package graft.driver

import java.nio.file.Files
import java.security.MessageDigest
import graft.SparkTestBase
import graft.operators.{CorpusBridge, CrawlRound}
import graft.queries.{CorpusOps, TextOps}
import graft.sim.FixtureWeb

/**
 * End-to-end: crawl the fixture web, export the extracted text through
 * the CorpusBridge into the pipeline's `documents` shape, and run the
 * curation operators directly on the export — the full
 * crawl → corpus → curate path one job graph away from training shards.
 */
class CorpusBridgeSpec extends SparkTestBase {
  val T0 = 1000000L

  lazy val crawled: (CrawlDriver, String) = {
    val web = CrawlRound.webFromMap(spark, FixtureWeb.generate())
    val drv = new CrawlDriver(spark, FixtureWeb.config(), web,
      store = None, numBuckets = 8)
    drv.seed(FixtureWeb.seeds, T0 - 1)
    drv.run(T0, 16)
    val dir = Files.createTempDirectory("graft-bridge").toString
    CorpusBridge.writeDocuments(drv.extracted, dir)
    (drv, dir)
  }

  test("bridge emits the exact documents schema with deterministic " +
       "hash-derived ids, one row per extracted url") {
    val (drv, dir) = crawled
    val written = spark.read.parquet(s"$dir/documents.parquet")
    assert(written.schema.fields.map(f =>
        (f.name, f.dataType.typeName)).sorted.toSeq == Seq(
      ("doc_id", "long"), ("lang", "string"), ("n_chars", "long"),
      ("source", "string"), ("text", "string")))
    val ext = drv.extractedMap
    assert(ext.nonEmpty)
    val rows = written.collect().map(r => (r.getLong(0), r.getString(1),
      r.getString(2), r.getString(3), r.getLong(4)))
    assert(rows.length == ext.size)
    assert(rows.map(_._1).distinct.length == rows.length, "doc_id collision")
    // ids replay from sha256(url); texts survive byte-identically
    val md = MessageDigest.getInstance("SHA-256")
    val wantIds = ext.map { case (url, text) =>
      val hex = md.digest(url.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      java.lang.Long.parseLong(hex, 16) -> text
    }
    rows.foreach { case (id, text, lang, source, nc) =>
      assert(wantIds(id) == text, s"doc $id text mismatch")
      assert(lang == "und" && source.nonEmpty && nc == text.length, id)
    }
  }

  test("the curation pipeline runs unmodified on the bridged export: " +
       "clean gate, dedup survivors, sequence packing") {
    val (drv, dir) = crawled
    val n = drv.extractedMap.size.toLong
    val clean = TextOps.corpusClean(spark, dir).collect()
    // corpusClean emits exact-dedup SURVIVORS: one row per distinct text,
    // whose dup counts add back up to the whole crawl corpus
    assert(clean.nonEmpty && clean.length <= n)
    assert(clean.map(_.getLong(4)).sum == n, s"dup counts don't cover $n")
    // packing accounts for every whitespace token of the crawl text
    val wantTokens = drv.extractedMap.values
      .map(_.split(" ").length.toLong).sum
    val packed = CorpusOps.seqPacking(spark, dir).collect()
    assert(packed.map(_.getLong(2)).sum == wantTokens)
    assert(packed.map(_.getLong(1)).sum == n)
  }
}
