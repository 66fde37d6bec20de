package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic invariants for the q77-q79 analytics wave. */
class CorpusAnalyticsSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q77 source KL: straight-line integer replay per source, and the " +
       "floored KL never dips below the interpolation-error floor") {
    val got = CorpusOps.sourceKl(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay with plain Scala integer arithmetic from raw (source, lang)
    // counts — same formula, independent execution path
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = counts.groupBy(_._1)
    val byLang = counts.groupBy(_._2).map { case (l, xs) => l -> xs.map(_._3).sum }
    val total = counts.map(_._3).sum
    def log2m(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      e * 1000 + (x * 1024 / (1L << e) - 1024) * 1000 / 1024
    }
    bySrc.foreach { case (src, rows) =>
      val nS = rows.map(_._3).sum
      val klNum = rows.map { case (_, lang, cSl) =>
        val ratio = math.max(cSl * total * 1024 / (nS * byLang(lang)), 1L)
        cSl * math.max(log2m(ratio) - 10000, -10000L)
      }.sum
      assert(got(src) == ((nS, klNum / nS)), s"replay mismatch for $src")
    }
    assert(got.values.forall(_._2 >= -200),
      "KL below the floor/interpolation error bound")
  }

  test("q80 winnowing: the local-fingerprint guarantee holds — any " +
       "shared >=6-token run between two documents shares a fingerprint; " +
       "density sits near winnowing's expected 2/(w+1)") {
    val rows = DedupOps.winnowing(spark, dir).collect()
    assert(rows.length > 400)
    rows.foreach { r =>
      assert(r.getLong(2) >= 1 && r.getLong(2) <= r.getLong(1)) }
    // density: per-doc expected ~2/(w+1) = 400000 ppm; corpus mean close
    val mean = rows.map(_.getLong(3)).sum / rows.length
    assert(mean > 250000 && mean < 650000, s"mean density $mean ppm")
    // the guarantee, exercised directly: take two docs, splice a shared
    // 8-token run into both, and check the fingerprint sets intersect
    import spark.implicits._
    val run = (1 to 8).map(i => s"sharedtok$i").mkString(" ")
    val spliced = Seq(
      (1L, s"alpha beta gamma $run delta epsilon"),
      (2L, s"one two three four $run five six")).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft-winnow")
    spliced.write.mode("overwrite")
      .parquet(tmp.resolve("documents.parquet").toString)
    // both docs clear the >=6-token gate, so winnowing(tmp) covers them;
    // recompute the raw fingerprint SETS (the op only emits the md5 proof)
    assert(DedupOps.winnowing(spark, tmp.toString).count() == 2)
    val sets = spark.read.parquet(tmp.resolve("documents.parquet").toString)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("g", expr(
        "transform(sequence(1, size(toks) - 2), i -> md5(concat_ws(' ', " +
          "element_at(toks, i), element_at(toks, i + 1), " +
          "element_at(toks, i + 2))))"))
      .withColumn("sel", expr(
        "array_distinct(transform(sequence(1, size(g) - 3), " +
          "j -> array_min(slice(g, j, 4))))"))
      .select("doc_id", "sel").collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert(sets(1L).intersect(sets(2L)).nonEmpty,
      "spliced 8-token run produced no shared fingerprint")
  }

  test("q81 signal agreement: cell counts sum to the scored corpus and " +
       "bands/terciles take only legal values") {
    val m = TextOps.signalAgreement(spark, dir).collect()
    val total = m.map(_.getLong(2)).sum
    val scored = TextOps.lmSurprise(spark, dir).count()
    assert(total == scored, s"cross-tab covers $total of $scored docs")
    assert(m.forall(r => r.getLong(0) >= 0 && r.getLong(0) <= 3))
    assert(m.forall(r => Set("head", "middle", "tail")(r.getString(1))))
    assert(m.map(_.getString(1)).toSet.size == 3,
      "a perplexity tercile is empty")
  }

  test("q82 split leakage: totals reconcile with q12, splits are legal " +
       "and hash-stable, and cross_split flags exactly the mixed cells") {
    val m = CorpusOps.splitLeakage(spark, dir).collect()
    val legal = Set("train", "val", "test")
    assert(m.forall(r => legal(r.getString(0)) && legal(r.getString(1))))
    assert(m.forall(r => r.getString(0) <= r.getString(1)))
    assert(m.forall(r =>
      (r.getLong(4) == 1L) == (r.getString(0) != r.getString(1))))
    assert(m.map(_.getLong(2)).sum ==
      DedupOps.lshCandidatePairs(spark, dir).count())
    // the 90/5/5 hash split puts most candidate mass in train×train
    val tt = m.find(r => r.getString(0) == "train" && r.getString(1) == "train")
    assert(tt.nonEmpty && tt.get.getLong(2) >= m.map(_.getLong(2)).max / 2)
  }

  test("q83 span mask: block arithmetic replays exactly and the corpus " +
       "mask rate sits near the designed 15%") {
    val rows = TextOps.spanMask(spark, dir).collect()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows.length == docs.size)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    def blockMasked(docId: Long, b: Long): Boolean = {
      val h = md.digest(s"mask:$docId:$b".getBytes("UTF-8"))
        .take(4).map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(h, 16) % 20 < 3
    }
    rows.foreach { r =>
      val toks = docs(r.getLong(0)).split(" ")
      val mb = (0L to (toks.length - 1) / 3).filter(blockMasked(r.getLong(0), _))
      val masked = toks.zipWithIndex.collect {
        case (t, i) if mb.contains(i / 3L) => t }
      assert(r.getLong(1) == toks.length && r.getLong(2) == mb.length &&
        r.getLong(3) == masked.length, s"doc ${r.getLong(0)} counts")
      val proof = java.security.MessageDigest.getInstance("MD5")
        .digest(masked.mkString(" ").getBytes("UTF-8"))
        .map(x => f"$x%02x").mkString
      assert(r.getString(5) == proof, s"doc ${r.getLong(0)} proof")
    }
    val rate = rows.map(_.getLong(3)).sum * 1000 / rows.map(_.getLong(1)).sum
    assert(rate > 100 && rate < 200, s"corpus mask rate ${rate}permille")
  }

  test("q78 copy matrix: totals reconcile with q12 candidates and q13 " +
       "verified dups; cells are source-normalized") {
    val m = DedupOps.copyMatrix(spark, dir)
    val rows = m.collect()
    assert(rows.forall(r => r.getString(0) <= r.getString(1)))
    val nCand = rows.map(_.getLong(2)).sum
    val nDups = rows.map(_.getLong(3)).sum
    assert(nCand == DedupOps.lshCandidatePairs(spark, dir).count())
    assert(nDups == DedupOps.jaccardPairs(spark, dir).count())
  }

  test("q79 bucket balance: loads reconcile with q29's shard assignment " +
       "and ppm columns sum to 32e6 modulo floor loss") {
    val bal = CorpusOps.bucketBalance(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val q29 = CorpusOps.shuffleShards(spark, dir)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bal.keySet == q29.keySet)
    bal.foreach { case (shard, (nDocs, _, _)) =>
      assert(q29(shard) == nDocs, s"shard $shard doc count") }
    val docSum = bal.values.map(_._2).sum
    val tokSum = bal.values.map(_._3).sum
    assert(docSum > 32000000L - 64 && docSum <= 32000000L, s"doc ppm $docSum")
    assert(tokSum > 32000000L - 64 && tokSum <= 32000000L, s"tok ppm $tokSum")
  }
}
