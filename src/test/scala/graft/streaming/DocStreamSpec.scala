package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.streaming.DocStream.{DocEvent, IngestRow}

class DocStreamSpec extends SparkTestBase {

  test("ingest: stateful first-arrival dedup + quality gate across " +
       "batches (hand fixture)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prose = "the cat of the house and a dog of the yard ran far away"
    val in = MemoryStream[DocEvent]
    val q = DocStream.ingest(in.toDS())
      .writeStream.format("memory").queryName("ingest_fix")
      .outputMode("append").start()
    // batch 1: two distinct docs, one in-batch duplicate pair (3 beats 7)
    in.addData(
      DocEvent(3L, "en", "web", prose),
      DocEvent(7L, "en", "web", prose),
      DocEvent(5L, "en", "web", "the the the the the the the the"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate (dropped) + one genuinely new doc
    in.addData(
      DocEvent(9L, "en", "web", prose),
      DocEvent(11L, "de", "web",
        "der hund und die katze und das haus und der baum sind gross"))
    q.processAllAvailable()
    val rows = spark.table("ingest_fix").as[IngestRow].collect()
      .sortBy(_.doc_id)
    q.stop()
    assert(rows.map(_.doc_id).toSeq == Seq(3L, 5L, 11L), rows.mkString(";"))
    val byId = rows.map(r => r.doc_id -> r).toMap
    assert(byId(3L).keep == 1 && byId(3L).guess == "en")
    assert(byId(5L).keep == 0, byId(5L).toString) // ttr 125 < 200
    assert(byId(11L).keep == 1 && byId(11L).guess == "de")
  }

  test("ingest ≡ batch q25 survivors on the real sf0.001 documents, fed " +
       "in 3 doc_id-ordered triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val all = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source"), col("text"))
      .as[DocEvent].collect().sortBy(_.doc_id)
    val in = MemoryStream[DocEvent]
    val q = DocStream.ingest(in.toDS())
      .writeStream.format("memory").queryName("ingest_parity")
      .outputMode("append").start()
    all.grouped((all.length + 2) / 3).foreach { chunk =>
      in.addData(chunk.toSeq); q.processAllAvailable()
    }
    val streamed = spark.table("ingest_parity").as[IngestRow].collect()
      .map(r => (r.doc_id, r.lang, r.source, r.text_hash, r.n_tokens,
        r.ttr_permille, r.guess, r.keep)).toSet
    q.stop()
    val batch = DocStream.batchSurvivors(
        graft.queries.TextOps.corpusClean(spark, sf)).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4), r.getLong(5), r.getString(6),
        r.getInt(7))).toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }
}
