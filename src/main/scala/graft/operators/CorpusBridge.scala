package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Crawl → corpus bridge: exports a crawl's extracted text as a table in
 * the exact `documents` shape every pipeline operator (q10..q64)
 * consumes — `(doc_id, text, lang, source, n_chars)`.
 *
 * This is the handoff the reference performs through its queue: Anansi's
 * processor marks each successfully processed object back into the queue
 * (/root/reference/libspider/processor.c:143-222 — the `updated`
 * callback ends in `queue_updated_uristr` with state ACCEPTED), and
 * downstream consumers drain those URIs (the MQ this repo's MqConsumer
 * mirrors) to read the cached payloads. Spark-first, the handoff is a
 * table, not a message stream: one scan of the `extracted` state
 * produces the corpus input, and the whole curation family (clean gate,
 * dedup, decontamination, packing) runs directly on it — demonstrated
 * end-to-end by CorpusBridgeSpec.
 *
 * Shapes: `doc_id` = first 15 hex digits of sha256(url) (60 bits —
 * deterministic across runs and engines, collision odds ~n²/2^61);
 * `source` = the URL host (the same per-site rollup key the crawl
 * partitions by); `lang` = 'und' — language identification is the
 * pipeline's OWN first pass (q20), not the crawler's claim. The write
 * repartitions by doc_id: a hash-distributed shard writer, no global
 * ordering, so the export scales exactly like the q29 shard build.
 */
object CorpusBridge {

  /** The `documents`-shaped view of a crawl's extracted text. */
  def documentsFrom(extracted: Dataset[CrawlRound.ExtractedRow]): DataFrame =
    extracted.toDF("url", "text").select(
      conv(substring(sha2(col("url").cast("binary"), 256), 1, 15), 16, 10)
        .cast("long").as("doc_id"),
      col("text"),
      lit("und").as("lang"),
      parse_url(col("url"), lit("HOST")).as("source"),
      length(col("text")).cast("long").as("n_chars"))

  /** Materialize as `<dir>/documents.parquet`, hash-distributed. */
  def writeDocuments(extracted: Dataset[CrawlRound.ExtractedRow],
                     dir: String, shards: Int = 0): Unit = {
    val d = documentsFrom(extracted)
    val out = if (shards > 0) d.repartition(shards, col("doc_id"))
              else d.repartition(col("doc_id"))
    out.write.mode("overwrite").parquet(s"$dir/documents.parquet")
  }
}
