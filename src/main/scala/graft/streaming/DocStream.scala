package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.queries.TextOps

/**
 * Streaming corpus ingest — the continuous twin of the batch corpus-clean
 * pass (queries/TextOps.corpusClean, q25): a crawl emits documents
 * continuously, and the training-corpus gate scores and dedups them
 * incrementally instead of re-scanning the accumulated corpus per batch.
 *
 * Per micro-batch: the SAME per-row feature projection as q25
 * (TextOps.cleanFeatures — content hash, language guess, type-token
 * ratio, keep verdict; codegen'd, shuffle-free), then a stateful
 * first-arrival exact dedup on the content hash: one boolean of state
 * store per distinct hash (sharded by Spark's state store exactly like
 * the batch group-by shards the shuffle), earliest doc_id wins within a
 * batch. Output = exactly the rows the batch pass would emit as
 * survivors, in arrival order — parity-pinned row-for-row by
 * EventStreamSpec when the stream is fed in doc_id order.
 */
object DocStream {

  /** A document on the wire. */
  final case class DocEvent(doc_id: Long, lang: String, source: String,
                            text: String)

  /** A scored, dedup-surviving document (q25's columns minus dup_cnt,
    * which a first-arrival stream cannot know yet). */
  final case class IngestRow(doc_id: Long, lang: String, source: String,
                             text_hash: String, n_tokens: Long,
                             ttr_permille: Long, guess: String, keep: Int)

  def ingest(docsStream: Dataset[DocEvent]): Dataset[IngestRow] = {
    import docsStream.sparkSession.implicits._
    TextOps.cleanFeatures(docsStream.toDF())
      .select("doc_id", "lang", "source", "text_hash", "n_tokens",
        "ttr_permille", "guess", "keep")
      .as[IngestRow]
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[IngestRow], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(batch.minBy(_.doc_id))
          }
      }
  }

  /** Batch survivors for the parity check: q25 minus dup_cnt. */
  def batchSurvivors(clean: DataFrame): DataFrame =
    clean.select("doc_id", "lang", "source", "text_hash", "n_tokens",
      "ttr_permille", "guess", "keep")
}
