package graft.driver

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions.col
import graft.core.{CrawlState, FrontierEntry, HostEntry}

/**
 * S6 — the downstream message-queue surface (reference: mq/mq.c:272-339
 * `anansi_mq_next_`): consumers drain `ACCEPTED` frontier rows one at a
 * time, scoped to their node slice (`tinyhash % nodecount = nodeid`,
 * mq.c:298-299) and optionally to a host partition label (F8 —
 * mq.c:373-400 joins crawl_root on its indexed `partition` column,
 * db.c:564-579), newest-updated first. An ack marks `COMPLETE` (mq.c:447),
 * a reject marks `FAILED` (mq.c:463) — both guarded on `state='ACCEPTED'`
 * so a concurrent transition wins (the reference's `AND state='ACCEPTED'`
 * clause).
 *
 * Transitions are BATCHED KEYED DELTAS: ackDelta/rejectDelta return only
 * the rows that actually transition (the guarded single-row UPDATE as a
 * delta); the driver folds them into its frontier overlay — O(batch) work,
 * never a full-frontier rewrite (round-1's per-ack whole-table map).
 *
 * The reference's DESC-by-updated scan has no tie-break — ours adds
 * `url ASC` for determinism (documented deviation).
 */
object MqConsumer {

  /** The next ACCEPTED row for node `nodeId` of `nodeCount`, optionally
    * scoped to hosts labeled `partition` (F8). */
  def next(frontier: Dataset[FrontierEntry], hosts: Dataset[HostEntry],
           nodeId: Int, nodeCount: Int,
           partition: Option[String] = None): Option[FrontierEntry] = {
    import frontier.sparkSession.implicits._
    val scoped = partition match {
      case None => frontier
      case Some(p) => frontier
        .join(hosts.filter(_.partition.contains(p)).select("root_hash"),
          Seq("root_hash"), "left_semi")
        .as[FrontierEntry]
    }
    scoped
      .filter(f => f.state == CrawlState.Accepted &&
        f.tinyhash % nodeCount == nodeId)
      .orderBy($"updated".desc_nulls_last, $"url".asc)
      .head(1).headOption
  }

  /** Guarded batch transition ACCEPTED → `to`: emits ONLY the rows that
    * actually transition. Rows already COMPLETE/FAILED produce no delta
    * row and stay untouched — the `AND state='ACCEPTED'` guard. Batches
    * are driver-sized ack lists (isin-pushdown against the scan). */
  private def transitionDelta(
      frontier: Dataset[FrontierEntry],
      urlHashes: Seq[String],
      to: String): Dataset[FrontierEntry] =
    frontier
      .filter(col("state") === CrawlState.Accepted &&
        col("url_hash").isin(urlHashes: _*))
      .map(_.copy(state = to))(frontier.encoder)

  /** Consumer acks: ACCEPTED → COMPLETE (guarded; mq.c:447). */
  def ackDelta(frontier: Dataset[FrontierEntry],
               urlHashes: Seq[String]): Dataset[FrontierEntry] =
    transitionDelta(frontier, urlHashes, CrawlState.Complete)

  /** Consumer rejects: ACCEPTED → FAILED (guarded; mq.c:463). */
  def rejectDelta(frontier: Dataset[FrontierEntry],
                  urlHashes: Seq[String]): Dataset[FrontierEntry] =
    transitionDelta(frontier, urlHashes, CrawlState.Failed)
}
