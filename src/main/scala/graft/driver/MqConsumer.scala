package graft.driver

import org.apache.spark.sql.Dataset
import graft.core.{CrawlState, FrontierEntry}

/**
 * S6 — the downstream message-queue surface (reference: mq/mq.c:272-339
 * `anansi_mq_next_`): consumers drain `ACCEPTED` frontier rows one at a
 * time, scoped to their node slice (`tinyhash % nodecount = nodeid`,
 * mq.c:298-299), newest-updated first; an ack marks `COMPLETE`
 * (mq.c:447), a reject marks `FAILED` (mq.c:463) — both guarded on
 * `state='ACCEPTED'` so a concurrent transition wins (the reference's
 * `AND state='ACCEPTED'` clause).
 *
 * S7 — the partition-label tool (reference: crawler/partition.c:47-96):
 * `UPDATE crawl_root SET partition=? WHERE uri=?`, plus the F8 scoped
 * host filter (db.c:564-579).
 *
 * Pure Dataset → Dataset transforms; CrawlDriver exposes stateful
 * wrappers. The reference's DESC-by-updated scan has no tie-break — ours
 * adds `url ASC` for determinism (documented deviation).
 */
object MqConsumer {

  /** The next ACCEPTED row for node `nodeId` of `nodeCount`. */
  def next(frontier: Dataset[FrontierEntry], nodeId: Int,
           nodeCount: Int): Option[FrontierEntry] = {
    import frontier.sparkSession.implicits._
    frontier
      .filter(f => f.state == CrawlState.Accepted &&
        f.tinyhash % nodeCount == nodeId)
      .orderBy($"updated".desc_nulls_last, $"url".asc)
      .head(1).headOption
  }

  private def transition(frontier: Dataset[FrontierEntry], urlHash: String,
                         to: String): Dataset[FrontierEntry] =
    frontier.map { f =>
      if (f.url_hash == urlHash && f.state == CrawlState.Accepted)
        f.copy(state = to)
      else f
    }(frontier.encoder)

  /** Consumer ack: ACCEPTED → COMPLETE (guarded; mq.c:447). */
  def ack(frontier: Dataset[FrontierEntry],
          urlHash: String): Dataset[FrontierEntry] =
    transition(frontier, urlHash, CrawlState.Complete)

  /** Consumer reject: ACCEPTED → FAILED (guarded; mq.c:463). */
  def reject(frontier: Dataset[FrontierEntry],
             urlHash: String): Dataset[FrontierEntry] =
    transition(frontier, urlHash, CrawlState.Failed)
}
