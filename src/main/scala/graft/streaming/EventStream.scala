package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming surfaces. The batch engine treats the frontier
 * tables as the state store (SURVEY §2.9 — rounds over snapshots), but a
 * continuous deployment can also consume fetch candidates / fetch events
 * as streams; these operators are that path:
 *
 *  - `hourlyCounts`: watermarked tumbling-window aggregation over fetch
 *    events (the streaming twin of queries.RelationalOps.eventsHourly);
 *  - `politenessThrottle`: the A2 politeness window (reference:
 *    libspider/queues/db.c:762-790 — ≥ rate ms between fetches per host)
 *    as keyed state via flatMapGroupsWithState: at most one emitted
 *    request per host per window, later-arriving requests dropped until
 *    the window reopens. State is one Long per host (the politeness
 *    ledger row), bounded by host count exactly like `crawl_root`.
 */
object EventStream {

  /** A fetch request/event on the wire. */
  final case class FetchEvent(root_hash: String, url: String, ts: Long)

  /** Watermarked tumbling counts per event hour (append mode). */
  def hourlyCounts(events: DataFrame,
                   watermark: String = "2 hours"): DataFrame =
    events
      .withColumn("ets", col("ts").cast("timestamp"))
      .withWatermark("ets", watermark)
      .groupBy(window(col("ets"), "1 hour"), col("root_hash"))
      .agg(count(lit(1)).as("fetches"))
      .select(col("window.start").as("hour_start"), col("root_hash"),
        col("fetches"))

  /** Politeness state: when may this host fetch next (epoch seconds). */
  final case class HostWindow(earliestUpdate: Long)

  /**
   * Streaming URL-seen filter — the continuous twin of the batch engine's
   * J2 insert-if-absent / U1 seen set (operators/SeenFilter; reference:
   * the `crawl_uri` unique-key insert, libspider/queues/db.c:1259-1293):
   * only the FIRST occurrence of each url ever passes; every later arrival
   * is dropped. State is one boolean per url key, sharded by Spark's state
   * store exactly like the batch side buckets on url_hash; within a
   * micro-batch the earliest (ts, url) duplicate wins deterministically.
   */
  def seenFilter(requests: Dataset[FetchEvent]): Dataset[FetchEvent] = {
    import requests.sparkSession.implicits._
    requests
      .groupByKey(_.url)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[FetchEvent], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            Iterator.single(batch.minBy(e => (e.ts, e.url)))
          }
      }
  }

  /**
   * Emit at most one request per host per politeness window of
   * `rateSec`; the window advances at emission (the reference writes
   * `earliest_update = now + rate` inside the dequeue txn).
   */
  def politenessThrottle(requests: Dataset[FetchEvent],
                         rateSec: Long): Dataset[FetchEvent] = {
    import requests.sparkSession.implicits._
    requests
      .groupByKey(_.root_hash)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[FetchEvent],
         state: GroupState[HostWindow]) =>
          var win = state.getOption.getOrElse(HostWindow(Long.MinValue))
          val out = Vector.newBuilder[FetchEvent]
          // deterministic within a micro-batch: process in time order
          batch.toVector.sortBy(e => (e.ts, e.url)).foreach { e =>
            if (e.ts >= win.earliestUpdate) {
              out += e
              win = HostWindow(e.ts + rateSec)
            } // else: inside the window — dropped (politeness)
          }
          state.update(win)
          out.result().iterator
      }
  }
}
