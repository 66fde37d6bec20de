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

  // -------------------------------------------------------------------
  // Gap sessionization — the streaming twin of queries.TemporalOps
  // .sessionize (q48): identical session boundaries (strict > gap),
  // identical output row per CLOSED session, continuous instead of batch.
  // -------------------------------------------------------------------

  /** One event on the wire; `ts` carries event time for the watermark,
    * `t_us`/`vc` the exact-integer copies the session math uses. */
  final case class UserEvent(user_id: Long, event_id: Long,
                             ts: java.sql.Timestamp, t_us: Long, vc: Long)

  /** Per-session emitted row — column-identical to batch q48. */
  final case class SessionRow(user_id: Long, sess_idx: Long, n_events: Long,
                              dur_us: Long, value_cents: Long)

  /** Keyed state: 1-based index of the OPEN session (matches the batch
    * cumsum numbering) plus its running aggregate; `open=false` after a
    * timeout closed it. */
  final case class SessState(idx: Long, open: Boolean, startUs: Long,
                             lastUs: Long, n: Long, cents: Long)

  /**
   * Sessions close either when a later event of the same user arrives
   * past the gap (same trigger or a later one) or when the event-time
   * watermark passes lastSeen+gap with no further data (EventTimeTimeout)
   * — so the emitted stream is exactly the batch result restricted to
   * sessions the watermark has proven complete. State is one fixed-size
   * row per ACTIVE user, sharded by the state store on user_id: the
   * 100 TB-scale cost is O(active users), not O(events), and each trigger
   * touches only users with new data plus those timing out.
   */
  def sessionizeStream(events: Dataset[UserEvent],
                       gapUs: Long,
                       watermarkDelay: String = "0 seconds")
      : Dataset[SessionRow] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[UserEvent],
         state: GroupState[SessState]) =>
          if (state.hasTimedOut) {
            // watermark passed lastUs+gap with no new data: the open
            // session is complete — emit it, keep only the counter
            val st = state.get
            state.update(st.copy(idx = st.idx + 1, open = false))
            Iterator.single(SessionRow(user, st.idx, st.n,
              st.lastUs - st.startUs, st.cents))
          } else {
            val out = Vector.newBuilder[SessionRow]
            var st = state.getOption
              .getOrElse(SessState(1, open = false, 0, 0, 0, 0))
            // deterministic within a trigger: event-time order, exactly
            // the batch window's (t_us, event_id) sort
            batch.toVector.sortBy(e => (e.t_us, e.event_id)).foreach { e =>
              st =
                if (!st.open)
                  SessState(st.idx, open = true, e.t_us, e.t_us, 1, e.vc)
                else if (e.t_us - st.lastUs > gapUs) { // strict >, as batch
                  out += SessionRow(user, st.idx, st.n,
                    st.lastUs - st.startUs, st.cents)
                  SessState(st.idx + 1, open = true, e.t_us, e.t_us, 1, e.vc)
                } else
                  st.copy(lastUs = e.t_us, n = st.n + 1,
                    cents = st.cents + e.vc)
            }
            state.update(st)
            if (st.open) // close when the watermark proves the gap; +1 ms
              // rounds UP so the ms-floored timeout can never fire before
              // the exact µs boundary (premature close would break strict->
              // parity with the batch window)
              state.setTimeoutTimestamp((st.lastUs + gapUs) / 1000L + 1L)
            out.result().iterator
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
