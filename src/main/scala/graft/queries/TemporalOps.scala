package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Temporal join/segmentation operators over the `events` table — the
 * query-side analogs of the crawl engine's fetch-timeline semantics
 * (reference: the `fetch_log` history rows written per fetch,
 * libspider/queues/db.c:1006-1126, and the politeness window
 * `earliest_update = now + rate` advanced inside the dequeue txn,
 * db.c:762-790). "What was the host/page state as of this fetch?" is an
 * AS-OF join against the log; "which fetches landed inside a politeness
 * window?" is an interval join; "group a host's fetches into bursts" is
 * gap sessionization. Spark has no native ASOF/range join (DuckDB does —
 * which makes it a genuinely independent oracle), so each is re-expressed
 * in the shape that survives 100 TB:
 *
 *  - as-of:   NO join at all — union both streams tagged, one shuffle on
 *             the key, and a carry-forward `last(_, ignoreNulls)` window
 *             (the Flink temporal-join pattern). Wall cost = one sort per
 *             key partition; never quadratic, never a BNLJ.
 *  - range:   intervals bucketized to fixed time bins (interval length ==
 *             bin width → ≤ 2 bins per interval), probe equi-joined on
 *             (key, bin) with the residual bounds in the join condition.
 *             The naive spelling (inequality-only condition) lowers to
 *             BroadcastNestedLoopJoin in Spark — the bucketing keeps it a
 *             shuffled hash join with a bounded fan-out of 2.
 *  - session: lag + cumulative-sum window — the textbook segmentation; one
 *             shuffle, map-side-combinable rollup after.
 *
 * All outputs are exact integers (epoch microseconds / cents) so
 * Spark/DuckDB cannot diverge on float summation order.
 */
object TemporalOps {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** Epoch µs; the driver writes TIMESTAMP_NTZ, the session tz is UTC, so
    * the cast interprets the naive timestamp exactly like DuckDB's
    * epoch_us. */
  private def us(c: Column): Column = unix_micros(c.cast("timestamp"))

  // -------------------------------------------------------------------
  // q46: AS-OF join — for every `error` event, the most recent `click`
  // by the same user at-or-before it (>= semantics, like DuckDB ASOF).
  // -------------------------------------------------------------------

  /** Carry-forward as-of: reference rows sort before probe rows at equal
    * timestamps (tag 0 < 1), so an equal-ts click is eligible, matching
    * ASOF's `e.ts >= c.ts`. Unmatched probes report lag_us = -1 (left
    * semantics, null-free for stable hashing). */
  def asofLastClick(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), us(col("ts")).as("t_us"),
        col("event_type"))
    val ref = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t_us"), lit(0).as("tag"),
        col("event_id"), col("t_us").as("ref_us"))
    val probe = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("t_us"), lit(1).as("tag"),
        col("event_id"), lit(null).cast("long").as("ref_us"))
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us").asc, col("tag").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ref.unionByName(probe)
      .withColumn("asof_us", last(col("ref_us"), ignoreNulls = true).over(w))
      .filter(col("tag") === 1)
      .select(col("event_id"), col("user_id"),
        coalesce(col("t_us") - col("asof_us"), lit(-1L)).as("lag_us"))
  }

  /** DuckDB's native ASOF JOIN — an independently-implemented algorithm
    * (DuckDB plans a specialized sorted-merge), so agreement is a strong
    * cross-check of the carry-forward window. */
  val asofLastClickSql: String =
    """SELECT e.event_id, e.user_id,
      |  COALESCE(epoch_us(e.ts) - epoch_us(c.ts), -1) AS lag_us
      |FROM (SELECT * FROM events WHERE event_type = 'error') e
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON e.user_id = c.user_id AND e.ts >= c.ts""".stripMargin

  // -------------------------------------------------------------------
  // q47: interval (range) join — each `error` opens a 10-minute window
  // [ts, ts+10min); count, per `view` event, the same-user windows
  // containing it.
  // -------------------------------------------------------------------

  private val BinUs = 600000000L // 10 min in µs == the interval length

  def rangeJoinCoverage(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
      .select(col("event_id"), col("user_id"), us(col("ts")).as("t_us"),
        col("event_type"))
    // interval side: explode to covered bins (exactly 1 or 2 — interval
    // length equals bin width, so this is a bounded fan-out, not a blow-up)
    val ivals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("t_us").as("s_us"))
      .withColumn("bin", explode(sequence(
        expr(s"s_us div $BinUs"),
        expr(s"(s_us + ${BinUs - 1}) div $BinUs"))))
    val probes = ev.filter(col("event_type") === "view")
      .select(col("event_id"), col("user_id"), col("t_us"))
      .withColumn("bin", expr(s"t_us div $BinUs"))
    // equi-join on (user, bin) carries the residual bounds in-condition;
    // each interval row matches a probe in at most one of its bins, so no
    // dedup step is needed before the count
    val hits = probes.join(ivals,
        probes("user_id") === ivals("user_id") &&
          probes("bin") === ivals("bin") &&
          col("t_us") >= col("s_us") &&
          col("t_us") < col("s_us") + lit(BinUs))
      .groupBy(probes("event_id").as("event_id"))
      .agg(count(lit(1)).as("n_cover"))
    probes.select("event_id", "user_id")
      .join(hits, Seq("event_id"), "left")
      .withColumn("n_cover", coalesce(col("n_cover"), lit(0L)))
  }

  /** DuckDB plans the raw inequality join with its IEJoin operator —
    * again an independent algorithm for the same semantics. */
  val rangeJoinCoverageSql: String =
    """SELECT v.event_id, v.user_id,
      |  CAST(COUNT(er.ts) AS BIGINT) AS n_cover
      |FROM (SELECT * FROM events WHERE event_type = 'view') v
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') er
      |  ON v.user_id = er.user_id
      | AND epoch_us(v.ts) >= epoch_us(er.ts)
      | AND epoch_us(v.ts) < epoch_us(er.ts) + 600000000
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------------------------
  // q48: gap sessionization — per-user sessions split where the
  // inter-event gap exceeds 30 minutes (strict >, mirroring the
  // politeness ledger's strict earliest_update comparison, db.c:771).
  // -------------------------------------------------------------------

  /** Session gap: 30 min in µs (shared with the streaming twin). */
  val GapUs = 1800000000L

  def sessionize(s: SparkSession, dir: String): DataFrame =
    sessionizeDf(events(s, dir))

  /** Batch sessionization over any frame with (user_id, event_id, ts,
    * value) — split out so the streaming twin
    * (streaming.EventStream.sessionizeStream) can be parity-tested against
    * the identical input. */
  def sessionizeDf(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("t_us").asc, col("event_id").asc)
    val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .select(col("user_id"), col("event_id"), us(col("ts")).as("t_us"),
        round(col("value") * 100).cast("long").as("vc"))
      .withColumn("prev_us", lag(col("t_us"), 1).over(w))
      .withColumn("ns",
        when(col("prev_us").isNull ||
          col("t_us") - col("prev_us") > GapUs, 1).otherwise(0))
      .withColumn("sess_idx", sum(col("ns")).over(wc).cast("long"))
      .groupBy("user_id", "sess_idx")
      .agg(count(lit(1)).as("n_events"),
        (max(col("t_us")) - min(col("t_us"))).as("dur_us"),
        sum(col("vc")).as("value_cents"))
  }

  val sessionizeSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS t_us,
      |    CAST(ROUND(value*100) AS BIGINT) AS vc
      |  FROM events),
      |s AS (
      |  SELECT user_id, event_id, t_us, vc,
      |    CASE WHEN LAG(t_us) OVER w IS NULL
      |           OR t_us - LAG(t_us) OVER w > 1800000000
      |         THEN 1 ELSE 0 END AS ns
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
      |x AS (
      |  SELECT user_id, t_us, vc,
      |    CAST(SUM(ns) OVER (PARTITION BY user_id ORDER BY t_us, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_idx
      |  FROM s)
      |SELECT user_id, sess_idx, COUNT(*) AS n_events,
      |  MAX(t_us) - MIN(t_us) AS dur_us,
      |  CAST(SUM(vc) AS BIGINT) AS value_cents
      |FROM x GROUP BY 1, 2""".stripMargin
}
