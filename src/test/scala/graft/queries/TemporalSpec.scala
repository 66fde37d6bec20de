package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.nio.file.Files

/**
 * Boundary semantics of the temporal operators on a handcrafted events
 * fixture — every edge the DuckDB oracle would also exercise at scale:
 * as-of tie/unmatched/latest-wins, range-join inclusive start / exclusive
 * end / bin-boundary crossing, sessionization's strict gap comparison.
 */
class TemporalSpec extends SparkTestBase {

  /** Writes a tiny events.parquet (driver schema) and returns its dir. */
  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-temporal").toString
    import spark.implicits._
    val base = 1700000000000000L // epoch µs, well past 1970
    def ev(id: Long, user: Long, tUs: Long, typ: String, value: Double) =
      (id, tUs, user, typ, value, "{}")
    val rows = Seq(
      // user 1 — as-of cases: error@t0 has no prior click; click@t1;
      // error@t1 ties the click (lag 0); click@t2 then error@t3 → latest
      // click wins (lag t3-t2)
      ev(100, 1, base + 0L, "error", 1.0),
      ev(101, 1, base + 1000000L, "click", 2.0),
      ev(102, 1, base + 1000000L, "error", 3.0),
      ev(103, 1, base + 5000000L, "click", 4.0),
      ev(104, 1, base + 9000000L, "error", 5.0),
      // user 2 — range cases around an error interval [s, s+600s):
      // view at s (inclusive), s+599.999999s (last µs in), s+600s
      // (exclusive end → out), and a view in the NEXT bin still inside
      // the interval (bin-boundary crossing). Interval start is chosen
      // mid-bin so it genuinely spans two bins.
      ev(200, 2, base + 300L * 1000000, "error", 1.0), // s, mid-bin
      ev(201, 2, base + 300L * 1000000, "view", 1.0), // == s → in
      ev(202, 2, base + 900L * 1000000 - 1, "view", 1.0), // last µs → in
      ev(203, 2, base + 900L * 1000000, "view", 1.0), // == end → out
      ev(204, 2, base + 700L * 1000000, "view", 1.0), // next bin, in
      // user 3 — two overlapping error intervals cover one view twice
      ev(300, 3, base + 0L, "error", 1.0),
      ev(301, 3, base + 100L * 1000000, "error", 1.0),
      ev(302, 3, base + 200L * 1000000, "view", 1.0),
      // user 4 — session gaps: exactly 30 min (same session, strict >),
      // 30 min + 1 µs (new session)
      ev(400, 4, base + 0L, "view", 1.0),
      ev(401, 4, base + 1800L * 1000000, "view", 2.0),
      ev(402, 4, base + 3600L * 1000000 + 1, "view", 4.0)
    )
    rows.toDF("event_id", "t_us", "user_id", "event_type", "value", "props")
      .select(col("event_id"), timestamp_micros(col("t_us")).as("ts"),
        col("user_id"), col("event_type"), col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    d
  }

  test("q46 as-of: unmatched → -1, equal-ts click matches with lag 0, " +
       "latest prior click wins") {
    val got = TemporalOps.asofLastClick(spark, dir)
      .filter(col("user_id") === 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == Map(100L -> -1L, 102L -> 0L, 104L -> 4000000L))
  }

  test("q47 range: inclusive start, exclusive end, coverage across the " +
       "bin boundary, overlapping intervals counted per interval") {
    val got = TemporalOps.rangeJoinCoverage(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(201L) == 1L, "view at interval start must be covered")
    assert(got(202L) == 1L, "view at last in-interval µs must be covered")
    assert(got(203L) == 0L, "view at exclusive end must NOT be covered")
    assert(got(204L) == 1L, "view in the interval's second bin must be " +
      "covered exactly once")
    assert(got(302L) == 2L, "overlapping intervals each count")
    assert(got(400L) == 0L && got(401L) == 0L, "users with no errors → 0")
  }

  test("q48 sessionize: gap == 30 min stays in-session (strict >); " +
       "30 min + 1 µs opens a new one") {
    val got = TemporalOps.sessionize(spark, dir)
      .filter(col("user_id") === 4)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .sortBy(_._1)
    // session 1: events 400+401 (gap exactly 30 min), 100+200 cents
    // session 2: event 402 alone, duration 0
    assert(got.toSeq == Seq((1L, 2L, 1800L * 1000000, 300L),
                            (2L, 1L, 0L, 400L)))
  }

  test("q46/q47/q48 agree with the DuckDB-shaped reference semantics on " +
       "the real sf0.001 events table (row counts + spot invariants)") {
    val sf = "/root/testdata/sf0.001"
    val asof = TemporalOps.asofLastClick(spark, sf).cache()
    val nErrors = spark.read.parquet(s"$sf/events.parquet")
      .filter(col("event_type") === "error").count()
    assert(asof.count() == nErrors, "one row per probe, exactly")
    assert(asof.filter(col("lag_us") < -1).count() == 0)
    val sess = TemporalOps.sessionize(spark, sf)
    // sessions per user ≥ 1 and event counts re-sum to the table total
    val tot = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(tot == spark.read.parquet(s"$sf/events.parquet").count())
    asof.unpersist()
  }
}
