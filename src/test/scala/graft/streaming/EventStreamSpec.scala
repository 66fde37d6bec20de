package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkTestBase
import graft.streaming.EventStream.FetchEvent

class EventStreamSpec extends SparkTestBase {

  test("politenessThrottle: ≤1 fetch per host per window, across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FetchEvent]
    val q = EventStream.politenessThrottle(in.toDS(), rateSec = 10)
      .writeStream.format("memory").queryName("throttled")
      .outputMode("append").start()

    // batch 1: host A floods inside one window; host B one request
    in.addData(
      FetchEvent("A", "a1", 100), FetchEvent("A", "a2", 103),
      FetchEvent("A", "a3", 109), FetchEvent("B", "b1", 100))
    q.processAllAvailable()
    // batch 2: A's window reopened at 110; B still closed at 105
    in.addData(FetchEvent("A", "a4", 111), FetchEvent("B", "b2", 105))
    q.processAllAvailable()
    // batch 3: B reopens
    in.addData(FetchEvent("B", "b3", 120))
    q.processAllAvailable()

    val got = spark.table("throttled").as[FetchEvent].collect()
      .map(_.url).toSet
    q.stop()
    assert(got == Set("a1", "b1", "a4", "b3"))
  }

  test("hourlyCounts: watermarked tumbling window (streaming twin of q07)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FetchEvent]
    val q = EventStream.hourlyCounts(in.toDF(), watermark = "1 hour")
      .writeStream.format("memory").queryName("hourly")
      .outputMode("append").start()

    val h = 3600L
    in.addData(
      FetchEvent("A", "u1", 10 * h + 60), FetchEvent("A", "u2", 10 * h + 120),
      FetchEvent("B", "u3", 10 * h + 200))
    q.processAllAvailable()
    // advance event time far past the watermark so hour-10 windows close
    in.addData(FetchEvent("A", "u4", 13 * h))
    q.processAllAvailable()
    in.addData(FetchEvent("A", "u5", 16 * h))
    q.processAllAvailable()

    val rows = spark.table("hourly")
      .selectExpr("cast(hour_start as long)", "root_hash", "fetches")
      .as[(Long, String, Long)].collect().toSet
    q.stop()
    assert(rows.contains((10 * h, "A", 2L)))
    assert(rows.contains((10 * h, "B", 1L)))
  }

  test("sessionizeStream: strict-gap boundaries in the data path, " +
       "watermark timeout closes idle sessions, batch-identical numbering") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStream.{SessionRow, UserEvent}
    def ue(user: Long, id: Long, tUs: Long, vc: Long) =
      UserEvent(user, id, new java.sql.Timestamp(tUs / 1000), tUs, vc)
    val G = 10000000L // 10 s gap for the test
    val base = 1700000000000000L
    val in = MemoryStream[UserEvent]
    val q = EventStream.sessionizeStream(in.toDS(), gapUs = G)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()

    // user 1: gap EXACTLY G (stays), then gap G+1µs (closes in-trigger)
    in.addData(ue(1, 10, base, 100), ue(1, 11, base + G, 200),
      ue(1, 12, base + 2 * G + 1, 400))
    q.processAllAvailable()
    // user 2 opens; far-future user-3 event advances the watermark past
    // user 1's and 2's last+G → both open sessions close via timeout
    in.addData(ue(2, 20, base + 3 * G, 800))
    q.processAllAvailable()
    in.addData(ue(3, 30, base + 100 * G, 1600))
    q.processAllAvailable()

    val got = spark.table("sessions").as[SessionRow].collect().toSet
    q.stop()
    assert(got == Set(
      SessionRow(1, 1, 2, G, 300),      // closed by the G+1 event
      SessionRow(1, 2, 1, 0, 400),      // closed by timeout
      SessionRow(2, 1, 1, 0, 800)))     // closed by timeout
  }

  test("sessionizeStream ≡ batch q48 on the real sf0.001 events, fed in " +
       "3 event-time-ordered triggers + a watermark flush") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStream.{SessionRow, UserEvent}
    import org.apache.spark.sql.functions._
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val all = ev.select(col("user_id"), col("event_id"),
        col("ts").cast("timestamp").as("ts"),
        unix_micros(col("ts").cast("timestamp")).as("t_us"),
        round(col("value") * 100).cast("long").as("vc"))
      .as[UserEvent].collect().sortBy(e => (e.t_us, e.event_id))
    val in = MemoryStream[UserEvent]
    val q = EventStream.sessionizeStream(in.toDS(),
        gapUs = graft.queries.TemporalOps.GapUs)
      .writeStream.format("memory").queryName("sess_parity")
      .outputMode("append").start()
    all.grouped((all.length + 2) / 3).foreach { chunk =>
      in.addData(chunk.toSeq); q.processAllAvailable()
    }
    // flush: one far-future event closes every open session via timeout
    val tMax = all.last.t_us + 1000L * graft.queries.TemporalOps.GapUs
    in.addData(UserEvent(-1L, -1L, new java.sql.Timestamp(tMax / 1000),
      tMax, 0L))
    q.processAllAvailable()
    val streamed = spark.table("sess_parity").as[SessionRow].collect()
      .filter(_.user_id >= 0).map(r =>
        (r.user_id, r.sess_idx, r.n_events, r.dur_us, r.value_cents)).toSet
    q.stop()
    val batch = graft.queries.TemporalOps.sessionizeDf(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(streamed == batch,
      s"streamed=${streamed.size} batch=${batch.size}; " +
        s"onlyStream=${(streamed -- batch).take(3)} " +
        s"onlyBatch=${(batch -- streamed).take(3)}")
  }

  test("seenFilter: first occurrence only, across batches (streaming twin " +
       "of J2/U1)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[FetchEvent]
    val q = EventStream.seenFilter(in.toDS())
      .writeStream.format("memory").queryName("seen")
      .outputMode("append").start()

    // batch 1: u1 arrives twice in the same micro-batch — earliest ts wins
    in.addData(
      FetchEvent("A", "u1", 105), FetchEvent("A", "u1", 101),
      FetchEvent("B", "u2", 100))
    q.processAllAvailable()
    // batch 2: replays of both + one genuinely new url
    in.addData(
      FetchEvent("A", "u1", 200), FetchEvent("B", "u2", 201),
      FetchEvent("C", "u3", 202))
    q.processAllAvailable()

    val got = spark.table("seen").as[FetchEvent].collect()
    q.stop()
    assert(got.map(_.url).sorted.toSeq == Seq("u1", "u2", "u3"))
    // the in-batch duplicate resolved to the earliest arrival
    assert(got.find(_.url == "u1").get.ts == 101)
  }
}
