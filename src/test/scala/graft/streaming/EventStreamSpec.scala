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
