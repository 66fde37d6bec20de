package graft.driver

import graft.SparkTestBase
import graft.core.CrawlState
import graft.operators.CrawlRound
import graft.sim.FixtureWeb

class MqConsumerSpec extends SparkTestBase {
  val T0 = 1000000L

  lazy val drv: CrawlDriver = {
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), store = None)
    d.seed(FixtureWeb.seeds, T0 - 1)
    d.run(T0, 8)
    d
  }

  test("mqNext: newest-updated ACCEPTED row of the node slice (mq.c:298)") {
    val next = drv.mqNext(0, 1)
    assert(next.isDefined)
    val accepted = drv.frontier.collect()
      .filter(_.state == CrawlState.Accepted)
    assert(accepted.nonEmpty)
    assert(next.get.updated == accepted.flatMap(_.updated).maxOption)
    // slice scoping: every node-sliced result stays in its slice
    (0 until 2).foreach { node =>
      drv.mqNext(node, 2).foreach(f => assert(f.tinyhash % 2 == node))
    }
  }

  test("mqAck/mqReject transition with the ACCEPTED-state guard") {
    val a = drv.mqNext(0, 1).get
    drv.mqAck(a.url_hash)
    val after = drv.frontier.collect().find(_.url_hash == a.url_hash).get
    assert(after.state == CrawlState.Complete)
    // guard: reject after completion is a no-op (mq.c's AND state='ACCEPTED')
    drv.mqReject(a.url_hash)
    val after2 = drv.frontier.collect().find(_.url_hash == a.url_hash).get
    assert(after2.state == CrawlState.Complete)
    // reject of a still-ACCEPTED row → FAILED
    val b = drv.mqNext(0, 1).get
    drv.mqReject(b.url_hash)
    assert(drv.frontier.collect()
      .find(_.url_hash == b.url_hash).get.state == CrawlState.Failed)
  }

  test("batched acks: one keyed merge, ACCEPTED guard per row (mq.c:447,463)") {
    val accepted = drv.frontier.collect()
      .filter(_.state == CrawlState.Accepted).sortBy(_.url)
    assert(accepted.size >= 3)
    val Seq(a, b, c) = accepted.take(3).map(_.url_hash).toSeq
    drv.mqAckBatch(Seq(a, b))
    val after = drv.frontier.collect().map(f => f.url_hash -> f.state).toMap
    assert(after(a) == CrawlState.Complete && after(b) == CrawlState.Complete)
    // guard inside a batch: a is COMPLETE now — reject must not touch it
    drv.mqRejectBatch(Seq(a, c))
    val after2 = drv.frontier.collect().map(f => f.url_hash -> f.state).toMap
    assert(after2(a) == CrawlState.Complete)
    assert(after2(c) == CrawlState.Failed)
    // row count unchanged — merge, not append
    assert(drv.frontier.count() == after.size)
  }

  test("F8: partition-scoped mq consumption (mq.c:373-400, db.c:564-579)") {
    drv.setHostPartition("http://host0.example.org/", Some("pf8"))
    val scoped = drv.mqNext(0, 1, Some("pf8"))
    scoped.foreach(f =>
      assert(f.url.startsWith("http://host0.example.org/")))
    // every ACCEPTED row of the labeled host is in scope; others are not
    val inScope = drv.frontier.collect().filter(f =>
      f.state == CrawlState.Accepted &&
        f.url.startsWith("http://host0.example.org/"))
    assert(scoped.isDefined == inScope.nonEmpty)
    assert(drv.mqNext(0, 1, Some("no-such-partition")).isEmpty)
  }

  test("locate: cache view of a fetched url (crawl-locate analog)") {
    val fetched = drv.traceRows.map(_.url)
      .find(u => drv.extractedMap.contains(u))
    assert(fetched.isDefined)
    val loc = drv.locate(fetched.get)
    assert(loc.isDefined)
    assert(loc.get._2.contains(drv.extractedMap(fetched.get)))
    assert(drv.locate("http://never-seen.example.org/").isEmpty)
  }

  test("setHostPartition labels a host root (partition.c analog)") {
    drv.setHostPartition("http://host1.example.org/x", Some("p1"))
    val h = drv.hosts.collect()
      .find(_.root_url == "http://host1.example.org/").get
    assert(h.partition.contains("p1"))
  }

  test("testUri: one-shot force fetch equals the simulator's single round " +
       "(crawld -t analog, db.c:610-627)") {
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), store = None)
    val u = FixtureWeb.url(0, 0)
    d.testUri(u, T0 + 100)
    val sim = new graft.sim.Simulator(FixtureWeb.generate(),
      FixtureWeb.config())
    sim.addUrl(u, T0 + 99, force = true)
    sim.run(T0 + 100, 1)
    assert(d.traceRows == sim.trace.toSeq)
    assert(d.traceRows.map(_.url) == Seq(u))
    assert(d.traceRows.head.state_at_dequeue == CrawlState.Force)
    assert(d.seenSet == sim.seenSet) // one-shot discoveries enqueued too
  }

  test("S4: stored payload readable via locatePayload (disk.c read path)") {
    val fetched = drv.traceRows.map(_.url)
      .find(u => drv.extractedMap.contains(u))
    assert(fetched.isDefined)
    val body = drv.locatePayload(fetched.get)
    assert(body.isDefined)
    val webBody = FixtureWeb.generate()(fetched.get).body
    assert(body.get.toSeq == webBody.toSeq)
    assert(drv.locatePayload("http://never-seen.example.org/").isEmpty)
  }
}
