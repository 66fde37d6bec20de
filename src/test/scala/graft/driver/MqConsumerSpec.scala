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

  test("testUri: one-shot force fetch (crawld -t analog)") {
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), store = None)
    val u = FixtureWeb.url(0, 0)
    d.testUri(u, T0 + 100)
    assert(d.traceRows.map(_.url) == Seq(u))
    assert(d.traceRows.head.state_at_dequeue == CrawlState.Force)
  }
}
