package graft.driver

import java.nio.file.Files
import graft.SparkTestBase
import graft.core.CrawlConfig
import graft.operators.CrawlRound
import graft.sim.{FixtureWeb, Simulator}
import graft.tables.SnapshotStore

/**
 * The BASELINE.md trace-replay gate: the Spark engine must reproduce the
 * reference simulator's crawl ordering, URL-seen set and extracted text
 * exactly, under the same seeds and politeness budget — and must resume
 * from any snapshot to the identical final state.
 */
class SparkCrawlSpec extends SparkTestBase {
  val T0 = 1000000L

  def cfg: CrawlConfig = FixtureWeb.config()

  def freshSim(c: CrawlConfig = cfg): Simulator = {
    val sim = new Simulator(FixtureWeb.generate(), c)
    FixtureWeb.seeds.foreach(sim.addUrl(_, T0 - 1))
    sim
  }

  def freshDriver(c: CrawlConfig = cfg,
                  store: Option[SnapshotStore] = None,
                  checkpointEvery: Int = 1): CrawlDriver = {
    val web = CrawlRound.webFromMap(spark, FixtureWeb.generate())
    val d = new CrawlDriver(spark, c, web, store, numBuckets = 8,
      checkpointEvery = checkpointEvery)
    d.seed(FixtureWeb.seeds, T0 - 1)
    d
  }

  // Phase 1 exercises discovery/politeness/redirect/policy paths; the
  // clock jump past the 24h ACCEPTED TTL (processor.c:213-221) makes the
  // crawled pages due again and exercises the refetch +
  // If-Modified-Since/304 + unchanged-bookkeeping paths (db.c:1077-1126).
  def runBoth(sim: Simulator, drv: CrawlDriver): Unit = {
    sim.run(T0, 16);         drv.run(T0, 16)
    sim.run(T0 + 90000, 6);  drv.run(T0 + 90000, 6)
  }

  // one shared full run for the three pure-comparison tests
  lazy val shared: (Simulator, CrawlDriver) = {
    val sim = freshSim()
    val drv = freshDriver()
    runBoth(sim, drv)
    (sim, drv)
  }

  test("crawl ordering matches the reference trace exactly") {
    val (sim, drv) = shared
    val simTrace = sim.trace.toSeq
    val sparkTrace = drv.traceRows
    assert(sparkTrace.nonEmpty)
    assert(sparkTrace == simTrace)
  }

  test("URL-seen set matches exactly") {
    val (sim, drv) = shared
    assert(drv.seenSet == sim.seenSet)
    assert(drv.seenSet.nonEmpty)
  }

  test("extracted text is byte-identical per url (input_hint invariant)") {
    val (sim, drv) = shared
    val simText = sim.extracted.toMap
    val sparkText = drv.extractedMap
    assert(sparkText.keySet == simText.keySet)
    sparkText.foreach { case (url, text) =>
      assert(text == simText(url), s"text mismatch for $url")
      // and against the golden `text` column of the pages table
    }
    val golden = FixtureWeb.pagesRows(FixtureWeb.generate())
      .map(r => r._1 -> r._4).toMap
    sparkText.foreach { case (url, text) =>
      golden.get(url).foreach(g => assert(text == g,
        s"golden text mismatch for $url"))
    }
  }

  test("fetch_log delta routing honors the DeltaState contract: tracked " +
       "rows == actual distinct keys (first-fetch→insert, refetch→overlay)") {
    val (_, drv) = shared
    // the shared run refetches every page after the TTL jump, so both the
    // insert path (round 1 fetches) and the overlay path (refetches of
    // existing keys) are exercised
    val actual = drv.fetchLog.collect()
    assert(actual.nonEmpty)
    assert(actual.map(_.url_hash).distinct.length == actual.length)
    assert(drv.fetchLogRows == actual.length.toLong)
  }

  test("budget truncates the trace at the same point") {
    val c = FixtureWeb.config(budget = 7)
    val sim = freshSim(c)
    val drv = freshDriver(c)
    sim.run(T0, 16); drv.run(T0, 16)
    assert(sim.trace.size == 7)
    assert(drv.traceRows == sim.trace.toSeq)
  }

  test("robots gating: engine ≡ simulator, disallowed page REJECTED") {
    val c = cfg.copy(robotsEnabled = true)
    val sim = freshSim(c)
    val drv = freshDriver(c)
    sim.run(T0, 16); drv.run(T0, 16)
    assert(drv.traceRows == sim.trace.toSeq)
    assert(drv.seenSet == sim.seenSet)
    // host2's robots disallows /page3; the url is discovered + dequeued
    // but must end REJECTED without a fetch_log commit
    val blocked = "http://host2.example.org/page3.ttl"
    val simState = sim.frontier.values.find(_.url == blocked)
    if (simState.isDefined) { // reachable in the fixture link graph
      assert(simState.get.state == graft.core.CrawlState.Rejected)
      val sparkState = drv.frontier.collect().find(_.url == blocked)
      assert(sparkState.map(_.state) == simState.map(_.state))
    }
    // allowed carve-out still crawlable
    val carved = sim.frontier.values.find(
      _.url == "http://host2.example.org/page5.ttl")
    carved.foreach(f =>
      assert(f.state != graft.core.CrawlState.Rejected))
  }

  test("LOD license processor (E5): engine ≡ simulator, unlicensed REJECTED") {
    val c = cfg.copy(useLodProcessor = true,
      licensePredicates = Seq(FixtureWeb.LicensePredicate),
      licenseWhitelist = Seq(FixtureWeb.GoodLicense),
      licenseBlacklist = Seq(FixtureWeb.BadLicense))
    val sim = freshSim(c)
    val drv = freshDriver(c)
    sim.run(T0, 16); drv.run(T0, 16)
    assert(drv.traceRows == sim.trace.toSeq)
    assert(drv.seenSet == sim.seenSet)
    val states = sim.frontier.values.map(f => f.url -> f.state).toMap
    // blacklisted license (host2 page2) must be REJECTED once fetched
    states.get(FixtureWeb.url(2, 2)).foreach(s =>
      assert(s == graft.core.CrawlState.Rejected))
    // a GoodLicense page stays ACCEPTED
    val anyAccepted = sim.frontier.values.exists(f =>
      f.state == graft.core.CrawlState.Accepted)
    assert(anyAccepted)
    // engine agrees row-for-row on states
    val sparkStates = drv.frontier.collect().map(f => f.url -> f.state).toMap
    assert(sparkStates == states)
  }

  test("alternate web topology: equality holds off the tuned fixture") {
    // different shape + PRNG stream → different link graph, redirect/error
    // placement relative to seeds, politeness interleaving
    val web = FixtureWeb.generate(hosts = 7, pagesPerHost = 8, seed = 7L)
    val c = FixtureWeb.config()
    val sim = new Simulator(web, c)
    val seeds = Seq(FixtureWeb.url(5, 7), FixtureWeb.url(6, 0))
    seeds.foreach(sim.addUrl(_, T0 - 1))
    val drv = new CrawlDriver(spark, c, CrawlRound.webFromMap(spark, web),
      None, numBuckets = 8)
    drv.seed(seeds, T0 - 1)
    sim.run(T0, 12); drv.run(T0, 12)
    assert(drv.traceRows == sim.trace.toSeq)
    assert(drv.traceRows.nonEmpty)
    assert(drv.seenSet == sim.seenSet)
    assert(drv.extractedMap == sim.extracted.toMap)
  }

  test("force re-seed (J3 upsert) matches the simulator") {
    val sim = freshSim()
    val drv = freshDriver()
    sim.run(T0, 6); drv.run(T0, 6)
    // force-add an already-crawled url: next_fetch=now, state=FORCE
    val u = FixtureWeb.url(0, 0)
    sim.addUrl(u, T0 + 6, force = true)
    drv.seed(Seq(u), T0 + 6, force = true)
    sim.run(T0 + 7, 3); drv.run(T0 + 7, 3)
    assert(drv.traceRows == sim.trace.toSeq)
    // the forced url must have been re-dequeued in state FORCE
    assert(sim.trace.exists(t =>
      t.url == u && t.state_at_dequeue == graft.core.CrawlState.Force))
    assert(drv.seenSet == sim.seenSet)
  }

  test("resume from a mid-crawl snapshot reproduces the final state") {
    val dirA = Files.createTempDirectory("graft-snap-a").toString
    val dirB = Files.createTempDirectory("graft-snap-b").toString

    // uninterrupted run
    val full = freshDriver(store = Some(new SnapshotStore(dirA)),
      checkpointEvery = 4)
    full.run(T0, 16)

    // interrupted run: 8 rounds, then a brand-new driver resumes from the
    // snapshot store and finishes the remaining 8 on the same clock
    val part = freshDriver(store = Some(new SnapshotStore(dirB)),
      checkpointEvery = 4)
    part.run(T0, 8)

    val resumed = new CrawlDriver(spark, cfg,
      CrawlRound.webFromMap(spark, FixtureWeb.generate()),
      Some(new SnapshotStore(dirB)), numBuckets = 8, checkpointEvery = 4)
    assert(resumed.resume())
    assert(resumed.seq == part.seq)
    resumed.run(T0 + 8, 8)

    assert(resumed.seenSet == full.seenSet)
    assert(resumed.traceRows == full.traceRows)
    assert(resumed.extractedMap == full.extractedMap)
    // frontier row-level equality (schedule state identical)
    val a = full.frontier.collect().map(f => f.url_hash -> f).toMap
    val b = resumed.frontier.collect().map(f => f.url_hash -> f).toMap
    assert(a == b)
    // S4: the payload store survives the resume identically
    def pageMap(d: CrawlDriver) = d.pages.collect()
      .map(p => p.url_hash -> ((p.updated, p.body.toSeq))).toMap
    val pagesFull = pageMap(full)
    assert(pagesFull.nonEmpty)
    assert(pageMap(resumed) == pagesFull)
  }

  test("mid-crawl seeds and partition labels survive checkpoint + resume") {
    // Regression for the COW change-tracking gap: mutations outside the
    // round path (seed / setHostPartition between checkpoints) must mark
    // their buckets changed, or the next snapshot carries forward stale
    // bucket pointers and the mutation is silently lost on resume.
    val dir = Files.createTempDirectory("graft-snap-c").toString
    val drv = freshDriver(store = Some(new SnapshotStore(dir)),
      checkpointEvery = 4)
    drv.run(T0, 6)
    drv.setHostPartition("http://host1.example.org/", Some("pZ"))
    val lateSeed = "http://lateseed.example.org/x"
    drv.seed(Seq(lateSeed), T0 + 6)
    drv.run(T0 + 7, 4) // crosses a checkpoint boundary

    val resumed = new CrawlDriver(spark, cfg,
      CrawlRound.webFromMap(spark, FixtureWeb.generate()),
      Some(new SnapshotStore(dir)), numBuckets = 8, checkpointEvery = 4)
    assert(resumed.resume())
    val h = resumed.hosts.collect()
      .find(_.root_url == "http://host1.example.org/")
    assert(h.exists(_.partition.contains("pZ")))
    assert(resumed.seenSet.contains(
      graft.functions.Urls.urlHash(lateSeed)))
    assert(resumed.seenSet == drv.seenSet)
    assert(resumed.traceRows == drv.traceRows)
  }
}
