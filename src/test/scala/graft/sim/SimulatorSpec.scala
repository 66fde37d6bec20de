package graft.sim

import org.scalatest.funsuite.AnyFunSuite
import graft.core._

class SimulatorSpec extends AnyFunSuite {
  val T0 = 1000000L

  def freshSim(cfg: CrawlConfig = FixtureWeb.config()): Simulator = {
    val sim = new Simulator(FixtureWeb.generate(), cfg)
    FixtureWeb.seeds.foreach(sim.addUrl(_, T0 - 1))
    sim
  }

  test("seeds dedupe after canonicalization/fragment-strip (X1/X2 + J2)") {
    val sim = freshSim()
    // 4 raw seeds → 3 distinct canonical urls → 3 frontier rows, 3 hosts
    assert(sim.frontier.size == 3)
    assert(sim.hosts.size == 3)
  }

  test("trace is deterministic and politeness holds") {
    val a = freshSim(); a.run(T0, 64)
    val b = freshSim(); b.run(T0, 64)
    assert(a.trace == b.trace)
    assert(a.trace.nonEmpty)
    // politeness: per host, consecutive dequeue rounds ≥ max(1, rate/1000)
    // apart — except an unchanged-path fetch may re-open the window at
    // now+2 (db.c:1095-1100), which for rates ≤ 2000ms is still ≥ floor.
    val byHost = a.trace.groupBy(t =>
      graft.functions.Urls.canonicalRoot(t.url).get)
    byHost.foreach { case (root, rows) =>
      val rate = FixtureWeb.config().hostRateOverrides.getOrElse(root, 1000)
      val minGap = math.max(1, rate / 1000)
      val rounds: Seq[Int] = rows.map(_.round).toSeq
      rounds.zip(rounds.drop(1)).foreach { case (r1, r2) =>
        assert(r2 - r1 >= minGap,
          s"host $root violated politeness: rounds $r1,$r2 rate $rate")
      }
    }
  }

  test("first round dequeues seeds in A1 composite order") {
    val sim = freshSim()
    val picks = sim.picksAt(T0)
    // all NEW, same next_fetch/earliest_update → rate ASC then url ASC:
    // host1 (rate 100) first, then host0/host2 (rate 1000/5000 → host0, host2)
    assert(picks.map(_.url) == Seq(
      "http://host1.example.org/page0.ttl",
      "http://host0.example.org/page0.ttl",
      "http://host2.example.org/page0.ttl"))
    sim.run(T0, 1)
    assert(sim.trace.map(_.url) == picks.map(_.url))
    assert(sim.trace.forall(_.state_at_dequeue == CrawlState.New))
  }

  test("crawl expands: discovered links (incl. vocab URIs) enter the " +
       "frontier; redirect target crawled; seen set grows") {
    val sim = freshSim(); sim.run(T0, 64)
    val urls = sim.frontier.values.map(_.url).toSet
    assert(urls.contains("http://host0.example.org/page2.ttl")) // via 301
    assert(urls.contains("http://purl.org/dc/terms/references")) // vocab node
    assert(urls.contains("ftp://files.example.org/data.bin")) // F1 enqueued
    assert(urls.size > 10)
    // ftp URL fetched → scheme-SKIPPED (F1 at fetch time, fetch.c:97-109)
    val ftp = sim.frontier.values.find(_.url.startsWith("ftp:")).get
    assert(ftp.state == CrawlState.Skipped)
  }

  test("states settle per fixture semantics") {
    val sim = freshSim(); sim.run(T0, 64)
    def stateOf(u: String) = sim.frontier.values.find(_.url == u).map(_.state)
    // 200-turtle page crawled + accepted
    assert(stateOf("http://host0.example.org/page0.ttl")
      .contains(CrawlState.Accepted))
    // redirect source SKIPPED
    assert(stateOf("http://host0.example.org/page1.ttl")
      .contains(CrawlState.Skipped))
    // 404 → SKIPPED with error_count 1 (rdf gate + 4xx counter)
    val p404 = sim.frontier.values.find(
      _.url == "http://host1.example.org/page1.ttl")
    if (p404.isDefined && p404.get.status.isDefined) {
      assert(p404.get.state == CrawlState.Skipped)
      assert(p404.get.status.contains(404) && p404.get.error_count == 1)
    }
    // vocab URL not in fixture web → 504 → checkpoint 406 (whitelist) →
    // failed-skip; soft/error per 406 → 4xx → error_count 1
    val vocab = sim.frontier.values.find(
      _.url == "http://purl.org/dc/terms/references").get
    if (vocab.status.isDefined) {
      assert(vocab.status.contains(406))
      assert(vocab.error_count == 1)
    }
  }

  test("clock jump past TTL → refetch answers 304 → unchanged path (A4)") {
    val sim = freshSim(); sim.run(T0, 64)
    val accepted = sim.frontier.values
      .filter(_.state == CrawlState.Accepted).map(_.url).toSet
    assert(accepted.nonEmpty)
    val tracesBefore = sim.trace.size
    val T1 = T0 + 100000 // > 1d ACCEPTED ttl
    sim.run(T1, 10)
    assert(sim.trace.size > tracesBefore)
    // a refetched accepted page got 304 → next_fetch = now+2+7200
    val re = sim.frontier.values.find(f => accepted.contains(f.url) &&
      f.updated.exists(_ >= T1))
    assert(re.isDefined)
    assert(re.get.next_fetch - re.get.updated.get == 7202)
  }

  test("budget truncates the trace mid-round deterministically") {
    val full = freshSim(); full.run(T0, 64)
    val lim = freshSim(FixtureWeb.config(budget = 7)); lim.run(T0, 64)
    assert(lim.trace.size == 7)
    assert(lim.trace == full.trace.take(7))
  }

  test("force re-add resets next_fetch and state (J3, db.c:1219-1231)") {
    val sim = freshSim(); sim.run(T0, 64)
    val u = "http://host0.example.org/page0.ttl"
    val before = sim.frontier.values.find(_.url == u).get
    assert(before.next_fetch > T0 + 64)
    sim.addUrl(u, T0 + 70, force = true)
    val after = sim.frontier.values.find(_.url == u).get
    assert(after.state == CrawlState.Force && after.next_fetch == T0 + 70)
  }

  test("extraction goldens: simulator text is byte-identical to the pages " +
       "table text column (input_hint invariant)") {
    val web = FixtureWeb.generate()
    val golden = FixtureWeb.pagesRows(web).map(r => r._1 -> r._4).toMap
    val sim = freshSim(); sim.run(T0, 64)
    assert(sim.extracted.nonEmpty)
    sim.extracted.foreach { case (url, text) =>
      assert(golden(url) == text, s"text mismatch for $url")
    }
  }
}
