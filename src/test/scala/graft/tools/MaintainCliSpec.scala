package graft.tools

import java.nio.file.Files
import graft.SparkTestBase
import graft.driver.CrawlDriver
import graft.operators.CrawlRound
import graft.sim.FixtureWeb
import graft.tables.{ObjectStoreSnapshotIO, SimObjectStore, SnapshotStore}

/**
 * The Maintain CLI path against the OBJECT-STORE backend (VERDICT r4 ask
 * #8): compaction, expiry and the rebucket resize job are exercisable
 * end-to-end the way a 100 TB operator would run them — a flag-selected
 * backend over a snapshot root, not a hand-built store in test code. The
 * maintenance SEMANTICS are pinned by SnapshotMaintenanceSpec through
 * both backends; this spec pins the CLI wiring: backend selection,
 * arg-shaped entry points, and that a crawl can resume from what the CLI
 * left behind.
 */
class MaintainCliSpec extends SparkTestBase {
  private val T0 = 1000000L

  test("--object-store maintain: compact + expire through the CLI entry " +
       "points, then resume from the maintained root") {
    val root = Files.createTempDirectory("graft-maintain-cli").toString
    // a real crawl writes snapshots through the object-store backend
    val os = new SimObjectStore(root)
    val st = new SnapshotStore(new ObjectStoreSnapshotIO(os))
    val drv = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 8, checkpointEvery = 1)
    drv.seed(FixtureWeb.seeds, T0 - 1)
    drv.run(T0, 5)
    val vCrawl = st.latestVersion.get

    // operator-side: a FRESH store via the CLI's backend selection
    val cliStore = Maintain.storeFor(root, objectStore = true)
    assert(cliStore.latestVersion.contains(vCrawl),
      "CLI store must resolve the crawl's latest through _latest/manifests")
    val deleted = Maintain.maintain(spark, cliStore, retain = 1)
    assert(deleted.nonEmpty, "5 checkpoints + compaction must expire dirs")
    assert(cliStore.latestVersion.get > vCrawl, "compaction commits versions")

    // and the crawl resumes from what the CLI left behind
    val resumed = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()),
      Some(Maintain.storeFor(root, objectStore = true)), numBuckets = 8)
    assert(resumed.resume())
    assert(resumed.seenSet == drv.seenSet)
    assert(resumed.traceRows == drv.traceRows)
  }

  test("--object-store rebucket: the CLI resize job rewrites the COW " +
       "modulus; a driver at the new bucket count resumes, the old one " +
       "fails fast") {
    val root = Files.createTempDirectory("graft-rebucket-cli").toString
    val os = new SimObjectStore(root)
    val st = new SnapshotStore(new ObjectStoreSnapshotIO(os))
    val drv = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 8, checkpointEvery = 1)
    drv.seed(FixtureWeb.seeds, T0 - 1)
    drv.run(T0, 3)

    Maintain.rebucket(spark, Maintain.storeFor(root, objectStore = true), 16)

    val at16 = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()),
      Some(Maintain.storeFor(root, objectStore = true)), numBuckets = 16)
    assert(at16.resume())
    assert(at16.seenSet == drv.seenSet)
    val at8 = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()),
      Some(Maintain.storeFor(root, objectStore = true)), numBuckets = 8)
    val err = intercept[IllegalArgumentException] { at8.resume() }
    assert(err.getMessage.contains("rebucket"))
  }
}
