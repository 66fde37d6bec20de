package graft.tables

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.driver.CrawlDriver
import graft.operators.CrawlRound
import graft.sim.FixtureWeb

/**
 * Snapshot maintenance gates (the Iceberg expire_snapshots /
 * rewrite_data_files analogs — SURVEY §7.2's COW-parquet layer needs its
 * own table maintenance exactly like Iceberg tables do):
 *  - compactAppend consolidates an append table's per-checkpoint file list
 *    into one dir without changing its content;
 *  - compactCow rewrites a COW table's scattered bucket pointers into one
 *    version dir without changing its content;
 *  - expireSnapshots deletes expired manifests plus exactly the version
 *    dirs no retained snapshot references — shared dirs survive, the
 *    retained snapshot's every pointer stays readable, and resume from the
 *    maintained store reproduces the pre-maintenance state.
 */
class SnapshotMaintenanceSpec extends SparkTestBase {
  val T0 = 1000000L

  /** Backend under test — overridden by the object-store twin suite. */
  protected def makeStore(rootDir: String): SnapshotStore =
    new SnapshotStore(rootDir)

  private def freshDriver(store: SnapshotStore): CrawlDriver = {
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(store),
      numBuckets = 8, checkpointEvery = 1)
    d.seed(FixtureWeb.seeds, T0 - 1)
    d
  }

  test("compact + expire: content preserved, only unreferenced version " +
       "dirs deleted, resume green from the maintained store") {
    val root = Files.createTempDirectory("graft-snap-maint").toString
    val st = makeStore(root)
    val drv = freshDriver(st)
    drv.run(T0, 6) // checkpointEvery=1 → one snapshot version per round
    val versionsBefore = st.latestVersion.get
    assert(versionsBefore >= 3, s"need several versions, got $versionsBefore")
    val traceBefore = drv.traceRows
    val seenBefore  = drv.seenSet

    // -- compactAppend: trace file list becomes ONE dir, content unchanged
    val beforeList = st.loadLatest().get.appends("trace")
    assert(beforeList.size >= 2, "trace should have accumulated dirs")
    val afterAppend = st.compactAppend(spark, "trace").get
    assert(afterAppend.appends("trace").size == 1)

    // -- compactCow: every frontier bucket pointer lands in one version dir
    val fBefore = st.loadLatest().get.cow("frontier")
    val afterCow = st.compactCow(spark, "frontier").get
    val fDirs = afterCow.cow("frontier").values
      .map(_.replaceFirst("/bucket=\\d+$", "")).toSet
    assert(fDirs.size == 1, s"frontier pointers not consolidated: $fDirs")
    assert(afterCow.cow("frontier").keySet == fBefore.keySet)

    // -- expire: keep only the latest; deleted dirs are gone, every
    //    pointer of the retained snapshot still exists
    val deleted = st.expireSnapshots(retain = 1)
    assert(deleted.nonEmpty, "expire should reclaim old version dirs")
    deleted.foreach { rel =>
      assert(!Files.exists(Paths.get(root, rel)), s"$rel not deleted") }
    val kept = st.loadLatest().get
    assert(st.io.listSnapshotFiles().count(_.matches("v\\d{6}\\.json")) == 1)
    (kept.cow.values.flatMap(_.values) ++ kept.appends.values.flatten)
      .foreach { p =>
        assert(Files.exists(Paths.get(p)), s"retained pointer missing: $p") }

    // -- the maintained store still resumes to the identical state
    val resumed = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 8)
    assert(resumed.resume())
    assert(resumed.seenSet == seenBefore)
    assert(resumed.traceRows == traceBefore)
  }

  test("expire keeps a version dir shared between expired and retained " +
       "snapshots (carried-forward bucket pointers)") {
    val root = Files.createTempDirectory("graft-snap-share").toString
    val st = makeStore(root)
    val drv = freshDriver(st)
    drv.run(T0, 5)
    val latest = st.loadLatest().get
    // politeness strides mean later rounds touch few buckets: at least one
    // of the latest snapshot's pointers predates the latest version — the
    // shared-dir case expire must NOT delete
    val latestDirs = latest.cow.values.flatMap(_.values)
      .map(_.replaceFirst("/bucket=\\d+$", "")).toSet
    val sharedOld = latestDirs.filterNot(_.endsWith(f"v${latest.version}%06d"))
    assert(sharedOld.nonEmpty, "fixture produced no carried-forward pointer")
    st.expireSnapshots(retain = 1)
    sharedOld.foreach { d =>
      assert(Files.exists(Paths.get(d)), s"shared version dir deleted: $d") }
  }

  test("rebucket 8→16: cluster-resize resume — trace and seen set match " +
       "an uninterrupted run, every rewritten bucket dir is pure under " +
       "the new modulus, and a post-resize commit stays key-unique") {
    // uninterrupted reference run
    val ref = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), store = None)
    ref.seed(FixtureWeb.seeds, T0 - 1)
    ref.run(T0, 10)

    // crawl half at 8 buckets, checkpointing every round
    val root = Files.createTempDirectory("graft-snap-rebucket").toString
    val st = makeStore(root)
    val drv = freshDriver(st) // numBuckets = 8
    drv.run(T0, 5)

    // offline resize to 16 buckets
    val resized = st.rebucket(spark, 16,
      t => CrawlDriver.cowBucketCol(t, 16)).get
    assert(resized.cow("frontier").keySet.exists(_ >= 8),
      "resize produced no bucket beyond the old modulus")
    // every rewritten dir holds only rows whose 16-modulus bucket is the
    // dir's — the property that makes post-resize COW merges sound
    resized.cow.foreach { case (table, buckets) =>
      buckets.foreach { case (b, path) =>
        val rows = spark.read.parquet(path)
        val mismatch = rows
          .withColumn("b2", CrawlDriver.cowBucketCol(table, 16))
          .filter(org.apache.spark.sql.functions.col("b2") =!= b).count()
        assert(mismatch == 0, s"$table bucket $b impure after rebucket")
      }
    }

    // resume with a 4×-cluster driver (16 buckets) and finish the crawl
    val big = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 16, checkpointEvery = 1)
    assert(big.resume())
    big.run(drv.lastNow + 1, 5)
    assert(big.seenSet == ref.seenSet)
    assert(big.traceRows == ref.traceRows)

    // the post-resize commits merged against the 16-bucket layout: a
    // fresh resume sees exactly one row per frontier key (the duplicate-
    // across-buckets corruption rebucket exists to prevent)
    val check = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 16)
    assert(check.resume())
    val f = check.frontier.toDF()
    assert(f.count() == f.select("url_hash").distinct().count(),
      "duplicate frontier keys after post-resize commits")
    assert(check.seenSet == ref.seenSet)
    assert(check.traceRows == ref.traceRows)
  }

  test("maintenance is an explicit backend opt-in: a read/commit-only " +
       "SnapshotIO rejects expire") {
    val root = Files.createTempDirectory("graft-snap-ro").toString
    val inner = new LocalFsSnapshotIO(root)
    val io = new SnapshotIO { // only the read/commit surface implemented
      override def root: String = inner.root
      override def listSnapshotFiles(): Seq[String] = inner.listSnapshotFiles()
      override def readManifest(n: String): String = inner.readManifest(n)
      override def writeManifestAtomic(n: String, c: String): Unit =
        inner.writeManifestAtomic(n, c)
      override def exists(p: String): Boolean = inner.exists(p)
    }
    val st = new SnapshotStore(io)
    val drv = freshDriver(st)
    drv.run(T0, 4)
    assertThrows[UnsupportedOperationException](st.expireSnapshots(1))
  }
}
