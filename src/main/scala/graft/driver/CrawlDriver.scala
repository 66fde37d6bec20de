package graft.driver

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions.{col, lit}
import graft.core._
import graft.functions.Urls
import graft.operators.{CrawlRound, SeenFilter}
import graft.operators.CrawlRound.{CacheRow, ExtractedRow, WebRow}
import graft.tables.SnapshotStore

/**
 * The crawl-loop driver — the Spark re-expression of the crawld daemon's
 * thread loop (reference: crawler/thread.c:272-354, libcrawl/crawler.c:36-69).
 * Runs scheduling rounds (CrawlRound) over frontier/hosts/fetch_log state,
 * maintains the URL-seen bloom family incrementally, and checkpoints state
 * to a SnapshotStore (resumable from any snapshot — north_rule).
 *
 * Time is the same logical clock as the simulator: round r of a `run(t0,_)`
 * executes at now = t0 + r (one round ≙ one reference wall-second).
 */
final class CrawlDriver(
    spark: SparkSession,
    cfg: CrawlConfig,
    web: Dataset[WebRow],
    store: Option[SnapshotStore] = None,
    numBuckets: Int = 16,
    checkpointEvery: Int = 1) {

  import spark.implicits._

  var frontier: Dataset[FrontierEntry] = spark.emptyDataset[FrontierEntry]
  var hosts: Dataset[HostEntry]        = spark.emptyDataset[HostEntry]
  var fetchLog: Dataset[CacheRow]      = spark.emptyDataset[CacheRow]
  var extracted: Dataset[ExtractedRow] = spark.emptyDataset[ExtractedRow]
  var traceAll: Dataset[TraceRow]      = spark.emptyDataset[TraceRow]
  private var pendingTrace: Dataset[TraceRow] = spark.emptyDataset[TraceRow]

  var seq: Long = 0L
  var roundNo: Long = 0L
  var lastNow: Long = 0L
  /** Accumulated work-phase wall seconds across rounds (bench metric). */
  var workPhaseSec: Double = 0.0
  private var snapshot: Option[SnapshotStore.Snapshot] = None
  private val bloom = new SeenFilter.SeenBloom()

  // ------------------------------------------------------------------ seeds

  /** Seed injection ≈ crawler-add (reference: crawler/add.c:44-209;
    * insert-if-absent db.c:1202-1294, force upsert db.c:1219-1231). */
  def seed(urls: Seq[String], now: Long, force: Boolean = false): Unit = {
    // Seeds are a driver-sized list; canonicalize + key derive in-process,
    // dedup first-wins like the serial add loop.
    val entries = urls.flatMap(Step.newFrontierEntry(_, now, force))
      .groupBy(_.url_hash).map(_._2.head).toSeq
    val newF = entries.toDS()
    val newH = entries.flatMap(e => Step.newHostEntry(e.url, now, cfg))
      .groupBy(_.root_hash).map(_._2.head).toSeq.toDS()

    if (force) {
      // J3 MERGE: matched → next_fetch=now, state=FORCE; else insert.
      val matched = frontier
        .join(newF.select("url_hash"), Seq("url_hash"), "left_semi")
        .as[FrontierEntry]
        .map(_.copy(next_fetch = now, state = CrawlState.Force))
      val untouched = frontier
        .join(newF.select("url_hash"), Seq("url_hash"), "left_anti")
        .as[FrontierEntry]
      val inserts = newF
        .join(frontier.select("url_hash"), Seq("url_hash"), "left_anti")
        .as[FrontierEntry]
      frontier = untouched.unionByName(matched).unionByName(inserts)
    } else {
      frontier = frontier.unionByName(
        newF.join(frontier.select("url_hash"), Seq("url_hash"), "left_anti")
          .as[FrontierEntry])
    }
    hosts = hosts.unionByName(
      newH.join(hosts.select("root_hash"), Seq("root_hash"), "left_anti")
        .as[HostEntry])
    frontier = frontier.localCheckpoint(true)
    hosts = hosts.localCheckpoint(true)
    mergeBloom(frontier.map(_.url_hash))
  }

  /** Distributed seed injection — the SeedLoader path for large seed
    * lists (reference: crawler-add reading stdin line lists, add.c:117-177;
    * at 10^10 scale seeds arrive as files, never through the driver). */
  def seedDs(urls: Dataset[String], now: Long): Unit = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val entries = urls
      .flatMap(Step.newFrontierEntry(_, now, force = false))
      .dropDuplicates("url_hash")
      .join(frontier.select("url_hash"), Seq("url_hash"), "left_anti")
      .as[FrontierEntry]
    frontier = frontier.unionByName(entries).localCheckpoint(true)
    val newH = frontier // derive hosts from the post-merge frontier slice
      .flatMap(e => Step.newHostEntry(e.url, now, bcCfg.value))
      .dropDuplicates("root_hash")
      .join(hosts.select("root_hash"), Seq("root_hash"), "left_anti")
      .as[HostEntry]
    hosts = hosts.unionByName(newH).localCheckpoint(true)
    mergeBloom(frontier.map(_.url_hash))
  }

  private def mergeBloom(hashes: Dataset[String]): Unit = {
    val n = hashes.count()
    if (n > 0) bloom.mergeBatch(SeenFilter.buildBloom(hashes, bloom), n)
  }

  // ------------------------------------------------------------------ rounds

  private val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
  private def timed[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r  = f
    if (verbose) println(f"[round-timing] $label: ${(System.nanoTime()-t0)/1e9}%.2fs")
    r
  }

  /** Run `rounds` scheduling rounds starting at logical time `t0`
    * (mirrors Simulator.run — clock jumps between calls model TTL expiry). */
  def run(t0: Long, rounds: Int): Unit = {
    var r = 0
    while (r < rounds && seq < cfg.budget) {
      val now = t0 + r
      lastNow = now
      val res = timed("roundCompute")(CrawlRound.run(spark, frontier, hosts,
        fetchLog, web, cfg, now, roundNo, seq, bloom))
      workPhaseSec += res.fetchPhaseSec + res.seenPhaseSec
      if (res.picksCount > 0) {
        import scala.concurrent.{Await, Future}
        import scala.concurrent.duration.Duration
        import scala.concurrent.ExecutionContext.Implicits.global
        // Materialize the new state (cuts lineage; eager so cleanup is
        // safe). The six materializations are independent Spark jobs over
        // the round's cached internals — submit them concurrently so the
        // per-job driver latency overlaps instead of summing.
        val (nf, nh, nl, tr, exNew) = timed("ckpt.state") {
          val fNf = Future(res.frontier.localCheckpoint(true))
          val fNh = Future(res.hosts.localCheckpoint(true))
          val fNl = Future(res.fetchLog.localCheckpoint(true))
          val fTr = Future(res.trace.localCheckpoint(true))
          val fEx = Future(res.extracted.localCheckpoint(true))
          // bloom update BEFORE cleanup (newHashes reads round internals)
          val fBloom = Future(mergeBloom(res.newHashes))
          val out = (Await.result(fNf, Duration.Inf),
            Await.result(fNh, Duration.Inf),
            Await.result(fNl, Duration.Inf),
            Await.result(fTr, Duration.Inf),
            Await.result(fEx, Duration.Inf))
          Await.result(fBloom, Duration.Inf)
          out
        }
        // COW change-tracking only matters when snapshots are written
        if (store.isDefined) timed("ckpt.changed") {
          val fF = Future(res.changedFrontier.localCheckpoint(true))
          val fH = Future(res.changedHosts.localCheckpoint(true))
          val fL = Future(res.changedLog.localCheckpoint(true))
          pendingChangedF = pendingChangedF
            .unionByName(Await.result(fF, Duration.Inf)).localCheckpoint(true)
          pendingChangedH = pendingChangedH
            .unionByName(Await.result(fH, Duration.Inf)).localCheckpoint(true)
          pendingChangedL = pendingChangedL
            .unionByName(Await.result(fL, Duration.Inf)).localCheckpoint(true)
          pendingChangedE = pendingChangedE.unionByName(exNew)
            .localCheckpoint(true)
          pendingTrace = pendingTrace.unionByName(tr).localCheckpoint(true)
        }
        res.cleanup()

        frontier = nf; hosts = nh; fetchLog = nl
        timed("merge.outputs") {
          val fExt = Future(extracted
            .join(exNew.select("url"), Seq("url"), "left_anti")
            .as[ExtractedRow].unionByName(exNew).localCheckpoint(true))
          val fTrA = Future(traceAll.unionByName(tr).localCheckpoint(true))
          extracted = Await.result(fExt, Duration.Inf)
          traceAll = Await.result(fTrA, Duration.Inf)
        }
        seq += res.picksCount
        pendingMetrics = pendingMetrics ++ Map(
          "picks"      -> (pendingMetrics.getOrElse("picks", 0L) + res.picksCount),
          "discovered" -> (pendingMetrics.getOrElse("discovered", 0L) + res.discoveredCount))
      } else res.cleanup()
      roundNo += 1
      if (store.isDefined && roundNo % checkpointEvery == 0) checkpoint(now)
      r += 1
    }
    if (store.isDefined) checkpoint(lastNow)
  }

  // -------------------------------------------------------------- snapshots

  private var pendingChangedF: Dataset[FrontierEntry] =
    spark.emptyDataset[FrontierEntry]
  private var pendingChangedH: Dataset[HostEntry] =
    spark.emptyDataset[HostEntry]
  private var pendingChangedL: Dataset[CacheRow] =
    spark.emptyDataset[CacheRow]
  private var pendingChangedE: Dataset[ExtractedRow] =
    spark.emptyDataset[ExtractedRow]
  private var pendingMetrics: Map[String, Long] = Map.empty

  /** Commit a snapshot: COW-rewrite only the buckets with pending changes,
    * append pending trace, publish the manifest atomically. */
  def checkpoint(now: Long): Unit = {
    val st = store.getOrElse(return)
    import CrawlDriver.{fBucket, hBucket, uBucket}
    val nb = numBuckets // local copy — keeps `this` out of the closures
    val changedFB = pendingChangedF.map(f => fBucket(f.shorthash, nb))
      .distinct().collect().toSet
    val changedHB = pendingChangedH.map(h => hBucket(h.root_hash, nb))
      .distinct().collect().toSet
    val changedLB = pendingChangedL
      .map(l => fBucket(Urls.shorthash(l.url_hash), nb))
      .distinct().collect().toSet
    val changedEB = pendingChangedE.map(e => uBucket(e.url, nb))
      .distinct().collect().toSet
    // first commit: every bucket present is "changed"
    def allOrChanged[T](changed: Set[Int]): Set[Int] =
      if (snapshot.isEmpty) (0 until numBuckets).toSet else changed

    snapshot = Some(st.commit(
      prev = snapshot,
      now = now, round = roundNo, seq = seq,
      cowUpdates = Map(
        "frontier" -> SnapshotStore.CowUpdate(
          frontier.withColumn("bucket", (col("shorthash") % nb).cast("int")),
          allOrChanged(changedFB)),
        "hosts" -> SnapshotStore.CowUpdate(
          hosts.map(h => (h, hBucket(h.root_hash, nb)))
            .toDF("value", "bucket").select($"value.*", $"bucket"),
          allOrChanged(changedHB)),
        "fetch_log" -> SnapshotStore.CowUpdate(
          fetchLog.map(l => (l, fBucket(Urls.shorthash(l.url_hash), nb)))
            .toDF("value", "bucket").select($"value.*", $"bucket"),
          allOrChanged(changedLB)),
        "extracted" -> SnapshotStore.CowUpdate(
          extracted.map(e => (e, uBucket(e.url, nb)))
            .toDF("value", "bucket").select($"value.*", $"bucket"),
          allOrChanged(changedEB))),
      appendData = Map("trace" -> pendingTrace.toDF()),
      metrics = pendingMetrics ++ Map(
        "frontier_rows" -> frontier.count(),
        "hosts_rows"    -> hosts.count())))

    pendingTrace = spark.emptyDataset[TraceRow]
    pendingChangedF = spark.emptyDataset[FrontierEntry]
    pendingChangedH = spark.emptyDataset[HostEntry]
    pendingChangedL = spark.emptyDataset[CacheRow]
    pendingChangedE = spark.emptyDataset[ExtractedRow]
    pendingMetrics = Map.empty
  }

  /** Restore state from the latest snapshot (or a specific version).
    * Returns false when the store is empty. */
  def resume(version: Option[Int] = None): Boolean = {
    val st = store.getOrElse(return false)
    val snap = version.map(st.load)
      .orElse(st.loadLatest()).getOrElse(return false)
    snapshot = Some(snap)
    frontier = st.readCow(spark, snap, "frontier",
      Encoders.product[FrontierEntry].schema).as[FrontierEntry]
      .localCheckpoint(true)
    hosts = st.readCow(spark, snap, "hosts",
      Encoders.product[HostEntry].schema).as[HostEntry].localCheckpoint(true)
    fetchLog = st.readCow(spark, snap, "fetch_log",
      Encoders.product[CacheRow].schema).as[CacheRow].localCheckpoint(true)
    extracted = st.readCow(spark, snap, "extracted",
      Encoders.product[ExtractedRow].schema).as[ExtractedRow]
      .localCheckpoint(true)
    traceAll = st.readAppend(spark, snap, "trace",
      Encoders.product[TraceRow].schema).as[TraceRow].localCheckpoint(true)
    seq = snap.seq
    roundNo = snap.round
    lastNow = snap.now
    mergeBloom(frontier.map(_.url_hash)) // rebuild seen-bloom from state
    true
  }

  // ------------------------------------------------ downstream surfaces

  /** S6 mq surface (MqConsumer): next ACCEPTED row for a node slice. */
  def mqNext(nodeId: Int, nodeCount: Int): Option[FrontierEntry] =
    MqConsumer.next(frontier, nodeId, nodeCount)

  /** S6 ack: ACCEPTED → COMPLETE (state-guarded). */
  def mqAck(urlHash: String): Unit = {
    frontier = MqConsumer.ack(frontier, urlHash).localCheckpoint(true)
    if (store.isDefined) markFrontierChanged(urlHash)
  }

  /** S6 reject: ACCEPTED → FAILED (state-guarded). */
  def mqReject(urlHash: String): Unit = {
    frontier = MqConsumer.reject(frontier, urlHash).localCheckpoint(true)
    if (store.isDefined) markFrontierChanged(urlHash)
  }

  private def markFrontierChanged(urlHash: String): Unit = {
    val changed = frontier.filter(_.url_hash == urlHash)
    pendingChangedF = pendingChangedF.unionByName(changed)
      .localCheckpoint(true)
  }

  /** S7 partition tool (reference: crawler/partition.c:47-96): label a
    * host root for scoped processing (F8). */
  def setHostPartition(rootUrl: String, partition: Option[String]): Unit = {
    val canonRoot = Urls.canonicalRoot(rootUrl).getOrElse(return)
    hosts = hosts.map(h =>
      if (h.root_url == canonRoot) h.copy(partition = partition) else h
    )(hosts.encoder).localCheckpoint(true)
  }

  /** crawl-locate analog (reference: utils/crawl-locate.c:40-85): what
    * the cache knows about a URL, without fetching. */
  def locate(url: String): Option[(CacheRow, Option[String])] =
    Urls.canonicalKeyUrl(url).flatMap { canon =>
      val h = Urls.urlHash(canon)
      fetchLog.filter(_.url_hash == h).head(1).headOption.map { row =>
        (row, extracted.filter(_.url == canon).head(1).headOption.map(_.text))
      }
    }

  /** `crawld -t URI` analog (reference: crawld.c:161-174, db.c:610-627):
    * force-add one URI and run a single round over it. */
  def testUri(url: String, t0: Long): Unit = {
    seed(Seq(url), t0 - 1, force = true)
    run(t0, 1)
  }

  // -------------------------------------------------------------- accessors

  def seenSet: Set[String] = frontier.map(_.url_hash).collect().toSet
  def traceRows: Seq[TraceRow] = traceAll.collect().sortBy(_.seq).toSeq
  def extractedMap: Map[String, String] =
    extracted.collect().map(e => e.url -> e.text).toMap
}

object CrawlDriver {
  /** COW bucket assignment — static so Dataset closures never capture the
    * driver instance. */
  def fBucket(shorthash: Long, nb: Int): Int = (shorthash % nb).toInt
  def hBucket(rootHash: String, nb: Int): Int =
    fBucket(Urls.shorthash(rootHash), nb)
  def uBucket(url: String, nb: Int): Int =
    fBucket(Urls.shorthash(Urls.urlHash(url)), nb)
}
