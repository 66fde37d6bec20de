package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.broadcast
import graft.core._
import graft.functions.Urls

/**
 * One scheduling round of the crawl loop as a Spark Dataset job — the
 * set-oriented re-expression of the reference's serial
 * dequeue→fetch→process→update iteration (libcrawl/crawler.c:36-69;
 * dequeue txn libspider/queues/db.c:659-791). See SURVEY §3.1.
 *
 * Per round (logical time `now`, one round ≙ one reference wall-second):
 *  1. A1 dequeue: frontier (next_fetch < now) ⋈ eligible hosts
 *     (rate > 0, earliest_update < now) on root_hash, then per-host top-1
 *     via typed groupByKey(root_hash).flatMapGroups — the form the
 *     north_rule names. ≤1 URL/host/round makes the reference's politeness
 *     invariant hold by construction (the reference needs a dequeue-time
 *     write txn for this, db.c:762-790).
 *  2. Emission order = the reference's full composite sort (Step.emitKey)
 *     applied across the winners; the crawl budget truncates in that order
 *     — this makes the parallel schedule the same total order as the
 *     serial C loop (trace-replay tested against the simulator).
 *  3. Simulated fetch: picks ⋈ web (pages + fetch_meta) on url, ⋈
 *     fetch_log on url_hash (If-Modified-Since/304 + rollback), then the
 *     shared pure Step.fetchAndProcess inside mapPartitions — policy
 *     gates, redirect follow, RDF/HTML extraction, TTL/error arithmetic
 *     all happen per-row with zero extra shuffles.
 *  4. Frontier/host updates merged back (url_hash/root_hash keyed); the
 *     monotonic guards live in Step so engine ≡ simulator.
 *  5. Discovered outlinks: canonicalize → keys (K1-K5) → URL-seen filter
 *     (SeenFilter: bloom → cuckoo → anti-join) → insert-if-absent rows.
 *
 * Skew note (SURVEY §7.4): the scheduling groupByKey must stay unsalted
 * (politeness is per-host), but its groups are tiny by construction —
 * flatMapGroups folds to a single winner without buffering the group.
 * A mega-host with 10^7 pending URLs is pre-reduced by the
 * `next_fetch < now` pushdown and the fold; extraction/join stages key on
 * url (uniform hash), so the only skewed key never carries heavy payloads.
 */
object CrawlRound {

  /** Simulated-web row: pages (input_hint shape) ⋈ fetch_meta, flattened. */
  final case class WebRow(
      url: String,
      warc_ts: Long,
      body: Array[Byte],
      status: Int,
      content_type: String,
      location: Option[String],
      content_location: Option[String],
      link_headers: Seq[String])

  /** fetch_log row (the cache sidecar's schedule-relevant fields —
    * reference JSON sidecar, libcrawl/p_libcrawl.h:47-75). */
  final case class CacheRow(url_hash: String, updated: Long, status: Int)

  /** Extracted-text output row (byte-identity contract per input_hint). */
  final case class ExtractedRow(url: String, text: String)

  /** A dequeued winner with its emission-order key flattened for sorting. */
  final case class Pick(f: FrontierEntry, h: HostEntry,
                        k1: Int, k2: Long, k3: Long, k4: Int, k5: String)

  /** A scheduled pick with its trace sequence + robots join key. */
  final case class Sched(pick: Pick, seq: Long, robots_url: String)

  /** One host's robots.txt (url = <root>robots.txt). */
  final case class RobotsRow(url: String, body: Array[Byte])

  /** Everything one step produces: trace row + state updates + outputs. */
  final case class StepOut(
      seq: Long,
      url: String,
      stateAtDequeue: String,
      newF: FrontierEntry,
      newH: HostEntry,
      commit: Boolean,
      status: Int,
      extractedText: Option[String],
      outlinks: Seq[String])

  final case class RoundResult(
      frontier: Dataset[FrontierEntry],
      hosts: Dataset[HostEntry],
      fetchLog: Dataset[CacheRow],
      extracted: Dataset[ExtractedRow],
      trace: Dataset[TraceRow],
      picksCount: Long,
      discoveredCount: Long,
      newHashes: Dataset[String],
      /** Wall seconds of the two work phases (dequeue+fetch+extract and
        * the URL-seen filter) — the compute-dominated portion of a round,
        * used by the bench to report work-stage scaling separately from
        * end-to-end (which in local mode carries fixed per-stage driver
        * latency a real cluster amortizes). */
      fetchPhaseSec: Double,
      seenPhaseSec: Double,
      /** Rows that changed this round — drives COW bucket selection. */
      changedFrontier: Dataset[FrontierEntry],
      changedHosts: Dataset[HostEntry],
      changedLog: Dataset[CacheRow],
      /** Unpersist round-internal caches — call AFTER materializing the
        * returned datasets. */
      cleanup: () => Unit)

  def webFromMap(spark: SparkSession,
                 web: Map[String, Step.WebEntry]): Dataset[WebRow] = {
    import spark.implicits._
    web.toSeq.sortBy(_._1).map { case (u, w) =>
      WebRow(u, w.warcTs, w.body, w.status, w.contentType, w.location,
        w.contentLocation, w.linkHeaders)
    }.toDS()
  }

  /**
   * Execute one round. Returns the post-round state (not yet
   * materialized — the driver decides checkpoint vs localCheckpoint).
   */
  def run(
      spark: SparkSession,
      frontier: Dataset[FrontierEntry],
      hosts: Dataset[HostEntry],
      fetchLog: Dataset[CacheRow],
      web: Dataset[WebRow],
      cfg: CrawlConfig,
      now: Long,
      round: Long,
      seqStart: Long,
      bloom: SeenFilter.SeenBloom): RoundResult = {
    import spark.implicits._

    val bcCfg = spark.sparkContext.broadcast(cfg)

    // --- 1. A1 dequeue --------------------------------------------------
    // Pushed-down frontier filter (at 100TB scale this is the partition-
    // pruning scan); hosts filter keeps only currently-eligible hosts so
    // the broadcast side stays minimal.
    val eligibleHosts = hosts
      .filter(h => h.rate > 0 && h.earliest_update < now)
    val due = frontier.filter(_.next_fetch < now)

    // hosts ≪ frontier (1 row/host). No forced broadcast hint: a driver-built
    // broadcast of a large host table is a serial bottleneck — AQE sees the
    // (cached) actual sizes and picks broadcast-hash when the eligible-host
    // side is genuinely small, shuffle join when it isn't.
    val joined: Dataset[(FrontierEntry, HostEntry)] =
      due.joinWith(eligibleHosts,
        due("root_hash") === eligibleHosts("root_hash"), "inner")

    // Typed per-host top-1 (north_rule's groupByKey + flatMapGroups).
    // Fold, don't buffer: group size is unbounded (mega-hosts) but the
    // winner needs O(1) state.
    val picks: Dataset[Pick] = joined
      .groupByKey(_._1.root_hash)
      .flatMapGroups { (_, it) =>
        var best: (FrontierEntry, HostEntry) = null
        var bestKey: (Int, Long, String) = null
        it.foreach { fh =>
          val k = Step.hostKey(fh._1)
          if (best == null || Ordering[(Int, Long, String)].lt(k, bestKey)) {
            best = fh; bestKey = k
          }
        }
        val (f, h) = best
        val (k1, k2, k3, k4, k5) = Step.emitKey(f, h)
        Iterator.single(Pick(f, h, k1, k2, k3, k4, k5))
      }

    // --- 2. emission order + budget truncation --------------------------
    val budgetLeft = cfg.budget - seqStart
    val ordered = picks.orderBy("k1", "k2", "k3", "k4", "k5")
    val limited =
      (if (budgetLeft >= Int.MaxValue) ordered
       else ordered.limit(math.max(0L, budgetLeft).toInt))
        .persist() // 3 passes below (range sampling, zip sizing, consume)
    // Global trace sequence: zipWithIndex respects the range-partitioned
    // sort order; only the (small) pick set flows through it.
    val robotsOn = cfg.robotsEnabled
    val seqd: Dataset[Sched] = spark.createDataset(
      limited.rdd.zipWithIndex().map { case (p, i) =>
        val rUrl =
          if (!robotsOn) ""
          else Urls.canonicalRoot(p.f.url)
            .map(graft.functions.Robots.robotsUrl).getOrElse("")
        Sched(p, seqStart + i, rUrl)
      })

    // --- 3. simulated fetch + process ------------------------------------
    val withWeb: Dataset[(Sched, WebRow)] = seqd
      .joinWith(web, seqd("pick.f.url") === web("url"), "left_outer")
    val withCache: Dataset[((Sched, WebRow), CacheRow)] = withWeb
      .joinWith(fetchLog, $"_1.pick.f.url_hash" === fetchLog("url_hash"),
        "left_outer")
    // robots side: one row per host that HAS a robots.txt — small, AQE
    // broadcasts it; empty (zero-cost join) when the gate is off
    val robotsDs: Dataset[RobotsRow] =
      if (!robotsOn) spark.emptyDataset[RobotsRow]
      else web.filter(w => w.url.endsWith("/robots.txt") && w.status == 200)
        .map(w => RobotsRow(w.url, w.body))
    val withRobots: Dataset[(((Sched, WebRow), CacheRow), RobotsRow)] =
      withCache.joinWith(robotsDs,
        $"_1._1.robots_url" === robotsDs("url"), "left_outer")

    val outs: Dataset[StepOut] = withRobots.mapPartitions { it =>
      val cfg = bcCfg.value
      it.map { case ((((Sched(pick, seq, _), webRow), cacheRow), robotsRow)) =>
        val f = pick.f
        val cached = Option(cacheRow)
          .map(c => Step.CachedInfo(c.updated, c.status))
        val wEntry = Option(webRow).map(w => Step.WebEntry(w.warc_ts,
          w.body, w.status, w.content_type, w.location, w.content_location,
          w.link_headers))
        // A2 politeness advance at dequeue (db.c:762-790)
        val hAdvanced = Step.politenessAdvance(pick.h, now)
        val res = Step.fetchAndProcess(f.url, f.state, now, cached,
          wEntry, cfg, Option(robotsRow).map(_.body))
        val (newF, newH) = res.path match {
          case Step.Path.Updated | Step.Path.Failed =>
            (Step.frontierUpdated(f, now, res.status, res.ttlArg, res.state),
             Step.rootUpdated(hAdvanced, now))
          case Step.Path.Unchanged =>
            (Step.frontierUnchanged(f, now, error = false),
             Step.rootUnchanged(hAdvanced, now))
        }
        StepOut(seq, f.url, f.state, newF, newH,
          res.commit, res.status, res.extractedText, res.outlinks)
      }
    }

    // The step output fans out to 6 consumers — materialize once.
    val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
    var fetchPhaseSec = 0.0
    var seenPhaseSec  = 0.0
    def timed[T](label: String)(f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r  = f
      val s  = (System.nanoTime() - t0) / 1e9
      if (verbose) println(f"[round-timing]   $label: $s%.2fs")
      (r, s)
    }
    val stepOuts = outs.persist()
    val (picksCount, fps) = timed("fetch+process")(stepOuts.count())
    fetchPhaseSec = fps

    // --- 4. merge updates -------------------------------------------------
    val updatedF = stepOuts.map(_.newF)
    val updatedH = stepOuts.map(_.newH)

    // --- 5. discovered URLs: canonicalize → seen-filter → insert ---------
    val candidates: Dataset[SeenFilter.Candidate] = stepOuts
      .flatMap(_.outlinks)
      .flatMap(raw => Urls.canonicalKeyUrl(raw)
        .map(c => SeenFilter.Candidate(Urls.urlHash(c), c)))
      .dropDuplicates("url_hash")

    val seenHashes = frontier.map(_.url_hash)
    val genuinelyNew = SeenFilter
      .filterNew(spark, candidates, seenHashes, bloom)
      .persist()

    val newEntries: Dataset[FrontierEntry] = genuinelyNew
      .flatMap(c => Step.newFrontierEntryFromCanon(c.url, c.url_hash, now))
    val (discoveredCount, sps) = timed("seen-filter")(genuinelyNew.count())
    seenPhaseSec = sps

    val newHostCandidates: Dataset[HostEntry] = genuinelyNew
      .flatMap(c => Step.newHostEntry(c.url, now, bcCfg.value))
      .dropDuplicates("root_hash")
    val newHosts = newHostCandidates
      .join(hosts.select("root_hash"), Seq("root_hash"), "left_anti")
      .as[HostEntry]

    // Replace-by-key merges (≤1 update per key per round by construction).
    val newFrontier = frontier
      .join(updatedF.select("url_hash"), Seq("url_hash"), "left_anti")
      .as[FrontierEntry]
      .unionByName(updatedF)
      .unionByName(newEntries)
    val newHostsAll = hosts
      .join(updatedH.select("root_hash"), Seq("root_hash"), "left_anti")
      .as[HostEntry]
      .unionByName(updatedH)
      .unionByName(newHosts)

    // --- 6. outputs -------------------------------------------------------
    val commits = stepOuts.filter(_.commit)
    val newLog = fetchLog
      .join(commits.select($"newF.url_hash".as("url_hash")),
        Seq("url_hash"), "left_anti")
      .as[CacheRow]
      .unionByName(commits.map(o =>
        CacheRow(o.newF.url_hash, now, o.status)))

    val extractedNew = stepOuts
      .filter(o => o.commit && o.extractedText.isDefined)
      .map(o => ExtractedRow(o.url, o.extractedText.get))

    val trace = stepOuts.map(o =>
      TraceRow(o.seq, round.toInt, o.url, o.stateAtDequeue))

    RoundResult(newFrontier, newHostsAll, newLog, extractedNew, trace,
      picksCount, discoveredCount,
      newHashes = genuinelyNew.map(_.url_hash),
      fetchPhaseSec = fetchPhaseSec,
      seenPhaseSec = seenPhaseSec,
      changedFrontier = updatedF.unionByName(newEntries),
      changedHosts = updatedH.unionByName(newHosts),
      changedLog = commits.map(o => CacheRow(o.newF.url_hash, now, o.status)),
      cleanup = () => { stepOuts.unpersist(); genuinelyNew.unpersist()
        limited.unpersist() })
  }
}
