package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{coalesce, col, explode, lit}
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
 *  2. Emission ORDER is decoupled from execution: each pick carries its
 *     A1 composite sort key (Step.emitKey) and the trace sequence is
 *     derived lazily from the keys on read — no global sort, no
 *     RangePartitioner sample job, no zipWithIndex job in the hot path.
 *     Only a finite crawl budget forces a top-k here (TakeOrdered over the
 *     remaining budget), truncating in exactly the reference's order.
 *  3. Simulated fetch: picks ⋈ web (pages ⋈ fetch_meta, raw header block)
 *     on url, ⋈ fetch_log on url_hash (If-Modified-Since/304 + rollback),
 *     then the shared pure Step.fetchAndProcess inside mapPartitions —
 *     X7 header parse, policy gates, redirect follow, RDF/HTML extraction,
 *     TTL/error arithmetic all happen per-row with zero extra shuffles.
 *  4. The step output is persisted ONCE as a flat DataFrame — every
 *     downstream consumer (frontier/host updates, fetch log, payload
 *     store, extracted text, trace, outlink candidates) reads a pruned
 *     column slice of the columnar cache, so the wide text/body columns
 *     are deserialized only by the consumers that need them.
 *  5. Returned are pure DELTAS (updates + inserts per table); the driver
 *     owns state as base+overlay+inserts (tables.DeltaState) — a round
 *     never rewrites any full table.
 *
 * Skew note (SURVEY §7.4): the scheduling groupByKey must stay unsalted
 * (politeness is per-host), but its groups are tiny by construction —
 * flatMapGroups folds to a single winner without buffering the group.
 * A mega-host with 10^7 pending URLs is pre-reduced by the
 * `next_fetch < now` pushdown and the fold; extraction/join stages key on
 * url (uniform hash), so the only skewed key never carries heavy payloads.
 */
object CrawlRound {

  /** Simulated-web row: pages (input_hint shape) ⋈ fetch_meta, flattened.
    * Carries the RAW response header block — status/type/redirect/Link are
    * parsed inside the fetch step (X7 in the dataflow, fetch.c:497-552). */
  final case class WebRow(
      url: String,
      warc_ts: Long,
      body: Array[Byte],
      headers_raw: String)

  /** fetch_log row (the cache sidecar's schedule-relevant fields —
    * reference JSON sidecar, libcrawl/p_libcrawl.h:47-75). */
  final case class CacheRow(url_hash: String, updated: Long, status: Int)

  /** Extracted-text output row (byte-identity contract per input_hint). */
  final case class ExtractedRow(url: String, text: String)

  /** S4: one stored payload (the reference cache's payload blob,
    * libcrawl/caches/disk.c:85-170 — committed iff the sidecar is). */
  final case class PageStoreRow(url_hash: String, url: String,
                                updated: Long, body: Array[Byte])

  /** One trace row with its A1 composite emission key; the global `seq`
    * is derived lazily (rank within round + per-round offset). */
  final case class TraceKeyed(round: Int, k1: Int, k2: Long, k3: Long,
                              k4: Int, url: String, state_at_dequeue: String)

  /** A dequeued winner with its emission-order key flattened for sorting
    * (k5 is the url itself). */
  final case class Pick(f: FrontierEntry, h: HostEntry,
                        k1: Int, k2: Long, k3: Long, k4: Int, k5: String)

  /** A scheduled pick with its robots join key. */
  final case class Sched(pick: Pick, robots_url: String)

  /** One host's robots.txt (url = <root>robots.txt). */
  final case class RobotsRow(url: String, body: Array[Byte])

  /** Everything one step produces: emission key + state updates + outputs.
    * Persisted as a flat DataFrame so consumers prune columns. */
  final case class StepOut(
      k1: Int, k2: Long, k3: Long, k4: Int,
      url: String,
      state_at_dequeue: String,
      newF: FrontierEntry,
      newH: HostEntry,
      commit: Boolean,
      /** Whether a fetch_log row already existed for this url (the J5 cache
        * join hit) — splits the log delta into replace-by-key updates vs
        * brand-new inserts without re-probing the table. */
      hadCache: Boolean,
      status: Int,
      text: Option[String],
      body: Option[Array[Byte]],
      outlinks: Seq[String])

  /** Pure per-table DELTAS of one round (all unpersisted plans over the
    * round-internal caches; the driver persists + materializes them in one
    * job and folds them into its DeltaState/AppendState tables). */
  final case class RoundResult(
      picksCount: Long,
      fetchPhaseSec: Double,
      updatedFrontier: Dataset[FrontierEntry],
      newFrontier: Dataset[FrontierEntry],
      updatedHosts: Dataset[HostEntry],
      newHosts: Dataset[HostEntry],
      /** fetch_log rows replacing existing keys (cache hit → re-fetch). */
      logUpdates: Dataset[CacheRow],
      /** fetch_log rows for never-before-fetched keys (DeltaState insert
        * contract: the overlay must only ever replace existing keys —
        * first-fetch rows routed there would leave the tracked row count
        * at 0 and grow the overlay without bound). */
      logInserts: Dataset[CacheRow],
      pagesDelta: Dataset[PageStoreRow],
      extractedDelta: Dataset[ExtractedRow],
      trace: Dataset[TraceKeyed],
      /** Unpersist round-internal caches — call AFTER materializing the
        * returned deltas. */
      cleanup: () => Unit)

  def webFromMap(spark: SparkSession,
                 web: Map[String, Step.WebEntry]): Dataset[WebRow] = {
    import spark.implicits._
    web.toSeq.sortBy(_._1).map { case (u, w) =>
      WebRow(u, w.warcTs, w.body, w.headersRaw)
    }.toDS()
  }

  /** S2 source shape: the simulated web assembled from the at-rest tables
    * — `pages` (input_hint shape) ⋈ `fetch_meta` (raw header envelope) on
    * url (SURVEY §2.1 S2, §2.4 J4). */
  def webFromTables(pages: Dataset[PageRow],
                    meta: Dataset[FetchMeta]): Dataset[WebRow] = {
    import pages.sparkSession.implicits._
    pages.joinWith(meta, pages("url") === meta("url"), "inner")
      .map { case (p, m) =>
        WebRow(p.url, p.warc_ts.getTime / 1000L, p.html, m.headers_raw)
      }
  }

  /** One row per host that serves a 200 robots.txt (the F-gate input). */
  def robotsFromWeb(spark: SparkSession,
                    web: Dataset[WebRow]): Dataset[RobotsRow] = {
    import spark.implicits._
    web.filter(_.url.endsWith("/robots.txt"))
      .flatMap { w =>
        val e = Step.WebEntry(w.warc_ts, w.body, w.headers_raw)
        if (e.status == 200) Iterator.single(RobotsRow(w.url, w.body))
        else Iterator.empty
      }
  }

  /**
   * Execute one round: runs ONE job (materializing the persisted step
   * output, whose count is the picks count) and returns the delta plans.
   */
  def run(
      spark: SparkSession,
      frontier: Dataset[FrontierEntry],
      hosts: Dataset[HostEntry],
      fetchLog: Dataset[CacheRow],
      seenKeys: Dataset[String],
      web: Dataset[WebRow],
      cfg: CrawlConfig,
      now: Long,
      round: Long,
      seqStart: Long,
      bloom: SeenFilter.SeenBloom,
      robotsCache: Option[Dataset[RobotsRow]] = None): RoundResult = {
    import spark.implicits._

    val bcCfg = spark.sparkContext.broadcast(cfg)

    // --- 1. A1 dequeue --------------------------------------------------
    // Column-level filters: stay columnar over the cached state (pushdown
    // at 100TB scale = partition pruning on next_fetch); hosts filter
    // keeps only currently-eligible hosts so the join side stays minimal.
    val eligibleHosts = hosts
      .filter(col("rate") > 0 && col("earliest_update") < lit(now))
    val due = frontier.filter(col("next_fetch") < lit(now))

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

    // --- 2. budget truncation (only a finite budget forces a sort) -------
    val budgetLeft = cfg.budget - seqStart
    val scheduled: Dataset[Pick] =
      if (budgetLeft >= Int.MaxValue) picks
      else picks.orderBy("k1", "k2", "k3", "k4", "k5")
        .limit(math.max(0L, budgetLeft).toInt)

    val robotsOn = cfg.robotsEnabled
    val sched: Dataset[Sched] = scheduled.map { p =>
      val rUrl =
        if (!robotsOn) ""
        else Urls.canonicalRoot(p.f.url)
          .map(graft.functions.Robots.robotsUrl).getOrElse("")
      Sched(p, rUrl)
    }

    // --- 3. simulated fetch + process ------------------------------------
    val withWeb: Dataset[(Sched, WebRow)] = sched
      .joinWith(web, sched("pick.f.url") === web("url"), "left_outer")
    val withCache: Dataset[((Sched, WebRow), CacheRow)] = withWeb
      .joinWith(fetchLog, $"_1.pick.f.url_hash" === fetchLog("url_hash"),
        "left_outer")
    // robots side: one row per host that HAS a robots.txt — small, AQE
    // broadcasts it; empty (zero-cost join) when the gate is off. The
    // driver passes a persisted cache so the derivation doesn't re-scan
    // `web` every round (robots.txt bodies change on day scales, not
    // round scales — in production this cache is the robots slice of the
    // pages table, refreshed by its own TTL).
    val robotsDs: Dataset[RobotsRow] =
      if (!robotsOn) spark.emptyDataset[RobotsRow]
      else robotsCache.getOrElse(robotsFromWeb(spark, web))
    val withRobots: Dataset[(((Sched, WebRow), CacheRow), RobotsRow)] =
      withCache.joinWith(robotsDs,
        $"_1._1.robots_url" === robotsDs("url"), "left_outer")

    val outs: Dataset[StepOut] = withRobots.mapPartitions { it =>
      val cfg = bcCfg.value
      it.map { case ((((Sched(pick, _), webRow), cacheRow), robotsRow)) =>
        val f = pick.f
        val cached = Option(cacheRow)
          .map(c => Step.CachedInfo(c.updated, c.status))
        val wEntry = Option(webRow).map(w =>
          Step.WebEntry(w.warc_ts, w.body, w.headers_raw))
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
        StepOut(pick.k1, pick.k2, pick.k3, pick.k4, f.url, f.state,
          newF, newH, res.commit, cached.isDefined, res.status,
          res.extractedText,
          if (res.commit) Some(Option(webRow).map(_.body)
            .getOrElse(Array.emptyByteArray)) else None,
          res.outlinks)
      }
    }

    // The step output fans out to 7 consumers — persist ONCE as a flat
    // DataFrame; the columnar cache serves each consumer a pruned column
    // slice (the wide text/body columns are read only by their consumers).
    // OFF_HEAP when the session has an off-heap pool: the round's bulky
    // caches otherwise fill the GC old generation (25-50% of big-sweep
    // wall went to collector pauses).
    val stateLevel =
      if (spark.conf.getOption("spark.memory.offHeap.enabled")
          .contains("true"))
        org.apache.spark.storage.StorageLevel.OFF_HEAP
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val stepOuts: DataFrame = outs.toDF().persist(stateLevel)
    val verbose = sys.env.get("SPARK_GRAFT_VERBOSE").contains("1")
    val t0 = System.nanoTime()
    val picksCount = stepOuts.count()
    val fetchPhaseSec = (System.nanoTime() - t0) / 1e9
    if (verbose) println(f"[round-timing]   fetch+process: $fetchPhaseSec%.2fs")

    // --- 4. state-update deltas (column-pruned reads of the cache) -------
    val updatedF = stepOuts.select($"newF.*").as[FrontierEntry]
    val updatedH = stepOuts.select($"newH.*").as[HostEntry]
    val commits  = stepOuts.filter(col("commit"))
    def logRows(cacheHit: Boolean): Dataset[CacheRow] = commits
      .filter(if (cacheHit) col("hadCache") else !col("hadCache"))
      .select($"newF.url_hash".as("url_hash"), lit(now).as("updated"),
        col("status"))
      .as[CacheRow]
    val logUpdates = logRows(cacheHit = true)
    val logInserts = logRows(cacheHit = false)
    val pagesDelta = commits
      .select($"newF.url_hash".as("url_hash"), col("url"),
        lit(now).as("updated"),
        coalesce(col("body"), lit(Array.emptyByteArray)).as("body"))
      .as[PageStoreRow]
    val extractedDelta = commits
      .filter(col("text").isNotNull)
      .select(col("url"), col("text"))
      .as[ExtractedRow]
    val trace = stepOuts
      .select(lit(round.toInt).as("round"), col("k1"), col("k2"), col("k3"),
        col("k4"), col("url"), col("state_at_dequeue"))
      .as[TraceKeyed]

    // --- 5. discovered URLs: canonicalize → seen-filter → insert ---------
    // canon_key is the native codegen'd spelling of the old typed
    // flatMap(canonicalKeyUrl → Candidate(urlHash, _)): the outlink
    // stream (~15× the page count, the round's densest row stream) stays
    // columnar through canonicalize+hash+dedup with zero String
    // materialization on the already-canonical fast path — the typed
    // encoder boundary paid UTF8String→String→case-class→UTF8String per
    // OUTLINK; it now runs once per DEDUPED candidate inside filterNew
    // (functions/UrlKey.scala; parity pinned by UrlKeySpec, end-to-end by
    // the trace/seen-set suites).
    graft.functions.GraftFunctions.register(spark)
    val candidates: Dataset[SeenFilter.Candidate] =
      if (sys.props.get("graft.canonKey").orElse(
            sys.env.get("SPARK_GRAFT_CANON_KEY")).contains("typed"))
        // the pre-r6 typed spelling, kept as the A/B escape hatch (same
        // set/clear discipline as graft.stateLeaf)
        stepOuts
          .select(explode(col("outlinks")).as("raw")).as[String]
          .flatMap(raw => Urls.canonicalKeyUrl(raw)
            .map(c => SeenFilter.Candidate(Urls.urlHash(c), c)))
          .dropDuplicates("url_hash")
      else stepOuts
        .select(explode(col("outlinks")).as("raw"))
        .select(org.apache.spark.sql.functions.expr("canon_key(raw)").as("ck"))
        .filter(col("ck").isNotNull)
        .select(col("ck.url_hash").as("url_hash"), col("ck.url").as("url"))
        .dropDuplicates("url_hash")
        .as[SeenFilter.Candidate]

    val genuinelyNew = SeenFilter
      .filterNew(spark, candidates, seenKeys, bloom)
      .persist(stateLevel)

    val newEntries: Dataset[FrontierEntry] = genuinelyNew
      .flatMap(c => Step.newFrontierEntryFromCanon(c.url, c.url_hash, now))
    val newHosts: Dataset[HostEntry] = genuinelyNew
      .flatMap(c => Step.newHostEntry(c.url, now, bcCfg.value))
      .dropDuplicates("root_hash")
      .join(hosts.select("root_hash"), Seq("root_hash"), "left_anti")
      .as[HostEntry]

    RoundResult(picksCount, fetchPhaseSec,
      updatedF, newEntries, updatedH, newHosts,
      logUpdates, logInserts, pagesDelta, extractedDelta, trace,
      cleanup = () => { stepOuts.unpersist(); genuinelyNew.unpersist() })
  }
}
