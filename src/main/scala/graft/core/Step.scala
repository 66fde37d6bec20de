package graft.core

import graft.functions.{Extract, Headers, LinkHeader, Urls}

/**
 * The per-URL fetch+process step and the frontier/host update arithmetic —
 * pure functions shared by the reference simulator (graft.sim.Simulator)
 * and the Spark engine (graft.operators.CrawlRound). Sharing this logic is
 * what makes the engine's parallel trace provably equal to the serial
 * reference trace: the orchestration differs, the row semantics cannot.
 *
 * Faithfully replicates (with file:line cites into /root/reference):
 *  - fetch dispatch incl. rollback rules (libcrawl/fetch.c:51-252)
 *  - checkpoint / content-type gate placement (fetch.c:344-367)
 *  - redirect following, processor dispatch, TTL choice
 *    (libspider/processor.c:156-261)
 *  - the RDF processor's status/type gates and node harvest
 *    (libspider/processors/rdf.c:129-330)
 *  - db_updated_uristr / db_unchanged_uristr arithmetic incl. the
 *    stale-`tm` quirk (libspider/queues/db.c:944-1126; quirk :1017-1027)
 *  - politeness advance at dequeue (db.c:762-790)
 *  - error-counter ranges incl. the `< 499` / `< 599` exclusions
 *    (db.c:1032-1055)
 */
object Step {

  /** What the cache (fetch_log) knows about a URL. */
  final case class CachedInfo(updated: Long, status: Int)

  /** What the simulated web knows about a URL: payload + the raw response
    * header block (pages ⋈ fetch_meta). Everything schedule-relevant —
    * status, content type, redirect target, Content-Location, Link headers
    * — is derived by parsing the block, so X7 runs IN the dataflow exactly
    * where the reference builds its header map from the wire bytes
    * (libcrawl/fetch.c:497-552); the status line sits under the ":" key
    * (fetch.c:519), duplicate headers fold into arrays, CRs are trimmed. */
  final case class WebEntry(
      warcTs: Long,
      body: Array[Byte],
      headersRaw: String) {
    lazy val headers: Map[String, Seq[String]] =
      Headers.parseHeaderBlock(headersRaw)
    def status: Int = Headers.statusCode(headers).getOrElse(0)
    def contentType: String =
      Headers.header(headers, "Content-Type").getOrElse("")
    def location: Option[String] = Headers.header(headers, "Location")
    def contentLocation: Option[String] =
      Headers.header(headers, "Content-Location")
    def linkHeaders: Seq[String] = Headers.values(headers, "Link")
  }

  /** Which queue-update path fired (exactly one per fetch —
    * fetch.c:226-251). */
  object Path {
    val Updated   = "updated"
    val Unchanged = "unchanged"
    val Failed    = "failed"
  }

  /** The complete, orchestration-independent result of one step. */
  final case class StepResult(
      url: String,
      path: String,           // Path.*
      status: Int,            // status passed to the queue update
      state: String,          // state passed to the queue update (pre-coercion)
      ttlArg: Long,           // ttl passed by the processor (86400/604800)
      commit: Boolean,        // fresh cache commit (fetch_log/pages written)
      extractedText: Option[String],
      outlinks: Vector[String]) // raw URIs in enqueue order (deduped per page)

  /**
   * One fetch+process of `url`, dequeued in `stateAtDequeue` at logical
   * time `now`, against the simulated web. Returns the StepResult that
   * drives the queue updates.
   */
  def fetchAndProcess(
      url: String,
      stateAtDequeue: String,
      now: Long,
      cached: Option[CachedInfo],
      web0: Option[WebEntry],
      cfg: CrawlConfig,
      robotsBody: Option[Array[Byte]] = None): StepResult = {

    val force     = stateAtDequeue == CrawlState.Force
    val cacheTime = cached.map(_.updated)

    // Header-size cap (fetch.c:28,270-272): once the accumulated block +
    // NUL needs an allocation beyond MAX_HEADERS_SIZE the header callback
    // returns 0 (the 128-byte alloc granularity divides 8192, so exactly
    // 8191 block bytes survive), curl aborts the transfer, and the perform
    // fails with no status parsed — exactly the low-level-fetch-error shape
    // the `web = None` path below models (status 504, fetch.c:259-266;
    // rollback-if-cached via the >=500 rule, else failed).
    val web = web0.filter(_.headersRaw.length < cfg.maxHeaderBytes)

    // min-TTL gate (fetch.c:76-84; cache_min is 0 in practice —
    // p_libcrawl.h:116 — but the crawl_set_cache_min knob exists)
    // now - cachetime < cache_min → unchanged without fetching
    if (cacheTime.exists(ct => !force && now - ct < cfg.cacheMin))
      return StepResult(url, Path.Unchanged, cached.get.status,
        stateAtDequeue, 0, commit = false, None, Vector.empty)

    // F1 URI policy, pre-fetch (fetch.c:97-109)
    val uriState = Policy.schemePolicy(url, cfg)
    if (uriState != CrawlState.Accepted) {
      // failed(state) — processor_failed_handler_ coerces anything outside
      // {FAILED, REJECTED, SKIPPED} to FAILED (processor.c:246-261)
      val st = coerceFailedState(uriState)
      return StepResult(url, Path.Failed, cached.map(_.status).getOrElse(0),
        st, 86400, commit = false, None, Vector.empty)
    }

    // robots.txt gate, pre-fetch (north-star extension; no reference
    // analog — off unless cfg.robotsEnabled). Disallowed → REJECTED via
    // the same failed path as F1.
    if (cfg.robotsEnabled &&
        !graft.functions.Robots.urlAllowed(url, robotsBody))
      return StepResult(url, Path.Failed, cached.map(_.status).getOrElse(0),
        CrawlState.Rejected, 86400, commit = false, None, Vector.empty)

    // Simulated HTTP exchange. No entry at all ≙ connection failure → 504
    // (fetch.c:144-150: curl error maps to status 504, state FAILED).
    var status = web match {
      case None    => 504
      case Some(w) =>
        // If-Modified-Since simulation: IMS sent when cached and not FORCE
        // (fetch.c:85-95); server answers 304 when unmodified since.
        if (cacheTime.exists(ct => !force && w.status == 200 && w.warcTs <= ct))
          304
        else w.status
    }

    // Rollback decisions (fetch.c:160-172)
    var rollback = false
    if (cacheTime.isDefined && status == 304) rollback = true
    else if (status >= 500 && cacheTime.isDefined) rollback = true

    // Mid-fetch checkpoint — F2 content-type policy (fetch.c:344-367;
    // content-types.c:154-226). Only runs when not already rolled back.
    var checkpointState = CrawlState.Accepted
    if (!rollback) {
      val ct = web.map(_.contentType).getOrElse("")
      val d  = Policy.contentTypePolicy(status, ct, cfg)
      checkpointState = d.state
      if (d.state != CrawlState.Accepted &&
          d.state != CrawlState.SkippedCommit) {
        status = d.status // forced 406 (content-types.c:206,218)
        rollback = true
      } else if (d.state == CrawlState.SkippedCommit) {
        status = d.status
      }
    }

    if (rollback) {
      // rollback with nothing cached is an error → failed (fetch.c:214-222)
      if (cacheTime.isEmpty) {
        val st = coerceFailedState(
          if (checkpointState != CrawlState.Accepted) checkpointState
          else CrawlState.Failed)
        StepResult(url, Path.Failed, status, st, 86400, commit = false,
          None, Vector.empty)
      } else {
        // not fresh → unchanged (fetch.c:236-242); unchanged handler always
        // passes error=0 (processor.c:227-240)
        StepResult(url, Path.Unchanged, status, stateAtDequeue, 0,
          commit = false, None, Vector.empty)
      }
    } else {
      // Fresh commit; state ACCEPTED unless checkpoint said SKIPPED_COMMIT
      // (fetch.c:199-205) — then the processor runs (processor.c:156-224).
      val w = web // may be None only on the 504-no-cache path
      val contentLocation = w.flatMap(_.contentLocation).flatMap { cl =>
        // Content-Location honored only when same-origin (fetch.c:371-449)
        Urls.resolve(url, cl).filter(abs => Urls.sameOrigin(url, abs))
      }
      val location = w.flatMap(_.location).flatMap(l => Urls.resolve(url, l))

      if (status > 300 && status < 304) {
        // E4 redirect follow (processor.c:177-192): enqueue target unless
        // it equals the source; state SKIPPED, ttl 604800
        val links =
          location.filter(_ != url).map(Vector(_)).getOrElse(Vector.empty)
        StepResult(url, Path.Updated, status, CrawlState.Skipped, 604800,
          commit = true, None, links)
      } else {
        // processor->process(): the RDF processor (rdf.c:129-240)
        val (state, text, links) = process(url, status, w, contentLocation, cfg)
        val ttl = if (state == CrawlState.Accepted) 86400L else 604800L
        StepResult(url, Path.Updated, status, state, ttl, commit = true,
          text, links)
      }
    }
  }

  /** The RDF (or extended rdf+html) processor: status/type gates, parse,
    * E2 header-triple injection, E5 license filter, E3 node harvest. */
  private def process(url: String, status: Int, web: Option[WebEntry],
                      contentLocation: Option[String], cfg: CrawlConfig)
      : (String, Option[String], Vector[String]) = {
    // rdf_preprocess gates (rdf.c:160-180)
    if (status < 200 || status > 299)
      return (CrawlState.Skipped, None, Vector.empty)
    val w  = web.getOrElse(return (CrawlState.Skipped, None, Vector.empty))
    val ct = Headers.normalizeContentType(w.contentType)
    if (ct.isEmpty) return (CrawlState.Skipped, None, Vector.empty)
    val parser = Headers.parserFor(ct) match {
      case None    => return (CrawlState.Skipped, None, Vector.empty)
      case Some(p) => p
    }
    if (parser == "html") {
      // The reference's rdf processor has no HTML parser → SKIPPED
      // (rdf.c:208-239). Our extended mode extracts text + links (the
      // north_star's RDF-aware HTML-to-text pass; E6).
      if (!cfg.useHtmlProcessor)
        return (CrawlState.Skipped, None, Vector.empty)
      val body = new String(w.body, java.nio.charset.StandardCharsets.UTF_8)
      val text = Extract.htmlText(body)
      return (CrawlState.Accepted, Some(text), Extract.htmlLinks(body, url))
    }
    // Parse (rdf.c:270-328). Parse failure → COS_ERR → FAILED
    // (processor.c:204-208). Our subset parser is total on fixture input;
    // an empty parse of a non-empty body models librdf's failure.
    val (text, bodyTriples) = Extract.extract(url, w.body, parser)
    if (bodyTriples.isEmpty && w.body.nonEmpty)
      return (CrawlState.Failed, None, Vector.empty)
    // E2: Link-header triples injected before traversal (rdf.c:338-372)
    val headerTriples = w.linkHeaders.flatMap(h =>
      LinkHeader.triples(h, url, contentLocation)).map(t =>
      Extract.Triple(t.anchor, t.rel, t.target, objIsResource = true))
    val triples = bodyTriples ++ headerTriples
    // E5: LOD license filter (lod.c:57-231)
    val lic = Policy.licensePolicy(url, contentLocation, triples, cfg)
    if (lic != CrawlState.Accepted) return (lic, Some(text), Vector.empty)
    // E3: harvest every resource node, deduped per page (rdf.c:316-327,
    // 601-635); enqueue order = first-seen order
    (CrawlState.Accepted, Some(text), Extract.harvestOutlinks(triples))
  }

  // ----------------------------------------------------- ordering keys
  // Shared by the serial simulator and the Spark engine so the parallel
  // schedule is provably the same total order as the reference's A1 sort
  // (db.c:681-692). Per-host terms (earliest_update, rate) are constant
  // within a host, so the per-host winner needs only the frontier columns.

  /** Per-host winner ordering (constant-per-host terms dropped). */
  def hostKey(f: FrontierEntry): (Int, Long, String) =
    (if (f.state == CrawlState.New) 0 else 1, f.next_fetch, f.url)

  /** Cross-host emission ordering — the full A1 composite sort. */
  def emitKey(f: FrontierEntry, h: HostEntry): (Int, Long, Long, Int, String) =
    (if (f.state == CrawlState.New) 0 else 1, h.earliest_update,
      f.next_fetch, h.rate, f.url)

  private def coerceFailedState(s: String): String =
    if (s == CrawlState.Failed || s == CrawlState.Rejected ||
        s == CrawlState.Skipped) s
    else CrawlState.Failed

  // ------------------------------------------------------------- updates

  /** A2: politeness advance at dequeue — earliest_update =
    * max(existing, now + max(1, rate/1000)) (db.c:762-790). */
  def politenessAdvance(h: HostEntry, now: Long): HostEntry = {
    val rateSec = math.max(1, h.rate / 1000).toLong
    h.copy(earliest_update = math.max(h.earliest_update, now + rateSec))
  }

  /** db_updated_uristr resource arithmetic (db.c:944-1016). */
  def frontierUpdated(f: FrontierEntry, now: Long, status: Int,
                      ttlArg: Long, state: String): FrontierEntry = {
    val persisted = state match {
      case CrawlState.Err | CrawlState.Failed => CrawlState.Failed
      case CrawlState.SkippedCommit           => CrawlState.Skipped
      case s                                  => s
    }
    val ttl =
      if (status != 200) math.max(ttlArg, 86400L)
      else math.max(ttlArg, 3600L)
    val nextFetch = math.max(f.next_fetch, now + ttl) // monotonic guard
    // error counters — note the reference excludes 499 and 599
    // (db.c:1032-1055: `< 499`, `< 599`)
    val (ec, sec) =
      if (status >= 400 && status < 499) (f.error_count + 1, f.soft_error_count)
      else if (status >= 500 && status < 599) (0, f.soft_error_count + 1)
      else (0, 0)
    f.copy(updated = Some(now), last_modified = Some(now),
      status = Some(status), state = persisted, next_fetch = nextFetch,
      error_count = ec, soft_error_count = sec, last_ttl = ttl.toInt)
  }

  /** db_updated_uristr root arithmetic incl. the stale-`tm` quirk
    * (db.c:1017-1027): the guard value is formatted from the tm of `now`,
    * so earliest_update = max(existing, now), NOT now+2. */
  def rootUpdated(h: HostEntry, now: Long): HostEntry =
    h.copy(last_updated = Some(now),
      earliest_update = math.max(h.earliest_update, now))

  /** db_unchanged_uristr resource arithmetic (db.c:1077-1126); the engine
    * only ever reaches error=false (processor.c:227-240 passes 0). */
  def frontierUnchanged(f: FrontierEntry, now: Long,
                        error: Boolean): FrontierEntry = {
    if (error)
      f.copy(updated = Some(now), next_fetch = now + 2 + 604800,
        error_count = f.error_count + 1)
    else
      f.copy(updated = Some(now), next_fetch = now + 2 + 7200,
        error_count = 0)
  }

  /** db_unchanged_uristr root arithmetic: last_updated=now,
    * earliest_update=now+2, both unconditional (db.c:1095-1100). */
  def rootUnchanged(h: HostEntry, now: Long): HostEntry =
    h.copy(last_updated = Some(now), earliest_update = now + 2)

  /** Insert-if-absent of a discovered/seeded URL (db.c:1202-1263). */
  def newFrontierEntry(rawUrl: String, now: Long,
                       force: Boolean): Option[FrontierEntry] =
    Urls.canonicalKeyUrl(rawUrl).flatMap { canon =>
      Urls.canonicalRoot(canon).map { root =>
        val h  = Urls.urlHash(canon)
        val sh = Urls.shorthash(h)
        FrontierEntry(h, sh, (sh % 256).toInt, Urls.urlHash(root), canon,
          if (force) CrawlState.Force else CrawlState.New,
          added = now, updated = None, last_modified = None, status = None,
          next_fetch = now, error_count = 0, soft_error_count = 0,
          last_ttl = 0)
      }
    }

  /** newFrontierEntry fast path for the discovered-URL hot loop: the
    * canonical url and url_hash are already derived upstream — identical
    * semantics, skips the redundant re-canonicalize + re-hash. */
  def newFrontierEntryFromCanon(canonUrl: String, urlHash: String,
                                now: Long): Option[FrontierEntry] =
    Urls.canonicalRoot(canonUrl).map { root =>
      val sh = Urls.shorthash(urlHash)
      FrontierEntry(urlHash, sh, (sh % 256).toInt, Urls.urlHash(root),
        canonUrl, CrawlState.New, added = now, updated = None,
        last_modified = None, status = None, next_fetch = now,
        error_count = 0, soft_error_count = 0, last_ttl = 0)
    }

  /** Insert-if-absent of the host root (db.c:1267-1294; rate default 1000,
    * overridable per-host for fixtures, cf. crawl.conf rate). */
  def newHostEntry(canonUrl: String, now: Long,
                   cfg: CrawlConfig): Option[HostEntry] =
    Urls.canonicalRoot(canonUrl).map { root =>
      val rate = cfg.hostRateOverrides.getOrElse(root, cfg.defaultRate)
      HostEntry(Urls.urlHash(root), root, added = now, last_updated = None,
        earliest_update = now, rate = rate, partition = None)
    }
}
