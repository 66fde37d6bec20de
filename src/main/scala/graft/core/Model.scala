package graft.core

/**
 * Core data model (reference: crawl_resource/crawl_root DDL in
 * libspider/queues/db.c:349-394,294-317; CRAWLSTATE enum in
 * libcrawl/libcrawl.h:31-53; CRAWLOBJ in libcrawl/p_libcrawl.h:127-140).
 *
 * Timestamps are a LOGICAL clock in seconds (round number ≙ one reference
 * wall-second) so traces are deterministic and independent of wall time.
 */
object CrawlState {
  val Err           = "ERR"
  val New           = "NEW"
  val Failed        = "FAILED"
  val Rejected      = "REJECTED"
  val Accepted      = "ACCEPTED"
  val Complete      = "COMPLETE"
  val Force         = "FORCE"
  val Skipped       = "SKIPPED"
  /** Transient only — collapsed to SKIPPED before persisting
    * (db.c:1000-1003). */
  val SkippedCommit = "SKIPPED_COMMIT"
}

/** One frontier row (mirrors crawl_resource; FIXTURES.md §3). */
final case class FrontierEntry(
    url_hash: String,
    shorthash: Long,
    tinyhash: Int,
    root_hash: String,
    url: String,
    state: String,
    added: Long,
    updated: Option[Long],
    last_modified: Option[Long],
    status: Option[Int],
    next_fetch: Long,
    error_count: Int,
    soft_error_count: Int,
    last_ttl: Int)

/** One politeness-ledger row (mirrors crawl_root; FIXTURES.md §4). */
final case class HostEntry(
    root_hash: String,
    root_url: String,
    added: Long,
    last_updated: Option[Long],
    earliest_update: Long,
    rate: Int, // ms between fetches; default 1000 (db.c:1285)
    partition: Option[String])

/** One Common-Crawl-style page (exact input_hint shape; warc_ts carried
  * as logical seconds alongside, java.sql.Timestamp at the table layer). */
final case class PageRow(
    url: String,
    warc_ts: java.sql.Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Simulated HTTP envelope per url (FIXTURES.md §2): the raw response
  * header block. Status/type/redirect/Link are NOT materialized — they are
  * parsed in-dataflow by Step.WebEntry (X7; libcrawl/fetch.c:497-552).
  * Joined with `pages` via CrawlRound.webFromTables (J4). */
final case class FetchMeta(
    url: String,
    headers_raw: String)

/** Result of one simulated fetch+process of one URL (CRAWLOBJ analog). */
final case class FetchOutcome(
    url: String,
    url_hash: String,
    root_hash: String,
    status: Int,
    state: String,
    ttl: Int,
    extracted_text: Option[String],
    outlinks: Seq[String])

/** One dequeue-trace row (golden-trace schema, FIXTURES.md §6). */
final case class TraceRow(
    seq: Long,
    round: Int,
    url: String,
    state_at_dequeue: String)

/** Crawl/policy configuration (mirrors crawler/crawl.conf knobs). */
final case class CrawlConfig(
    schemeWhitelist: Seq[String] = Seq("http", "https"),
    schemeBlacklist: Seq[String] = Nil,
    ctypeWhitelist: Seq[String]  = Nil,
    ctypeBlacklist: Seq[String]  = Nil,
    licensePredicates: Seq[String] = Nil,
    licenseWhitelist: Seq[String]  = Nil,
    licenseBlacklist: Seq[String]  = Nil,
    useLodProcessor: Boolean = false,
    /** Extension (north-star; absent in the reference): gate fetches on
      * the host's robots.txt (RFC 9309 subset — functions/Robots.scala).
      * Off by default so reference traces are unaffected. */
    robotsEnabled: Boolean = false,
    /** Extended mode: html payloads extracted instead of SKIPPED (north
      * star's RDF-aware HTML-to-text; reference rdf processor skips html,
      * rdf.c:208-239). */
    useHtmlProcessor: Boolean = false,
    defaultRate: Int = 1000, // ms (db.c:1285)
    /** F6 min-TTL cache gate (crawl_set_cache_min analog): a cached copy
      * younger than this many logical seconds short-circuits the fetch as
      * "unchanged" (libcrawl/fetch.c:76-84). The reference never configures
      * it (p_libcrawl.h:116) so the default 0 keeps every trace identical. */
    cacheMin: Long = 0L,
    /** Response-header size cap in bytes: the reference aborts the transfer
      * when the accumulated header block would exceed MAX_HEADERS_SIZE
      * (libcrawl/fetch.c:28,270-272) — curl then fails the perform, which
      * surfaces as status 504 / FAILED (fetch.c:259-266), or a rollback to
      * the cached copy when one exists (fetch.c:268-281). */
    maxHeaderBytes: Int = 8192,
    /** Per-root rate overrides (root URL → ms), cf. crawl.conf rate. */
    hostRateOverrides: Map[String, Int] = Map.empty,
    maxRounds: Int = 100,
    budget: Long = Long.MaxValue)
