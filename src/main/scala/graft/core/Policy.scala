package graft.core

import graft.functions.{Extract, Headers, Urls}

/**
 * Policy gates — pure functions shared by simulator and engine.
 *
 *  - F1 scheme policy (libspider/policies/schemes.c:133-170)
 *  - F2 content-type policy / mid-fetch checkpoint
 *    (libspider/policies/content-types.c:154-226)
 *  - E5 LOD license filter (libspider/processors/lod.c:57-231)
 *
 * Reference quirks handled (SURVEY §7.4):
 *  - content-types.c:198 records `n = c` on a whitelist hit, so a match at
 *    index 0 is treated as a miss. We implement the INTENDED semantics
 *    (any match passes); fixtures avoid index-0-only whitelists so traces
 *    agree either way. Pinned by PolicySpec.
 *  - a whitelist/blacklist rejection forces status 406
 *    (content-types.c:206,218).
 */
object Policy {

  /** F1: returns the new state — ACCEPTED passes to fetch; SKIPPED /
    * REJECTED short-circuit. Case-insensitive (schemes.c:133-170). */
  def schemePolicy(url: String, cfg: CrawlConfig): String = {
    Urls.scheme(url) match {
      case None => CrawlState.Failed
      case Some(sc) =>
        if (cfg.schemeBlacklist.exists(_.equalsIgnoreCase(sc)))
          CrawlState.Rejected
        else if (cfg.schemeWhitelist.nonEmpty &&
                 !cfg.schemeWhitelist.exists(_.equalsIgnoreCase(sc)))
          CrawlState.Skipped
        else CrawlState.Accepted
    }
  }

  /** F2 result: possibly-overridden status + state decision. */
  final case class CtypeDecision(status: Int, state: String)

  /**
   * F2: checkpoint gate after headers. 3xx → SKIPPED_COMMIT (object kept
   * so the redirect can be followed; content-types.c:161-164). Otherwise
   * normalize the type and apply blacklist/whitelist; a policy miss forces
   * status 406 (content-types.c:206,218).
   */
  def contentTypePolicy(status: Int, rawContentType: String,
                        cfg: CrawlConfig): CtypeDecision = {
    if (status >= 300 && status < 400)
      return CtypeDecision(status, CrawlState.SkippedCommit)
    val ct = Headers.normalizeContentType(rawContentType)
    if (cfg.ctypeBlacklist.exists(_.equalsIgnoreCase(ct)))
      CtypeDecision(406, CrawlState.Rejected)
    else if (cfg.ctypeWhitelist.nonEmpty &&
             !cfg.ctypeWhitelist.exists(_.equalsIgnoreCase(ct)))
      CtypeDecision(406, CrawlState.Skipped)
    else CtypeDecision(status, CrawlState.Accepted)
  }

  /**
   * E5: LOD license filter — triples whose subject is the document URL (or
   * its Content-Location) and whose predicate is a configured license
   * predicate; object must hit the whitelist (blacklist rejects outright).
   * No acceptable license → REJECTED (lod.c:57-231).
   */
  def licensePolicy(docUrl: String, contentLocation: Option[String],
                    triples: Seq[Extract.Triple],
                    cfg: CrawlConfig): String = {
    if (!cfg.useLodProcessor || cfg.licensePredicates.isEmpty)
      return CrawlState.Accepted
    val subjects = Set(docUrl) ++ contentLocation
    val licenses = triples.filter(t =>
      subjects.contains(t.subj) && cfg.licensePredicates.contains(t.pred) &&
      t.objIsResource).map(_.obj)
    if (licenses.exists(cfg.licenseBlacklist.contains)) CrawlState.Rejected
    else if (licenses.exists(l => cfg.licenseWhitelist.isEmpty ||
                                  cfg.licenseWhitelist.contains(l)))
      CrawlState.Accepted
    else CrawlState.Rejected
  }
}
