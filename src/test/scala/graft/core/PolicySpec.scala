package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Extract.Triple

class PolicySpec extends AnyFunSuite {
  val cfg = CrawlConfig()

  test("F1: whitelist pass / miss / blacklist (schemes.c:133-170)") {
    assert(Policy.schemePolicy("http://e.org/", cfg) == CrawlState.Accepted)
    assert(Policy.schemePolicy("HTTPS://e.org/", cfg) == CrawlState.Accepted)
    assert(Policy.schemePolicy("ftp://e.org/x", cfg) == CrawlState.Skipped)
    val bl = cfg.copy(schemeBlacklist = Seq("ftp"))
    assert(Policy.schemePolicy("ftp://e.org/x", bl) == CrawlState.Rejected)
    assert(Policy.schemePolicy("not a url", cfg) == CrawlState.Failed)
  }

  test("F1: empty whitelist admits everything (schemes.c:148 n=1 quirk is " +
       "correct there — any match passes)") {
    val open = cfg.copy(schemeWhitelist = Nil)
    assert(Policy.schemePolicy("gopher://e.org/", open) == CrawlState.Accepted)
  }

  test("F2: 3xx → SKIPPED_COMMIT keeps the object (content-types.c:161-164)") {
    val d = Policy.contentTypePolicy(301, "text/html", cfg)
    assert(d.state == CrawlState.SkippedCommit && d.status == 301)
  }

  test("F2: whitelist miss forces 406 SKIPPED; blacklist 406 REJECTED " +
       "(content-types.c:198,206,218 — intended semantics: any match " +
       "passes, including index 0, unlike the reference's n=c bug)") {
    val wl = cfg.copy(ctypeWhitelist = Seq("text/turtle", "text/html"))
    // index-0 whitelist entry MUST pass (the reference bug would fail it)
    assert(Policy.contentTypePolicy(200, "text/turtle; charset=utf-8", wl) ==
      Policy.CtypeDecision(200, CrawlState.Accepted))
    assert(Policy.contentTypePolicy(200, "application/json", wl) ==
      Policy.CtypeDecision(406, CrawlState.Skipped))
    val bl = cfg.copy(ctypeBlacklist = Seq("application/json"))
    assert(Policy.contentTypePolicy(200, "application/json ; x", bl) ==
      Policy.CtypeDecision(406, CrawlState.Rejected))
  }

  test("E5: license filter (lod.c:57-231)") {
    val lodCfg = cfg.copy(useLodProcessor = true,
      licensePredicates = Seq("http://purl.org/dc/terms/license"),
      licenseWhitelist = Seq("http://ok.org/lic"),
      licenseBlacklist = Seq("http://bad.org/lic"))
    val doc = "http://e.org/d"
    def lic(o: String) =
      Triple(doc, "http://purl.org/dc/terms/license", o, objIsResource = true)
    assert(Policy.licensePolicy(doc, None, Seq(lic("http://ok.org/lic")),
      lodCfg) == CrawlState.Accepted)
    assert(Policy.licensePolicy(doc, None, Seq(lic("http://bad.org/lic")),
      lodCfg) == CrawlState.Rejected)
    assert(Policy.licensePolicy(doc, None, Nil, lodCfg) == CrawlState.Rejected)
    assert(Policy.licensePolicy(doc, None, Seq(lic("http://other.org/")),
      lodCfg) == CrawlState.Rejected)
    // license asserted on the Content-Location subject counts too
    val cl = "http://e.org/canonical"
    assert(Policy.licensePolicy(doc, Some(cl),
      Seq(Triple(cl, "http://purl.org/dc/terms/license", "http://ok.org/lic",
        true)), lodCfg) == CrawlState.Accepted)
    // LOD disabled → always accepted (processor 'rdf' vs 'lod', crawld.c:123)
    assert(Policy.licensePolicy(doc, None, Nil, cfg) == CrawlState.Accepted)
  }
}
