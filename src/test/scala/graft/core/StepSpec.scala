package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets
import graft.core.Step._

class StepSpec extends AnyFunSuite {
  val cfg = CrawlConfig(ctypeWhitelist =
    Seq("text/turtle", "text/html", "application/rdf+xml"))
  val now = 1000000L
  val url = "http://e.org/doc"

  def web(status: Int = 200, body: String = "<> <http://p.org/p> <http://o.org/> .",
          ctype: String = "text/turtle", warcTs: Long = 1L,
          location: Option[String] = None,
          contentLocation: Option[String] = None,
          linkHeaders: Seq[String] = Nil) =
    WebEntry(warcTs, body.getBytes(StandardCharsets.UTF_8),
      graft.functions.Headers.renderHeaderBlock(status, ctype, location,
        contentLocation, linkHeaders))

  test("200 RDF: fresh commit, ACCEPTED, ttl 86400, outlinks harvested") {
    val r = fetchAndProcess(url, CrawlState.New, now, None, Some(web()), cfg)
    assert(r.path == Path.Updated && r.state == CrawlState.Accepted)
    assert(r.ttlArg == 86400 && r.commit)
    assert(r.outlinks == Vector(url, "http://p.org/p", "http://o.org/"))
    assert(r.extractedText.contains(s"<$url> <http://p.org/p> <http://o.org/> ."))
  }

  test("504 (no web entry, no cache): committed then SKIPPED by processor " +
       "(fetch.c:144-150, rdf.c:167-173) — requires open ctype whitelist") {
    val r = fetchAndProcess(url, CrawlState.New, now, None, None,
      cfg.copy(ctypeWhitelist = Nil))
    assert(r.path == Path.Updated && r.status == 504)
    assert(r.state == CrawlState.Skipped && r.ttlArg == 604800)
  }

  test("504 with ctype whitelist: checkpoint 406 rollback, no cache → FAILED") {
    val r = fetchAndProcess(url, CrawlState.New, now, None, None, cfg)
    assert(r.path == Path.Failed && r.status == 406)
    assert(r.state == CrawlState.Skipped && !r.commit)
  }

  test("304 on refetch with cache → unchanged (fetch.c:160-163)") {
    val r = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(web(warcTs = 1L)), cfg)
    assert(r.path == Path.Unchanged && r.status == 304 && !r.commit)
  }

  test("FORCE skips If-Modified-Since → fresh 200 (fetch.c:85-95)") {
    val r = fetchAndProcess(url, CrawlState.Force, now,
      Some(CachedInfo(now - 100, 200)), Some(web(warcTs = 1L)), cfg)
    assert(r.path == Path.Updated && r.status == 200 && r.commit)
  }

  test("modified since cache → fresh 200 despite IMS") {
    val r = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(web(warcTs = now - 50)), cfg)
    assert(r.path == Path.Updated && r.status == 200)
  }

  test("5xx with cache → rollback → unchanged (fetch.c:164-172)") {
    val r = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(web(status = 503)), cfg)
    assert(r.path == Path.Unchanged && !r.commit)
  }

  test("5xx without cache → committed, processor SKIPs (open whitelist)") {
    val r = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(status = 503, ctype = "text/plain", body = "x y z")),
      cfg.copy(ctypeWhitelist = Nil))
    assert(r.path == Path.Updated && r.status == 503)
    assert(r.state == CrawlState.Skipped)
  }

  test("E4: 301 redirect enqueues target, SKIPPED, ttl 604800 " +
       "(processor.c:177-192)") {
    val r = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(status = 301, body = "", location = Some("/moved"))), cfg)
    assert(r.path == Path.Updated && r.state == CrawlState.Skipped)
    assert(r.outlinks == Vector("http://e.org/moved") && r.ttlArg == 604800)
  }

  test("E4: self-redirect not enqueued; dead redirect (no Location) logged") {
    val r = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(status = 302, body = "", location = Some(url))), cfg)
    assert(r.outlinks.isEmpty && r.state == CrawlState.Skipped)
    val r2 = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(status = 302, body = "")), cfg)
    assert(r2.outlinks.isEmpty && r2.state == CrawlState.Skipped)
  }

  test("F1: scheme-skipped never fetches; failed path ttl 86400 " +
       "(fetch.c:97-109, processor.c:246-261)") {
    val r = fetchAndProcess("ftp://files.org/x", CrawlState.New, now,
      None, None, cfg)
    assert(r.path == Path.Failed && r.state == CrawlState.Skipped)
    assert(r.ttlArg == 86400 && r.status == 0)
  }

  test("F2: non-whitelisted ctype with cache → rollback → unchanged; " +
       "without cache → failed 406") {
    val w = web(ctype = "application/json", body = "{}")
    val r1 = fetchAndProcess(url, CrawlState.New, now, None, Some(w), cfg)
    assert(r1.path == Path.Failed && r1.status == 406 &&
      r1.state == CrawlState.Skipped)
    val r2 = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(w), cfg)
    assert(r2.path == Path.Unchanged)
  }

  test("F4: cross-origin Content-Location dropped; same-origin honored " +
       "as Link-header anchor (fetch.c:371-449, rdf.c:553-581)") {
    val sameOrigin = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(contentLocation = Some("/canonical"),
        linkHeaders = Seq("</next>; rel=next"))), cfg)
    assert(sameOrigin.outlinks.contains("http://e.org/canonical"))
    val crossOrigin = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(contentLocation = Some("http://evil.org/x"),
        linkHeaders = Seq("</next>; rel=next"))), cfg)
    assert(crossOrigin.outlinks.contains(url)) // anchor fell back to url
    assert(!crossOrigin.outlinks.exists(_.contains("evil.org")))
  }

  test("parse failure → FAILED (processor.c:204-208 via COS_ERR)") {
    val r = fetchAndProcess(url, CrawlState.New, now, None,
      Some(web(body = "<<<not turtle")), cfg)
    assert(r.path == Path.Updated && r.state == CrawlState.Failed)
  }

  test("html under rdf processor → SKIPPED; under extended mode → text+links") {
    val w = web(ctype = "text/html",
      body = """<html><body>Hi <a href="/x">x</a></body></html>""")
    val r = fetchAndProcess(url, CrawlState.New, now, None, Some(w), cfg)
    assert(r.state == CrawlState.Skipped)
    val r2 = fetchAndProcess(url, CrawlState.New, now, None, Some(w),
      cfg.copy(useHtmlProcessor = true))
    assert(r2.state == CrawlState.Accepted)
    assert(r2.extractedText.contains("Hi x"))
    assert(r2.outlinks == Vector("http://e.org/x"))
  }

  test("E5: LOD processor rejects unlicensed pages") {
    val lodCfg = cfg.copy(useLodProcessor = true,
      licensePredicates = Seq("http://purl.org/dc/terms/license"),
      licenseWhitelist = Seq("http://ok.org/lic"))
    val r = fetchAndProcess(url, CrawlState.New, now, None, Some(web()), lodCfg)
    assert(r.state == CrawlState.Rejected && r.outlinks.isEmpty)
    val licensed = web(body =
      s"""<> <http://purl.org/dc/terms/license> <http://ok.org/lic> .""")
    val r2 = fetchAndProcess(url, CrawlState.New, now, None, Some(licensed), lodCfg)
    assert(r2.state == CrawlState.Accepted)
  }

  // ----------------------------------------------------- update arithmetic

  test("A2: politeness advance — floor 1 s, monotonic (db.c:762-790)") {
    val h = HostEntry("rh", "http://e.org/", 0, None, now - 5, 100, None)
    assert(Step.politenessAdvance(h, now).earliest_update == now + 1)
    assert(Step.politenessAdvance(h.copy(rate = 5000), now)
      .earliest_update == now + 5)
    assert(Step.politenessAdvance(h.copy(earliest_update = now + 99), now)
      .earliest_update == now + 99)
  }

  val fe = FrontierEntry("h", 1L, 1, "rh", url, CrawlState.New, 0, None,
    None, None, next_fetch = 0, error_count = 5, soft_error_count = 3,
    last_ttl = 0)

  test("A3: TTL floors + monotonic next_fetch (db.c:962-990)") {
    val ok = Step.frontierUpdated(fe, now, 200, 60, CrawlState.Accepted)
    assert(ok.next_fetch == now + 3600) // 200 floor 1h
    val nf = Step.frontierUpdated(fe, now, 404, 60, CrawlState.Skipped)
    assert(nf.next_fetch == now + 86400) // non-200 floor 24h
    val acc = Step.frontierUpdated(fe, now, 200, 86400, CrawlState.Accepted)
    assert(acc.next_fetch == now + 86400)
    val guard = Step.frontierUpdated(fe.copy(next_fetch = now + 999999),
      now, 200, 60, CrawlState.Accepted)
    assert(guard.next_fetch == now + 999999) // monotonic
  }

  test("A5: error counters — 499 and 599 fall through to reset " +
       "(db.c:1032-1055 `< 499` / `< 599`)") {
    assert(Step.frontierUpdated(fe, now, 404, 60, CrawlState.Skipped)
      .error_count == 6)
    val s5 = Step.frontierUpdated(fe, now, 503, 60, CrawlState.Skipped)
    assert(s5.error_count == 0 && s5.soft_error_count == 4)
    val s499 = Step.frontierUpdated(fe, now, 499, 60, CrawlState.Skipped)
    assert(s499.error_count == 0 && s499.soft_error_count == 0)
    val s599 = Step.frontierUpdated(fe, now, 599, 60, CrawlState.Skipped)
    assert(s599.error_count == 0 && s599.soft_error_count == 0)
    val ok = Step.frontierUpdated(fe, now, 200, 60, CrawlState.Accepted)
    assert(ok.error_count == 0 && ok.soft_error_count == 0)
  }

  test("state persistence mapping: ERR/FAILED→FAILED, SKIPPED_COMMIT→SKIPPED " +
       "(db.c:981-1003)") {
    assert(Step.frontierUpdated(fe, now, 200, 60, CrawlState.Err).state ==
      CrawlState.Failed)
    assert(Step.frontierUpdated(fe, now, 301, 60, CrawlState.SkippedCommit)
      .state == CrawlState.Skipped)
  }

  test("A4 quirk: updated-path root earliest_update is max(eu, now), NOT " +
       "now+2 — stale tm (db.c:1017-1027)") {
    val h = HostEntry("rh", "http://e.org/", 0, None, now - 5, 1000, None)
    val u = Step.rootUpdated(h, now)
    assert(u.earliest_update == now && u.last_updated.contains(now))
    // but the politeness advance from dequeue survives (guarded update)
    val advanced = Step.politenessAdvance(h, now)
    assert(Step.rootUpdated(advanced, now).earliest_update == now + 1)
  }

  test("A4: unchanged-path arithmetic — unconditional eu=now+2, " +
       "next_fetch=now+2+2h, errors reset (db.c:1077-1126)") {
    val h = HostEntry("rh", "http://e.org/", 0, None, now + 99, 1000, None)
    val u = Step.rootUnchanged(h, now)
    assert(u.earliest_update == now + 2) // unconditional SET — can go DOWN
    val f = Step.frontierUnchanged(fe, now, error = false)
    assert(f.next_fetch == now + 2 + 7200 && f.error_count == 0)
    assert(f.state == fe.state) // state untouched
    val fErr = Step.frontierUnchanged(fe, now, error = true)
    assert(fErr.next_fetch == now + 2 + 604800 && fErr.error_count == 6)
  }

  test("header cap: ≥8192-byte raw block aborts the transfer — failed " +
       "without cache, rollback→unchanged with cache (fetch.c:28,262-281)") {
    val fat = web(linkHeaders = Seq("</x>; rel=\"" + "a" * 9000 + "\""))
    assert(fat.headersRaw.length >= 8192)
    // no cache: abort ≙ curl error ≙ the web=None path → 406 under the
    // ctype whitelist (mirrors the "504 with ctype whitelist" case)
    val r1 = fetchAndProcess(url, CrawlState.New, now, None, Some(fat), cfg)
    assert(r1.path == Path.Failed && !r1.commit && r1.outlinks.isEmpty)
    // with cache: status 504 ≥ 500 → rollback → unchanged
    val r2 = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(fat), cfg)
    assert(r2.path == Path.Unchanged && !r2.commit)
    // open whitelist, no cache: committed 504, processor SKIPs — identical
    // to the recorded no-web-entry behavior
    val r3 = fetchAndProcess(url, CrawlState.New, now, None, Some(fat),
      cfg.copy(ctypeWhitelist = Nil))
    assert(r3.path == Path.Updated && r3.status == 504 &&
      r3.state == CrawlState.Skipped)
  }

  test("header cap boundary: 8191-byte block still fetches (128-byte alloc " +
       "granularity divides 8192 — p_libcrawl.h:77, fetch.c:262-267)") {
    val base = web()
    val pad = 8191 - base.headersRaw.length - "X-Pad: \r\n".length
    val exact = WebEntry(base.warcTs, base.body,
      base.headersRaw + "X-Pad: " + "p" * pad + "\r\n")
    assert(exact.headersRaw.length == 8191)
    val r = fetchAndProcess(url, CrawlState.New, now, None, Some(exact), cfg)
    assert(r.path == Path.Updated && r.status == 200 && r.commit)
  }

  test("F6: cache_min gate — cached copy younger than cacheMin short-" +
       "circuits to unchanged without fetching; FORCE bypasses " +
       "(fetch.c:76-84)") {
    val cfgMin = cfg.copy(cacheMin = 300L)
    val w = web(warcTs = now - 10) // modified since cache → would refetch
    val r = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(w), cfgMin)
    assert(r.path == Path.Unchanged && !r.commit && r.status == 200)
    // cache older than the window → normal fetch proceeds
    val r2 = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 400, 200)), Some(w), cfgMin)
    assert(r2.path == Path.Updated && r2.status == 200)
    // FORCE ignores the gate (fetch.c:77 `!(flags & COF_FORCE)`)
    val r3 = fetchAndProcess(url, CrawlState.Force, now,
      Some(CachedInfo(now - 100, 200)), Some(w), cfgMin)
    assert(r3.path == Path.Updated && r3.commit)
    // default cacheMin=0 keeps the gate closed (reference practice)
    val r4 = fetchAndProcess(url, CrawlState.Accepted, now,
      Some(CachedInfo(now - 100, 200)), Some(w), cfg)
    assert(r4.path == Path.Updated)
  }

  test("J2: newFrontierEntry canonicalizes, strips fragment, derives keys") {
    val e = Step.newFrontierEntry("HTTP://E.org:80/a#f", now, force = false).get
    assert(e.url == "http://e.org/a" && e.state == CrawlState.New)
    assert(e.url_hash == graft.functions.Urls.urlHash("http://e.org/a"))
    assert(e.root_hash == graft.functions.Urls.urlHash("http://e.org/"))
    assert(e.next_fetch == now && e.added == now)
    assert(Step.newFrontierEntry("mailto:x@y", now, force = false).isEmpty)
  }
}
