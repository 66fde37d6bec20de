package graft.sim

import java.nio.charset.StandardCharsets
import graft.core.{CrawlConfig, Step}
import graft.functions.Extract

/**
 * Deterministic synthetic web (FIXTURES.md §1-2): H hosts × P Turtle pages
 * with seeded cross-links, plus the special cases — redirect chain (E4),
 * 404, 5xx, Link headers (X10/E2), `;charset` content types (X8),
 * same-origin and cross-origin Content-Location (F4), ftp outlink (F1),
 * license triples (E5). Seeded PRNG → goldens are stable.
 */
object FixtureWeb {

  def url(h: Int, p: Int): String = s"http://host$h.example.org/page$p.ttl"

  val LicensePredicate = "http://purl.org/dc/terms/license"
  val GoodLicense      = "http://creativecommons.org/publicdomain/zero/1.0/"
  val BadLicense       = "http://example.org/proprietary-license"

  /** The standard fixture config: http/https whitelist, two-entry ctype
    * whitelist (avoiding the index-0 reference bug, content-types.c:198),
    * one fast and one slow host (FIXTURES.md §7). */
  def config(maxRounds: Int = 64, budget: Long = Long.MaxValue): CrawlConfig =
    CrawlConfig(
      schemeWhitelist = Seq("http", "https"),
      ctypeWhitelist = Seq("text/turtle", "application/rdf+xml",
        "text/html", "application/n-triples", "application/n-quads"),
      hostRateOverrides = Map(
        "http://host1.example.org/" -> 100,  // floored to 1 s (db.c:771-779)
        "http://host2.example.org/" -> 5000),
      maxRounds = maxRounds, budget = budget)

  def seeds: Seq[String] = Seq(
    url(0, 0),
    url(0, 0) + "#fragment",              // X2: dup after fragment strip
    "HTTP://Host1.Example.Org:80/page0.ttl", // X1: dup after canonicalization
    url(2, 0))

  private def turtle(self: String, outlinks: Seq[String],
                     license: Option[String], extra: String = ""): String = {
    val links =
      if (outlinks.isEmpty) ""
      else outlinks.map(o => s"<$o>").mkString(
        s"<$self> <http://purl.org/dc/terms/references> ", ", ", " .\n")
    val lic = license.map(l =>
      s"<$self> <$LicensePredicate> <$l> .\n").getOrElse("")
    s"""@prefix dct: <http://purl.org/dc/terms/> .
       |<$self> dct:title "Title of $self" .
       |$links$lic$extra""".stripMargin
  }

  private def entry(u: String, body: String, status: Int = 200,
                    ctype: String = "text/turtle", warcTs: Long = 900000L,
                    location: Option[String] = None,
                    contentLocation: Option[String] = None,
                    linkHeaders: Seq[String] = Nil): (String, Step.WebEntry) =
    u -> Step.WebEntry(warcTs, body.getBytes(StandardCharsets.UTF_8),
      // raw CRLF header block — every simulated fetch now exercises the
      // X7 parser (status line under ":", duplicate-fold, CR trim)
      graft.functions.Headers.renderHeaderBlock(status, ctype, location,
        contentLocation, linkHeaders))

  /** Generate the fixture web. */
  def generate(hosts: Int = 5, pagesPerHost: Int = 6,
               seed: Long = 42L): Map[String, Step.WebEntry] = {
    val rnd = new java.util.Random(seed)
    val b   = Map.newBuilder[String, Step.WebEntry]

    for (h <- 0 until hosts; p <- 0 until pagesPerHost) {
      val self = url(h, p)
      (h, p) match {
        case (0, 1) => // E4: redirect chain 301 → page2
          b += entry(self, "", status = 301, location = Some(url(0, 2)))
        case (1, 1) => // 404 with an html error body
          b += entry(self, "<html><body>not here</body></html>",
            status = 404, ctype = "text/html")
        case (2, 1) => // 5xx
          b += entry(self, "oops", status = 503, ctype = "text/plain")
        case (3, 1) => // F2: non-whitelisted content type
          b += entry(self, "key: value", ctype = "application/json")
        case (4, 1) => // X10/E2: Link headers carrying extra outlinks — two
          // separate header lines, so X7's duplicate-fold runs in-trace
          b += entry(self,
            turtle(self, Seq(url(4, 2)), None),
            linkHeaders = Seq(
              s"""<${url(0, 3)}>; rel="describedby"""",
              "</page4.ttl>; rel=next"))
        case (3, 2) => // F4: same-origin Content-Location honored
          b += entry(self, turtle(self, Seq(url(3, 3)), Some(GoodLicense)),
            ctype = "text/turtle; charset=utf-8", // X8
            contentLocation = Some(s"http://host3.example.org/canonical/$p"))
        case (4, 2) => // F4: cross-origin Content-Location dropped
          b += entry(self, turtle(self, Nil, Some(GoodLicense)),
            contentLocation = Some("http://evil.example.com/x"))
        case (2, 2) => // E5: blacklisted/absent license (rejected under LOD)
          b += entry(self, turtle(self, Seq(url(2, 3)), Some(BadLicense)))
        case (1, 2) => // F1: ftp outlink — enqueued, then SKIPPED at fetch
          b += entry(self, turtle(self,
            Seq("ftp://files.example.org/data.bin", url(1, 3)), None))
        case (3, 4) => // E1: genuine RDF/XML (NOT Turtle) — Description +
          // typed node + nested description + rdf:resource links
          b += entry(self,
            s"""<?xml version="1.0"?>
               |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:dct="http://purl.org/dc/terms/" xmlns:foaf="http://xmlns.com/foaf/0.1/">
               |<rdf:Description rdf:about="$self"><dct:title>RDF/XML page $self</dct:title><dct:references rdf:resource="${url(3, 5)}"/><dct:references rdf:resource="/page0.ttl"/></rdf:Description>
               |<foaf:Document rdf:about="canonical/34"><dct:creator><rdf:Description rdf:about="${url(0, 4)}"><dct:title>nested</dct:title></rdf:Description></dct:creator></foaf:Document>
               |</rdf:RDF>""".stripMargin,
            ctype = "application/rdf+xml")
        case (2, 4) => // E1: genuine N-Quads with a 4th (graph) term —
          // discarded by the parser (rdf.c:231-235; context off-statement)
          b += entry(self,
            s"""<$self> <http://purl.org/dc/terms/title> "NQ page" <http://graphs.example.org/g1> .
               |<$self> <http://purl.org/dc/terms/references> <${url(2, 5)}> <http://graphs.example.org/g1> .
               |<$self> <http://purl.org/dc/terms/references> <${url(4, 0)}> .
               |""".stripMargin,
            ctype = "application/n-quads")
        case _ =>
          // seeded cross-links: 1-3 outlinks to random (host, page)
          val n = 1 + rnd.nextInt(3)
          val links = (0 until n).map { _ =>
            url(rnd.nextInt(hosts), rnd.nextInt(pagesPerHost))
          }.distinct.filterNot(_ == self)
          val lic = if (rnd.nextInt(3) == 0) Some(GoodLicense) else None
          b += entry(self, turtle(self, links, lic))
      }
    }
    // an old page for the 304-on-refetch path (warc_ts far in the past so
    // any If-Modified-Since beats it)
    b += entry(url(0, 5) + "old", turtle(url(0, 5) + "old", Nil, None),
      warcTs = 1L)
    // robots.txt for host2 (only consulted when cfg.robotsEnabled; the
    // url is never linked, so disabled-mode traces are unaffected).
    // Semantics: Disallow the /page3 and /page5 prefixes, with a longer
    // Allow carve-out that re-permits exactly /page5.ttl.
    b += entry("http://host2.example.org/robots.txt",
      "# fixture robots\nUser-agent: *\nDisallow: /page3\n" +
        "Disallow: /page5\nAllow: /page5.ttl\n",
      ctype = "text/plain")
    b.result()
  }

  /** The `fetch_meta` rows implied by the web — the raw header envelope
    * side of the at-rest source shape (CrawlRound.webFromTables). */
  def fetchMetaRows(web: Map[String, Step.WebEntry])
      : Seq[graft.core.FetchMeta] =
    web.toSeq.sortBy(_._1).map { case (u, w) =>
      graft.core.FetchMeta(u, w.headersRaw)
    }

  /** The input `pages` rows implied by the web — text column is the golden
    * extraction (byte-identity contract, input_hint). */
  def pagesRows(web: Map[String, Step.WebEntry])
      : Seq[(String, Long, Array[Byte], String, String)] =
    web.toSeq.sortBy(_._1).map { case (u, w) =>
      val parser = graft.functions.Headers.parserFor(
        graft.functions.Headers.normalizeContentType(w.contentType))
      val text = parser match {
        case Some("html") => Extract.htmlText(
          new String(w.body, StandardCharsets.UTF_8))
        case Some(p)      => Extract.extract(u, w.body, p)._1
        case None         => ""
      }
      (u, w.warcTs, w.body, text, "en")
    }
}
