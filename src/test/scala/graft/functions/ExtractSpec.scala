package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class ExtractSpec extends AnyFunSuite {
  import Extract._

  private def ttl(s: String) = parseTurtle(s, "http://e.org/doc")

  test("E1: turtle subset — prefixes, 'a', literals, ; and , continuations") {
    val ts = ttl(
      """@prefix dct: <http://purl.org/dc/terms/> .
        |<http://e.org/doc> a <http://e.org/Type> ;
        |  dct:title "Hello \"world\"" ;
        |  dct:references <http://e.org/a>, </b> .
        |""".stripMargin)
    assert(ts == Vector(
      Triple("http://e.org/doc", RdfType, "http://e.org/Type", true),
      Triple("http://e.org/doc", "http://purl.org/dc/terms/title",
        "Hello \"world\"", false),
      Triple("http://e.org/doc", "http://purl.org/dc/terms/references",
        "http://e.org/a", true),
      Triple("http://e.org/doc", "http://purl.org/dc/terms/references",
        "http://e.org/b", true)))
  }

  test("E1: relative URIs resolved against base; empty <> is the doc") {
    val ts = ttl("<> <http://p.org/p> <../x> .")
    assert(ts == Vector(
      Triple("http://e.org/doc", "http://p.org/p", "http://e.org/x", true)))
  }

  test("E1: lang tags and datatypes consumed") {
    val ts = ttl("""<> <http://p.org/p> "hi"@en . <> <http://p.org/q> "1"^^<http://www.w3.org/2001/XMLSchema#int> .""")
    assert(ts.map(_.obj) == Vector("hi", "1"))
  }

  test("E1: comments skipped; malformed tail stops cleanly (librdf-style)") {
    val ts = ttl("# comment\n<> <http://p.org/p> <http://x.org/> .\n<<<garbage")
    assert(ts.size == 1)
  }

  test("E1: extracted text is N-Triples serialization in document order") {
    val (text, ts) = extract("http://e.org/doc",
      """<> <http://p.org/p> "v" . <> <http://p.org/q> <http://x.org/> ."""
        .getBytes(StandardCharsets.UTF_8), "turtle")
    assert(ts.size == 2)
    assert(text ==
      "<http://e.org/doc> <http://p.org/p> \"v\" .\n" +
      "<http://e.org/doc> <http://p.org/q> <http://x.org/> .")
  }

  test("E1: rdf/xml — Description/about, rdf:resource, literal, relative URIs") {
    val ts = parseRdfXml(
      """<?xml version="1.0"?>
        |<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:dct="http://purl.org/dc/terms/">
        |<rdf:Description rdf:about="http://e.org/doc"><dct:title>T1</dct:title><dct:references rdf:resource="/a"/><dct:references rdf:resource="http://x.org/b"/></rdf:Description>
        |</rdf:RDF>""".stripMargin, "http://e.org/doc")
    assert(ts == Vector(
      Triple("http://e.org/doc", "http://purl.org/dc/terms/title", "T1", false),
      Triple("http://e.org/doc", "http://purl.org/dc/terms/references",
        "http://e.org/a", true),
      Triple("http://e.org/doc", "http://purl.org/dc/terms/references",
        "http://x.org/b", true)))
  }

  test("E1: rdf/xml — typed node emits rdf:type; nested Description emits " +
       "inner triples then the linking triple (raptor order)") {
    val ts = parseRdfXml(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:foaf="http://xmlns.com/foaf/0.1/" xmlns:dct="http://purl.org/dc/terms/">
        |<foaf:Document rdf:about="http://e.org/d"><dct:creator><rdf:Description rdf:about="http://e.org/alice"><foaf:name>Alice</foaf:name></rdf:Description></dct:creator></foaf:Document>
        |</rdf:RDF>""".stripMargin, "http://e.org/d")
    assert(ts == Vector(
      Triple("http://e.org/d", RdfType, "http://xmlns.com/foaf/0.1/Document", true),
      Triple("http://e.org/alice", "http://xmlns.com/foaf/0.1/name", "Alice", false),
      Triple("http://e.org/d", "http://purl.org/dc/terms/creator",
        "http://e.org/alice", true)))
  }

  test("E1: rdf/xml — malformed XML and blank (no-about) nodes handled") {
    assert(parseRdfXml("<rdf:RDF><unclosed", "http://e.org/") == Vector.empty)
    assert(parseRdfXml("not xml at all", "http://e.org/") == Vector.empty)
    // node without rdf:about (blank) is skipped, siblings still parse
    val ts = parseRdfXml(
      """<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" xmlns:d="http://p.org/">
        |<rdf:Description><d:p>anon</d:p></rdf:Description>
        |<rdf:Description rdf:about="http://e.org/x"><d:p rdf:resource="http://o.org/"/></rdf:Description>
        |</rdf:RDF>""".stripMargin, "http://e.org/")
    assert(ts == Vector(
      Triple("http://e.org/x", "http://p.org/p", "http://o.org/", true)))
  }

  test("E1: nquads — 4th graph term accepted and discarded; 3-term lines " +
       "still work; literals with lang/datatype/escapes") {
    val ts = parseNQuads(
      """# comment
        |<http://e.org/s> <http://p.org/p> <http://o.org/> <http://g.org/g1> .
        |<http://e.org/s> <http://p.org/t> "hi \"q\""@en <http://g.org/g1> .
        |<http://e.org/s> <http://p.org/u> "1"^^<http://www.w3.org/2001/XMLSchema#int> .
        |""".stripMargin, "http://e.org/s")
    assert(ts == Vector(
      Triple("http://e.org/s", "http://p.org/p", "http://o.org/", true),
      Triple("http://e.org/s", "http://p.org/t", "hi \"q\"", false),
      Triple("http://e.org/s", "http://p.org/u", "1", false)))
  }

  test("E1: nquads — malformed line aborts the stream, keeping the prefix") {
    val ts = parseNQuads(
      """<http://e.org/s> <http://p.org/p> <http://o.org/> .
        |<http://e.org/s> <http://p.org/p> .
        |<http://e.org/s> <http://p.org/q> <http://o2.org/> .
        |""".stripMargin, "http://e.org/s")
    assert(ts.size == 1)
  }

  test("E6: html text — tags stripped, scripts dropped, entities, ws-normalized") {
    val html = """<html><head><script>var x=1;</script><style>b{}</style></head>
      |<body><h1>Title</h1><p>Hello &amp; goodbye &lt;x&gt;.</p></body></html>"""
      .stripMargin
    assert(htmlText(html) == "Title Hello & goodbye <x>.")
  }

  test("E6: html links — href/src resolved, fragment-only skipped, deduped") {
    val html = """<a href="/a">A</a> <a href='b.html'>B</a>
      |<img src="/a"> <a href="#frag">skip</a> <a href="http://x.org/c">C</a>"""
      .stripMargin
    assert(htmlLinks(html, "http://e.org/dir/page") == Vector(
      "http://e.org/a", "http://e.org/dir/b.html", "http://x.org/c"))
  }

  test("E3: harvest all three positions, resource nodes only, first-seen " +
       "order dedup (rdf.c:316-327,601-635)") {
    val ts = Vector(
      Triple("http://s.org/1", "http://p.org/p", "lit", false),
      Triple("http://s.org/1", "http://p.org/p", "http://o.org/1", true),
      Triple("http://s.org/2", "http://p.org/p", "http://s.org/1", true))
    assert(harvestOutlinks(ts) == Vector(
      "http://s.org/1", "http://p.org/p", "http://o.org/1", "http://s.org/2"))
  }

  test("byte-identity: extract is deterministic (same bytes in → same text)") {
    val body = FixtureBody.sample.getBytes(StandardCharsets.UTF_8)
    val a = extract("http://e.org/d", body, "turtle")._1
    val b = extract("http://e.org/d", body, "turtle")._1
    assert(a == b)
    assert(a.nonEmpty)
  }
}

object FixtureBody {
  val sample: String =
    """@prefix dct: <http://purl.org/dc/terms/> .
      |<> dct:title "Sample" ; dct:references <http://other.org/x> .
      |""".stripMargin
}
