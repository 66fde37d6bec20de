package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class HeadersSpec extends AnyFunSuite {

  test("X7: header block parse — status line under ':' key (fetch.c:519)") {
    val raw = "HTTP/1.1 200 OK\r\nContent-Type: text/turtle\r\n" +
      "Set-Cookie: a=1\r\nSet-Cookie: b=2\r\nX-Empty:\r\n"
    val hs = Headers.parseHeaderBlock(raw)
    assert(hs(Headers.StatusKey) == Seq("HTTP/1.1 200 OK"))
    assert(hs("Content-Type") == Seq("text/turtle"))
    assert(hs("Set-Cookie") == Seq("a=1", "b=2")) // duplicates fold to array
    assert(hs("X-Empty") == Seq(""))
    assert(Headers.statusCode(hs).contains(200))
  }

  test("X7: LF-only blocks, malformed lines skipped, value space trimmed") {
    val hs = Headers.parseHeaderBlock(
      "HTTP/1.0 304 Not Modified\nLast-Modified:  Mon, 01 Jan 2024\njunkline\n")
    assert(Headers.statusCode(hs).contains(304))
    assert(hs("Last-Modified") == Seq(" Mon, 01 Jan 2024")) // single space stripped
    assert(hs.size == 2)
  }

  test("case-insensitive lookup, last value wins") {
    val hs = Headers.parseHeaderBlock("HTTP/1.1 200 OK\nX-A: 1\nx-a: 2\n")
    assert(Headers.header(hs, "X-A").contains("2"))
    assert(Headers.header(hs, "x-A").contains("2"))
  }

  test("X8: content-type normalize (content-types.c:170-189)") {
    assert(Headers.normalizeContentType("text/turtle; charset=utf-8") == "text/turtle")
    assert(Headers.normalizeContentType("Text/HTML ; q=1") == "text/html")
    assert(Headers.normalizeContentType("text/plain") == "text/plain")
    assert(Headers.normalizeContentType(null) == "")
  }

  test("X12: content-type → parser name (rdf.c:208-239)") {
    assert(Headers.parserFor("text/turtle").contains("turtle"))
    assert(Headers.parserFor("text/n3").contains("turtle"))
    assert(Headers.parserFor("application/rdf+xml").contains("rdfxml"))
    assert(Headers.parserFor("text/plain").contains("ntriples"))
    assert(Headers.parserFor("application/n-triples").contains("ntriples"))
    assert(Headers.parserFor("application/n-quads").contains("nquads"))
    assert(Headers.parserFor("text/x-nquads").contains("nquads"))
    assert(Headers.parserFor("application/json").isEmpty)
  }

  test("X9: SQL timestamp format UTC (db.c:958-961)") {
    assert(Headers.formatSqlTs(0) == "1970-01-01 00:00:00")
    assert(Headers.formatSqlTs(1000000) == "1970-01-12 13:46:40")
  }
}
