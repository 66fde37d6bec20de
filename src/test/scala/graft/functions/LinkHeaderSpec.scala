package graft.functions

import org.scalatest.funsuite.AnyFunSuite

class LinkHeaderSpec extends AnyFunSuite {

  test("X10: single link with quoted rel") {
    val ls = LinkHeader.parse("""<http://e.org/x>; rel="describedby"""")
    assert(ls == List(LinkHeader.Link("http://e.org/x",
      List("rel" -> "describedby"))))
  }

  test("X10: multiple comma-separated links, unquoted params") {
    val ls = LinkHeader.parse(
      """</a>; rel=next, <http://e.org/b>; rel="prev"; title="B, b"""")
    assert(ls.map(_.target) == List("/a", "http://e.org/b"))
    assert(ls.head.rels == List("next"))
    assert(ls(1).params.contains("title" -> "B, b")) // comma inside quotes
  }

  test("X10: multiple whitespace-separated rel names (RFC 5988 §5.5)") {
    val ls = LinkHeader.parse("""</x>; rel="next last"""")
    assert(ls.head.rels == List("next", "last"))
  }

  test("X10: quoted-string backslash escapes") {
    val ls = LinkHeader.parse("""</x>; title="a \"quoted\" title"; rel=up""")
    assert(ls.head.params.contains("title" -> """a "quoted" title"""))
    assert(ls.head.rels == List("up"))
  }

  test("X10 triples: rel resolution against the XHTML vocab, anchor default " +
       "(rdf.c:553-581)") {
    val ts = LinkHeader.triples(
      """</page2>; rel=next, <http://o.org/s>; rel="http://x.org/rel"""",
      "http://e.org/page1", contentLocation = None)
    assert(ts == List(
      LinkHeader.LinkTriple("http://e.org/page1",
        LinkHeader.XhtmlVocab + "next", "http://e.org/page2"),
      LinkHeader.LinkTriple("http://e.org/page1",
        "http://x.org/rel", "http://o.org/s")))
  }

  test("X10 triples: anchor param overrides; content-location default") {
    val ts = LinkHeader.triples("""</x>; rel=up; anchor="/anchor"""",
      "http://e.org/a", contentLocation = Some("http://e.org/cl"))
    assert(ts.head.anchor == "http://e.org/anchor")
    val ts2 = LinkHeader.triples("""</x>; rel=up""",
      "http://e.org/a", contentLocation = Some("http://e.org/cl"))
    assert(ts2.head.anchor == "http://e.org/cl")
  }

  test("X10: permissive on junk") {
    assert(LinkHeader.parse("junk, </ok>; rel=next").map(_.target) == List("/ok"))
    assert(LinkHeader.parse("<unterminated").isEmpty)
    assert(LinkHeader.parse(null).isEmpty)
  }
}
