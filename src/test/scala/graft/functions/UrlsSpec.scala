package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.Check.forAll

class UrlsSpec extends AnyFunSuite {

  test("X1 canonicalize: lowercase scheme/host, default port dropped") {
    assert(Urls.canonicalize("HTTP://Example.ORG:80/a").contains("http://example.org/a"))
    assert(Urls.canonicalize("https://example.org:443/").contains("https://example.org/"))
    assert(Urls.canonicalize("http://example.org:8080/a").contains("http://example.org:8080/a"))
    assert(Urls.canonicalize("http://example.org").contains("http://example.org/"))
  }

  test("X1 canonicalize: dot segments removed (RFC 3986 5.2.4)") {
    assert(Urls.canonicalize("http://e.org/a/b/../c").contains("http://e.org/a/c"))
    assert(Urls.canonicalize("http://e.org/a/./b").contains("http://e.org/a/b"))
    assert(Urls.canonicalize("http://e.org/../a").contains("http://e.org/a"))
    assert(Urls.canonicalize("http://e.org/a/..").contains("http://e.org/"))
  }

  test("X1 canonicalize: percent-encoding normalized") {
    assert(Urls.canonicalize("http://e.org/%7euser").contains("http://e.org/~user"))
    assert(Urls.canonicalize("http://e.org/a%2fb").contains("http://e.org/a%2Fb"))
    assert(Urls.canonicalize("http://e.org/%41").contains("http://e.org/A"))
  }

  test("X1 canonicalize idempotent (property)") {
    val gen = for {
      host <- Gen.oneOf("Example.org", "a.b.c", "X.COM:8080", "x.com:80")
      path <- Gen.oneOf("", "/", "/a/b", "/a/../b", "/%7e", "/a%2Fb/./c")
      q    <- Gen.oneOf("", "?x=1", "?a=%41")
      f    <- Gen.oneOf("", "#frag")
    } yield s"http://$host$path$q$f"
    forAll(gen) { u =>
      val c1 = Urls.canonicalize(u)
      assert(c1.isDefined)
      assert(Urls.canonicalize(c1.get) == c1)
    }
  }

  test("canonical-key fast path ≡ full canonicalization (property)") {
    // Every input, fast-form or not, must give exactly what the full RFC
    // machinery gives — the fast path may only skip work, never change
    // the result. Mix of fast-form urls, near-misses that must fall
    // through (uppercase host, ports, escapes, dot segments, fragments),
    // and generated combinations.
    val gen = for {
      scheme <- Gen.oneOf("http", "https", "HTTP")
      host   <- Gen.oneOf("example.org", "Example.org", "a-b.c1.de",
        "e.org:80", "e.org:8080", "u@e.org")
      path   <- Gen.oneOf("", "/", "/a/b.ttl", "/a//b", "/a/../b", "/./a",
        "/%41", "/a~_-9", "/a.", "/a..", "/..", "/...", "/a/..")
      q      <- Gen.oneOf("", "?x=1&y=2", "?a=%41", "?a/./b")
      f      <- Gen.oneOf("", "#frag")
    } yield s"$scheme://$host$path$q$f"
    forAll(gen) { u =>
      val viaFull = Urls.canonicalizeSlow(Urls.stripFragment(u))
      assert(Urls.canonicalKeyUrl(u) == viaFull, u)
      // canonicalize's own fast path must equal the full machinery, and
      // resolve's absolute-ref fast path must equal canonicalize
      assert(Urls.canonicalize(u) == Urls.canonicalizeSlow(u), u)
      assert(Urls.resolve("http://unrelated.example/", u) ==
        Urls.canonicalizeSlow(u), u)
      val fullRoot = Urls.parse(u).map { p =>
        val port = p.port.filter(x => !p.defaultPort.contains(x))
        s"${p.scheme}://${p.host}${port.map(":" + _).getOrElse("")}/"
      }
      assert(Urls.canonicalRoot(u) == fullRoot, u)
    }
    // the canonical forms themselves must take the fast path unchanged
    Seq("http://e.org/a/b.ttl", "https://a-1.b.c/x?y=1&z=2",
      "http://e.org/a...b/c.", "http://h/doc7.ttl").foreach { u =>
      assert(Urls.canonicalKeyUrl(u).contains(u), u)
    }
  }

  test("X2 fragment strip") {
    assert(Urls.stripFragment("http://e.org/a#b#c") == "http://e.org/a")
    assert(Urls.stripFragment("http://e.org/a") == "http://e.org/a")
    assert(Urls.canonicalKeyUrl("http://e.org/a#frag").contains("http://e.org/a"))
  }

  test("X4/K5 canonicalRoot preserves non-default port (db.c:840-845)") {
    assert(Urls.canonicalRoot("http://E.org/a/b?q#f").contains("http://e.org/"))
    assert(Urls.canonicalRoot("http://e.org:8080/a").contains("http://e.org:8080/"))
    assert(Urls.canonicalRoot("https://e.org:443/a").contains("https://e.org/"))
  }

  test("K1 url_hash: known SHA-256 vector, 32 hex chars (cache.c:103-129)") {
    // sha256("http://example.org/") =
    // cc28615d5b4fa4d765b54eeb0d4e9bfbff7fd05ab49ab3d4e3e9d0de558e8f04... verify via MessageDigest
    val h = Urls.urlHash("http://example.org/")
    assert(h.length == 32)
    assert(h.matches("[0-9a-f]{32}"))
    val full = java.security.MessageDigest.getInstance("SHA-256")
      .digest("http://example.org/".getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    assert(h == full.substring(0, 32))
  }

  test("K2/K3 shorthash + tinyhash (db.c:836-838, :1252)") {
    val h = "ff0000ab" + "0" * 24
    assert(Urls.shorthash(h) == 0xff0000abL) // unsigned 32-bit, no overflow
    assert(Urls.tinyhash(h) == (0xff0000abL % 256).toInt)
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { s =>
      val hash = Urls.urlHash(s"http://e.org/$s")
      val sh   = Urls.shorthash(hash)
      assert(sh >= 0 && sh <= 0xffffffffL)
      assert(Urls.tinyhash(hash) == (sh % 256).toInt)
    }
  }

  test("F4/X11 same-origin with 80/443 defaulting (fetch.c:371-413)") {
    assert(Urls.sameOrigin("http://e.org/a", "http://E.ORG:80/b"))
    assert(Urls.sameOrigin("https://e.org/a", "https://e.org:443/b"))
    assert(!Urls.sameOrigin("http://e.org/a", "https://e.org/a"))
    assert(!Urls.sameOrigin("http://e.org/a", "http://e.org:8080/a"))
    assert(!Urls.sameOrigin("http://e.org/a", "http://other.org/a"))
  }

  test("resolve: RFC 3986 5.4 reference cases") {
    val base = "http://a/b/c/d;p?q"
    assert(Urls.resolve(base, "g").contains("http://a/b/c/g"))
    assert(Urls.resolve(base, "./g").contains("http://a/b/c/g"))
    assert(Urls.resolve(base, "/g").contains("http://a/g"))
    assert(Urls.resolve(base, "//g").contains("http://g/"))
    assert(Urls.resolve(base, "../g").contains("http://a/b/g"))
    assert(Urls.resolve(base, "../../g").contains("http://a/g"))
    assert(Urls.resolve(base, "#s").contains("http://a/b/c/d;p?q#s"))
    assert(Urls.resolve(base, "?y").contains("http://a/b/c/d;p?y"))
    assert(Urls.resolve(base, "http://x/y").contains("http://x/y"))
  }

  test("X3 scheme extract") {
    assert(Urls.scheme("HTTP://e.org/").contains("http"))
    assert(Urls.scheme("mailto:a@b").contains("mailto"))
    assert(Urls.scheme("no-scheme-here").isEmpty)
    assert(Urls.scheme("/relative/path").isEmpty)
  }

  test("mailto/non-hierarchical URIs are not frontier-insertable " +
       "(db_uristr_key_root fails on rootless URIs, db.c:840-857)") {
    assert(Urls.canonicalKeyUrl("mailto:user@example.org").isEmpty)
  }
}
