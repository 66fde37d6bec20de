package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class RobotsSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(StandardCharsets.UTF_8)

  test("parse: star group only, comments, case-insensitive keys") {
    val r = Robots.parse(b(
      """# robots
        |User-Agent: googlebot
        |Disallow: /google-only
        |
        |user-agent: *
        |disallow: /private   # trailing comment
        |Allow: /private/ok
        |Disallow:
        |""".stripMargin))
    assert(r.disallow == Vector("/private"))
    assert(r.allow == Vector("/private/ok"))
  }

  test("parse: consecutive user-agent lines form one group (RFC 9309 §2.1)") {
    val r = Robots.parse(b(
      """User-agent: googlebot
        |User-agent: *
        |Disallow: /both
        |User-agent: bingbot
        |Disallow: /bing-only
        |""".stripMargin))
    assert(r.disallow == Vector("/both"))
  }

  test("allowed: longest match wins, Allow wins ties") {
    val r = Robots.Rules(Vector("/a", "/a/b/c"), Vector("/a/b"))
    assert(!Robots.allowed(r, "/a/x"))       // /a disallow
    assert(Robots.allowed(r, "/a/b/x"))      // /a/b allow (longer)
    assert(!Robots.allowed(r, "/a/b/c/d"))   // /a/b/c disallow (longest)
    assert(Robots.allowed(r, "/elsewhere"))  // no match
    val tie = Robots.Rules(Vector("/p"), Vector("/p"))
    assert(Robots.allowed(tie, "/p/x"))      // tie → allow
  }

  test("urlAllowed: missing robots allows; robots.txt itself always allowed") {
    assert(Robots.urlAllowed("http://h/x", None))
    val body = b("User-agent: *\nDisallow: /\n")
    assert(!Robots.urlAllowed("http://h/x", Some(body)))
    assert(Robots.urlAllowed("http://h/robots.txt", Some(body)))
  }

  test("urlAllowed: query string participates in the path match") {
    val body = b("User-agent: *\nDisallow: /search?q=\n")
    assert(!Robots.urlAllowed("http://h/search?q=x", Some(body)))
    assert(Robots.urlAllowed("http://h/search", Some(body)))
  }
}
