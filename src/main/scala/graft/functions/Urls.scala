package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * URL parsing, canonicalization and key derivation.
 *
 * Re-specifies (as pure Scala, from public RFC 3986 semantics) what the
 * reference delegates to liburi:
 *  - X1 canonicalization round-trip (reference: libspider/queues/db.c:818-826,
 *    libcrawl/fetch.c:426-449)
 *  - X2 fragment strip (libcrawl/cache.c:113-118, db.c:806-810)
 *  - X3 scheme extract (libspider/policies/schemes.c:140)
 *  - X4 root URL derive — "/" resolved against the URI (db.c:840-845)
 *  - K1 url_hash = lowercase-hex SHA-256 truncated to 32 chars
 *    (libcrawl/cache.c:103-129, CACHE_KEY_LEN libcrawl/libcrawl.h:70-72)
 *  - K2 shorthash = first 8 hex chars parsed base-16 (db.c:836-838)
 *  - K3 tinyhash = shorthash % 256 (db.c:1252)
 *  - F4/X11 same-origin predicate with 80/443 port defaulting
 *    (libcrawl/fetch.c:371-413)
 *
 * These functions are the single source of truth shared by the Spark engine,
 * the reference simulator and the fixture generator, so the byte-identity
 * invariants hold by construction and are pinned by unit tests.
 */
object Urls {

  final case class ParsedUrl(
      scheme: String,
      userinfo: Option[String],
      host: String,
      port: Option[Int],
      path: String,
      query: Option[String],
      fragment: Option[String]) {

    def defaultPort: Option[Int] = Urls.defaultPort(scheme)

    /** Effective port after scheme defaulting (fetch.c:389-399 semantics). */
    def effectivePort: Int = port.orElse(defaultPort).getOrElse(-1)

    def authority: String = {
      val ui = userinfo.map(_ + "@").getOrElse("")
      val p  = port.map(":" + _).getOrElse("")
      ui + host + p
    }

    def render: String = {
      val q = query.map("?" + _).getOrElse("")
      val f = fragment.map("#" + _).getOrElse("")
      s"$scheme://$authority$path$q$f"
    }
  }

  def defaultPort(scheme: String): Option[Int] = scheme match {
    case "http"  => Some(80)
    case "https" => Some(443)
    case "ftp"   => Some(21)
    case _       => None
  }

  // RFC 3986 appendix B regex.
  private val UrlRe =
    """^(([^:/?#]+):)?(//([^/?#]*))?([^?#]*)(\?([^#]*))?(#(.*))?""".r

  /** Parse an absolute hierarchical URL; None if no scheme or no host. */
  def parse(s: String): Option[ParsedUrl] = s.trim match {
    case UrlRe(_, scheme, auth0, authority, path, _, query, _, fragment)
        if scheme != null && auth0 != null =>
      val (ui, hostPort) = authority.lastIndexOf('@') match {
        case -1 => (None, authority)
        case i  => (Some(authority.substring(0, i)), authority.substring(i + 1))
      }
      val (host, port) = hostPort.lastIndexOf(':') match {
        case -1 => (hostPort, None)
        case i =>
          val ps = hostPort.substring(i + 1)
          if (ps.isEmpty) (hostPort.substring(0, i), None)
          else if (ps.forall(_.isDigit))
            (hostPort.substring(0, i), Some(ps.toInt))
          else (hostPort, None) // IPv6 w/o port or junk: keep as-is
      }
      if (host.isEmpty) None
      else Some(ParsedUrl(scheme.toLowerCase, ui, host.toLowerCase, port,
        path, Option(query), Option(fragment)))
    case _ => None
  }

  private def isUnreserved(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '-' || c == '.' || c == '_' || c == '~'

  /** Normalize percent-encoding: decode unreserved, uppercase hex digits. */
  private[functions] def normalizePct(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        val v = Integer.parseInt(s.substring(i + 1, i + 3), 16)
        if (v < 128 && isUnreserved(v.toChar)) sb.append(v.toChar)
        else { sb.append('%'); sb.append(s.substring(i + 1, i + 3).toUpperCase) }
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[functions] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in  = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) {
        in = "/" + in.substring(4)
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "/..") {
        in = "/"
        val i = out.lastIndexOf("/")
        out.setLength(if (i >= 0) i else 0)
      } else if (in == "." || in == "..") in = ""
      else {
        val next = in.indexOf('/', 1)
        val seg  = if (next == -1) in else in.substring(0, next)
        out.append(seg)
        in = if (next == -1) "" else in.substring(next)
      }
    }
    out.toString
  }

  /**
   * X1: canonical absolute form — lowercase scheme/host, default port
   * dropped, dot-segments removed, percent-encoding normalized, empty path
   * becomes "/". Keeps the fragment (callers that need the crawl/cache key
   * strip it first — X2; fetch.c:471-489 strips on the effective URL too).
   *
   * Fast path: an already-canonical-key-form input (no fragment by
   * charset) IS its canonical form — skips the regex parse + normalize +
   * re-render entirely. This function runs for every URI term of every
   * parsed triple (via resolve), which made the slow path the single
   * largest allocator of a crawl sweep (~230 GB of a 1.15 TB profile).
   * Equivalence with the slow path is property-tested in UrlsSpec.
   */
  def canonicalize(s: String): Option[String] =
    if (canonicalKeySlash(s) > 0) Some(s)
    else canonicalizeSlow(s)

  /** The full RFC machinery behind canonicalize — exposed package-private
    * so the fast≡slow property test can compare against it directly. */
  private[functions] def canonicalizeSlow(s: String): Option[String] =
    parse(s).map { u =>
      val port = u.port.filter(p => !u.defaultPort.contains(p))
      val path0 = if (u.path.isEmpty) "/" else u.path
      val path = removeDotSegments(normalizePct(path0))
      u.copy(port = port, path = if (path.isEmpty) "/" else path,
        query = u.query.map(normalizePct),
        fragment = u.fragment.map(normalizePct)).render
    }

  /** X2: strip `#fragment` (cache.c:113-118). */
  def stripFragment(s: String): String = s.indexOf('#') match {
    case -1 => s
    case i  => s.substring(0, i)
  }

  /**
   * Fast-path detector: returns the index of the path-start '/' when `s`
   * is ALREADY in canonical key form — lowercase http/https scheme,
   * lowercase reg-name host (no userinfo/port/percent-escapes), a path
   * with no dot-segments, no '%'/'#'/':'/'@' anywhere after the scheme —
   * and -1 otherwise. For fast-form input, canonicalKeyUrl(s) == s and
   * canonicalRoot(s) == s.take(slash+1), so the discovered-URL hot loop
   * (tens of millions of outlinks per sweep) skips the full RFC machinery
   * (regex parse + percent/dot normalization + re-render), whose
   * allocation rate dominated GC at high parallelism. Equivalence with
   * the slow path is property-tested in UrlsSpec; any doubt falls through
   * to the slow path, so this can only be conservatively wrong.
   */
  private[functions] def canonicalKeySlash(s: String): Int = {
    val schemeEnd =
      if (s.startsWith("http://")) 7
      else if (s.startsWith("https://")) 8
      else return -1
    val slash = s.indexOf('/', schemeEnd)
    if (slash <= schemeEnd) return -1 // empty host or no path
    var i = schemeEnd
    while (i < slash) { // host: lowercase reg-name only
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '.' || c == '-'
      if (!ok) return -1
      i += 1
    }
    i = slash
    var prev    = ' '
    var dots    = 0     // run of '.' directly after a '/' (path only)
    var inQuery = false // query is kept verbatim — no dot-segment logic
    while (i < s.length) { // path+query: conservative safe charset
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '/' || c == '.' || c == '-' ||
        c == '_' || c == '~' || c == '?' || c == '=' || c == '&'
      if (!ok) return -1
      if (!inQuery) {
        if (c == '?') {
          if (dots == 1 || dots == 2) return -1 // path ends "/." or "/.."
          inQuery = true
        } else if (c == '/') {
          if (dots == 1 || dots == 2) return -1 // "/./" or "/../"
          dots = 0
        } else if (c == '.' && (prev == '/' || (dots > 0 && dots < 3))) {
          if (prev == '/') dots = 1 else dots += 1
        } else dots = 3 // segment is not a pure dot-run
        prev = c
      }
      i += 1
    }
    if (!inQuery && (dots == 1 || dots == 2)) -1 // trailing "/." or "/.."
    else slash
  }

  /** Canonical crawl/cache key form: canonicalize then drop fragment.
    * Already-canonical inputs short-circuit (see canonicalKeySlash). */
  def canonicalKeyUrl(s: String): Option[String] =
    if (canonicalKeySlash(s) > 0) Some(s)
    else canonicalize(stripFragment(s))

  /** X4/K5: root = "/" resolved against the URI, i.e. scheme://host[:port]/
    * (port preserved when non-default; db.c:840-845). */
  def canonicalRoot(s: String): Option[String] = {
    val slash = canonicalKeySlash(s)
    if (slash > 0) Some(s.substring(0, slash + 1))
    else parse(s).map { u =>
      val port = u.port.filter(p => !u.defaultPort.contains(p))
      val ps   = port.map(":" + _).getOrElse("")
      s"${u.scheme}://${u.host}$ps/"
    }
  }

  // Hot path (runs per discovered URL): thread-local digest (getInstance
  // contends above ~8 threads) + table-driven hex (a Formatter per byte
  // costs ~18µs/hash and wrecks multi-core scaling via allocation).
  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }
  private val hexChars = "0123456789abcdef".toCharArray

  private def sha256Hex(s: String): String = {
    val md = digestTL.get()
    md.reset()
    val d   = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](64)
    var i = 0
    while (i < 32) {
      out(i * 2)     = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** K1: url_hash — SHA-256 hex of the canonical, fragment-free URL,
    * truncated to 32 chars (cache.c:103-129). Input must already be the
    * canonical key form. */
  def urlHash(canonicalUrl: String): String =
    sha256Hex(canonicalUrl).substring(0, 32)

  /** K2: first 32 bits of the hash as unsigned (db.c:836-838). */
  def shorthash(urlHash: String): Long =
    java.lang.Long.parseLong(urlHash.substring(0, 8), 16)

  /** K3: tinyhash = shorthash % 256 (db.c:1252). */
  def tinyhash(urlHash: String): Int = (shorthash(urlHash) % 256).toInt

  /** F4/X11: same-origin — scheme, host (case-insensitive via parse) and
    * effective port (80/443 defaulting) must all match (fetch.c:371-413). */
  def sameOrigin(a: String, b: String): Boolean =
    (parse(a), parse(b)) match {
      case (Some(x), Some(y)) =>
        x.scheme == y.scheme && x.host == y.host &&
          x.effectivePort == y.effectivePort
      case _ => false
    }

  /** RFC 3986 §5.2 relative reference resolution (for Location headers and
    * extracted relative links; liburi's uri_create_str(str, base)). */
  def resolve(base: String, ref: String): Option[String] = {
    val r = ref.trim
    if (r.isEmpty) return canonicalize(base)
    // fast path: an absolute, already-canonical reference resolves to
    // itself (the parse→canonicalize round-trip below is the identity on
    // fast-form input — property-tested); extraction resolves every URI
    // node of every triple through here
    if (canonicalKeySlash(r) > 0) return Some(r)
    if (parse(r).isDefined) return canonicalize(r)
    parse(base).flatMap { b =>
      val (refPath, refQF) = {
        val qi = math.min(
          r.indexOf('?') match { case -1 => r.length; case i => i },
          r.indexOf('#') match { case -1 => r.length; case i => i })
        (r.substring(0, qi), r.substring(qi))
      }
      val merged =
        if (r.startsWith("//")) return canonicalize(b.scheme + ":" + r)
        else if (refPath.startsWith("/")) refPath
        else if (refPath.isEmpty) {
          // query/fragment-only reference keeps the base path
          val bq = if (refQF.startsWith("#")) b.query.map("?" + _).getOrElse("") else ""
          return canonicalize(
            s"${b.scheme}://${b.authority}${b.path}$bq$refQF")
        } else {
          val bp = if (b.path.isEmpty) "/" else b.path
          bp.substring(0, bp.lastIndexOf('/') + 1) + refPath
        }
      canonicalize(s"${b.scheme}://${b.authority}$merged$refQF")
    }
  }

  /** X3: scheme extract; None when unparseable (schemes.c:140). */
  def scheme(s: String): Option[String] = {
    val i = s.indexOf(':')
    if (i <= 0) None
    else {
      val sc = s.substring(0, i)
      if (sc.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
          && sc.head.isLetter) Some(sc.toLowerCase)
      else None
    }
  }
}
