package graft.functions

import java.nio.charset.StandardCharsets

/**
 * robots.txt parsing + gating (north-star extension — the reference has no
 * robots handling; its politeness is rate-only via crawl_root.rate,
 * libspider/queues/db.c:762-790. Grammar per the public REP spec,
 * RFC 9309, reduced to what the gate needs).
 *
 * Semantics implemented:
 *  - group selection: only `User-agent: *` groups apply (the engine sends
 *    a fixed UA and registers no product token);
 *  - `Disallow:`/`Allow:` path prefixes; empty Disallow = allow all;
 *  - longest-match wins between Allow and Disallow (RFC 9309 §2.2.2),
 *    Allow wins ties; no wildcard support (`*`/`$` treated literally —
 *    documented simplification);
 *  - unparseable/missing robots.txt ⇒ allow (RFC 9309 §2.3.1.2-4 spirit:
 *    only a definite disallow blocks).
 */
object Robots {

  final case class Rules(disallow: Vector[String], allow: Vector[String])

  val Empty: Rules = Rules(Vector.empty, Vector.empty)

  def robotsUrl(rootUrl: String): String = rootUrl + "robots.txt"

  /** Parse a robots.txt body; keeps only `User-agent: *` group rules. */
  def parse(body: Array[Byte]): Rules = {
    val text = new String(body, StandardCharsets.UTF_8)
    var inStar      = false
    var sawAgent    = false // inside a user-agent header run
    val dis         = Vector.newBuilder[String]
    val all         = Vector.newBuilder[String]
    text.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val i = line.indexOf(':')
        if (i > 0) {
          val key   = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              // consecutive user-agent lines form one group header
              if (!sawAgent) inStar = false
              sawAgent = true
              if (value == "*") inStar = true
            case "disallow" =>
              sawAgent = false
              if (inStar && value.nonEmpty) dis += value
            case "allow" =>
              sawAgent = false
              if (inStar && value.nonEmpty) all += value
            case _ => sawAgent = false
          }
        }
      }
    }
    Rules(dis.result(), all.result())
  }

  /** Longest-prefix-match decision for a URL path (+query). */
  def allowed(rules: Rules, path: String): Boolean = {
    val d = rules.disallow.filter(path.startsWith).map(_.length)
      .maxOption.getOrElse(-1)
    val a = rules.allow.filter(path.startsWith).map(_.length)
      .maxOption.getOrElse(-1)
    a >= d // Allow wins ties; nothing matched (-1 >= -1) ⇒ allowed
  }

  /** Full gate: is `url` fetchable given its host's robots body (None =
    * no robots.txt ⇒ allowed)? robots.txt itself is always fetchable. */
  def urlAllowed(url: String, robotsBody: Option[Array[Byte]]): Boolean =
    robotsBody match {
      case None => true
      case Some(b) =>
        Urls.parse(url) match {
          case None => true
          case Some(p) =>
            p.path == "/robots.txt" || {
              val path = p.path + p.query.map("?" + _).getOrElse("")
              allowed(parse(b), if (path.isEmpty) "/" else path)
            }
        }
    }
}
