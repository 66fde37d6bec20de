package graft.functions

/**
 * X10: RFC 5988 `Link:` header parser (reference:
 * libspider/processors/rdf.c:374-599, ~225 LoC).
 *
 * Semantics replicated from the reference:
 *  - a single header may carry multiple comma-separated link-values;
 *  - each link-value is `<target>; param; param...`;
 *  - params are `key=value` or `key="quoted value"` (backslash escapes
 *    honored inside quotes);
 *  - `rel` values that are not absolute URIs are resolved against the
 *    XHTML vocab base `http://www.w3.org/1999/xhtml/vocab#` (rdf.c uses
 *    this base for short rel names);
 *  - a `rel` param may contain multiple whitespace-separated relation
 *    names — each yields one triple;
 *  - the triple subject (anchor) defaults to the Content-Location of the
 *    response, falling back to the request URL (rdf.c:553-581); an
 *    explicit `anchor="..."` param overrides it (resolved against the
 *    request URL);
 *  - the target URI is resolved against the request URL.
 */
object LinkHeader {

  val XhtmlVocab = "http://www.w3.org/1999/xhtml/vocab#"

  final case class Link(target: String, params: List[(String, String)]) {
    def rels: List[String] = params.collect {
      case (k, v) if k.equalsIgnoreCase("rel") => v
    }.flatMap(_.split("\\s+").toList).filter(_.nonEmpty)
    def anchor: Option[String] = params.collectFirst {
      case (k, v) if k.equalsIgnoreCase("anchor") => v
    }
  }

  /** Parse one raw Link header value into link-values. Malformed input
    * yields the links parsed so far (the reference is permissive). */
  def parse(raw: String): List[Link] = {
    if (raw == null) return Nil
    var i     = 0
    val n     = raw.length
    var links = List.newBuilder[Link]

    def skipWs(): Unit = while (i < n && (raw.charAt(i) == ' ' || raw.charAt(i) == '\t')) i += 1

    while (i < n) {
      skipWs()
      if (i < n && raw.charAt(i) == '<') {
        val end = raw.indexOf('>', i)
        if (end == -1) { i = n } // unterminated target: stop
        else {
          val target = raw.substring(i + 1, end).trim
          i = end + 1
          val params = List.newBuilder[(String, String)]
          var more   = true
          while (more) {
            skipWs()
            if (i < n && raw.charAt(i) == ';') {
              i += 1; skipWs()
              // param name
              val ns = i
              while (i < n && raw.charAt(i) != '=' && raw.charAt(i) != ';' &&
                     raw.charAt(i) != ',') i += 1
              val name = raw.substring(ns, i).trim
              var value = ""
              if (i < n && raw.charAt(i) == '=') {
                i += 1; skipWs()
                if (i < n && raw.charAt(i) == '"') {
                  i += 1
                  val sb = new StringBuilder
                  while (i < n && raw.charAt(i) != '"') {
                    if (raw.charAt(i) == '\\' && i + 1 < n) {
                      sb.append(raw.charAt(i + 1)); i += 2
                    } else { sb.append(raw.charAt(i)); i += 1 }
                  }
                  i += 1 // closing quote
                  value = sb.toString
                } else {
                  val vs = i
                  while (i < n && raw.charAt(i) != ';' && raw.charAt(i) != ',') i += 1
                  value = raw.substring(vs, i).trim
                }
              }
              if (name.nonEmpty) params += (name -> value)
            } else more = false
          }
          links += Link(target, params.result())
          skipWs()
          if (i < n && raw.charAt(i) == ',') i += 1
        }
      } else if (i < n) {
        // junk before '<': skip to next comma (permissive)
        val c = raw.indexOf(',', i)
        i = if (c == -1) n else c + 1
      }
    }
    links.result()
  }

  /** A (subject, predicate, object) triple where all three are URIs. */
  final case class LinkTriple(anchor: String, rel: String, target: String)

  /**
   * Expand parsed links into triples per the reference semantics
   * (rdf.c:553-581): resolve targets/anchors against `requestUrl`,
   * default the anchor to contentLocation-or-requestUrl, resolve short
   * rel names against the XHTML vocab.
   */
  def triples(raw: String, requestUrl: String,
              contentLocation: Option[String]): List[LinkTriple] = {
    val defaultAnchor = contentLocation.getOrElse(requestUrl)
    parse(raw).flatMap { link =>
      val target = Urls.resolve(requestUrl, link.target)
      val anchor = link.anchor match {
        case Some(a) => Urls.resolve(requestUrl, a)
        case None    => Some(defaultAnchor)
      }
      (target, anchor) match {
        case (Some(t), Some(a)) =>
          link.rels.map { r =>
            val rel =
              if (r.contains(":")) r // absolute URI (or curie) kept verbatim
              else XhtmlVocab + r
            LinkTriple(a, rel, t)
          }
        case _ => Nil
      }
    }
  }
}
