package graft.functions

/**
 * HTTP header handling:
 *  - X7 raw header block → map (reference: libcrawl/fetch.c:497-552 — the
 *    status line is stored under key ":", duplicate headers fold into
 *    arrays, values are trimmed of trailing CR and leading space)
 *  - X8 content-type normalization — strip ";params" and trailing
 *    whitespace (libspider/policies/content-types.c:170-189,
 *    libspider/processors/rdf.c:182-197)
 *  - X12 content-type → parser name (rdf.c:208-239)
 */
object Headers {

  /** Status-line key used by the reference sidecar (fetch.c:519). */
  val StatusKey = ":"

  /**
   * X7: parse a raw header block (status line + `Name: value` lines,
   * CRLF or LF separated) into an ordered map of name → values.
   * Header names are case-normalized the way the reference stores them
   * (verbatim — lookup is done case-insensitively by callers; we keep the
   * first-seen spelling and fold case-insensitive duplicates).
   */
  def parseHeaderBlock(raw: String): Map[String, Seq[String]] = {
    if (raw == null || raw.isEmpty) return Map.empty
    val lines = raw.split("\n", -1).iterator
      .map(l => if (l.endsWith("\r")) l.dropRight(1) else l)
      .filter(_.nonEmpty)
      .toVector
    var out   = Vector.empty[(String, Vector[String])]
    var index = Map.empty[String, Int] // lowercase name → position in out
    def add(name: String, value: String): Unit =
      index.get(name.toLowerCase) match {
        case Some(i) =>
          val (n, vs) = out(i); out = out.updated(i, (n, vs :+ value))
        case None =>
          index += (name.toLowerCase -> out.length)
          out :+= (name -> Vector(value))
      }
    lines.foreach { line =>
      if (line.startsWith("HTTP/")) add(StatusKey, line)
      else line.indexOf(':') match {
        case -1 => // malformed line: reference skips lines without ':'
        case i =>
          val name = line.substring(0, i)
          val v0   = line.substring(i + 1)
          // exactly one optional leading space stripped (fetch.c:497-552)
          val value = if (v0.startsWith(" ")) v0.substring(1) else v0
          if (name.nonEmpty) add(name, value)
      }
    }
    out.toMap
  }

  /** Case-insensitive single-value lookup (last value wins, matching the
    * reference's crawl_obj_* accessors reading the final header). */
  def header(hs: Map[String, Seq[String]], name: String): Option[String] =
    hs.collectFirst {
      case (k, vs) if k.equalsIgnoreCase(name) && vs.nonEmpty => vs.last
    }

  /** Case-insensitive all-values lookup (duplicate headers were folded
    * into the array in wire order). */
  def values(hs: Map[String, Seq[String]], name: String): Seq[String] =
    hs.collectFirst { case (k, vs) if k.equalsIgnoreCase(name) => vs }
      .getOrElse(Nil)

  /** Render a response header block — the fixture/bench-side encoder, the
    * inverse of parseHeaderBlock. Emits CRLF endings so the parser's
    * CR-trim path is exercised by every simulated fetch. */
  def renderHeaderBlock(
      status: Int, contentType: String,
      location: Option[String] = None,
      contentLocation: Option[String] = None,
      linkHeaders: Seq[String] = Nil): String = {
    val sb = new StringBuilder(64)
    sb.append("HTTP/1.1 ").append(status).append(' ')
      .append(reason(status)).append("\r\n")
    if (contentType.nonEmpty)
      sb.append("Content-Type: ").append(contentType).append("\r\n")
    location.foreach(l => sb.append("Location: ").append(l).append("\r\n"))
    contentLocation.foreach(l =>
      sb.append("Content-Location: ").append(l).append("\r\n"))
    linkHeaders.foreach(l => sb.append("Link: ").append(l).append("\r\n"))
    sb.toString
  }

  private def reason(status: Int): String = status match {
    case 200 => "OK"
    case 301 => "Moved Permanently"
    case 302 => "Found"
    case 303 => "See Other"
    case 304 => "Not Modified"
    case 404 => "Not Found"
    case 406 => "Not Acceptable"
    case 503 => "Service Unavailable"
    case _   => "Status"
  }

  /** Status code from the stored status line ("HTTP/1.1 200 OK" → 200). */
  def statusCode(hs: Map[String, Seq[String]]): Option[Int] =
    hs.get(StatusKey).flatMap(_.headOption).flatMap { line =>
      line.split(" ").lift(1).flatMap(s => s.toIntOption)
    }

  /** X8: normalize a Content-Type — cut at ';', trim trailing whitespace,
    * lowercase (content-types.c:170-189). */
  def normalizeContentType(ct: String): String = {
    if (ct == null) return ""
    val cut = ct.indexOf(';') match {
      case -1 => ct
      case i  => ct.substring(0, i)
    }
    cut.trim.toLowerCase
  }

  /** X12: normalized content-type → RDF parser name; None means the
    * processor SKIPs the object (rdf.c:208-239). */
  def parserFor(normalizedCt: String): Option[String] = normalizedCt match {
    case "text/turtle" | "application/x-turtle" | "text/n3" => Some("turtle")
    case "application/rdf+xml"                              => Some("rdfxml")
    case "text/plain" | "application/n-triples"             => Some("ntriples")
    case "application/n-quads" | "text/x-nquads"            => Some("nquads")
    case "text/html" | "application/xhtml+xml"              => Some("html")
    case _                                                  => None
  }

  /** X9: the fixed SQL/If-Modified-Since timestamp format (db.c:958-961;
    * fetch.c:89-95). Seconds since epoch → "yyyy-MM-dd HH:mm:ss" UTC. */
  def formatSqlTs(epochSec: Long): String = {
    val i = java.time.Instant.ofEpochSecond(epochSec)
    java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC)
      .format(i)
  }
}
