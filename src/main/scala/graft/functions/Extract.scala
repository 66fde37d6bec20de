package graft.functions

import java.nio.charset.StandardCharsets

/**
 * E1/E6: deterministic content extraction — the pure function of
 * `(url, html)` whose output must be byte-identical per url between the
 * engine, the simulator and the golden `text` column of the pages table.
 *
 * The reference parses RDF payloads with librdf (libspider/processors/
 * rdf.c:270-328) and walks every statement; the crawl-mirror utility
 * html-parses payloads (utils/crawl-mirror.c:265-291). Here both are
 * re-specified as pure Scala:
 *  - a Turtle/N-Triples subset parser (covers @prefix/@base, <uri>,
 *    prefixed names, `a`, literals with lang/datatype, `;`/`,`
 *    continuations) — the fixture generator only emits this subset, so
 *    the parser is exact on all test inputs;
 *  - an HTML tag-stripper + href/src harvester.
 *
 * Extracted text (the byte-identity contract):
 *  - RDF payloads → one line per statement in document order,
 *    N-Triples-style (`<s> <p> <o> .` / literal form), joined by '\n';
 *  - HTML payloads → tag-stripped, whitespace-normalized body text.
 */
object Extract {

  /** One RDF statement. `objIsResource`=false means literal object. */
  final case class Triple(subj: String, pred: String, obj: String,
                          objIsResource: Boolean) {
    def renderNt: String = {
      val o = if (objIsResource) s"<$obj>" else "\"" + obj.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      s"<$subj> <$pred> $o ."
    }
  }

  // ---------------------------------------------------------------- Turtle

  private sealed trait Tok
  private case class TUri(v: String)            extends Tok
  private case class TPrefixed(p: String, l: String) extends Tok
  private case class TLiteral(v: String)        extends Tok
  private case class TPunct(c: Char)            extends Tok
  private case class TKeyword(v: String)        extends Tok

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i   = 0
    val n   = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '#') { while (i < n && s.charAt(i) != '\n') i += 1 }
      else if (c.isWhitespace) i += 1
      else if (c == '<') {
        val e = s.indexOf('>', i)
        if (e == -1) { i = n } else { out += TUri(s.substring(i + 1, e)); i = e + 1 }
      } else if (c == '"') {
        val sb = new StringBuilder
        i += 1
        while (i < n && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < n) {
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 't' => sb.append('\t')
              case 'r' => sb.append('\r'); case ch  => sb.append(ch)
            }
            i += 2
          } else { sb.append(s.charAt(i)); i += 1 }
        }
        i += 1
        // optional lang tag / datatype — consumed, not stored
        if (i < n && s.charAt(i) == '@') {
          while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '.' &&
                 s.charAt(i) != ';' && s.charAt(i) != ',') i += 1
        } else if (i + 1 < n && s.charAt(i) == '^' && s.charAt(i + 1) == '^') {
          i += 2
          if (i < n && s.charAt(i) == '<') { val e = s.indexOf('>', i); i = if (e == -1) n else e + 1 }
          else while (i < n && !s.charAt(i).isWhitespace && s.charAt(i) != '.') i += 1
        }
        out += TLiteral(sb.toString)
      } else if (c == '.' || c == ';' || c == ',') { out += TPunct(c); i += 1 }
      else {
        val st = i
        while (i < n && !s.charAt(i).isWhitespace && !"<>\".;,#".contains(s.charAt(i))) i += 1
        val w = s.substring(st, i)
        if (w == "a") out += TKeyword("a")
        else if (w == "@prefix" || w == "@base" || w == "PREFIX" || w == "BASE")
          out += TKeyword(w.stripPrefix("@").toLowerCase)
        else w.indexOf(':') match {
          case -1 => out += TKeyword(w)
          case j  => out += TPrefixed(w.substring(0, j), w.substring(j + 1))
        }
      }
    }
    out.result()
  }

  val RdfType = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

  /** Parse the Turtle/N-Triples subset; statements in document order.
    * Permissive: a malformed statement ends parsing (like librdf erroring
    * out mid-stream yields the statements parsed so far). */
  def parseTurtle(body: String, baseUrl: String): Vector[Triple] = {
    val toks  = tokenize(body)
    var i     = 0
    var base  = baseUrl
    var pfx   = Map.empty[String, String]
    val out   = Vector.newBuilder[Triple]

    def resolveUri(u: String): Option[String] =
      if (u.isEmpty) Some(base)
      else Urls.resolve(base, u).orElse(Some(u)) // non-hierarchical kept raw

    def term(t: Tok): Option[(String, Boolean)] = t match {
      case TUri(u)         => resolveUri(u).map((_, true))
      case TPrefixed(p, l) => pfx.get(p).map(ns => (ns + l, true))
      case TLiteral(v)     => Some((v, false))
      case TKeyword("a")   => Some((RdfType, true))
      case _               => None
    }

    while (i < toks.length) {
      toks(i) match {
        case TKeyword("prefix") if i + 2 < toks.length =>
          (toks(i + 1), toks(i + 2)) match {
            case (TPrefixed(p, _), TUri(ns)) =>
              pfx += (p -> ns); i += 3
              if (i < toks.length && toks(i) == TPunct('.')) i += 1
            case _ => i = toks.length
          }
        case TKeyword("base") if i + 1 < toks.length =>
          toks(i + 1) match {
            case TUri(b) =>
              base = Urls.resolve(base, b).getOrElse(b); i += 2
              if (i < toks.length && toks(i) == TPunct('.')) i += 1
            case _ => i = toks.length
          }
        case st =>
          term(st) match {
            case Some((subj, true)) =>
              i += 1
              var done = false
              var pred: Option[String] = None
              while (!done && i < toks.length) {
                if (pred.isEmpty) {
                  term(toks(i)) match {
                    case Some((p, true)) => pred = Some(p); i += 1
                    case _               => done = true; i = toks.length
                  }
                } else {
                  term(toks(i)) match {
                    case Some((o, isRes)) =>
                      out += Triple(subj, pred.get, o, isRes); i += 1
                      if (i < toks.length) toks(i) match {
                        case TPunct(',') => i += 1 // same subj+pred
                        case TPunct(';') => pred = None; i += 1
                        case TPunct('.') => done = true; i += 1
                        case _           => done = true; i = toks.length
                      } else done = true
                    case None => done = true; i = toks.length
                  }
                }
              }
            case _ => i = toks.length // not a valid subject: stop
          }
      }
    }
    out.result()
  }

  // ---------------------------------------------------------------- RDF/XML

  private val RdfNs = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

  /**
   * E1: RDF/XML parser (reference: librdf via rdf.c:208-239,270-328) —
   * the subset LOD actually serves, via the JDK's StAX pull parser:
   *  - node elements: `rdf:Description rdf:about=...` or a typed element
   *    (emits an rdf:type triple); rdf:about resolved against the base;
   *    subjects without rdf:about (blank nodes) are skipped (subset);
   *  - property elements: `rdf:resource` attribute → resource object;
   *    nested node element → its triples, then the linking triple (raptor
   *    statement order); text content → literal (xml:lang / rdf:datatype
   *    consumed, not stored — same as the Turtle parser).
   * Malformed XML → empty vector, which Step maps to FAILED exactly like
   * librdf erroring out (processor.c:204-208).
   */
  def parseRdfXml(body: String, baseUrl: String): Vector[Triple] = {
    import javax.xml.stream.{XMLInputFactory, XMLStreamConstants => C}
    val out = Vector.newBuilder[Triple]
    try {
      val f = XMLInputFactory.newInstance()
      f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
      f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
      val r = f.createXMLStreamReader(new java.io.StringReader(body))

      def resolveUri(u: String): String =
        if (u.isEmpty) baseUrl else Urls.resolve(baseUrl, u).getOrElse(u)
      def rdfAttr(name: String): Option[String] =
        Option(r.getAttributeValue(RdfNs, name))
      def qnameUri: String = Option(r.getNamespaceURI).getOrElse("") +
        r.getLocalName

      /** Consume the element at the cursor (START_ELEMENT) entirely. */
      def skipElement(): Unit = {
        var depth = 1
        while (depth > 0 && r.hasNext) r.next() match {
          case C.START_ELEMENT => depth += 1
          case C.END_ELEMENT   => depth -= 1
          case _               =>
        }
      }

      /** Parse a node element at the cursor; returns its subject URI.
        * Consumes through the matching END_ELEMENT. */
      def parseNode(): Option[String] = {
        val isDescription =
          r.getNamespaceURI == RdfNs && r.getLocalName == "Description"
        val typeUri = qnameUri
        rdfAttr("about") match {
          case None => skipElement(); None // blank node: outside the subset
          case Some(a) =>
            val subj = resolveUri(a)
            if (!isDescription)
              out += Triple(subj, RdfType, typeUri, objIsResource = true)
            // children are property elements
            var open = true
            while (open && r.hasNext) r.next() match {
              case C.START_ELEMENT => parseProperty(subj)
              case C.END_ELEMENT   => open = false
              case _               =>
            }
            Some(subj)
        }
      }

      /** Parse a property element at the cursor, owned by `subj`. */
      def parseProperty(subj: String): Unit = {
        val pred = qnameUri
        rdfAttr("resource") match {
          case Some(res) =>
            out += Triple(subj, pred, resolveUri(res), objIsResource = true)
            skipElement()
          case None =>
            val sb = new StringBuilder
            var nested: Option[String] = None
            var open = true
            while (open && r.hasNext) r.next() match {
              case C.CHARACTERS | C.CDATA => sb.append(r.getText)
              case C.START_ELEMENT        => nested = parseNode()
              case C.END_ELEMENT          => open = false
              case _                      =>
            }
            nested match {
              case Some(n) =>
                out += Triple(subj, pred, n, objIsResource = true)
              case None =>
                out += Triple(subj, pred, sb.toString, objIsResource = false)
            }
        }
      }

      // advance to the document element; rdf:RDF wraps node elements, any
      // other root IS a node element
      while (r.hasNext && r.getEventType != C.START_ELEMENT) r.next()
      if (r.getEventType == C.START_ELEMENT) {
        if (r.getNamespaceURI == RdfNs && r.getLocalName == "RDF") {
          var open = true
          while (open && r.hasNext) r.next() match {
            case C.START_ELEMENT => parseNode()
            case C.END_ELEMENT   => open = false
            case _               =>
          }
        } else parseNode()
      }
      r.close()
      out.result()
    } catch { case _: Exception => Vector.empty }
  }

  // ---------------------------------------------------------------- N-Quads

  /**
   * E1: N-Quads parser (rdf.c:231-235 routes application/n-quads to
   * librdf's nquads parser). Line-oriented: `<s> <p> (<o>|"lit") [<g>] .`
   * — the optional 4th (graph) term is accepted and DISCARDED: librdf
   * stores context off the statement, and both the node harvest and the
   * statement print iterate s/p/o only (rdf.c:316-327). Blank-node labels
   * are kept verbatim as `_:x` terms (fixtures don't use them; the outlink
   * harvest's scheme filter drops them). A malformed line aborts the
   * statement stream, keeping what parsed so far (librdf error behavior).
   */
  def parseNQuads(body: String, baseUrl: String): Vector[Triple] = {
    val out = Vector.newBuilder[Triple]
    def resolveUri(u: String): String =
      if (u.isEmpty) baseUrl else Urls.resolve(baseUrl, u).getOrElse(u)

    val lines = body.linesIterator
    var ok = true
    while (ok && lines.hasNext) {
      val line = lines.next().trim
      if (line.nonEmpty && !line.startsWith("#")) {
        // tokenize one statement line
        var i = 0
        val n = line.length
        var terms = Vector.empty[(String, Boolean)] // (value, isResource)
        var dot   = false
        var bad   = false
        while (!bad && !dot && i < n) {
          val c = line.charAt(i)
          if (c.isWhitespace) i += 1
          else if (c == '<') {
            val e = line.indexOf('>', i)
            if (e == -1) bad = true
            else { terms :+= (resolveUri(line.substring(i + 1, e)), true); i = e + 1 }
          } else if (c == '"') {
            val sb = new StringBuilder
            i += 1
            var closed = false
            while (!closed && i < n) {
              val ch = line.charAt(i)
              if (ch == '\\' && i + 1 < n) {
                line.charAt(i + 1) match {
                  case 'n' => sb.append('\n'); case 't' => sb.append('\t')
                  case 'r' => sb.append('\r'); case x   => sb.append(x)
                }
                i += 2
              } else if (ch == '"') { closed = true; i += 1 }
              else { sb.append(ch); i += 1 }
            }
            if (!closed) bad = true
            else {
              // optional @lang / ^^<datatype> — consumed, not stored
              if (i < n && line.charAt(i) == '@') {
                while (i < n && !line.charAt(i).isWhitespace) i += 1
              } else if (i + 1 < n && line.charAt(i) == '^' &&
                         line.charAt(i + 1) == '^') {
                i += 2
                if (i < n && line.charAt(i) == '<') {
                  val e = line.indexOf('>', i)
                  i = if (e == -1) n else e + 1
                } else while (i < n && !line.charAt(i).isWhitespace) i += 1
              }
              terms :+= (sb.toString, false)
            }
          } else if (c == '_' && i + 1 < n && line.charAt(i + 1) == ':') {
            val st = i
            while (i < n && !line.charAt(i).isWhitespace &&
                   line.charAt(i) != '.') i += 1
            terms :+= (line.substring(st, i), true)
          } else if (c == '.') { dot = true; i += 1 }
          else bad = true
        }
        if (bad || !dot || terms.length < 3 || terms.length > 4 ||
            !terms(0)._2 || !terms(1)._2) ok = false
        else out += Triple(terms(0)._1, terms(1)._1,
          terms(2)._1, terms(2)._2) // 4th (graph) term discarded
      }
    }
    out.result()
  }

  // ----------------------------------------------------------------- HTML

  private val TagRe    = "(?s)<[^>]*>".r
  private val HrefRe   = """(?i)(?:href|src)\s*=\s*["']([^"'#][^"']*)["']""".r
  private val ScriptRe = "(?is)<(script|style)[^>]*>.*?</\\1>".r

  /** HTML → whitespace-normalized visible text. */
  def htmlText(body: String): String = {
    val noScript = ScriptRe.replaceAllIn(body, " ")
    val noTags   = TagRe.replaceAllIn(noScript, " ")
    val unescaped = noTags
      .replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
    unescaped.split("\\s+").filter(_.nonEmpty).mkString(" ")
  }

  /** HTML → absolute outlinks (href/src), resolved against base, deduped
    * in document order. */
  def htmlLinks(body: String, baseUrl: String): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    HrefRe.findAllMatchIn(body).foreach { m =>
      Urls.resolve(baseUrl, m.group(1)).foreach(seen += _)
    }
    seen.toVector
  }

  // --------------------------------------------------------- entry points

  /** The deterministic extraction contract: (url, payload, parser) →
    * (extractedText, triples). `parser` is the X12 result. */
  def extract(url: String, payload: Array[Byte], parser: String)
      : (String, Vector[Triple]) = {
    val body = new String(payload, StandardCharsets.UTF_8)
    parser match {
      case "turtle" | "ntriples" =>
        val ts = parseTurtle(body, url)
        (ts.map(_.renderNt).mkString("\n"), ts)
      case "nquads" =>
        val ts = parseNQuads(body, url)
        (ts.map(_.renderNt).mkString("\n"), ts)
      case "rdfxml" =>
        val ts = parseRdfXml(body, url)
        (ts.map(_.renderNt).mkString("\n"), ts)
      case "html" =>
        (htmlText(body), Vector.empty)
      case _ => ("", Vector.empty)
    }
  }

  /** E3: outlink harvest — every resource node (subject, predicate AND
    * object) of every triple, deduped in first-seen order
    * (rdf.c:316-327,601-635). */
  def harvestOutlinks(triples: Seq[Triple]): Vector[String] = {
    val seen = scala.collection.mutable.LinkedHashSet.empty[String]
    triples.foreach { t =>
      seen += t.subj
      seen += t.pred
      if (t.objIsResource) seen += t.obj
    }
    seen.iterator.filter(u => u.startsWith("http:") || u.startsWith("https:") ||
      u.contains("://") || u.startsWith("mailto:") || u.startsWith("ftp:")).toVector
  }
}
