package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native codegen'd spelling of the discovered-URL key derivation
 * (canonicalize → url_hash), the densest per-row stream of a crawl round:
 * every outlink of every fetched page passes through it (~15× the page
 * count). The r5 spelling was a typed `flatMap(raw =>
 * Urls.canonicalKeyUrl(raw).map(c => Candidate(Urls.urlHash(c), c)))` —
 * per outlink that pays the Dataset encoder boundary (UTF8String→String,
 * Option + case-class allocation, two String→UTF8String copies on the way
 * back), which the round's JFR profile books under the ~40 GB UTF8String
 * conversions + ~30 GB UnsafeRow copies at typed boundaries (BASELINE.md
 * allocation budget — the VERDICT r5 GC lever).
 *
 * `canon_key(url)` returns `struct(url_hash, url)` or NULL (unparseable
 * URL), computed with ZERO String materialization on the already-
 * canonical fast path: the canonical-form detector is a byte-level port
 * of Urls.canonicalKeySlash (every char it accepts is ASCII, so the byte
 * scan and the char scan accept exactly the same strings — any byte ≥
 * 0x80 fails the safe-set test and falls through to the String slow
 * path), and the SHA-256 runs directly over the UTF8String's bytes
 * (identical digest input: url_hash is defined over the UTF-8 encoding).
 *
 * PARITY CONTRACT (pinned by UrlKeySpec): for every input,
 * `canon_key(s)` ≡ `Urls.canonicalKeyUrl(s).map(c => (Urls.urlHash(c), c))`.
 */
object UrlKeyNative {

  private val digestTL = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }
  private val hexBytes = "0123456789abcdef".getBytes

  private def matchesAscii(u: UTF8String, lit: String): Boolean = {
    if (u.numBytes < lit.length) return false
    var i = 0
    while (i < lit.length) {
      if (u.getByte(i) != lit.charAt(i).toByte) return false
      i += 1
    }
    true
  }

  /** Byte-level twin of [[Urls.canonicalKeySlash]]. Accepts exactly the
    * same strings (its safe charset is pure ASCII, so any multi-byte
    * UTF-8 sequence fails the scan and routes to the String path). */
  private[functions] def canonicalKeySlashBytes(u: UTF8String): Int = {
    val n = u.numBytes
    val schemeEnd =
      if (matchesAscii(u, "http://")) 7
      else if (matchesAscii(u, "https://")) 8
      else return -1
    var slash = -1
    var k = schemeEnd
    while (slash < 0 && k < n) {
      if (u.getByte(k) == '/'.toByte) slash = k
      k += 1
    }
    if (slash <= schemeEnd) return -1 // empty host or no path
    var i = schemeEnd
    while (i < slash) { // host: lowercase reg-name only
      val c = u.getByte(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') ||
        c == '.' || c == '-'
      if (!ok) return -1
      i += 1
    }
    i = slash
    var prev: Byte = ' '
    var dots    = 0
    var inQuery = false
    while (i < n) { // path+query: conservative safe charset (ASCII only)
      val c = u.getByte(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '/' || c == '.' || c == '-' ||
        c == '_' || c == '~' || c == '?' || c == '=' || c == '&'
      if (!ok) return -1
      if (!inQuery) {
        if (c == '?') {
          if (dots == 1 || dots == 2) return -1
          inQuery = true
        } else if (c == '/') {
          if (dots == 1 || dots == 2) return -1
          dots = 0
        } else if (c == '.' && (prev == '/' || (dots > 0 && dots < 3))) {
          if (prev == '/') dots = 1 else dots += 1
        } else dots = 3
        prev = c
      }
      i += 1
    }
    if (!inQuery && (dots == 1 || dots == 2)) -1
    else slash
  }

  /** 32-hex truncated SHA-256 over the UTF8String's bytes — the same
    * digest input as Urls.urlHash (which hashes the String's UTF-8
    * encoding), without materializing the String. */
  private def urlHashUtf8(u: UTF8String): UTF8String = {
    val md = digestTL.get()
    md.reset()
    md.update(u.getBytes) // one byte[] (often the backing array itself)
    val d   = md.digest()
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(i * 2)     = hexBytes((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexBytes(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** (url_hash, canonical_url) or null. Called from generated code. */
  def canonKey(u: UTF8String): InternalRow =
    if (canonicalKeySlashBytes(u) > 0)
      new GenericInternalRow(Array[Any](urlHashUtf8(u), u))
    else {
      Urls.canonicalKeyUrl(u.toString) match {
        case Some(c) => new GenericInternalRow(Array[Any](
          UTF8String.fromString(Urls.urlHash(c)), UTF8String.fromString(c)))
        case None => null
      }
    }
}

/** `canon_key(url)` → `struct(url_hash: string, url: string)`, null for
  * unparseable input. */
case class CanonKey(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("url_hash", StringType, nullable = false),
    StructField("url", StringType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "canon_key"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"canon_key expects string, got $t")
  }
  override protected def nullSafeEval(u: Any): Any =
    UrlKeyNative.canonKey(u.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.UrlKeyNative.canonKey($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(
      newChild: Expression): CanonKey = copy(child = newChild)
}
