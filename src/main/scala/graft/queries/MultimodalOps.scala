package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
 * with decode/feature-extraction as a narrow per-partition transform.
 *
 * The image/audio codecs aren't in this container, so `decodeStub` is a
 * clearly-marked deterministic fake — but the Spark-side plumbing is real:
 * the schema (binary + struct metadata), the batch-at-a-time mapPartitions
 * shape (the Scala analog of a Pandas-UDF `mapInPandas` batch), the
 * partition sizing. Swapping the stub for a real JNI/codec call changes
 * nothing upstream or downstream.
 */
object MultimodalOps {

  /** A multimodal asset row: payload + typed metadata. */
  final case class Asset(asset_id: Long, media_type: String,
                         payload: Array[Byte])

  /** "Decoded" features — in production: width/height/duration/frames
    * from the codec; here: deterministic functions of the bytes. */
  final case class AssetFeatures(asset_id: Long, media_type: String,
                                 byte_len: Long, width: Int, height: Int,
                                 n_frames: Int, checksum: String)

  /** The decode stub: a stand-in for an image/audio decoder. Deterministic
    * pure function of the payload bytes (NOT a real codec). */
  def decodeStub(payload: Array[Byte]): (Int, Int, Int) = {
    var h = 0x811c9dc5
    var i = 0
    while (i < payload.length) { h = (h ^ (payload(i) & 0xff)) * 0x01000193; i += 1 }
    val w = math.floorMod(h, 640) + 1
    val ht = math.floorMod(h >> 10, 480) + 1
    val frames = math.floorMod(payload.length, 30) + 1
    (w, ht, frames)
  }

  /** Batch feature extraction — one partition at a time, zero shuffles
    * (the mapInPandas-equivalent shape). */
  private val hexChars = "0123456789abcdef".toCharArray

  def extractFeatures(assets: Dataset[Asset]): Dataset[AssetFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { a =>
        val (w, h, f) = decodeStub(a.payload)
        md.reset()
        val d   = md.digest(a.payload)
        val out = new Array[Char](d.length * 2) // table-driven hex: a
        var i   = 0 // Formatter per byte allocates and wrecks >8-thread scaling
        while (i < d.length) {
          out(i * 2)     = hexChars((d(i) >> 4) & 0xf)
          out(i * 2 + 1) = hexChars(d(i) & 0xf)
          i += 1
        }
        AssetFeatures(a.asset_id, a.media_type, a.payload.length.toLong,
          w, h, f, new String(out))
      }
    }
  }

  /** "Resized" asset: a deterministic downsample of the payload to at most
    * `maxBytes` bytes by constant stride (stand-in for an image resize —
    * same batch shape, same opaque-binary column; swapping in a real codec
    * changes only the per-element function). Output stays a binary column
    * so resize composes with extractFeatures downstream. */
  final case class ResizedAsset(asset_id: Long, media_type: String,
                                orig_len: Long, payload: Array[Byte])

  def resize(assets: Dataset[Asset], maxBytes: Int): Dataset[ResizedAsset] = {
    import assets.sparkSession.implicits._
    require(maxBytes > 0)
    assets.mapPartitions { it =>
      it.map { a =>
        val n = a.payload.length
        val out =
          if (n <= maxBytes) a.payload
          else {
            // ceil-stride keeps the sample ≤ maxBytes and deterministic
            val stride = (n + maxBytes - 1) / maxBytes
            Array.tabulate[Byte]((n + stride - 1) / stride)(i =>
              a.payload(i * stride))
          }
        ResizedAsset(a.asset_id, a.media_type, n.toLong, out)
      }
    }
  }

  /** One sampled "frame" row per asset: frame f of n (from decodeStub)
    * covers the byte slice [f·len/n, (f+1)·len/n); `every` keeps one frame
    * in `every` (frame-sampling a video/audio stream). Explodes 1→k rows —
    * the flatMap shape a real frame sampler has; frame payloads stay
    * binary. */
  final case class Frame(asset_id: Long, frame_idx: Int, n_frames: Int,
                         payload: Array[Byte])

  def sampleFrames(assets: Dataset[Asset], every: Int): Dataset[Frame] = {
    import assets.sparkSession.implicits._
    require(every > 0)
    assets.mapPartitions { it =>
      it.flatMap { a =>
        val (_, _, n) = decodeStub(a.payload)
        val len = a.payload.length
        (0 until n by every).iterator.map { f =>
          val from = (f.toLong * len / n).toInt
          val until = ((f + 1).toLong * len / n).toInt
          Frame(a.asset_id, f, n,
            java.util.Arrays.copyOfRange(a.payload, from, until))
        }
      }
    }
  }

  /** Oracle-checkable slice of the plumbing over `documents` (payload =
    * utf-8 bytes of text): byte length + md5 checksum — the parts DuckDB
    * can reproduce; width/height/frames come from the stub and are covered
    * by the MultimodalSpec unit tests instead. */
  def docAssetFeatures(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("byte_len"),
        md5(col("text")).as("checksum"))

  val docAssetFeaturesSql: String =
    """SELECT doc_id, CAST(strlen(text) AS BIGINT) AS byte_len,
      |  md5(text) AS checksum
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // Binary format sniffing — REAL parsers (not stubs): magic-byte
  // detection plus the per-format structural walk a multimodal ingest
  // pipeline runs before ever invoking a codec. No codec library needed:
  // container headers are plain bytes.
  //   png  : 8-byte signature, then IHDR width/height (big-endian 32)
  //   gif  : GIF87a/GIF89a signature, logical-screen w/h (little-endian 16)
  //   wav  : RIFF....WAVE, then a CHUNK WALK (word-aligned) to `fmt ` for
  //          sample-rate (LE32) and channels (LE16)
  //   jpeg : FFD8, then a MARKER SCAN over segments to the first SOFn
  //          (n ∉ {4,8,12}) for height/width (big-endian 16)
  // ---------------------------------------------------------------------

  /** Sniffed media descriptor. dim1/dim2 are format-native: images →
    * (width, height); WAVE → (sample_rate, channels); unknown/unparsable
    * → (0, 0) with the most specific format name the magic allows. */
  final case class Sniffed(format: String, dim1: Int, dim2: Int)

  def sniff(p: Array[Byte]): Sniffed = {
    @inline def u8(i: Int): Int  = p(i) & 0xff
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le32(i: Int): Int =
      u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    @inline def ascii(i: Int, s: String): Boolean = {
      var k = 0
      while (k < s.length && i + k < p.length && p(i + k) == s.charAt(k).toByte) k += 1
      k == s.length
    }
    val n = p.length
    if (n >= 24 && u8(0) == 0x89 && ascii(1, "PNG") && u8(4) == 0x0d &&
        u8(5) == 0x0a && u8(6) == 0x1a && u8(7) == 0x0a && ascii(12, "IHDR"))
      Sniffed("png", be32(16), be32(20))
    else if (n >= 10 && ascii(0, "GIF8") && (u8(4) == '7' || u8(4) == '9') &&
        u8(5) == 'a')
      Sniffed("gif", le16(6), le16(8))
    else if (n >= 12 && ascii(0, "RIFF") && ascii(8, "WAVE")) {
      // chunk walk: [id:4][size:LE32][body:size (+1 pad to word align)]
      var i = 12
      var out: Sniffed = Sniffed("wav", 0, 0) // RIFF/WAVE but fmt missing
      var done = false
      while (!done && i + 8 <= n) {
        val size = le32(i + 4)
        if (size < 0) done = true // corrupt size — stop, keep (0,0)
        else if (ascii(i, "fmt ") && size >= 16 && i + 8 + 16 <= n) {
          out = Sniffed("wav", le32(i + 12), le16(i + 10))
          done = true
        } else i += 8 + size + (size & 1)
      }
      out
    } else if (n >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      // marker scan: skip segments by their declared length until a
      // start-of-frame marker carries the dimensions
      var i = 2
      var out: Sniffed = Sniffed("jpeg", 0, 0)
      var done = false
      while (!done && i + 4 <= n) {
        if (u8(i) != 0xff) done = true // desync — stop, keep (0,0)
        else {
          val m = u8(i + 1)
          if (m == 0xff) i += 1                    // fill byte
          else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
          else {
            val len = be16(i + 2)
            if (len < 2) done = true
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                     m != 0xcc) { // SOFn
              if (i + 9 <= n) out = Sniffed("jpeg", be16(i + 7), be16(i + 5))
              done = true
            } else i += 2 + len
          }
        }
      }
      out
    } else Sniffed("unknown", 0, 0)
  }

  /** q45: construct→parse round trip over `documents` — each doc gets a
    * REAL container header (format by doc_id % 4) built as hex inside the
    * dataflow, decoded to a binary column, then `sniff`ed back per
    * partition. The WAV places a JUNK chunk before `fmt ` and the JPEG an
    * APP0 segment before SOF0, so the chunk walk / marker scan are
    * genuinely exercised, not just fixed offsets. The DuckDB oracle is
    * the arithmetic the round trip must invert. Scale shape: pure per-row
    * scan→map, zero shuffles; payloads stay an opaque binary column
    * exactly as a real asset table would hold them. */
  def mmSniff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d = s.read.parquet(s"$dir/documents.parquet")
    // %04x / %08x big-endian hex, and byte-swapped little-endian variants
    def hx(c: org.apache.spark.sql.Column, w: Int) =
      lpad(lower(hex(c)), w, "0")
    def le16h(c: org.apache.spark.sql.Column) = {
      val h = hx(c, 4)
      concat(substring(h, 3, 2), substring(h, 1, 2))
    }
    def le32h(c: org.apache.spark.sql.Column) = {
      val h = hx(c, 8)
      concat(substring(h, 7, 2), substring(h, 5, 2),
             substring(h, 3, 2), substring(h, 1, 2))
    }
    val w    = col("doc_id") % 640 + 1
    val h    = col("doc_id") % 480 + 1
    val rate = col("doc_id") % 40000 + 8000
    val ch   = col("doc_id") % 2 + 1
    val hexPayload = when(col("doc_id") % 4 === 0,
        concat(lit("89504e470d0a1a0a" + "0000000d" + "49484452"),
          hx(w, 8), hx(h, 8), lit("0806000000")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("474946383961"), le16h(w), le16h(h)))
      .when(col("doc_id") % 4 === 2,
        concat(lit("52494646"), le32h(lit(48)), lit("57415645"),
          lit("4a554e4b"), le32h(lit(4)), lit("00000000"), // JUNK chunk
          lit("666d7420"), le32h(lit(16)), le16h(lit(1)), le16h(ch),
          le32h(rate), le32h(rate * ch * 2), le16h(ch * 2), le16h(lit(16))))
      .otherwise(
        concat(lit("ffd8" + "ffe0" + "0010" + "4a46494600" + "0101" + "00" +
            "00010001" + "0000" + "ffc0" + "0011" + "08"), // APP0 then SOF0
          hx(h, 4), hx(w, 4),
          lit("03" + "011100" + "021101" + "031101" + "ffd9")))
    d.select(col("doc_id"), unhex(hexPayload).as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val sn = sniff(payload)
        (id, sn.format, sn.dim1.toLong, sn.dim2.toLong)
      })
      .toDF("doc_id", "format", "dim1", "dim2")
  }

  val mmSniffSql: String =
    """SELECT doc_id,
      |  CASE doc_id % 4 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
      |    WHEN 2 THEN 'wav' ELSE 'jpeg' END AS format,
      |  CAST(CASE doc_id % 4 WHEN 2 THEN doc_id % 40000 + 8000
      |    ELSE doc_id % 640 + 1 END AS BIGINT) AS dim1,
      |  CAST(CASE doc_id % 4 WHEN 2 THEN doc_id % 2 + 1
      |    ELSE doc_id % 480 + 1 END AS BIGINT) AS dim2
      |FROM documents""".stripMargin
}
