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
}
