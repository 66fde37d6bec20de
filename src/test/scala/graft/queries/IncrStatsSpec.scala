package graft.queries

import java.security.MessageDigest

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic invariants for the q74-q76 wave (values are oracle-gated). */
class IncrStatsSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q74 chunking: contiguous indices, full coverage, exact window " +
       "arithmetic, and an md5 that matches a direct recomputation") {
    val chunks = CorpusOps.docChunks(spark, dir).collect()
      .groupBy(_.getLong(0))
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (docId, rows) =>
      val toks = docs(docId).split(" ")
      val byIdx = rows.sortBy(_.getLong(1))
      assert(byIdx.map(_.getLong(1)).toSeq ==
        (0L until byIdx.length).toSeq, s"doc $docId indices")
      assert(byIdx.length == (toks.length - 1) / 48 + 1, s"doc $docId count")
      byIdx.foreach { r =>
        val start = r.getLong(2).toInt
        assert(start == r.getLong(1).toInt * 48 + 1)
        val expectLen = math.min(64, toks.length - start + 1)
        assert(r.getLong(3) == expectLen, s"doc $docId start $start len")
        val span = toks.slice(start - 1, start - 1 + expectLen)
          .mkString(" ")
        val md5 = MessageDigest.getInstance("MD5")
          .digest(span.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        assert(r.getString(4) == md5, s"doc $docId chunk md5")
      }
      // the last chunk reaches the last token
      val last = byIdx.last
      assert(last.getLong(2) + last.getLong(3) - 1 == toks.length)
    }
  }

  test("q75 dim stats: 64 dims, counts equal the vector count, and " +
       "mean/variance match a direct recomputation on one dimension") {
    val stats = AnnOps.dimStats(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(stats.keySet == (0L until 64L).toSet)
    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0))
    assert(stats.values.forall(_._1 == vecs.length))
    assert(stats.values.forall(_._3 >= 0))
    val q7 = vecs.map(v => math.floor(v(7).toDouble * 1000000.0).toLong)
    val mean = q7.sum / q7.length
    val varr = q7.map(q => (q - mean) * (q - mean)).sum / q7.length
    assert(stats(7L) == ((vecs.length.toLong, mean, varr)))
  }

  test("q76 incremental vocab: df_new ≡ df_old + df_delta and the merged " +
       "table reconciles with the one-shot q42 DF table per touched term") {
    val incr = TextOps.incrVocab(spark, dir)
    assert(incr.filter(col("df_new") =!= col("df_old") + col("df_delta"))
      .count() == 0)
    assert(incr.filter(col("df_delta") < 1).count() == 0)
    val full = TextOps.tokenDf(spark, dir)
      .select(col("tok").as("term"), col("df"))
    val mismatches = incr.join(full, Seq("term"))
      .filter(col("df_new") =!= col("df")).count()
    assert(mismatches == 0,
      "incremental merge diverges from the one-shot DF table")
    assert(incr.count() > 0)
  }
}
