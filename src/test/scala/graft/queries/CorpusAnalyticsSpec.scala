package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantic invariants for the q77-q79 analytics wave. */
class CorpusAnalyticsSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q77 source KL: straight-line integer replay per source, and the " +
       "floored KL never dips below the interpolation-error floor") {
    val got = CorpusOps.sourceKl(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // replay with plain Scala integer arithmetic from raw (source, lang)
    // counts — same formula, independent execution path
    val counts = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("source", "lang").count().collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val bySrc = counts.groupBy(_._1)
    val byLang = counts.groupBy(_._2).map { case (l, xs) => l -> xs.map(_._3).sum }
    val total = counts.map(_._3).sum
    def log2m(x: Long): Long = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
      e * 1000 + (x * 1024 / (1L << e) - 1024) * 1000 / 1024
    }
    bySrc.foreach { case (src, rows) =>
      val nS = rows.map(_._3).sum
      val klNum = rows.map { case (_, lang, cSl) =>
        val ratio = math.max(cSl * total * 1024 / (nS * byLang(lang)), 1L)
        cSl * math.max(log2m(ratio) - 10000, -10000L)
      }.sum
      assert(got(src) == ((nS, klNum / nS)), s"replay mismatch for $src")
    }
    assert(got.values.forall(_._2 >= -200),
      "KL below the floor/interpolation error bound")
  }

  test("q78 copy matrix: totals reconcile with q12 candidates and q13 " +
       "verified dups; cells are source-normalized") {
    val m = DedupOps.copyMatrix(spark, dir)
    val rows = m.collect()
    assert(rows.forall(r => r.getString(0) <= r.getString(1)))
    val nCand = rows.map(_.getLong(2)).sum
    val nDups = rows.map(_.getLong(3)).sum
    assert(nCand == DedupOps.lshCandidatePairs(spark, dir).count())
    assert(nDups == DedupOps.jaccardPairs(spark, dir).count())
  }

  test("q79 bucket balance: loads reconcile with q29's shard assignment " +
       "and ppm columns sum to 32e6 modulo floor loss") {
    val bal = CorpusOps.bucketBalance(spark, dir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(3), r.getLong(4)))
      .toMap
    val q29 = CorpusOps.shuffleShards(spark, dir)
      .groupBy("shard").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(bal.keySet == q29.keySet)
    bal.foreach { case (shard, (nDocs, _, _)) =>
      assert(q29(shard) == nDocs, s"shard $shard doc count") }
    val docSum = bal.values.map(_._2).sum
    val tokSum = bal.values.map(_._3).sum
    assert(docSum > 32000000L - 64 && docSum <= 32000000L, s"doc ppm $docSum")
    assert(tokSum > 32000000L - 64 && tokSum <= 32000000L, s"tok ppm $tokSum")
  }
}
