package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Semantic properties of the corpus-curation family (q19/q27/q28/q29) that
 * the row-hash oracle can't express: set containment between the pipeline
 * stages, shard completeness/contiguity, and the sample-filter invariant.
 */
class CorpusOpsSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q27: only corpus docs are flagged, with >=1 shared gram and " +
       ">=1 benchmark hit each") {
    val rows = CorpusOps.decontaminate(spark, dir).collect()
    assert(rows.nonEmpty, "fixture corpus should have some contamination")
    rows.foreach { r =>
      assert(r.getLong(0) % 50 != 0, s"benchmark doc flagged: $r")
      assert(r.getLong(1) >= 1 && r.getLong(2) >= 1, r.toString)
    }
  }

  test("q28: sample = exactly the rows whose hash bucket clears the " +
       "per-language rate") {
    val sample = CorpusOps.stratifiedSample(spark, dir)
    sample.collect().foreach { r =>
      assert(r.getLong(3) < r.getLong(4), r.toString) // bucket < rate
    }
    // no stratum lost, none over-full
    val byLang = sample.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val tot = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    byLang.foreach { case (l, n) => assert(n > 0 && n <= tot(l), s"$l:$n") }
    // rates are monotone en > de > es > fr > zh on a same-sized stratum
    // basis: check the observed per-mille is within 250 of the target
    val rate = Map("en" -> 500L, "de" -> 400L, "es" -> 300L,
      "fr" -> 200L, "zh" -> 100L)
    rate.foreach { case (l, r) =>
      val pm = byLang.getOrElse(l, 0L) * 1000 / tot(l)
      assert(math.abs(pm - r) <= 250, s"$l observed $pm vs $r")
    }
  }

  test("q29: every doc lands in exactly one shard; pos is contiguous " +
       "1..n within each shard; shard in [0,32)") {
    val df = CorpusOps.shuffleShards(spark, dir)
    val n = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(df.count() == n)
    assert(df.select("doc_id").distinct().count() == n)
    val bad = df.groupBy("shard")
      .agg(count(lit(1)).as("cnt"), max(col("pos")).as("mx"),
        min(col("pos")).as("mn"))
      .filter(col("mx") =!= col("cnt") || col("mn") =!= 1 ||
        col("shard") < 0 || col("shard") >= 32)
    assert(bad.count() == 0, bad.collect().mkString(","))
  }

  test("q19: final corpus = clean survivors minus contaminated") {
    val fin = CorpusOps.corpusFinal(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val keep = TextOps.corpusClean(spark, dir).filter(col("keep") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cont = CorpusOps.decontaminate(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fin == (keep -- cont))
    assert(fin.nonEmpty)
  }
}
