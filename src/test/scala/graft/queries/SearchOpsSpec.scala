package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/**
 * Semantic invariants for the q70-q73 wave (the value-level correctness is
 * the DuckDB oracle gate; these pin the properties the gate can't see).
 */
class SearchOpsSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q70 BM25: per term ranks are contiguous from 1, scores " +
       "non-increasing in rank, and every hit really contains the term") {
    val rows = SearchOps.bm25TopK(spark, dir)
      .collect().groupBy(_.getString(0))
    assert(rows.nonEmpty)
    rows.foreach { case (term, hits) =>
      val byRank = hits.sortBy(_.getLong(5))
      assert(byRank.map(_.getLong(5)).toSeq == (1L to byRank.length).toSeq,
        s"$term ranks")
      val scores = byRank.map(_.getLong(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"$term scores not sorted: ${scores.toSeq}")
      assert(byRank.forall(_.getLong(2) >= 1), s"$term zero-tf hit")
      assert(byRank.length <= 10)
    }
    // the fixture vocabulary contains all three query terms
    assert(rows.keySet == Set("spark", "merge", "window"))
  }

  test("q70 BM25: higher tf wins at equal document length and shared term") {
    val df = SearchOps.bm25TopK(spark, dir)
      .filter(col("term") === "spark")
      .select("dl", "tf", "score_micro").collect()
    val byDl = df.groupBy(_.getLong(0)).filter(_._2.length >= 2)
    byDl.foreach { case (dl, hits) =>
      val sorted = hits.sortBy(_.getLong(1))
      sorted.zip(sorted.tail).foreach { case (lo, hi) =>
        assert(lo.getLong(2) <= hi.getLong(2),
          s"dl=$dl: tf=${lo.getLong(1)} scored above tf=${hi.getLong(1)}")
      }
    }
  }

  test("q71 random projection: JL energy ratio concentrates near 1e6 " +
       "per vector and its corpus mean is tight") {
    val e = AnnOps.randProj(spark, dir).select("energy_ppm").collect()
      .map(_.getLong(0))
    assert(e.length > 400)
    // per-vector the 8-component ratio is χ²-wide (measured sf0.001:
    // 38k..4.4M ppm) — the JL concentration is in the corpus MEAN
    assert(e.forall(v => v > 10000 && v < 10000000),
      s"outlier ratio: min=${e.min} max=${e.max}")
    val mean = e.sum / e.length
    assert(mean > 850000 && mean < 1150000, s"mean=$mean")
  }

  test("q71 random projection: components are non-degenerate (each " +
       "output dimension varies across vectors)") {
    val df = AnnOps.randProj(spark, dir)
    (0 until 8).foreach { j =>
      val d = df.select(countDistinct(col(s"p$j"))).collect()(0).getLong(0)
      assert(d > 100, s"p$j collapsed to $d distinct values")
    }
  }

  test("q72 MinHash audit: covers every LSH candidate pair, every pair " +
       "matches >=2 families (its shared band), and the estimate tracks " +
       "directly-computed shingle Jaccard") {
    val audit = DedupOps.minhashAudit(spark, dir)
    val nPairs = DedupOps.lshCandidatePairs(spark, dir).count()
    assert(audit.count() == nPairs && nPairs > 0)
    // a candidate pair shares a full band = both of that band's families
    assert(audit.filter(col("match_fams") < 2).count() == 0)
    // est is an 8-sample estimator of SHINGLE-set Jaccard: recompute the
    // truth independently and bound the mean absolute error (expected
    // sd ≈ sqrt(p(1-p)/8) ≤ 177‰)
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), expr("array_distinct(transform(" +
        "sequence(1, size(toks) - 2), i -> concat_ws(' ', " +
        "element_at(toks, i), element_at(toks, i + 1), " +
        "element_at(toks, i + 2))))").as("sh"))
    val truth = audit
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")),
        Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")),
        Seq("doc_b"))
      .select(col("est_permille"),
        expr("size(array_intersect(sh_a, sh_b)) * 1000 div " +
          "size(array_union(sh_a, sh_b))").as("true_permille"))
      .select(abs(col("est_permille") - col("true_permille")).as("err"))
      .agg(avg(col("err"))).collect()(0).getDouble(0)
    assert(truth < 300, s"mean |est - shingle jaccard| = $truth permille")
  }

  test("q73 postings: df/cf reconcile with direct counts and the head is " +
       "capped at 8, ordered by tf desc") {
    val p = SearchOps.postings(spark, dir)
    val direct = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(col("term") === "spark")
    val row = p.filter(col("term") === "spark").collect()(0)
    assert(row.getLong(row.fieldIndex("cf")) == direct.count())
    assert(row.getLong(row.fieldIndex("df")) ==
      direct.select("doc_id").distinct().count())
    val entries = row.getString(row.fieldIndex("postings_head")).split(" ")
    assert(entries.length <= 8 && entries.nonEmpty)
    val tfs = entries.map(_.split(":")(1).toLong)
    assert(tfs.zip(tfs.tail).forall { case (a, b) => a >= b },
      s"head not tf-ordered: ${tfs.toSeq}")
  }
}
