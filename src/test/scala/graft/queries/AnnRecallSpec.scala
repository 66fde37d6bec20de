package graft.queries

import java.nio.file.Files
import graft.SparkTestBase

/**
 * ANN quality gate: on a corpus with genuine near-duplicate structure
 * (tight clusters — the regime LSH exists for; the sf fixtures are noise),
 * the computed hyperplane cells/bands must recover most of what the exact
 * brute-force baseline finds. Deterministic fixture → deterministic recall.
 */
class AnnRecallSpec extends SparkTestBase {

  // 10 clusters × 10 members, dim 64; member = center + small noise →
  // within-cluster cosine ≈ 0.99, cross-cluster ≈ 0 ± 0.12.
  // vec_id = i, cluster = i % 10, so queries 0..4 hit 5 distinct clusters.
  lazy val dir: String = {
    import spark.implicits._
    val rnd = new scala.util.Random(20260817L)
    val centers = Array.fill(10, 64)(rnd.nextGaussian())
    val rows = (0 until 100).map { i =>
      val c = centers(i % 10)
      val v = Array.tabulate(64)(d =>
        (c(d) + 0.15 * rnd.nextGaussian()).toFloat)
      (i.toLong, v, i % 10)
    }
    val d = Files.createTempDirectory("graft-ann").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  lazy val vecs: Map[Long, Array[Float]] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").as[(Long, Array[Float])]
      .collect().toMap
  }

  test("ivfTopK with computed cells recovers most brute-force top-3 " +
       "neighbors on a clustered corpus") {
    val brute = AnnOps.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = AnnOps.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(brute.size == 15)
    val recall = (brute intersect ivf).size.toDouble / brute.size
    assert(recall >= 0.6, s"IVF recall $recall (found ${ivf.size})")
    // every IVF hit must itself be a genuine high-cosine neighbor (same
    // cluster), not an artifact of the cell partitioning
    ivf.foreach { case (q, n) =>
      assert(cosine(vecs(q), vecs(n)) > 0.5, s"ivf pair ($q,$n) not close")
    }
  }

  test("multiprobe dominates single-probe: probing Hamming-1 cells never " +
       "loses a neighbor and lifts recall toward brute-force") {
    val brute = AnnOps.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = AnnOps.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val multi = AnnOps.ivfMultiprobeTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rs = (brute intersect single).size.toDouble / brute.size
    val rm = (brute intersect multi).size.toDouble / brute.size
    assert(rm >= rs, s"multiprobe recall $rm below single-probe $rs")
    assert(rm >= 0.8, s"multiprobe recall $rm (found ${multi.size})")
    // probing neighbor cells must not admit junk: every returned pair is
    // still a genuine high-cosine neighbor
    multi.foreach { case (q, n) =>
      assert(cosine(vecs(q), vecs(n)) > 0.5, s"probe pair ($q,$n) not close")
    }
  }

  test("banded hyperplane near-dup recovers ≥80% of genuine near-duplicate " +
       "pairs (the cos≥0.95 regime the bands are tuned for)") {
    val ids = vecs.keys.toSeq.sorted
    val genuine = (for {
      a <- ids; b <- ids if a < b
      if cosine(vecs(a), vecs(b)) >= 0.4
    } yield (a, b)).toSet
    assert(genuine.size >= 400) // 10 clusters × C(10,2) = 450 expected
    val found = AnnOps.embedNearDup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (genuine intersect found).size.toDouble / genuine.size
    assert(recall >= 0.8, s"near-dup recall $recall of ${genuine.size}")
    // precision is exact by construction: every emitted pair passed the
    // exact cosine filter
    found.foreach { case (a, b) =>
      assert(cosine(vecs(a), vecs(b)) >= 0.4 - 1e-9) }
  }

  test("q38 trained-quantizer search: k-means cells recall at least as " +
       "much as the untrained hyperplane cells, and every hit is genuine") {
    val brute = AnnOps.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val hyper = AnnOps.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val km = AnnOps.kmeansTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val rh = (brute intersect hyper).size.toDouble / brute.size
    val rk = (brute intersect km).size.toDouble / brute.size
    assert(rk >= rh, s"k-means recall $rk below hyperplane $rh")
    assert(rk >= 0.8, s"k-means recall $rk (found ${km.size})")
    km.foreach { case (q, n) =>
      assert(cosine(vecs(q), vecs(n)) > 0.5, s"kmeans pair ($q,$n) not close")
    }
  }

  test("q37 k-means: Lloyd iterations never increase total distortion and " +
       "the seeded clusters map whole-cluster to one cell") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), expr(AnnOps.quantSpark).as("qv"))
    def collectCents(df: org.apache.spark.sql.DataFrame) =
      df.as[(Int, Array[Long])].collect().toSeq
        .map { case (c, v) => (c, v.toSeq) }
    var cents = collectCents(e.filter(col("vec_id") < AnnOps.KmK)
      .select(col("vec_id").cast("int").as("cell"), col("qv").as("cv")))
    var distortion = Vector.empty[Long]
    for (_ <- 1 to AnnOps.KmIters) {
      val a = AnnOps.kmAssign(e, cents)
      distortion :+= a.agg(sum("dist")).head.getLong(0)
      cents = collectCents(AnnOps.kmUpdate(a))
    }
    val fin = AnnOps.kmAssign(e, cents)
    distortion :+= fin.agg(sum("dist")).head.getLong(0)
    // Lloyd monotonicity (floor-quantized means cost at most rounding µ²)
    assert(distortion.sliding(2).forall(w => w(1) <= w(0)), distortion)
    assert(distortion.last < distortion.head * 6 / 10,
      s"no real convergence: $distortion")
    // fixture: cluster = vec_id % 10; seeds 0..7 sit in clusters 0..7.
    // Each SEEDED cluster must end up (near-)whole in a single cell —
    // clusters 8/9 may legitimately straddle whichever far centroids tie.
    val cells = fin.select($"vec_id", $"cell").as[(Long, Int)].collect()
    cells.groupBy(_._1 % 10).filter(_._1 < 8).foreach { case (lbl, m) =>
      val dominant = m.groupBy(_._2).values.map(_.size).max
      assert(dominant.toDouble / m.size >= 0.9,
        s"cluster $lbl split across cells: ${m.groupBy(_._2).view.mapValues(_.size).toMap}")
    }
  }

  test("q39/q41 product quantization: every vector encodes to PqM codes " +
       "in range, and ADC search over codes alone recovers brute-force " +
       "neighbors on the clustered corpus") {
    val codes = AnnOps.pqCodes(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // exactly PqM codes per vector, each within [0, PqK)
    assert(codes.length == vecs.size * AnnOps.PqM)
    codes.groupBy(_._1).foreach { case (v, cs) =>
      assert(cs.map(_._2).sorted.toSeq == (0 until AnnOps.PqM),
        s"vector $v missing subspaces")
    }
    assert(codes.forall(c => c._3 >= 0 && c._3 < AnnOps.PqK))
    // ADC ranks by (unnormalized) squared L2 — the right loss control is
    // the EXACT-L2 top-3, not the cosine baseline (their orderings differ
    // legitimately inside a tight cluster where all cosines ≈ 0.99)
    def sqL2(a: Array[Float], b: Array[Float]): Double =
      a.indices.map(i => (a(i).toDouble - b(i)) * (a(i).toDouble - b(i))).sum
    val exactL2 = (0L until 5L).flatMap { q =>
      vecs.keys.filter(_ >= 5).toSeq
        .sortBy(n => (sqL2(vecs(q), vecs(n)), n)).take(3).map((q, _))
    }.toSet
    val adc = AnnOps.pqAdcTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exactL2 intersect adc).size.toDouble / exactL2.size
    assert(recall >= 0.8, s"ADC recall $recall vs exact L2 (${adc.size})")
    adc.foreach { case (q, n) =>
      assert(cosine(vecs(q), vecs(n)) > 0.5, s"adc pair ($q,$n) not close")
    }
  }

  test("q64 semantic dedup: decision matches a straight-line within-cell " +
       "replay; each cell's min id survives; the clustered corpus " +
       "collapses to ~one survivor per latent cluster") {
    val cells = AnnOps.kmeansCells(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val byCell = cells.groupBy(_._2).view
      .mapValues(_.keys.toSeq.sorted).toMap
    val wantKept = cells.keySet.filter { v =>
      !byCell(cells(v)).exists(u => u < v && cosine(vecs(u), vecs(v)) >= 0.4)
    }
    val got = AnnOps.semanticDedup(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.length == 100 && got.map(_._1).distinct.length == 100)
    got.foreach { case (v, c, k) =>
      assert(c == cells(v), s"vec $v cell $c vs ${cells(v)}")
      assert(k == (if (wantKept(v)) 1L else 0L), s"vec $v kept=$k")
    }
    val keptIds = got.filter(_._3 == 1L).map(_._1).toSet
    byCell.values.foreach(ids => assert(keptIds(ids.min), ids.min.toString))
    // 10 latent clusters of within-cos ≈0.99 → aggressive collapse
    assert(keptIds.size <= 20 && keptIds.size >= 10, keptIds.size.toString)
  }
}
