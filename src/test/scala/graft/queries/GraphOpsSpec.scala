package graft.queries

import graft.SparkTestBase

/**
 * q53 PageRank: bit-exact agreement with an independent in-memory
 * reference loop on a tiny fixture, plus invariants on sf0.001.
 */
class GraphOpsSpec extends SparkTestBase {

  /** Straight-line reference: the same exact-integer recurrence, no
    * Spark, no SQL. */
  private def refRanks(n: Int, iters: Int): Array[Long] = {
    val edges = (0 until n).flatMap { s =>
      Seq((7 * s + 1) % n, (13 * s + 2) % n, (31 * s + 3) % n)
        .take(s % 3 + 1).map(d => (s, d))
    }
    var r = Array.fill(n)(1000000L)
    for (_ <- 1 to iters) {
      val in = Array.fill(n)(0L)
      edges.foreach { case (s, d) => in(d) += r(s) / (s % 3 + 1) }
      r = in.map(m => 150000L + (850L * m) / 1000L)
    }
    r
  }

  test("q53: matches the reference loop exactly on a 7-node graph") {
    import spark.implicits._
    val n = 7
    val dir = java.nio.file.Files.createTempDirectory("pr-fix").toString
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = GraphOps.pageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = refRanks(n, 6)
    (0 until n).foreach { i =>
      assert(got(i.toLong) == want(i), s"node $i: ${got(i.toLong)} vs ${want(i)}")
    }
  }

  test("q53: sf0.001 invariants — one row per doc, floor >= 150000, " +
       "mass conserved within floor losses") {
    val rows = GraphOps.pageRank(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getLong(1) >= 150000L))
    val total = rows.map(_.getLong(1)).sum
    // each iteration loses <3 µ/node to the div-3 floor and <1 µ/node to
    // the damping floor; total stays within a tight band of n×10^6
    assert(total <= 500L * 1000000L && total > 500L * 990000L, total.toString)
    // the graph is irregular: ranks must actually differ across nodes
    assert(rows.map(_.getLong(1)).distinct.length > 100)
  }

  /** Brute-force per-node triangle counts over the same deterministic
    * edge rule (modular out-edges + the s+1/s+2 ring), straight
    * adjacency sets — no Spark, no orientation trick. */
  private def refTriangles(n: Int): Array[Long] = {
    val adj = Array.fill(n)(scala.collection.mutable.Set.empty[Int])
    for (s <- 0 until n;
         d <- Seq((7 * s + 1) % n, (13 * s + 2) % n, (31 * s + 3) % n)
           .take(s % 3 + 1) ++ Seq((s + 1) % n, (s + 2) % n) if d != s) {
      adj(s) += d; adj(d) += s
    }
    val cnt = Array.fill(n)(0L)
    for (a <- 0 until n; b <- adj(a) if b > a;
         c <- adj(a) if c > b && adj(b).contains(c)) {
      cnt(a) += 1; cnt(b) += 1; cnt(c) += 1
    }
    cnt
  }

  test("q55: per-node triangle counts match the brute-force reference " +
       "on the full sf0.001 graph (n=500)") {
    val want = refTriangles(500)
    assert(want.sum > 0 && want.sum % 3 == 0, want.sum.toString)
    val got = GraphOps.triangles(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 500)
    (0 until 500).foreach { i =>
      assert(got(i.toLong) == want(i),
        s"node $i: ${got(i.toLong)} vs ${want(i)}")
    }
  }

  /** Straight-line HITS: same exact-integer max-renormalized recurrence
    * over the distinct self-loop-free edge set. */
  private def refHits(n: Int, iters: Int): (Array[Long], Array[Long]) = {
    val edges = (0 until n).flatMap { s =>
      Seq((7 * s + 1) % n, (13 * s + 2) % n, (31 * s + 3) % n)
        .take(s % 3 + 1).filter(_ != s).map(d => (s, d))
    }.distinct
    var h = Array.fill(n)(1000000L)
    var a = Array.fill(n)(0L)
    for (_ <- 1 to iters) {
      val araw = Array.fill(n)(0L)
      edges.foreach { case (s, d) => araw(d) += h(s) }
      val amx = araw.max
      a = araw.map(x => x * 1000000L / amx)
      val hraw = Array.fill(n)(0L)
      edges.foreach { case (s, d) => hraw(s) += a(d) }
      val hmx = hraw.max
      h = hraw.map(x => x * 1000000L / hmx)
    }
    (h, a)
  }

  test("q56: hub and authority scores match the reference loop exactly " +
       "on the full sf0.001 graph (n=500)") {
    val (wantH, wantA) = refHits(500, 4)
    val got = GraphOps.hits(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size == 500)
    (0 until 500).foreach { i =>
      assert(got(i.toLong) == ((wantH(i), wantA(i))),
        s"node $i: ${got(i.toLong)} vs ${(wantH(i), wantA(i))}")
    }
    // normalization invariant: scores live in [0, 1e6] and the max hits it
    assert(got.values.forall { case (h, a) =>
      h >= 0 && h <= 1000000L && a >= 0 && a <= 1000000L })
    assert(got.values.map(_._1).max == 1000000L)
    assert(got.values.map(_._2).max == 1000000L)
  }

  test("q57: host-graph contraction matches an in-memory rollup of the " +
       "same edges + source mapping") {
    val d = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val n = d.size
    val edges = (0 until n).flatMap { s =>
      Seq((7 * s + 1) % n, (13 * s + 2) % n, (31 * s + 3) % n)
        .take(s % 3 + 1).filter(_ != s).map(dd => (s, dd))
    }.distinct
    val eset = edges.toSet
    val want = edges.groupBy { case (s, dd) => (d(s.toLong), d(dd.toLong)) }
      .map { case (k, es) =>
        k -> ((es.size.toLong,
          es.count { case (s, dd) => eset.contains((dd, s)) }.toLong,
          es.map(_._1).distinct.size.toLong))
      }
    val got = GraphOps.hostGraph(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == want,
      s"diff: ${(got.toSet diff want.toSet).take(3)} / ${(want.toSet diff got.toSet).take(3)}")
  }

  test("q55: tiny fixture — degree-ordered enumeration finds exactly the " +
       "hand-checkable triangles of a 5-node graph") {
    val n = 5
    val dir = java.nio.file.Files.createTempDirectory("tri-fix").toString
    import spark.implicits._
    (0 until n).map(i => (i.toLong, s"doc $i")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val want = refTriangles(n)
    val got = GraphOps.triangles(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0 until n).foreach { i =>
      assert(got(i.toLong) == want(i),
        s"node $i: ${got(i.toLong)} vs ${want(i)}")
    }
  }
}
