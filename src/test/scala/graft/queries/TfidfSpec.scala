package graft.queries

import graft.SparkTestBase

/**
 * q54 TF-IDF distinctive terms: exact-integer scores, top-3 cut and the
 * lexicographic tie-break, all hand-checkable on a 3-doc fixture.
 */
class TfidfSpec extends SparkTestBase {

  test("q54: scores, rank cut and tie-break match the hand computation") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tfidf-fix").toString
    Seq(
      (0L, "a a b"),
      (1L, "a c"),
      (2L, "b b c d d d d")
    ).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    // n_docs=3; df: a=2 b=2 c=2 d=1; idf_u = 3_000_000 // df
    val got = TextOps.tfidfTopTerms(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val want = Map(
      (0L, 1L) -> ("a", 2L, 3000000L),
      (0L, 2L) -> ("b", 1L, 1500000L),
      (1L, 1L) -> ("a", 1L, 1500000L), // tie with c → lexicographic
      (1L, 2L) -> ("c", 1L, 1500000L),
      (2L, 1L) -> ("d", 4L, 12000000L),
      (2L, 2L) -> ("b", 2L, 3000000L),
      (2L, 3L) -> ("c", 1L, 1500000L))
    assert(got == want, got.toString)
  }

  test("q61: CMS heavy hitters match a straight-line reference sketch " +
       "exactly — same table, same estimates, never an underestimate") {
    import java.security.MessageDigest
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    def bkt(r: Int, tok: String): Int = {
      val md = MessageDigest.getInstance("SHA-256")
      val hex = md.digest(s"$r:$tok".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      (java.lang.Long.parseLong(hex.take(8), 16) % 256).toInt
    }
    val occ = texts.flatMap(_.split(" "))
    val cms = Array.fill(4, 256)(0L)
    occ.foreach(t => (0 to 3).foreach(r => cms(r)(bkt(r, t)) += 1))
    val cnt = occ.groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val top = cnt.toSeq.sortBy { case (t, c) => (-c, t) }.take(20)
    val want = top.map { case (t, c) =>
      val est = (0 to 3).map(r => cms(r)(bkt(r, t))).min
      t -> ((c, est, (est - c) * 1000000L / c))
    }.toMap
    val got = TextOps.cmsHeavyHitters(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == want, s"first diff: ${(got.toSet diff want.toSet).take(2)}")
    got.values.foreach { case (c, est, over) =>
      assert(est >= c && over >= 0, s"CMS underestimated: $c vs $est")
    }
  }

  test("q63: bigram lift matches a straight-line replay — exact-integer " +
       "lift, support >= 5, top-20 by (lift desc, w1, w2)") {
    val texts = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val occ = texts.flatMap(_.split(" "))
    val n = occ.length.toLong
    val uni = occ.groupBy(identity).map { case (t, o) => t -> o.length.toLong }
    val bi = texts.flatMap { t =>
      val ts = t.split(" "); ts.dropRight(1).zip(ts.drop(1))
    }.groupBy(identity).map { case (p, o) => p -> o.length.toLong }
      .filter(_._2 >= 5)
    val want = bi.toSeq.map { case ((w1, w2), c12) =>
      (w1, w2, c12, uni(w1), uni(w2), c12 * n * 1000000L / (uni(w1) * uni(w2)))
    }.sortBy { case (w1, w2, _, _, _, l) => (-l, w1, w2) }.take(20)
    val got = TextOps.bigramLift(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got == want,
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    assert(got.size == 20 && got.forall(_._3 >= 5))
  }

  test("q65: bigram-LM surprise matches a straight-line replay — exact " +
       "floor-log2 surprisal, milli-bit means, head/middle/tail split") {
    val rows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bg = rows.flatMap { case (d, t) =>
      val ts = t.split(" ", -1)
      if (ts.length < 2) Seq.empty[(Long, String, String)]
      else ts.dropRight(1).zip(ts.drop(1)).toSeq
        .map { case (a, b) => (d, a, b) }
    }
    val uni = bg.groupBy(_._2).map { case (w, o) => w -> o.length.toLong }
    val bi = bg.groupBy(x => (x._2, x._3))
      .map { case (p, o) => p -> o.length.toLong }
    def log2floor(x: Long): Long =
      63L - java.lang.Long.numberOfLeadingZeros(x)
    val perDoc = bg.groupBy(_._1).map { case (d, os) =>
      val s = os.map { case (_, a, b) =>
        log2floor(uni(a) * 1024L / bi((a, b)))
      }.sum
      val n = os.length.toLong
      (d, n, s, s * 1000L / n)
    }.toSeq
    val sortedA = perDoc.map(_._4).toSeq.sorted
    val nd = sortedA.size
    val headCut = sortedA((nd + 2) / 3 - 1)
    val tailCut = sortedA((2 * nd + 2) / 3 - 1)
    val want = perDoc.map { case (d, n, s, a) =>
      val b = if (a <= headCut) "head"
              else if (a > tailCut) "tail" else "middle"
      (d, n, s, a, b)
    }.sortBy(_._1)
    val got = TextOps.lmSurprise(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq.sortBy(_._1)
    assert(got.size == want.size)
    assert(got == want,
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")
    // the split is CCNet's point: all three buckets non-empty, and every
    // head doc scores below every tail doc
    val byB = got.groupBy(_._5)
    assert(byB.keySet == Set("head", "middle", "tail"), byB.keySet)
    assert(byB("head").map(_._4).max < byB("tail").map(_._4).min)
  }

  test("q54: sf0.001 invariants — <=3 rows per doc, ranks contiguous " +
       "from 1, scores non-increasing within a doc") {
    val rows = TextOps.tfidfTopTerms(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc.size == 500)
    byDoc.foreach { case (d, rs) =>
      assert(rs.length <= 3, s"doc $d has ${rs.length} rows")
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, d)
      assert(sorted.sliding(2).forall {
        case Array(x, y) => x._3 >= y._3
        case _           => true
      }, s"doc $d scores not non-increasing")
    }
  }
}
