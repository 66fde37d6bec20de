package graft.queries

import graft.SparkTestBase

/** q84 maximal duplicated spans: adjacent duplicated 8-grams merge into
  * maximal runs with span-accurate boundaries. Pinned against (a) a
  * straight-line replay of the run merge on the real corpus, (b) a
  * spliced fixture whose shared substring has KNOWN exact boundaries,
  * and (c) q44/q67 reconciliation — span_cov ≡ dup_cov and
  * kept_tokens ≡ n_tokens − span_cov, doc for doc. */
class MaxSpansSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Straight-line replay: duplicated grams → covered set → maximal runs. */
  private def replay(texts: Seq[(Long, String)])
      : Map[Long, (Long, Long, Long, Long, String)] = {
    val occ = texts.flatMap { case (d, t) =>
      val ts = t.split(" ", -1)
      if (ts.length < 8) Seq.empty[(Long, Int, String)]
      else (0 to ts.length - 8).map { i =>
        (d, i + 1, ts.slice(i, i + 8).mkString(" "))
      }
    }
    val dup = occ.map(o => (o._1, o._3)).distinct.groupBy(_._2)
      .collect { case (g, os) if os.length >= 2 => g }.toSet
    val covByDoc = occ.filter(o => dup(o._3))
      .flatMap(o => (o._2 to o._2 + 7).map(p => (o._1, p)))
      .toSet.groupBy((x: (Long, Int)) => x._1)
      .view.mapValues(_.map(_._2).toVector.sorted).toMap
    texts.map { case (d, t) =>
      val n = t.split(" ", -1).length.toLong
      val cov = covByDoc.getOrElse(d, Vector.empty)
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      cov.foreach { p =>
        if (runs.nonEmpty && runs.last._2 == p - 1)
          runs(runs.length - 1) = (runs.last._1, p)
        else runs += ((p, p))
      }
      val md = md5hex(runs.map(r => s"${r._1}-${r._2}").mkString(" "))
      d -> ((n, runs.length.toLong,
        if (runs.isEmpty) 0L else runs.map(r => r._2 - r._1 + 1).max.toLong,
        cov.length.toLong, md))
    }.toMap
  }

  test("q84: boundaries on a spliced fixture are span-exact") {
    import spark.implicits._
    // doc 0: w0..w39; doc 1 shares w10..w29 verbatim (spliced into fresh
    // context) -> ONE maximal span of 20 tokens at positions 11..30 in
    // doc 0 and 6..25 in doc 1; doc 2 is all-fresh (no spans)
    def w(i: Int) = s"w$i"
    val shared = (10 until 30).map(w).mkString(" ")
    val t0 = (0 until 40).map(w).mkString(" ")
    val t1 = ((100 until 105).map(w) ++ (10 until 30).map(w) ++
              (200 until 210).map(w)).mkString(" ")
    val t2 = (300 until 340).map(w).mkString(" ")
    // doc 3: TWO disjoint shared regions (w10..w19 at 4..13, w20..w29 at
    // 17..26, separated by 3 fresh tokens — too short to bridge) -> but a
    // 10-token run only carries duplicated 8-grams, so both regions fully
    // cover -> two maximal spans
    val t3 = ((400 until 403).map(w) ++ (10 until 20).map(w) ++
              (500 until 503).map(w) ++ (20 until 30).map(w) ++
              (600 until 605).map(w)).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("q84fx").toString
    Seq((0L, t0), (1L, t1), (2L, t2), (3L, t3)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = DedupOps.dupMaxSpans(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(got(0L) == ((40L, 1L, 20L, 20L, md5hex("11-30"))))
    assert(got(1L) == ((35L, 1L, 20L, 20L, md5hex("6-25"))))
    assert(got(2L) == ((40L, 0L, 0L, 0L, md5hex(""))))
    assert(got(3L) == ((31L, 2L, 10L, 20L, md5hex("4-13 17-26"))),
      "two disjoint shared regions must merge into TWO maximal spans")
    assert(shared.split(" ").length == 20)
  }

  test("q84: real corpus matches the straight-line replay and reconciles " +
       "with q44 coverage and q67 kept_tokens") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val want = replay(texts)

    val got = DedupOps.dupMaxSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (d, g) =>
      assert(g == want(d), s"doc $d: got $g want ${want(d)}")
    }
    // the merge is non-trivial on the real fixture: spans exist, and
    // adjacent grams merged into runs LONGER than one 8-gram (the
    // multi-span case is pinned by the spliced fixture above)
    assert(got.values.exists(_._2 >= 1), "no duplicated spans at all")
    assert(got.values.exists(_._3 > 8), "no merged run longer than a gram")

    // q44: span_cov ≡ dup_cov; q67: kept_tokens ≡ n_tokens − span_cov
    val cov44 = DedupOps.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val kept67 = DedupOps.exactScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { case (d, g) =>
      assert(g._4 == cov44(d), s"doc $d: span_cov ${g._4} != dup_cov")
      assert(kept67(d) == g._1 - g._4, s"doc $d: kept != n_tokens - span_cov")
    }
  }
}
