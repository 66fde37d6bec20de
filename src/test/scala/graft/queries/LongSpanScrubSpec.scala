package graft.queries

import graft.SparkTestBase

/** q85 long-span exact-substring scrub (VERDICT r4 ask #5): q84's merged
  * maximal spans, thresholded at LongSpanMin tokens, scrubbed q67-style.
  * Pinned against (a) a spliced fixture with one span ABOVE and one BELOW
  * the floor — exact boundaries, exact cleaned-text md5 — and (b) the
  * real corpus reconciliations: long_cov ≤ q84.span_cov, kept_tokens ≡
  * n_tokens − long_cov, kept ≥ q67.kept, equality exactly where every
  * span clears the floor. */
class LongSpanScrubSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(
      s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("q85: spliced fixture — the 60-token shared run is scrubbed, the " +
       "20-token shared run survives, boundaries and cleaned text exact") {
    import spark.implicits._
    def w(i: Int) = s"w$i"
    val long  = (1000 until 1060).map(w) // 60 shared tokens -> scrubbed
    val short = (2000 until 2020).map(w) // 20 shared tokens -> kept
    // doc 0: 5 fresh + long(60) + 5 fresh + short(20) + 5 fresh = 95 toks;
    // long span at positions 6..65, short at 71..90
    val t0 = ((0 until 5).map(w) ++ long ++ (100 until 105).map(w) ++
              short ++ (200 until 205).map(w)).mkString(" ")
    // doc 1: same shared runs spliced into different context
    val t1 = ((300 until 303).map(w) ++ long ++ (400 until 410).map(w) ++
              short ++ (500 until 502).map(w)).mkString(" ")
    // doc 2: all fresh
    val t2 = (600 until 650).map(w).mkString(" ")
    val tmp = java.nio.file.Files.createTempDirectory("q85fx").toString
    Seq((0L, t0), (1L, t1), (2L, t2)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")

    val got = DedupOps.longSpanScrub(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5)))).toMap

    // doc 0: kept = everything except positions 6..65 (the long span);
    // the SHORT shared span stays in the cleaned text
    val kept0 = ((0 until 5).map(w) ++ (100 until 105).map(w) ++
                 short ++ (200 until 205).map(w)).mkString(" ")
    assert(got(0L) == ((95L, 1L, 60L, 35L, md5hex(kept0))),
      s"doc 0 mismatch: ${got(0L)}")
    val kept1 = ((300 until 303).map(w) ++ (400 until 410).map(w) ++
                 short ++ (500 until 502).map(w)).mkString(" ")
    assert(got(1L) == ((95L, 1L, 60L, 35L, md5hex(kept1))),
      s"doc 1 mismatch: ${got(1L)}")
    // doc 2: untouched — cleaned text is the original
    assert(got(2L) == ((50L, 0L, 0L, 50L, md5hex(
      (600 until 650).map(w).mkString(" ")))))

    // and q67 on the SAME fixture scrubs BOTH shared runs — the floor is
    // the only difference
    val kept67 = DedupOps.exactScrub(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(kept67(0L) == 95L - 60L - 20L)
    assert(got(0L)._4 == 95L - 60L,
      "q85 must keep exactly the short-span tokens q67 removes")
  }

  test("q85: real corpus reconciles with q84 spans and q67 scrub") {
    val spans84 = DedupOps.dupMaxSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap
    val kept67 = DedupOps.exactScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val got = DedupOps.longSpanScrub(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))).toMap

    assert(got.keySet == spans84.keySet)
    got.foreach { case (d, (n, nLong, longCov, kept)) =>
      val (n84, nSpans, _, spanCov) = spans84(d)
      assert(n == n84)
      assert(nLong <= nSpans, s"doc $d: more long spans than spans")
      assert(longCov <= spanCov, s"doc $d: long_cov exceeds span_cov")
      assert(kept == n - longCov, s"doc $d: kept != n_tokens - long_cov")
      assert(kept >= kept67(d), s"doc $d: q85 scrubbed more than q67")
      if (nLong == nSpans)
        assert(kept == kept67(d),
          s"doc $d: every span is long yet kept differs from q67")
      if (nLong < nSpans)
        assert(kept > kept67(d),
          s"doc $d: a short span exists yet q85 kept no more than q67")
    }
    // the threshold is non-trivial on the driver testdata: both branches
    // are populated (28 of 45 merged spans are >= 50 at sf0.001)
    assert(got.values.exists(_._2 > 0), "no long spans at all")
    assert(got.exists { case (d, g) => g._2 < spans84(d)._2 },
      "no span below the floor — threshold untested")
  }
}
