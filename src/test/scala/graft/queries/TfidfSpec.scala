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
