package graft.queries

import graft.SparkTestBase

/**
 * q51 BPE merge training: exact merge table on a hand-computed fixture
 * (covering greedy left-to-right application, the leading-space symbol
 * convention, lexicographic tie-break, and early exhaustion), plus the
 * max-pair-count monotonicity invariant on the real sf0.001 corpus.
 */
class BpeMergeSpec extends SparkTestBase {

  test("q51: exact merges on a hand-computed corpus, early exhaustion") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-fix").toString
    // pretokens: "abab" ×1, " abab" ×2, " cd" ×1
    Seq((1L, "abab abab abab cd")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.bpeMerges(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .sortBy(_._1)
    val want = Seq(
      (1L, "a", "b", "ab", 6L),       // (a,b): 2·1 + 2·2
      (2L, "ab", "ab", "abab", 3L),   // greedy: [ab,ab] from a,b,a,b
      (3L, " ", "abab", " abab", 2L), // space is a real symbol
      (4L, " ", "c", " c", 1L),       // tie with (c,d) → l asc: ' ' < 'c'
      (5L, " c", "d", " cd", 1L))     // then exhausted: 5 < K merges
    assert(got.toSeq == want, s"got ${got.mkString("; ")}")
  }

  test("q52: exact encode on the hand-computed corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpe-enc").toString
    Seq((1L, "abab abab abab cd")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // after the 5 merges above, every pretoken is a single token:
    // [abab] [ abab] [ abab] [ cd] -> 4 tokens over 17 alphabetic chars
    val got = TextOps.bpeEncode(spark, dir).collect()
    assert(got.length == 1)
    val r = got(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((1L, 4L, 4L, 17L, 4250L)), r.toString)
  }

  test("q52: sf0.001 token counts bounded by pretokens and chars") {
    val rows = TextOps.bpeEncode(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pre, bpe, chars) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(bpe >= pre && bpe <= chars, r.toString) // merges only shrink
    }
    // the trained merges must actually compress: strictly fewer tokens
    // than characters corpus-wide
    assert(rows.map(_.getLong(2)).sum < rows.map(_.getLong(3)).sum)
  }

  test("q51: sf0.001 yields K merges with non-increasing pair counts") {
    // merging the argmax pair can only remove occurrences of other pairs
    // and create pairs no more frequent than the merged one, so the
    // selected counts are non-increasing across iterations
    val rows = TextOps.bpeMerges(spark, "/root/testdata/sf0.001")
      .collect().sortBy(_.getLong(0))
    assert(rows.length == 8, s"expected 8 merges, got ${rows.length}")
    val cnts = rows.map(_.getLong(4))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
      cnts.mkString(","))
    rows.foreach { r =>
      assert(r.getString(3) == r.getString(1) + r.getString(2))
    }
  }
}
