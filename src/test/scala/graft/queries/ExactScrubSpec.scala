package graft.queries

import graft.SparkTestBase

/** q67 exact-substring scrub: pinned against a straight-line replay of
  * the Lee-et-al. ExactSubstr rule (remove every token covered by a
  * cross-document duplicated 8-gram), and cross-checked against q44's
  * coverage stat — kept_tokens must equal n_tokens − dup_cov doc-for-doc,
  * since both derive from the same duplicated-gram set. */
class ExactScrubSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  test("q67: scrub md5 matches a straight-line replay and reconciles " +
       "with q44 coverage; untouched docs hash to their original text") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))

    // replay: duplicated 8-grams (>=2 distinct docs), covered positions,
    // cleaned text = uncovered tokens in order
    val occ = texts.flatMap { case (d, t) =>
      val ts = t.split(" ", -1)
      if (ts.length < 8) Seq.empty[(Long, Int, String)]
      else (0 to ts.length - 8).map { i =>
        (d, i + 1, ts.slice(i, i + 8).mkString(" "))
      }
    }
    val dup = occ.map(o => (o._1, o._3)).distinct.groupBy(_._2)
      .collect { case (g, os) if os.length >= 2 => g }.toSet
    val covered = occ.filter(o => dup(o._3))
      .flatMap(o => (o._2 to o._2 + 7).map(p => (o._1, p))).toSet
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(
        s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = texts.map { case (d, t) =>
      val ts = t.split(" ", -1)
      val kept = ts.zipWithIndex.collect {
        case (tok, i) if !covered((d, i + 1)) => tok
      }
      (d, ts.length.toLong, kept.length.toLong, md5hex(kept.mkString(" ")))
    }.sortBy(_._1).toSeq

    val got = DedupOps.exactScrub(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(got.size == want.size)
    assert(got == want,
      s"first diff: ${got.zip(want).find(p => p._1 != p._2)}")

    // the transformation actually fired on this corpus AND left most
    // docs untouched (sf0.001 has genuine cross-doc duplication but is
    // not wall-to-wall duplicated)
    val touched = got.filter(g => g._3 < g._2)
    assert(touched.nonEmpty, "no doc was scrubbed — fixture lost its dups?")
    assert(touched.size < got.size)
    val textMd5 = texts.map { case (d, t) => d -> md5hex(t) }.toMap
    got.filter(g => g._3 == g._2).foreach { g =>
      assert(g._4 == textMd5(g._1), s"untouched doc ${g._1} hash drifted")
    }

    // q44 reconciliation: kept = n_tokens - dup_cov, doc for doc
    val cov44 = DedupOps.dupSpans(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    got.foreach { g =>
      assert(g._3 == g._2 - cov44(g._1),
        s"doc ${g._1}: kept ${g._3} != ${g._2} - ${cov44(g._1)}")
    }
  }
}
