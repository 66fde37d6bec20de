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

  test("q58: rates move every language toward the 20% target — " +
       "over-represented down-sampled, under-represented kept whole; " +
       "kept == (bucket < rate) everywhere") {
    val rows = CorpusOps.mixtureRebalance(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getInt(4)))
    assert(rows.length == 500)
    val cnt = rows.groupBy(_._2).map { case (l, rs) => l -> rs.length }
    rows.foreach { case (id, lang, bucket, rate, kept) =>
      // the rate is exactly min(1000, (200 * n) div cnt_lang)
      val want = math.min(1000L, 200L * 500L / cnt(lang))
      assert(rate == want, s"doc $id lang $lang: rate $rate vs $want")
      assert(kept == (if (bucket < rate) 1 else 0), s"doc $id")
    }
    // en is over-represented (193/500 > 20%) → down-sampled;
    // de (71/500 < 20%) → kept whole
    assert(rows.find(_._2 == "en").get._4 < 1000L)
    assert(rows.find(_._2 == "de").get._4 == 1000L)
  }

  test("q59: at most 20 docs per source survive, slots are contiguous " +
       "1..k in hash-priority order") {
    val rows = CorpusOps.sourceQuota(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = rows.groupBy(_._2)
    assert(bySrc.size == 20) // every source keeps something
    bySrc.foreach { case (src, rs) =>
      assert(rs.length <= 20, s"$src kept ${rs.length}")
      assert(rs.map(_._3).sorted.toSeq == (1L to rs.length).toSeq, src)
    }
    // every source has 25 docs in the fixture → the cap binds everywhere
    assert(rows.length == 20 * 20)
    // priority is the deterministic hash order: the survivor set equals
    // the 20 lowest sha256("quota:"+id) of each source
    val all = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"),
        sha2(concat(lit("quota:"), col("doc_id").cast("string")), 256)
          .as("k"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val wantKept = all.groupBy(_._2).values.flatMap { rs =>
      rs.sortBy(r => (r._3, r._1)).take(20).map(_._1)
    }.toSet
    assert(rows.map(_._1).toSet == wantKept)
  }

  test("q60: KMV estimates match a straight-line reference sketch " +
       "exactly, and the estimator is actually accurate") {
    import java.security.MessageDigest
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    def h40(tok: String): Long = {
      val md = MessageDigest.getInstance("SHA-256")
      val hex = md.digest(("kmv:" + tok).getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(10), 16)
    }
    val bySrc = d.groupBy(_._1).map { case (src, rows) =>
      val toks = rows.flatMap(_._2.split(" ")).distinct
      val hs = toks.map(h40).distinct.sorted
      val nExact = toks.length.toLong
      val nKmv = if (hs.length < 64) nExact
                 else 63L * 1099511627776L / hs(63)
      src -> ((nExact, nKmv, math.abs(nKmv - nExact) * 1000000L / nExact))
    }
    val got = CorpusOps.kmvDistinct(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == bySrc, s"first diff: ${
      (got.toSet diff bySrc.toSet).take(2)} vs ${
      (bySrc.toSet diff got.toSet).take(2)}")
    // k=64 gives ~12.7% standard error: demand every source lands
    // within 50% and the median within 25%
    val errs = got.values.map(_._3).toSeq.sorted
    assert(errs.last < 500000L, errs.toString)
    assert(errs(errs.length / 2) < 250000L, errs.toString)
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

  test("q62: packing stats match a straight-line per-shard replay — " +
       "concat-and-chunk at L=128, spanning docs counted exactly") {
    import java.security.MessageDigest
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def sha(s: String): String = {
      val md = MessageDigest.getInstance("SHA-256")
      md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    }
    val keyed = docs.map { case (id, text) =>
      val k = sha(s"pack:$id")
      val shard = (java.lang.Long.parseLong(k.take(8), 16) % 8).toInt
      (shard, k, id, text.split(" ").length.toLong)
    }
    val want = keyed.groupBy(_._1).map { case (shard, rs) =>
      val ordered = rs.sortBy(r => (r._2, r._3))
      var off = 0L; var spans = 0L
      ordered.foreach { r =>
        if ((off / 128) != ((off + r._4 - 1) / 128)) spans += 1
        off += r._4
      }
      val nSeqs = (off + 127) / 128
      shard -> ((rs.length.toLong, off, nSeqs, spans,
        (off - (nSeqs - 1) * 128) * 1000 / 128))
    }
    val got = CorpusOps.seqPacking(spark, dir).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    assert(got == want, (got.toSet diff want.toSet).take(2).toString)
    // global invariants: every doc lands somewhere, fills are sane
    assert(got.values.map(_._1).sum == 500L)
    got.values.foreach { case (nd, nt, ns, sp, fill) =>
      assert(ns == (nt + 127) / 128 && sp < nd &&
        fill > 0 && fill <= 1000, (nd, nt, ns, sp, fill).toString)
    }
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

  test("q68: fuzzy decontamination matches a straight-line replay; the " +
       "100-permille threshold splits exact dups from incidental overlap") {
    val texts = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def grams3(t: String): Set[String] = {
      val ts = t.split(" ", -1)
      if (ts.length < 3) Set.empty
      else (0 to ts.length - 3).map(i => ts.slice(i, i + 3).mkString(" ")).toSet
    }
    val bench = texts.filter(_._1 % 50 == 0).map { case (d, t) => d -> grams3(t) }
    val corpus = texts.filter(_._1 % 50 != 0).map { case (d, t) => d -> grams3(t) }
    val want = (for {
      (cd, cg) <- corpus; (bd, bg) <- bench
      n = (cg & bg).size.toLong if n > 0
      op = n * 1000 / bg.size
    } yield (bd, cd, n, bg.size.toLong, op,
      if (op >= 100) 1L else 0L)).sortBy(p => (p._1, p._2)).toSeq
    val got = CorpusOps.fuzzyDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(r.fieldIndex("bench_id")),
        r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("n_match")),
        r.getLong(r.fieldIndex("bench_grams")),
        r.getLong(r.fieldIndex("overlap_permille")),
        r.getLong(r.fieldIndex("contaminated"))))
      .sortBy(p => (p._1, p._2)).toSeq
    assert(got == want,
      s"sizes ${got.size}/${want.size}; first diff: " +
        s"${got.zip(want).find(p => p._1 != p._2)}")
    // graded structure exists: true contamination AND sub-threshold
    // incidental overlap both present, and they're well separated
    val (hot, cold) = got.partition(_._6 == 1L)
    assert(hot.nonEmpty && cold.nonEmpty)
    assert(hot.map(_._5).min >= 100 && cold.map(_._5).max < 100)
  }

  test("q69: token-budget selection keeps >=60% of corpus tokens with a " +
       "minimal score cutoff, matching a straight-line replay") {
    val rows = CorpusOps.budgetSelect(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = rows.map(_._2).sum
    val keptT = rows.filter(_._4 == 1L).map(_._2).sum
    assert(keptT * 1000 >= total * 600, s"kept $keptT of $total")
    assert(rows.exists(_._4 == 0L), "nothing dropped — budget degenerate")
    // the cutoff is the kept docs' min score, and it's MINIMAL: dropping
    // the cutoff bucket dips below the budget
    val cutoff = rows.filter(_._4 == 1L).map(_._3).min
    assert(rows.forall(r => (r._4 == 1L) == (r._3 >= cutoff)))
    val above = rows.filter(_._3 > cutoff).map(_._2).sum
    assert(above * 1000 < total * 600, s"cutoff not minimal: $above/$total")
    // replay the cutoff from scratch
    val byScore = rows.groupBy(_._3).map { case (s0, g) =>
      s0 -> g.map(_._2).sum }
    val wantCut = byScore.keys.toSeq.sorted(Ordering[Long].reverse)
      .scanLeft((Long.MaxValue, 0L)) { case ((_, acc), s0) =>
        (s0, acc + byScore(s0)) }.drop(1)
      .filter { case (_, cum) => cum * 1000 >= total * 600 }
      .map(_._1).max
    assert(cutoff == wantCut, s"cutoff $cutoff != replay $wantCut")
  }

  test("q66: DSIR importance weights separate the target domain — en " +
       "docs score higher than non-en on average, per-token bits respect " +
       "the clamp, and both keep classes are populated") {
    val langs = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val rows = CorpusOps.dsirWeights(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == langs.size)
    // Spark `div` and DuckDB `//` truncate toward zero, like Scala `/`
    val meanRate = rows.map(_._4).sum / rows.length
    rows.foreach { case (d, n, w, rate, k) =>
      assert(w >= -10L * n, s"doc $d below the -10 bits/token clamp")
      assert(rate == w * 1000 / n, s"doc $d rate mismatch")
      assert(k == (if (rate >= meanRate) 1L else 0L))
    }
    val (en, rest) = rows.partition(r => langs(r._1) == "en")
    def meanMilliBits(xs: Array[(Long, Long, Long, Long, Long)]) =
      xs.map(_._4).sum / xs.length
    assert(meanMilliBits(en) > meanMilliBits(rest),
      s"en ${meanMilliBits(en)} !> rest ${meanMilliBits(rest)}")
    assert(rows.exists(_._5 == 1L) && rows.exists(_._5 == 0L))
    // the selector favors the target domain: en keep-rate strictly higher
    val enKeep = en.count(_._5 == 1L).toDouble / en.length
    val restKeep = rest.count(_._5 == 1L).toDouble / rest.length
    assert(enKeep > restKeep, s"en $enKeep !> rest $restKeep")
  }

  test("q50: histogram quantiles ≡ straight-line sort-and-rank on a " +
       "mega-source fixture (one source = 50% of all docs, heavy ties)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-q50-skew")
      .toString
    // 4000 docs; 'mega' holds half the corpus; n_chars domain bounded to
    // 50 distinct values so every value carries many tied docs — the case
    // where rank-within-value could diverge if the histogram form were
    // not the identical statistic
    val rows = (0 until 4000).map { i =>
      val source = if (i < 2000) "mega" else s"s${i % 7}"
      (i.toLong, source, (i * 37 % 50 + 10).toLong)
    }
    rows.toDF("doc_id", "source", "n_chars")
      .write.parquet(s"$tmp/documents.parquet")
    val got = CorpusOps.lenQuantiles(spark, tmp).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val expect = rows.groupBy(_._2).map { case (src, rs) =>
      val sorted = rs.map(_._3).sorted
      val n = sorted.length.toLong
      def q(p: Int) = sorted(((n - 1) * p / 100).toInt)
      src -> ((n, q(50), q(90), q(99)))
    }
    assert(got == expect)
    assert(got("mega")._1 == 2000L)
  }
}
