package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline over `documents`:
 * language-ID (stopword-hit heuristic), quality scoring (token/distinct/
 * stopword ratios in exact integer permille), token counting, and document
 * fingerprinting (polynomial rolling hash over md5-derived token codes).
 * All arithmetic is integer-exact so the DuckDB oracles match bit-for-bit.
 */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  // tiny per-language stopword lists (deterministic heuristic — the
  // synthetic corpus shares one vocabulary, so the interesting output is
  // the hit counts + argmax rule, not linguistic accuracy)
  private val en = Seq("the", "a", "of", "and")
  private val de = Seq("der", "die", "das", "und")
  private val es = Seq("el", "la", "de", "y")

  private def hits(toks: String, words: Seq[String]) =
    size(filter(col(toks), t =>
      t.isin(words.map(lit(_).cast("string")): _*))).cast("long")

  /** Language-ID: stopword-hit counts per candidate language + argmax
    * guess (ties → 'und'). */
  def langId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), col("lang"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("lang"),
        hits("toks", en).as("en_hits"),
        hits("toks", de).as("de_hits"),
        hits("toks", es).as("es_hits"))
      .withColumn("guess",
        when(col("en_hits") > col("de_hits") &&
             col("en_hits") > col("es_hits"), "en")
          .when(col("de_hits") > col("en_hits") &&
                col("de_hits") > col("es_hits"), "de")
          .when(col("es_hits") > col("en_hits") &&
                col("es_hits") > col("de_hits"), "es")
          .otherwise("und"))

  val langIdSql: String =
    """SELECT doc_id, lang, en_hits, de_hits, es_hits,
      |  CASE
      |    WHEN en_hits > de_hits AND en_hits > es_hits THEN 'en'
      |    WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
      |    WHEN es_hits > en_hits AND es_hits > de_hits THEN 'es'
      |    ELSE 'und' END AS guess
      |FROM (
      |  SELECT doc_id, lang,
      |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and')))
      |      AS BIGINT) AS en_hits,
      |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und')))
      |      AS BIGINT) AS de_hits,
      |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','y')))
      |      AS BIGINT) AS es_hits
      |  FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
      |        FROM documents))""".stripMargin

  /** Quality scoring: token counts, type-token ratio and stopword ratio in
    * integer permille (floor division — identical in both engines). */
  def qualityScore(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"),
        length(col("text")).as("n_chars_t"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        hits("toks", en ++ de ++ es).as("stop_cnt"),
        col("n_chars_t").cast("long").as("n_chars_t"))
      .withColumn("ttr_permille",
        expr("(n_distinct * 1000) div n_tokens"))
      .withColumn("stop_permille",
        expr("(stop_cnt * 1000) div n_tokens"))

  val qualityScoreSql: String =
    """SELECT doc_id, n_tokens, n_distinct, stop_cnt, n_chars_t,
      |  (n_distinct * 1000) // n_tokens AS ttr_permille,
      |  (stop_cnt * 1000) // n_tokens AS stop_permille
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(toks, t -> t IN
      |      ('the','a','of','and','der','die','das','und','el','la','de','y')))
      |      AS BIGINT) AS stop_cnt,
      |    CAST(length(text) AS BIGINT) AS n_chars_t
      |  FROM (SELECT doc_id, text, string_split(text, ' ') AS toks
      |        FROM documents))""".stripMargin

  /** Token counting rolled up per (lang, source). */
  def tokenStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), col("source"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .groupBy("lang", "source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        expr("(sum(n_tokens) * 1000) div count(1)")
          .as("avg_tokens_permille"))

  val tokenStatsSql: String =
    """SELECT lang, source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |  CAST((SUM(n_tokens) * 1000) // COUNT(*) AS BIGINT)
      |    AS avg_tokens_permille
      |FROM (SELECT lang, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents)
      |GROUP BY 1, 2""".stripMargin

  /** BPE-ish pretokenizer regex — the GPT-2 pattern's shape (contraction
    * suffixes | space?+letter run | space?+digit run | space?+other run)
    * restricted to constructs Java regex and DuckDB's RE2 evaluate
    * identically: alternation, ASCII classes, no lookaround (RE2 has
    * none), leftmost-first in both. A training pipeline budgets corpora in
    * BPE tokens, not whitespace words; this is the cheap upper-bound
    * pre-count (every real BPE token boundary is a subset of a pretoken). */
  private val bpeRe =
    "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Token counting, tokenizer-comparative: whitespace words vs BPE-ish
    * pretokens per document (+ ratio in exact permille). Pure per-row
    * codegen'd expressions — no shuffle, scales linearly. */
  def bpeTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(bpeRe), lit(0)))
          .cast("long").as("bpe_tokens"))
      .withColumn("bpe_per_ws_permille",
        expr("(bpe_tokens * 1000) div ws_tokens"))

  val bpeTokensSql: String = {
    val re = bpeRe.replace("'", "''")
    s"""SELECT doc_id,
       |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) AS bpe_tokens,
       |  (CAST(len(regexp_extract_all(text, '$re')) AS BIGINT) * 1000)
       |    // CAST(len(string_split(text, ' ')) AS BIGINT)
       |    AS bpe_per_ws_permille
       |FROM documents""".stripMargin
  }

  /** q25: the composed training-corpus cleaning pass — what an actual
    * 100 TB pipeline runs nightly: exact-dedup survivors (q10's min-id
    * rule) annotated with language guess (q20) and quality metrics (q21),
    * plus the final `keep` verdict (identified language + type-token ratio
    * + length gates). One scan computes every per-row feature (the
    * stopword hits feed BOTH lang-id and quality — Catalyst's common
    * subexpression elimination shares them); the only shuffle is the
    * dedup group-by, keyed on the 32-hex content hash (map-side combine,
    * uniform key space — no skew). Emits survivors only: downstream
    * training jobs read this manifest, not the raw corpus. */
  /** The per-row half of q25, shared with the streaming ingest twin
    * (streaming/DocStream.ingest): (doc_id, lang, source, text) →
    * content hash + language guess + quality verdict. Pure codegen'd
    * projection — no shuffle, usable on a micro-batch unchanged. */
  private[graft] def cleanFeatures(docsDf: DataFrame): DataFrame =
    docsDf
      .select(col("doc_id"), col("lang"), col("source"),
        substring(sha2(col("text"), 256), 1, 32).as("text_hash"),
        split(col("text"), " ").as("toks"))
      .select(col("doc_id"), col("lang"), col("source"), col("text_hash"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct"),
        hits("toks", en).as("en_hits"),
        hits("toks", de).as("de_hits"),
        hits("toks", es).as("es_hits"))
      .withColumn("guess",
        when(col("en_hits") > col("de_hits") &&
             col("en_hits") > col("es_hits"), "en")
          .when(col("de_hits") > col("en_hits") &&
                col("de_hits") > col("es_hits"), "de")
          .when(col("es_hits") > col("en_hits") &&
                col("es_hits") > col("de_hits"), "es")
          .otherwise("und"))
      .withColumn("ttr_permille", expr("(n_distinct * 1000) div n_tokens"))
      .withColumn("keep",
        (col("guess") =!= "und" && col("ttr_permille") >= 200 &&
          col("n_tokens") >= 8).cast("int"))

  def corpusClean(s: SparkSession, dir: String): DataFrame = {
    val d = cleanFeatures(docs(s, dir))
    val survivors = d.groupBy("text_hash")
      .agg(min(col("doc_id")).as("doc_id"),
        count(lit(1)).as("dup_cnt"))
    d.join(survivors, Seq("text_hash", "doc_id"))
      .select("doc_id", "lang", "source", "text_hash", "dup_cnt",
        "n_tokens", "ttr_permille", "guess", "keep")
  }

  val corpusCleanSql: String =
    """WITH d AS (
      |  SELECT doc_id, lang, source,
      |    substr(sha256(text), 1, 32) AS text_hash,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
      |    CAST(len(list_filter(toks, t -> t IN ('the','a','of','and')))
      |      AS BIGINT) AS en_hits,
      |    CAST(len(list_filter(toks, t -> t IN ('der','die','das','und')))
      |      AS BIGINT) AS de_hits,
      |    CAST(len(list_filter(toks, t -> t IN ('el','la','de','y')))
      |      AS BIGINT) AS es_hits
      |  FROM (SELECT doc_id, lang, source, text, string_split(text, ' ')
      |          AS toks FROM documents)),
      |s AS (SELECT text_hash, MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
      |      FROM d GROUP BY 1)
      |SELECT d.doc_id, lang, source, d.text_hash, dup_cnt, n_tokens,
      |  (n_distinct * 1000) // n_tokens AS ttr_permille,
      |  CASE
      |    WHEN en_hits > de_hits AND en_hits > es_hits THEN 'en'
      |    WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
      |    WHEN es_hits > en_hits AND es_hits > de_hits THEN 'es'
      |    ELSE 'und' END AS guess,
      |  CAST(CASE
      |     WHEN en_hits > de_hits AND en_hits > es_hits THEN 'en'
      |     WHEN de_hits > en_hits AND de_hits > es_hits THEN 'de'
      |     WHEN es_hits > en_hits AND es_hits > de_hits THEN 'es'
      |     ELSE 'und' END <> 'und'
      |   AND (n_distinct * 1000) // n_tokens >= 200
      |   AND n_tokens >= 8 AS INTEGER) AS keep
      |FROM d JOIN s ON d.text_hash = s.text_hash AND d.doc_id = s.doc_id""".stripMargin

  /** q26: the repetition filter (the Gopher/MassiveText "fraction of
    * duplicate n-grams" rule — boilerplate and spam score high, prose
    * scores low): per document, the fraction of word 3-grams that are
    * repeats of an earlier 3-gram in the same document, exact integer
    * permille. Pure per-row array math — grams are built and deduped
    * inside one projection, so the operator is a linear scan with no
    * shuffle and no cross-document state; at 100 TB it rides the same
    * single-pass manifest scan as q20/q21 (and q25 can absorb it as
    * another shared-scan feature). Documents under 3 tokens have no
    * 3-gram and are filtered identically in both engines. */
  def repetition(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("""transform(sequence(1, size(toks) - 2),
                  i -> concat_ws(' ', element_at(toks, i),
                    element_at(toks, i + 1), element_at(toks, i + 2)))""")
          .as("grams"))
      .select(col("doc_id"),
        size(col("grams")).cast("long").as("gram_cnt"),
        expr("""cast(1000 - (cast(size(array_distinct(grams)) as bigint)
                  * 1000) div size(grams) as bigint)""").as("dup_permille"))

  val repetitionSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |g AS (SELECT doc_id,
      |        list_transform(generate_series(1, len(toks) - 2),
      |          i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |          AS grams
      |      FROM t WHERE len(toks) >= 3)
      |SELECT doc_id, CAST(len(grams) AS BIGINT) AS gram_cnt,
      |  CAST(1000 - (CAST(len(list_distinct(grams)) AS BIGINT) * 1000)
      |    // len(grams) AS BIGINT) AS dup_permille
      |FROM g""".stripMargin

  /** Document fingerprint: polynomial rolling hash over md5-derived token
    * codes, h ← (h·131 + code) mod 1e9+7 — an order-sensitive content
    * fingerprint (unlike the bag-of-words sketches in DedupOps). */
  def fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        expr("""aggregate(
                  transform(split(text, ' '),
                    x -> cast(conv(substr(md5(x), 1, 8), 16, 10) as bigint)),
                  0L,
                  (h, t) -> (h * 131 + t) % 1000000007)""").as("fp"))

  val fingerprintSql: String =
    """SELECT doc_id,
      |  list_reduce(
      |    list_prepend(CAST(0 AS BIGINT),
      |      list_transform(string_split(text, ' '),
      |        x -> ('0x' || substr(md5(x), 1, 8))::BIGINT)),
      |    (h, t) -> (h * 131 + t) % 1000000007) AS fp
      |FROM documents""".stripMargin

  /** q42: corpus vocabulary with document frequency — the table a pipeline
    * builds stopword lists, vocabulary caps and DF-based quality filters
    * from. One row per distinct token: df (docs containing it) and df_ppm
    * (integer parts-per-million share of the corpus).
    *
    * Scale shape: explode(distinct tokens) is narrow; the groupBy("tok")
    * aggregates with map-side combine, so the shuffle carries one row per
    * (partition, token) — bounded by vocabulary, not corpus size. The
    * corpus total rides a 1-row broadcast (scalar subquery), never a
    * second scan of the wide table. */
  def tokenDf(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val total = d.agg(count(lit(1)).cast("long").as("n_docs"))
    d.select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(total))
      .select(col("tok"), col("df"),
        expr("(df * 1000000) div n_docs").as("df_ppm"))
  }

  val tokenDfSql: String =
    """SELECT tok, df, (df * 1000000) // n_docs AS df_ppm
      |FROM (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
      |  FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS tok
      |        FROM documents)
      |  GROUP BY tok),
      |  (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)""".stripMargin

  /** q76: incremental vocabulary update — maintain q42's DF table under a
    * new document batch without rebuilding it: per term TOUCHED BY THE
    * BATCH, the prior-corpus df, the batch delta, and the merged df. The
    * corpus/batch split is the q15/q35 derived threshold (batch = doc_id ≥
    * ⌊4·max/5⌋); in production df_old is the stored vocab table from the
    * previous snapshot and only the (term, df) rows for batch terms are
    * read back.
    *
    * Scale shape: work ∝ batch — the batch-side aggregate is
    * batch-bounded; the batch term set broadcasts as a LEFT SEMI into the
    * corpus token stream, so the corpus side aggregates ONLY the touched
    * vocabulary (never the full vocab table, and the corpus is scanned,
    * not shuffled, beyond those terms). The final merge joins two
    * vocab-bounded tables. */
  def incrVocab(s: SparkSession, dir: String): DataFrame = {
    // literal split (the DedupOps.thresholdVal pattern): the doc_id
    // predicate pushes into each side's scan before the token explode
    val t = graft.queries.DedupOps.thresholdVal(docs(s, dir))
    val tok = docs(s, dir).select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("term"))
    val bdf = tok.filter(col("doc_id") >= t)
      .groupBy("term").agg(count(lit(1)).cast("long").as("df_delta"))
    val cdf = tok.filter(col("doc_id") < t)
      .join(broadcast(bdf.select("term")), Seq("term"), "left_semi")
      .groupBy("term").agg(count(lit(1)).cast("long").as("df_old"))
    bdf.join(cdf, Seq("term"), "left")
      .select(col("term"),
        coalesce(col("df_old"), lit(0L)).as("df_old"),
        col("df_delta"),
        (coalesce(col("df_old"), lit(0L)) + col("df_delta")).as("df_new"))
  }

  val incrVocabSql: String =
    """WITH t AS (SELECT max(doc_id)*4//5 AS t FROM documents),
      |tok AS (SELECT doc_id,
      |          unnest(list_distinct(string_split(text, ' '))) AS term
      |        FROM documents),
      |b AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_delta
      |      FROM tok CROSS JOIN t WHERE doc_id >= t.t GROUP BY term),
      |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df_old
      |      FROM tok CROSS JOIN t WHERE doc_id < t.t GROUP BY term)
      |SELECT b.term,
      |  COALESCE(c.df_old, CAST(0 AS BIGINT)) AS df_old,
      |  b.df_delta,
      |  COALESCE(c.df_old, CAST(0 AS BIGINT)) + b.df_delta AS df_new
      |FROM b LEFT JOIN c USING (term)""".stripMargin

  /** q43: rare-token ratio — per document, the permille of token
    * OCCURRENCES whose corpus document-frequency is under 10% of docs
    * (df_ppm < 100000). A high ratio marks garbage/OCR-noise documents a
    * quality gate drops; the df side reuses q42's table.
    *
    * Scale shape: the rare set is df-filtered BEFORE the join, so only
    * the (tiny) rare vocabulary ships — broadcast here, and still a
    * vocab-bounded shuffle if it ever outgrew a broadcast. The per-doc
    * rollup aggregates the exploded occurrences with map-side combine. */
  def rareTokenRatio(s: SparkSession, dir: String): DataFrame = {
    val rare = tokenDf(s, dir).filter(col("df_ppm") < 100000)
      .select(col("tok"), lit(1L).as("is_rare"))
    docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .join(broadcast(rare), Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_tokens"),
        coalesce(sum(col("is_rare")), lit(0L)).cast("long").as("rare_cnt"))
      .withColumn("rare_permille",
        expr("(rare_cnt * 1000) div n_tokens"))
  }

  val rareTokenRatioSql: String =
    """WITH df AS (
      |  SELECT tok, df, (df * 1000000) // n_docs AS df_ppm
      |  FROM (
      |    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
      |    FROM (SELECT unnest(list_distinct(string_split(text, ' '))) AS tok
      |          FROM documents)
      |    GROUP BY tok),
      |    (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)),
      |occ AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents)
      |SELECT o.doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(COALESCE(SUM(CASE WHEN r.tok IS NOT NULL THEN 1 END), 0)
      |    AS BIGINT) AS rare_cnt,
      |  (CAST(COALESCE(SUM(CASE WHEN r.tok IS NOT NULL THEN 1 END), 0)
      |    AS BIGINT) * 1000) // COUNT(*) AS rare_permille
      |FROM occ o
      |LEFT JOIN (SELECT tok FROM df WHERE df_ppm < 100000) r
      |  ON o.tok = r.tok
      |GROUP BY o.doc_id""".stripMargin

  /** q54: TF-IDF distinctive terms — each document's top-3 tokens by
    * exact-integer tf·idf, the per-doc keyword profile retrieval systems
    * and topic filters read off the q42 vocabulary. idf_u =
    * (n_docs·10^6) div df (rarer ⇒ larger), score_u = tf·idf_u; ties
    * broken lexicographically by token so both engines pick identical
    * rows under a total order (the q50 exact-rank recipe).
    *
    * Scale shape: tf is a (doc_id, tok) groupBy with map-side combine —
    * the shuffle carries distinct doc×token pairs, never raw occurrences;
    * the idf side is the vocabulary-bounded q42 table, broadcast here
    * (still a vocab-bounded equi-join if a web-scale vocabulary ever
    * outgrew a broadcast); the top-3 window re-shuffles only the compact
    * (doc, tok, tf) triples on doc_id. No corpus-sized sort anywhere. */
  def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val total = d.agg(count(lit(1)).cast("long").as("n_docs"))
    val idf = d
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).cast("long").as("df"))
      .crossJoin(broadcast(total))
      .select(col("tok"), expr("(n_docs * 1000000) div df").as("idf_u"))
    val tf = d
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy("doc_id", "tok").agg(count(lit(1)).cast("long").as("tf"))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("score_u").desc, col("tok"))
    tf.join(broadcast(idf), Seq("tok"))
      .withColumn("score_u", col("tf") * col("idf_u"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("doc_id"), col("rk"), col("tok"), col("tf"),
        col("score_u"))
  }

  val tfidfTopTermsSql: String =
    """WITH idf AS (
      |  SELECT tok, (n_docs * 1000000) // df AS idf_u
      |  FROM (
      |    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df
      |    FROM (SELECT unnest(list_distinct(string_split(text, ' ')))
      |            AS tok
      |          FROM documents)
      |    GROUP BY tok),
      |    (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)),
      |tf AS (
      |  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY doc_id, tok)
      |SELECT doc_id, rk, tok, tf, score_u FROM (
      |  SELECT t.doc_id, t.tok, t.tf,
      |    t.tf * i.idf_u AS score_u,
      |    CAST(row_number() OVER (PARTITION BY t.doc_id
      |      ORDER BY t.tf * i.idf_u DESC, t.tok) AS BIGINT) AS rk
      |  FROM tf t JOIN idf i ON t.tok = i.tok)
      |WHERE rk <= 3""".stripMargin

  /** q61: Count-Min heavy hitters — the frequency-sketch complement of
    * q60's KMV cardinality sketch: a d=4 × w=256 CMS over all token
    * occurrences, audited against the exact top-20 tokens (estimate =
    * min over the 4 rows; CMS never underestimates, so over_ppm
    * quantifies collision inflation). Like KMV, CMS is deterministic
    * given its hashes — both engines build the identical table and
    * return bit-identical estimates, so the oracle audits the sketch.
    *
    * Scale shape: the sketch build is a map-side-combined groupBy on
    * (row, bucket) — the shuffle carries at most d·w = 1024 cells per
    * map task regardless of corpus size (the point of a CMS); the
    * exact side is the q42-style vocab-bounded aggregate with a
    * TakeOrdered top-20 (never a global sort); probes join the tiny
    * broadcast sketch. */
  def cmsHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def bucket(r: Int, c: Column): Column =
      conv(substring(sha2(concat(lit(s"$r:"), c), 256), 1, 8), 16, 10)
        .cast("long") % 256
    val occ = docs(s, dir).select(explode(split(col("text"), " ")).as("tok"))
    val cms = occ
      .select(posexplode(array((0 to 3).map(r => bucket(r, col("tok"))): _*))
        .as(Seq("r", "bucket")))
      .groupBy("r", "bucket").agg(count(lit(1)).cast("long").as("c"))
    val top = occ.groupBy("tok").agg(count(lit(1)).cast("long").as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20)
    top
      .select(col("tok"), col("cnt"),
        posexplode(array((0 to 3).map(r => bucket(r, col("tok"))): _*))
          .as(Seq("r", "bucket")))
      .join(broadcast(cms), Seq("r", "bucket"))
      .groupBy("tok", "cnt").agg(min("c").as("cms_est"))
      .withColumn("over_ppm", expr("((cms_est - cnt) * 1000000) div cnt"))
  }

  val cmsHeavyHittersSql: String =
    """WITH occ AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      |cms AS (
      |  SELECT t.r,
      |    ('0x' || substr(sha256(t.r || ':' || tok), 1, 8))::BIGINT % 256
      |      AS bucket,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM occ, range(0, 4) t(r)
      |  GROUP BY 1, 2),
      |top AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM occ GROUP BY tok
      |  ORDER BY cnt DESC, tok LIMIT 20),
      |probe AS (
      |  SELECT tok, cnt, t.r,
      |    ('0x' || substr(sha256(t.r || ':' || tok), 1, 8))::BIGINT % 256
      |      AS bucket
      |  FROM top, range(0, 4) t(r))
      |SELECT p.tok, p.cnt, CAST(MIN(c.c) AS BIGINT) AS cms_est,
      |  ((CAST(MIN(c.c) AS BIGINT) - p.cnt) * 1000000) // p.cnt AS over_ppm
      |FROM probe p JOIN cms c ON p.r = c.r AND p.bucket = c.bucket
      |GROUP BY p.tok, p.cnt""".stripMargin

  /** q63: bigram collocations by lift — the text-analysis complement of
    * q54's TF-IDF: which adjacent token pairs co-occur more than their
    * unigram frequencies predict. Score = exact-integer lift in ppm,
    * lift_ppm = (c12 · N · 10^6) div (c1 · c2) (N = total token
    * occurrences); PMI is ln(lift), so the ranking is identical without
    * ever leaving BIGINT. Top-20 with support ≥ 5, ties broken (w1, w2).
    *
    * Scale shape: bigram generation is per-row (zip of two slices — no
    * doc-keyed shuffle, no self-join on position); both count tables are
    * vocab-bounded group-bys that combine map-side; the unigram table and
    * the 1-row total broadcast into the bigram stream; top-20 lowers to
    * TakeOrderedAndProject. At 10^10 docs the only shuffles carry
    * vocab²-bounded bigram counts, never the corpus. */
  def bigramLift(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(split(col("text"), " ").as("t"))
    val occ = toks.select(explode(col("t")).as("tok"))
    val total = occ.agg(count(lit(1)).cast("long").as("n"))
    val uni = occ.groupBy("tok").agg(count(lit(1)).cast("long").as("c"))
    val bi = toks
      // codegen'd bigram projection (the gramOcc lesson — no zip_with
      // lambda); the ≥2 guard matters: sequence(1, 0) DESCENDS
      .filter(size(col("t")) >= 2)
      .select(col("t"), explode(expr("sequence(1, size(t) - 1)")).as("i"))
      .select(expr("element_at(t, i)").as("w1"),
        expr("element_at(t, i + 1)").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).cast("long").as("c12"))
      .filter(col("c12") >= 5)
    bi.join(broadcast(uni.select(col("tok").as("w1"), col("c").as("c1"))),
        Seq("w1"))
      .join(broadcast(uni.select(col("tok").as("w2"), col("c").as("c2"))),
        Seq("w2"))
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), col("c12"), col("c1"), col("c2"),
        expr("(c12 * n * 1000000) div (c1 * c2)").as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("w1"), col("w2"))
      .limit(20)
  }

  val bigramLiftSql: String =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS t FROM documents),
      |occ AS (SELECT unnest(t) AS tok FROM toks),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM occ),
      |uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      |        FROM occ GROUP BY tok),
      |pairs AS (
      |  SELECT t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT t, unnest(range(1, len(t))) AS i FROM toks)),
      |bi AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM pairs GROUP BY w1, w2
      |  HAVING COUNT(*) >= 5)
      |SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
      |  (b.c12 * n.n * 1000000) // (u1.c * u2.c) AS lift_ppm
      |FROM bi b
      |JOIN uni u1 ON b.w1 = u1.tok
      |JOIN uni u2 ON b.w2 = u2.tok
      |CROSS JOIN n
      |ORDER BY lift_ppm DESC, b.w1, b.w2
      |LIMIT 20""".stripMargin

  /** q65: bigram-LM surprise scoring — the perplexity-style quality
    * filter of CCNet/Gopher (score each document under a corpus language
    * model; keep the predictable "head", drop the noisy "tail"), made
    * oracle-exact: the LM is the corpus's own bigram table and the
    * per-bigram surprisal is floor(log2(c1·1024 / c12)) — an EXACT
    * integer both engines derive as `length(bin(x)) - 1` (minimal-width
    * binary in Spark and DuckDB alike), so no float log ever appears.
    * A doc's score is the mean surprisal in milli-bits; docs are bucketed
    * into CCNet's head/middle/tail terciles with EXACT cutoffs derived
    * from a histogram of the milli-bit scores: avg_milli is bounded in
    * [0, 64000] whatever the corpus size, so the histogram is a
    * value-bounded table and the cumulative window over it costs O(64k)
    * rows at any scale — exact global terciles without ever sorting the
    * corpus (CCNet estimates the same cutoffs from a sample).
    *
    * Scale shape: bigrams are generated per-row (zip of two slices, no
    * position self-join); the unigram/bigram model tables are
    * vocab-bounded map-side-combined group-bys and are explicitly
    * broadcast into the occurrence stream — "ship the trained LM to every
    * worker", exactly how CCNet distributes its KenLM. The per-doc rollup
    * combines map-side (a doc's bigrams are colocated by the narrow
    * explode), so the one corpus-keyed shuffle carries O(docs) rows; the
    * two tercile cutoffs ride a 1-row broadcast. */
  def lmSurprise(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2)
    // position explode + top-level element_at projections: the r5
    // zip_with(slice, slice) lambda was interpreted per bigram (the
    // gramOcc lesson); and the unigram model derives from the VOCAB-
    // BOUNDED bigram model (c1(w1) = Σ c12 over w2) instead of a third
    // full pass over the bigram stream — 3 corpus passes → 2
    val bg = toks
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, size(t) - 1)")).as("i"))
      .select(col("doc_id"),
        expr("element_at(t, i)").as("w1"),
        expr("element_at(t, i + 1)").as("w2"))
    val bi  = bg.groupBy("w1", "w2")
      .agg(count(lit(1)).cast("long").as("c12"))
    val uni = bi.groupBy("w1").agg(sum("c12").cast("long").as("c1"))
    val scored = bg
      .join(broadcast(uni), Seq("w1"))
      .join(broadcast(bi), Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(count(lit(1)).cast("long").as("n_bigrams"),
        sum(expr("length(bin((c1 * 1024) div c12)) - 1")).cast("long")
          .as("surprise_sum"))
      .withColumn("avg_milli",
        expr("(surprise_sum * 1000) div n_bigrams"))
    // exact tercile cutoffs from the value-bounded histogram: the first
    // score value whose cumulative doc count reaches 1/3 (resp. 2/3) of
    // the corpus — ties share a bucket, so the rule is deterministic
    val hist = scored.groupBy("avg_milli")
      .agg(count(lit(1)).cast("long").as("cnt"))
      .withColumn("cum", sum("cnt").over(
        org.apache.spark.sql.expressions.Window
          .orderBy("avg_milli")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .crossJoin(broadcast(
        scored.agg(count(lit(1)).cast("long").as("n_docs"))))
    val cuts = hist.agg(
      min(when(col("cum") * 3 >= col("n_docs"), col("avg_milli")))
        .as("head_cut"),
      min(when(col("cum") * 3 >= col("n_docs") * 2, col("avg_milli")))
        .as("tail_cut"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("n_bigrams"), col("surprise_sum"),
        col("avg_milli"),
        expr("CASE WHEN avg_milli <= head_cut THEN 'head'" +
          " WHEN avg_milli > tail_cut THEN 'tail'" +
          " ELSE 'middle' END").as("bucket"))
  }

  /** q83: span-corruption mask plan — the data-prep step of denoising
    * pretraining (T5/UL2 span corruption): a deterministic ~15% of each
    * document's tokens is selected for masking in block-aligned 3-token
    * spans (block b masked iff hash(doc, b) mod 20 < 3 — content-
    * independent, so the plan is reproducible across engines and epochs
    * without an RNG state). Output per doc: token/span/masked counts, the
    * realized mask rate in ppm, and an md5 proof over the masked tokens
    * in document order (the q49/q67 idiom).
    *
    * Scale shape: one narrow per-row expression chain — no explode, no
    * shuffle; the mask plan streams straight into the training writer. */
  def spanMask(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("mb", expr(
        "filter(sequence(cast(0 as bigint), (size(toks) - 1) div 3), b -> " +
          "(cast(conv(substring(sha2(concat('mask:', " +
          "cast(doc_id as string), ':', cast(b as string)), 256), " +
          "1, 8), 16, 10) as bigint) % 20) < 3)"))
      .withColumn("masked", expr(
        "filter(toks, (t, i) -> array_contains(mb, i div 3))"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(col("mb")).cast("long").as("n_spans"),
        size(col("masked")).cast("long").as("n_masked"),
        expr("(cast(size(masked) as bigint) * 1000000) div " +
          "cast(size(toks) as bigint)").as("mask_ppm"),
        expr("md5(concat_ws(' ', masked))").as("mask_md5"))

  val spanMaskSql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
      |           FROM documents),
      |m AS (SELECT doc_id, toks,
      |        list_filter(generate_series(0, (len(toks) - 1) // 3),
      |          b -> (('0x' || substr(sha256('mask:' || doc_id || ':' || b),
      |            1, 8))::BIGINT % 20) < 3) AS mb
      |      FROM t),
      |x AS (SELECT doc_id, toks, mb,
      |        [toks[i] for i in generate_series(1, len(toks))
      |         if list_contains(mb, (i - 1) // 3)] AS masked
      |      FROM m)
      |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |  CAST(len(mb) AS BIGINT) AS n_spans,
      |  CAST(len(masked) AS BIGINT) AS n_masked,
      |  (CAST(len(masked) AS BIGINT) * 1000000)
      |    // CAST(len(toks) AS BIGINT) AS mask_ppm,
      |  md5(COALESCE(array_to_string(masked, ' '), '')) AS mask_md5
      |FROM x""".stripMargin

  /** q81: quality-signal agreement matrix — the calibration cross-tab
    * between two independent quality signals (q21's lexical score, banded
    * at 250‰, and q65's LM-perplexity tercile): how many documents land
    * in each (band, tercile) cell. The diagnostic a curation pipeline
    * runs before trusting either filter alone — systematic disagreement
    * (high-lexical-quality docs piling into the perplexity tail) flags a
    * domain the LM under-models, exactly the failure CCNet's per-domain
    * buckets exist to absorb.
    *
    * Scale shape: both inputs are per-doc score tables; the equi-join on
    * doc_id is the one corpus-keyed shuffle (the honest cost of
    * correlating two signals) and the 4×3 rollup combines map-side. */
  def signalAgreement(s: SparkSession, dir: String): DataFrame = {
    val q = qualityScore(s, dir).select(col("doc_id"),
      expr("least(((ttr_permille + stop_permille) div 2) div 250, 3)")
        .as("quality_band"))
    val p = lmSurprise(s, dir).select(col("doc_id"), col("bucket"))
    q.join(p, Seq("doc_id"))
      .groupBy("quality_band", "bucket")
      .agg(count(lit(1)).cast("long").as("n_docs"))
  }

  /** Defined after lmSurpriseSql (object vals initialize in order). */
  lazy val signalAgreementSql: String =
    s"""WITH q AS (${qualityScoreSql.replace("\n", "\n  ")}),
       |p AS (${lmSurpriseSql.replace("\n", "\n  ")})
       |SELECT LEAST(((ttr_permille + stop_permille) // 2) // 250,
       |    CAST(3 AS BIGINT)) AS quality_band,
       |  bucket, CAST(COUNT(*) AS BIGINT) AS n_docs
       |FROM q JOIN p USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  val lmSurpriseSql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE len(string_split(text, ' ')) >= 2),
      |bg AS (
      |  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
      |  FROM (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM toks)),
      |uni AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1
      |        FROM bg GROUP BY w1),
      |bi AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |       FROM bg GROUP BY w1, w2),
      |sc AS (
      |  SELECT g.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |    CAST(SUM(length(bin((u.c1 * 1024) // b.c12)) - 1) AS BIGINT)
      |      AS surprise_sum
      |  FROM bg g
      |  JOIN uni u ON g.w1 = u.w1
      |  JOIN bi b ON g.w1 = b.w1 AND g.w2 = b.w2
      |  GROUP BY g.doc_id),
      |avgd AS (
      |  SELECT doc_id, n_bigrams, surprise_sum,
      |    (surprise_sum * 1000) // n_bigrams AS avg_milli FROM sc),
      |hist AS (
      |  SELECT avg_milli, CAST(COUNT(*) AS BIGINT) AS cnt FROM avgd
      |  GROUP BY avg_milli),
      |cum AS (
      |  SELECT avg_milli,
      |    CAST(SUM(cnt) OVER (ORDER BY avg_milli
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM avgd) AS n_docs
      |  FROM hist),
      |cuts AS (
      |  SELECT
      |    MIN(CASE WHEN cum * 3 >= n_docs THEN avg_milli END) AS head_cut,
      |    MIN(CASE WHEN cum * 3 >= n_docs * 2 THEN avg_milli END)
      |      AS tail_cut
      |  FROM cum)
      |SELECT doc_id, n_bigrams, surprise_sum, avg_milli,
      |  CASE WHEN avg_milli <= head_cut THEN 'head'
      |       WHEN avg_milli > tail_cut THEN 'tail'
      |       ELSE 'middle' END AS bucket
      |FROM avgd CROSS JOIN cuts""".stripMargin

  // -------------------------------------------------------------------
  // q49: PII detect + redact — construct→scan round trip. The synthetic
  // corpus is PII-free by construction (no digit/@/+ ever appears in
  // `text`), so each doc gets a deterministic contact block injected IN
  // the dataflow (doc_id%3+1 emails, doc_id%2 phones); the operator then
  // finds and redacts it with REAL regexes, exactly as a curation
  // pipeline scrubs scraped text. The DuckDB oracle builds the expected
  // REDACTED string directly from the arithmetic — md5 agreement proves
  // the regexes matched precisely the injected spans and nothing else
  // (an over- or under-match anywhere in ~1k chars flips the hash).
  // Scale shape: pure per-row scan→map, no shuffle, codegen'd regexes.
  // -------------------------------------------------------------------

  private val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  private val PhoneRe = "\\+[0-9][0-9-]{6,}[0-9]"

  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val k = col("doc_id") % 3 + 1
    val emails = concat_ws(" ", transform(sequence(lit(1), k.cast("int")),
      j => concat(lit("u"), col("doc_id"), lit("j"), j,
        lit("@mail"), (col("doc_id") + j) % 10, lit(".example.org"))))
    val phone = concat(lit("+1-555-"),
      lpad((col("doc_id") % 10000).cast("string"), 4, "0"), lit("-"),
      lpad((col("doc_id") * 7 % 1000).cast("string"), 3, "0"))
    val full = concat(col("text"), lit(" "), emails,
      when(col("doc_id") % 2 === 1, concat(lit(" "), phone))
        .otherwise(lit("")))
    val red = regexp_replace(
      regexp_replace(col("text0"), EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")
    docs(s, dir)
      .select(col("doc_id"), full.as("text0"))
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text0"), lit(EmailRe), lit(0)))
          .cast("long").as("n_emails"),
        size(regexp_extract_all(col("text0"), lit(PhoneRe), lit(0)))
          .cast("long").as("n_phones"),
        length(red).cast("long").as("red_len"),
        md5(red).as("red_md5"))
  }

  val piiRedactSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 3 + 1 AS BIGINT) AS n_emails,
      |  CAST(doc_id % 2 AS BIGINT) AS n_phones,
      |  CAST(strlen(red) AS BIGINT) AS red_len,
      |  md5(red) AS red_md5
      |FROM (
      |  SELECT doc_id, text || ' ' ||
      |    CASE doc_id % 3 WHEN 0 THEN '<EMAIL>'
      |      WHEN 1 THEN '<EMAIL> <EMAIL>'
      |      ELSE '<EMAIL> <EMAIL> <EMAIL>' END ||
      |    CASE doc_id % 2 WHEN 1 THEN ' <PHONE>' ELSE '' END AS red
      |  FROM documents)""".stripMargin

  // -------------------------------------------------------------------
  // q51: BPE merge-pair training — the operator that completes the
  // tokenizer family (q24 pretokenizes, q42 builds the vocabulary table;
  // this TRAINS the merge table an actual BPE tokenizer is defined by).
  // Sennrich-style: start from per-word character sequences weighted by
  // corpus word frequency; each iteration counts adjacent symbol pairs,
  // picks the most frequent (ties → lexicographic (l, r)), and applies
  // the merge greedily left-to-right in every word.
  //
  // Scale shape (the published distributed-BPE recipe): ONE corpus scan
  // folds the 100 TB of text into a word-frequency table (map-side
  // combine, vocabulary-bounded shuffle); all K iterations then run on
  // that vocab table only — a vocab-bounded pair aggregate plus a 1-row
  // TakeOrdered to the driver per iteration (the same driver-coordinated
  // pattern as q37's Lloyd iterations), with the vocab re-materialized
  // per iteration via lazy localCheckpoint so iteration k never replays
  // the k-1 merges before it.
  //
  // Representation: a word's symbol sequence is a single string with
  // every symbol wrapped in U+001F sentinels ("th","e" → ␟th␟␟e␟), so a
  // merge is a plain (codegen'd) string replace of ␟l␟␟r␟ with ␟lr␟ —
  // boundary-anchored (symbols never contain the sentinel: training runs
  // over the alphabetic ` ?[A-Za-z]+` pretokens), and leftmost-restart-
  // after-replacement replace semantics (identical in Java and DuckDB)
  // ARE greedy left-to-right BPE application: "aaaa" + (a,a) → (aa)(aa).
  // The DuckDB oracle replays the full K-iteration fixpoint as chained
  // CTEs — argmax selection included — so the merge table matches
  // bit-for-bit, not just statistically.
  // -------------------------------------------------------------------

  private val MergeK = 8
  private val Sep = "\u001F"

  /** The K-iteration training loop shared by q51 (emits the merge table)
    * and q52 (applies the merges): returns (rank, l, r, merged, count)
    * in rank order, fewer than K rows if the corpus exhausts first. */
  private def trainMerges(s: SparkSession, dir: String)
      : Seq[(Long, String, String, String, Long)] = {
    // ONE corpus scan into the vocab table, PERSISTED: every iteration's
    // pair aggregate reads the cache and re-applies the k merges found so
    // far as a per-row fold (K tiny literal replaces over a vocab-bounded
    // table — far cheaper than the r5 per-iteration localCheckpoint,
    // which paid a materialization job per merge on top of the argmax
    // job; per-iteration cost is now exactly one TakeOrdered job)
    val words = docs(s, dir)
      .select(explode(regexp_extract_all(col("text"),
        lit(" ?[A-Za-z]+"), lit(0))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .select(regexp_replace(col("word"), "(.)", Sep + "$1" + Sep)
        .as("rep"), col("freq"))
      .persist()
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    def repK: org.apache.spark.sql.Column =
      out.foldLeft(col("rep")) { case (c, (_, l, r, _, _)) =>
        replace(c, lit(Sep + l + Sep + Sep + r + Sep),
          lit(Sep + l + r + Sep))
      }
    var k = 1
    var exhausted = false
    while (k <= MergeK && !exhausted) {
      val syms = split(expr(s"trim(BOTH '$Sep' FROM rep)"), Sep + Sep)
      // adjacent pairs via indexed transform over a length-(n-1) slice —
      // never sequence(1, n-1), which DESCENDS for single-symbol words
      val pairs = explode(expr(
        "transform(slice(syms, 1, size(syms) - 1), " +
          "(x, i) -> struct(x AS l, element_at(syms, i + 2) AS r))"))
      val best = words
        .select(repK.as("rep"), col("freq"))
        .select(syms.as("syms"), col("freq"))
        .select(pairs.as("p"), col("freq"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, cnt) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((k.toLong, l, r, l + r, cnt))
        k += 1
      }
    }
    words.unpersist(blocking = false)
    out.toSeq
  }

  def bpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    trainMerges(s, dir).toDF("merge_rank", "l", "r", "merged", "cnt")
  }

  /** The shared oracle prefix: w (word frequencies), v0..vK (vocab after
    * each merge), b1..bK (the argmax pair of each iteration). */
  private val bpeCtes: String = {
    val S = "chr(31)"
    val sb = new StringBuilder
    sb ++= s"""WITH w AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      |  FROM (SELECT unnest(regexp_extract_all(text, ' ?[A-Za-z]+')) AS word
      |        FROM documents)
      |  GROUP BY word),
      |v0 AS (SELECT regexp_replace(word, '(.)', $S || '\\1' || $S, 'g')
      |         AS rep, freq FROM w)""".stripMargin
    for (k <- 1 to MergeK) {
      sb ++= s""",
      |b$k AS (
      |  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS cnt
      |  FROM (SELECT syms[i] AS l, syms[i + 1] AS r, freq
      |        FROM (SELECT syms, freq,
      |                unnest(generate_series(1, len(syms) - 1)) AS i
      |              FROM (SELECT string_split(trim(rep, $S), $S || $S)
      |                      AS syms, freq FROM v${k - 1})))
      |  GROUP BY l, r
      |  ORDER BY cnt DESC, l, r
      |  LIMIT 1),
      |v$k AS (
      |  SELECT replace(v.rep, $S || b.l || $S || $S || b.r || $S,
      |                 $S || b.l || b.r || $S) AS rep, v.freq
      |  FROM v${k - 1} v, b$k b)""".stripMargin
    }
    sb.toString
  }

  val bpeMergesSql: String =
    bpeCtes + "\nSELECT merge_rank, l, r, merged, cnt FROM (\n" +
      (1 to MergeK).map(k =>
        s"  SELECT CAST($k AS BIGINT) AS merge_rank, l, r, l || r AS merged, cnt FROM b$k")
        .mkString("", "\n  UNION ALL\n", ")")

  // -------------------------------------------------------------------
  // q52: BPE encode — apply the q51-trained merges to every document and
  // report the number a pipeline actually budgets by: trained-tokenizer
  // token counts (q24's pretoken count is the cheap upper bound; this is
  // the real figure). Per doc: alphabetic pretokens joined on a U+001E
  // boundary (merges never cross pretokens), every char wrapped in the
  // U+001F sentinels, then the K trained merges applied IN RANK ORDER as
  // literal replaces; token count = sentinel-pair count.
  //
  // Scale shape: training reuses q51 (vocab-bounded); encoding is then a
  // SINGLE whole-stage-codegen'd scan — one regexp_replace + K literal
  // replaces + two lengths per row, no shuffle, no UDF, merges inlined
  // as literals from the driver (8 tiny strings). The DuckDB oracle
  // re-derives the merges via q51's CTE chain and applies them with
  // scalar subqueries, so a drift in EITHER training or application
  // breaks the hash.
  // -------------------------------------------------------------------

  def bpeEncode(s: SparkSession, dir: String): DataFrame = {
    val Rs = "\u001E" // pretoken boundary: never wrapped, never merged
    val merges = trainMerges(s, dir)
    val toks = regexp_extract_all(col("text"), lit(" ?[A-Za-z]+"), lit(0))
    val rep0 = regexp_replace(array_join(toks, Rs),
      s"([^$Rs])", Sep + "$1" + Sep)
    val repK = merges.foldLeft(rep0) { case (c, (_, l, r, _, _)) =>
      replace(c, lit(Sep + l + Sep + Sep + r + Sep), lit(Sep + l + r + Sep))
    }
    docs(s, dir)
      .select(col("doc_id"), size(toks).cast("long").as("pre_tokens"),
        repK.as("rep"))
      .select(col("doc_id"), col("pre_tokens"),
        expr(s"(length(replace(rep, '$Rs', '')) -" +
          s" length(replace(replace(rep, '$Rs', ''), '$Sep', ''))) div 2")
          .as("bpe_tokens"),
        expr(s"length(replace(replace(rep, '$Rs', ''), '$Sep', ''))")
          .cast("long").as("alpha_chars"))
      .withColumn("chars_per_token_permille",
        expr("CASE WHEN bpe_tokens = 0 THEN 0 " +
          "ELSE (alpha_chars * 1000) div bpe_tokens END"))
  }

  val bpeEncodeSql: String = {
    val S = "chr(31)"
    val R = "chr(30)"
    val sb = new StringBuilder
    sb ++= bpeCtes
    sb ++= s""",
      |d0 AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, ' ?[A-Za-z]+')) AS BIGINT)
      |      AS pre_tokens,
      |    regexp_replace(
      |      array_to_string(regexp_extract_all(text, ' ?[A-Za-z]+'), $R),
      |      '([^' || $R || '])', $S || '\\1' || $S, 'g') AS rep
      |  FROM documents)""".stripMargin
    for (k <- 1 to MergeK) {
      sb ++= s""",
      |d$k AS (
      |  SELECT doc_id, pre_tokens,
      |    replace(rep,
      |      COALESCE((SELECT $S || l || $S || $S || r || $S FROM b$k), chr(2)),
      |      COALESCE((SELECT $S || l || r || $S FROM b$k), chr(2))) AS rep
      |  FROM d${k - 1})""".stripMargin
    }
    sb ++= s"""
      |SELECT doc_id, pre_tokens,
      |  CAST((strlen(norep) - strlen(replace(norep, $S, ''))) // 2
      |    AS BIGINT) AS bpe_tokens,
      |  CAST(strlen(replace(norep, $S, '')) AS BIGINT) AS alpha_chars,
      |  CAST(CASE WHEN strlen(norep) = strlen(replace(norep, $S, ''))
      |    THEN 0 ELSE (strlen(replace(norep, $S, '')) * 1000)
      |      // ((strlen(norep) - strlen(replace(norep, $S, ''))) // 2)
      |    END AS BIGINT) AS chars_per_token_permille
      |FROM (SELECT doc_id, pre_tokens, replace(rep, $R, '') AS norep
      |      FROM d$MergeK)""".stripMargin
    sb.toString
  }
}
