package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Keyword-retrieval operators over the curated corpus — the lexical half
 * of a data pipeline's search stack (the dense half is AnnOps): a BM25
 * scorer (q70) and the inverted-index build that would back it at scale
 * (q73). Both are exact-integer (µ/milli units, floor division) so the
 * DuckDB oracles match bit-for-bit.
 *
 * BM25 is Robertson/Spärck Jones "Okapi BM25" with the Lucene idf variant
 * idf = log((N + 1) / (df + 0.5)) — always positive — and k1 = 1.2,
 * b = 0.75. The log2 is evaluated deterministically in milli-bits via the
 * q65 floor-log2 idiom (`length(bin(x)) - 1`) plus a LINEAR mantissa
 * interpolation ((m − 1024)/1024 for m = x·1024 >> floor-log2-bits): both
 * engines compute the identical integer, and the interpolation error
 * (< 0.086 bits) is the same deterministic function of x in both.
 *
 * Scale notes (100 TB):
 *  - q70 never explodes the token stream: the per-(doc, term) tf is a
 *    codegen'd array expression (size(toks) − size(array_remove(toks, t)))
 *    over the query-term fan-out (|terms| rows per doc, |terms| small).
 *    The corpus stats (N, Σdl) and per-term df are broadcast back, so the
 *    only corpus-wide movement is the final top-k — and the rank filter
 *    lowers to WindowGroupLimit, so each map task pre-prunes to its local
 *    top-10 per term BEFORE the shuffle (pinned in PlanSpec).
 *  - q73 shuffles (term, doc) once to build tf; everything after is
 *    vocab-bounded. The posting-head cap is again a WindowGroupLimit —
 *    the exchange feeding the head build carries O(vocab × 8 × tasks),
 *    not the corpus; df/cf ride the same (term, doc) aggregate.
 */
object SearchOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** The fixed keyword queries (an eval-style query set; tiny vs corpus). */
  private val Terms = Seq("spark", "merge", "window")

  /** Deterministic log2 in milli-bits: floor-log2 via length(bin(x))−1,
    * plus linear mantissa interpolation — identical integer in Spark SQL
    * and DuckDB (`//` ≡ `div` on positives). x must be ≥ 1. */
  private def log2mSpark(x: String): String =
    s"((length(bin($x)) - 1) * 1000 + " +
      s"((($x) * 1024 div shiftleft(cast(1 as bigint), " +
      s"length(bin($x)) - 1)) - 1024) * 1000 div 1024)"

  private def log2mDuck(x: String): String =
    s"((length(bin($x)) - 1) * 1000 + " +
      s"((($x) * 1024 // (1::BIGINT << (length(bin($x)) - 1))) - 1024) " +
      s"* 1000 // 1024)"

  /** q70: BM25 top-10 per query term, exact-integer.
    *   norm‰   = 250 + (750·dl·N) div Σdl            — k1·((1−b)+b·dl/avgdl) sans k1
    *   tfpartµ = (tf·2200·10^6) div (tf·1000 + (1200·norm‰) div 1000)
    *   ratio   = ((N+1)·2048) div (2·df+1)           — ≥ 1024, so idf ≥ 0
    *   idf_m   = log2m(ratio) − 10000                — milli-bits
    *   scoreµ  = (tfpartµ·idf_m) div 1000
    */
  def bm25TopK(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
    val stats = d.agg(count(lit(1)).cast("long").as("n_docs"),
      sum(col("dl")).cast("long").as("total_toks"))
    val tf = d
      .select(col("doc_id"), col("dl"), col("toks"),
        explode(array(Terms.map(lit): _*)).as("term"))
      .withColumn("tf",
        (size(col("toks")) - size(array_remove(col("toks"), col("term"))))
          .cast("long"))
      .filter(col("tf") > 0)
      .drop("toks")
    val dfreq = tf.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"))
    val scored = tf
      .crossJoin(broadcast(stats))
      .join(broadcast(dfreq), Seq("term"))
      .withColumn("norm_permille",
        expr("250 + (750 * dl * n_docs) div total_toks"))
      .withColumn("tf_part_micro",
        expr("(tf * 2200 * 1000000) div " +
          "(tf * 1000 + (1200 * norm_permille) div 1000)"))
      .withColumn("ratio", expr("((n_docs + 1) * 2048) div (2 * df + 1)"))
      .withColumn("idf_milli", expr(s"${log2mSpark("ratio")} - 10000"))
      .withColumn("score_micro",
        expr("(tf_part_micro * idf_milli) div 1000"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("term")
          .orderBy(col("score_micro").desc, col("doc_id").asc)).cast("long"))
      .filter(col("rnk") <= 10)
      .select("term", "doc_id", "tf", "dl", "score_micro", "rnk")
  }

  val bm25TopKSql: String = {
    val idf = log2mDuck("ratio")
    s"""WITH d AS (
       |  SELECT doc_id, string_split(text, ' ') AS toks,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |  FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |         CAST(SUM(dl) AS BIGINT) AS total_toks FROM d),
       |tf AS (
       |  SELECT doc_id, dl, term,
       |    CAST(len(list_filter(toks, t -> t = term)) AS BIGINT) AS tf
       |  FROM d, (SELECT unnest(['spark', 'merge', 'window']) AS term)
       |  WHERE len(list_filter(toks, t -> t = term)) > 0),
       |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |          FROM tf GROUP BY term),
       |x AS (
       |  SELECT term, doc_id, tf, dl,
       |    250 + (750 * dl * n_docs) // total_toks AS norm_permille,
       |    ((n_docs + 1) * 2048) // (2 * df + 1) AS ratio
       |  FROM tf CROSS JOIN st JOIN dfreq USING (term)),
       |y AS (
       |  SELECT term, doc_id, tf, dl,
       |    (tf * 2200 * 1000000)
       |      // (tf * 1000 + (1200 * norm_permille) // 1000)
       |      AS tf_part_micro,
       |    $idf - 10000 AS idf_milli
       |  FROM x),
       |z AS (SELECT term, doc_id, tf, dl,
       |        (tf_part_micro * idf_milli) // 1000 AS score_micro FROM y)
       |SELECT term, doc_id, tf, dl, score_micro, rnk FROM (
       |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY term
       |    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rnk FROM z)
       |WHERE rnk <= 10""".stripMargin
  }

  /** q73: inverted-index build — per term: document frequency, corpus
    * frequency, and the head of the posting list (top-8 docs by tf desc,
    * doc_id asc, rendered "doc:tf doc:tf …"). The capped head is what a
    * impact-ordered index stores in its first block; df/cf are the
    * statistics BM25 (q70) reads. */
  def postings(s: SparkSession, dir: String): DataFrame = {
    val tfd = docs(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .groupBy("term", "doc_id")
      .agg(count(lit(1)).cast("long").as("tf"))
    val stats = tfd.groupBy("term")
      .agg(count(lit(1)).cast("long").as("df"),
        sum(col("tf")).cast("long").as("cf"))
    val head = tfd
      .withColumn("rnk", row_number().over(
        Window.partitionBy("term")
          .orderBy(col("tf").desc, col("doc_id").asc)))
      .filter(col("rnk") <= 8)
      .groupBy("term")
      .agg(expr(
        "array_join(transform(array_sort(collect_list(" +
          "struct(rnk, doc_id, tf))), " +
          "x -> concat(cast(x.doc_id as string), ':', " +
          "cast(x.tf as string))), ' ')").as("postings_head"))
    stats.join(head, Seq("term"))
  }

  val postingsSql: String =
    """WITH tfd AS (
      |  SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  GROUP BY 1, 2),
      |st AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
      |         CAST(SUM(tf) AS BIGINT) AS cf FROM tfd GROUP BY term),
      |r AS (SELECT term, doc_id, tf,
      |        ROW_NUMBER() OVER (PARTITION BY term
      |          ORDER BY tf DESC, doc_id) AS rnk FROM tfd),
      |h AS (SELECT term,
      |        string_agg(doc_id || ':' || tf, ' ' ORDER BY rnk)
      |          AS postings_head
      |      FROM r WHERE rnk <= 8 GROUP BY term)
      |SELECT term, df, cf, postings_head FROM st JOIN h USING (term)""".stripMargin
}
