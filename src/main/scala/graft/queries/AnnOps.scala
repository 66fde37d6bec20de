package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Similarity search over the `embeddings` table (Array[Float], dim 64).
 *
 * - bruteForceTopK: exact cosine top-k — the correctness baseline. The dot
 *   product is a codegen'd `aggregate(zip_with(...))` over doubles
 *   (sequential fold → bit-identical to the DuckDB oracle's explicit
 *   element sum); similarities exported as round(cos·1e6) integers.
 * - ivfTopK: the scale path — coarse partitioning (here the `label`
 *   column as the IVF cell) restricts each query to one cell, turning the
 *   O(Q·N) scan into O(Q·N/cells); at 100 TB the cell assignment is a
 *   k-means/LSH bucket and the join is a co-partitioned shuffle instead
 *   of a broadcast cross-join.
 * - norms: per-vector L2 norm (integer-µ export).
 */
object AnnOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  private val dot =
    "aggregate(zip_with(%s, %s, (x, y) -> cast(x as double) * cast(y as double)), 0D, (s, v) -> s + v)"

  /** Exact brute-force cosine top-3 for query vectors vec_id < 5 against
    * all vec_id ≥ 5. */
  def bruteForceTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.select(col("vec_id").as("query_id"),
      col("embedding").as("qe")).filter(col("query_id") < 5)
    val c = e.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("ce")).filter(col("neighbor_id") >= 5)
    val scored = q.crossJoin(c)
      .withColumn("dotqc", expr(dot.format("qe", "ce")))
      .withColumn("nq", expr(dot.format("qe", "qe")))
      .withColumn("nc", expr(dot.format("ce", "ce")))
      .withColumn("cos", col("dotqc") / (sqrt(col("nq")) * sqrt(col("nc"))))
    scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cos") * 1000000).cast("long").as("cos_e6"))
  }

  private val duckDot =
    "list_sum(list_transform(generate_series(1, 64), i -> CAST(%s[i] AS DOUBLE) * CAST(%s[i] AS DOUBLE)))"

  val bruteForceTopKSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, embedding AS ce
       |      FROM embeddings WHERE vec_id >= 5),
       |scored AS (
       |  SELECT query_id, neighbor_id,
       |    ${duckDot.format("qe", "ce")} /
       |      (sqrt(${duckDot.format("qe", "qe")}) *
       |       sqrt(${duckDot.format("ce", "ce")})) AS cos
       |  FROM q, c)
       |SELECT query_id, neighbor_id,
       |  CAST(ROUND(cos * 1000000) AS BIGINT) AS cos_e6
       |FROM (SELECT query_id, neighbor_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored)
       |WHERE rn <= 3""".stripMargin

  /** IVF-style partitioned top-3: each query searches only its own coarse
    * cell (label) — the pruned-scan ANN shape. */
  def ivfTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.select(col("vec_id").as("query_id"), col("label"),
      col("embedding").as("qe")).filter(col("query_id") < 5)
    val c = e.select(col("vec_id").as("neighbor_id"), col("label"),
      col("embedding").as("ce")).filter(col("neighbor_id") >= 5)
    q.join(c, Seq("label"))
      .withColumn("dotqc", expr(dot.format("qe", "ce")))
      .withColumn("nq", expr(dot.format("qe", "qe")))
      .withColumn("nc", expr(dot.format("ce", "ce")))
      .withColumn("cos", col("dotqc") / (sqrt(col("nq")) * sqrt(col("nc"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("query_id")
          .orderBy(col("cos").desc, col("neighbor_id").asc)))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("label"), col("neighbor_id"),
        round(col("cos") * 1000000).cast("long").as("cos_e6"))
  }

  val ivfTopKSql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, label, embedding AS qe
       |           FROM embeddings WHERE vec_id < 5),
       |c AS (SELECT vec_id AS neighbor_id, label, embedding AS ce
       |      FROM embeddings WHERE vec_id >= 5),
       |scored AS (
       |  SELECT query_id, q.label AS label, neighbor_id,
       |    ${duckDot.format("qe", "ce")} /
       |      (sqrt(${duckDot.format("qe", "qe")}) *
       |       sqrt(${duckDot.format("ce", "ce")})) AS cos
       |  FROM q JOIN c ON q.label = c.label)
       |SELECT query_id, label, neighbor_id,
       |  CAST(ROUND(cos * 1000000) AS BIGINT) AS cos_e6
       |FROM (SELECT query_id, label, neighbor_id, cos,
       |        ROW_NUMBER() OVER (PARTITION BY query_id
       |          ORDER BY cos DESC, neighbor_id) AS rn
       |      FROM scored)
       |WHERE rn <= 3""".stripMargin

  /** Embedding-cosine near-duplicate pairs (the dedup family's embedding
    * member): candidate pairs restricted to the same coarse cell (label —
    * at scale an LSH/k-means bucket), kept when cos ≥ 0.4 (the corpus
    * is random noise — 0.4 is ≈3σ of the within-cell cosine null
    * distribution, so the query returns the genuine outlier pairs; a real
    * near-dup corpus uses ≥0.95). Exported as integer-µ cosine. */
  def embedNearDup(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val a = e.select(col("vec_id").as("vec_a"), col("label"),
      col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("vec_b"), col("label"),
      col("embedding").as("eb"))
    a.join(b, Seq("label"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos",
        expr(dot.format("ea", "eb")) /
          (sqrt(expr(dot.format("ea", "ea"))) *
           sqrt(expr(dot.format("eb", "eb")))))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("label"),
        round(col("cos") * 1000000).cast("long").as("cos_e6"))
  }

  val embedNearDupSql: String =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       |p AS (
       |  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       |    ${duckDot.format("a.embedding", "b.embedding")} /
       |      (sqrt(${duckDot.format("a.embedding", "a.embedding")}) *
       |       sqrt(${duckDot.format("b.embedding", "b.embedding")})) AS cos
       |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
       |SELECT vec_a, vec_b, label,
       |  CAST(ROUND(cos * 1000000) AS BIGINT) AS cos_e6
       |FROM p WHERE cos >= 0.4""".stripMargin

  /** Per-vector L2 norm in integer micro-units. */
  def norms(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("vec_id"), col("label"),
        round(sqrt(expr(dot.format("embedding", "embedding"))) * 1000000)
          .cast("long").as("norm_e6"))

  val normsSql: String =
    s"""SELECT vec_id, label,
       |  CAST(ROUND(sqrt(${duckDot.format("embedding", "embedding")})
       |    * 1000000) AS BIGINT) AS norm_e6
       |FROM embeddings""".stripMargin
}
