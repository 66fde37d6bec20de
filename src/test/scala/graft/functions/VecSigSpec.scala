package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Parity pins for the native codegen'd expressions in VecSig.scala: each
 * must be BIT-IDENTICAL to the interpreted higher-order-function SQL it
 * replaced (which is what the DuckDB oracle reproduces — the CORRECTNESS
 * gate compares hashes of exact values, so "close" is not enough).
 */
class VecSigSpec extends SparkTestBase {
  val dir = "/root/testdata/sf0.001"

  private def emb: DataFrame = {
    GraftFunctions.register(spark)
    spark.read.parquet(s"$dir/embeddings.parquet")
  }

  /** The interpreted SQL fold vec_dot replaced (AnnOps pre-r3-perf). */
  private def hofDot(a: String, b: String): String =
    s"aggregate(zip_with($a, $b, (x, y) -> cast(x as double) * " +
      s"cast(y as double)), 0D, (s, v) -> s + v)"

  private def signCase(p: Int): String = {
    val x = s"(CAST($p*64 + i AS BIGINT))"
    s"(CAST(CASE WHEN (($x*$x*40503 + $x*69069 + 12345) % 2147483648) " +
      "< 1073741824 THEN 1 ELSE -1 END AS DOUBLE))"
  }
  private def hofPlaneDot(c: String, p: Int): String =
    s"aggregate(sequence(1, 64), cast(0 as double), " +
      s"(s, i) -> s + cast(element_at($c, i) as double) * ${signCase(p)})"
  private def hofSig(c: String, base: Int, band: Int, bits: Int): String =
    (0 until bits).map { r =>
      s"(CASE WHEN ${hofPlaneDot(c, base + band * bits + r)} >= 0 " +
        s"THEN ${1 << r} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  test("vec_dot ≡ interpreted aggregate/zip_with fold, bitwise, " +
       "self- and cross-pairs") {
    val e = emb.select(col("vec_id"), col("embedding"))
    val shifted = e.select((col("vec_id") - 1).as("vec_id"),
      col("embedding").as("other"))
    val pairs = e.join(shifted, Seq("vec_id"))
    val bad = pairs.filter(
      expr("vec_dot(embedding, embedding)") =!=
        expr(hofDot("embedding", "embedding")) ||
      expr("vec_dot(embedding, other)") =!=
        expr(hofDot("embedding", "other"))).count()
    assert(bad == 0)
    assert(pairs.count() > 400)
  }

  test("hyper_sigs ≡ interpreted sign-bit CASE chains for the cell family " +
       "and every near-dup band, bitwise, all rows") {
    // cell family: base 0, 1 band × 4 bits
    val cellBad = emb.filter(
      expr("element_at(hyper_sigs(embedding, 0, 1, 4), 1)") =!=
        expr(hofSig("embedding", 0, 0, 4))).count()
    assert(cellBad == 0)
    // band family: base 100, 8 bands × 8 bits
    val bandExprs = (0 until 8).map(b =>
      expr(s"element_at(hyper_sigs(embedding, 100, 8, 8), ${b + 1})") =!=
        expr(hofSig("embedding", 100, b, 8)))
    val bandBad = emb.filter(bandExprs.reduce(_ || _)).count()
    assert(bandBad == 0)
  }

  test("minhash_bands ≡ interpreted per-family array_min(md5) bands, " +
       "all documents") {
    GraftFunctions.register(spark)
    val shs = "transform(sequence(1, size(toks) - 2), " +
      "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), " +
      "element_at(toks, i + 2)))"
    def mh(j: Int): String =
      s"array_min(transform($shs, sh -> md5(concat('$j', ':', sh))))"
    val hofBands = (0 until 4).map(b =>
      s"md5(concat_ws('|', ${mh(2 * b)}, ${mh(2 * b + 1)}))")
      .mkString("array(", ", ", ")")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val bad = d.filter(expr("minhash_bands(toks)") =!= expr(hofBands)).count()
    assert(bad == 0)
    assert(d.count() > 400)
  }

  test("minhash_sigs ≡ interpreted per-family array_min(md5) minima, " +
       "all documents") {
    GraftFunctions.register(spark)
    val shs = "transform(sequence(1, size(toks) - 2), " +
      "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), " +
      "element_at(toks, i + 2)))"
    val hofSigs = (0 until 8).map(j =>
      s"array_min(transform($shs, sh -> md5(concat('$j', ':', sh))))")
      .mkString("array(", ", ", ")")
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 3)
    val bad = d.filter(expr("minhash_sigs(toks)") =!= expr(hofSigs)).count()
    assert(bad == 0)
  }

  test("vec_quant ≡ interpreted floor-µ transform and sq_l2 ≡ interpreted " +
       "squared-diff fold, bitwise, all rows") {
    val hofQuant = "transform(embedding, x -> " +
      "cast(floor(cast(x as double) * 1000000D) as bigint))"
    val e = emb.select(col("vec_id"), col("embedding"))
    val qBad = e.filter(
      expr("vec_quant(embedding)") =!= expr(hofQuant)).count()
    assert(qBad == 0)
    val shifted = e.select((col("vec_id") - 1).as("vec_id"),
      expr("vec_quant(embedding)").as("qb"))
    val pairs = e.select(col("vec_id"),
        expr("vec_quant(embedding)").as("qa"))
      .join(shifted, Seq("vec_id"))
    val hofL2 = "aggregate(zip_with(qa, qb, (x, y) -> (x - y) * (x - y))" +
      ", 0L, (acc, v) -> acc + v)"
    val dBad = pairs.filter(expr("sq_l2(qa, qb)") =!= expr(hofL2)).count()
    assert(dBad == 0)
    assert(pairs.count() > 400)
  }

  test("proj_quant ≡ interpreted signed floor-µ fold over planes 200..207, " +
       "bitwise, all rows") {
    val x = "(CAST((200 + j)*64 + i AS BIGINT))"
    val sign = s"(CASE WHEN (($x*$x*40503 + $x*69069 + 12345) % 2147483648)" +
      " < 1073741824 THEN 1L ELSE -1L END)"
    val hof = "transform(sequence(0, 7), j -> " +
      "aggregate(sequence(1, 64), 0L, (acc, i) -> acc + " +
      "cast(floor(cast(element_at(embedding, i) as double) * 1000000D) " +
      s"as bigint) * $sign))"
    val bad = emb.filter(
      expr("proj_quant(embedding, 200, 8)") =!= expr(hof)).count()
    assert(bad == 0)
    assert(emb.count() > 400)
  }

  test("native expressions stay inside whole-stage codegen") {
    val p = emb.select(expr("vec_dot(embedding, embedding)").as("d"),
        expr("hyper_sigs(embedding, 100, 8, 8)").as("s"),
        expr("sq_l2(vec_quant(embedding), vec_quant(embedding))").as("q"),
        expr("proj_quant(embedding, 200, 8)").as("pq"))
      .queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), p.take(400))
  }
}
