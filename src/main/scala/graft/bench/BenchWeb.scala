package graft.bench

import org.apache.spark.sql.{Dataset, SparkSession}
import graft.operators.CrawlRound.WebRow

/**
 * Distributed synthetic web for throughput benchmarking — generated on the
 * executors from `spark.range` (never materialized on the driver), so the
 * same generator scales from 10^4 (sandbox) to 10^10 (cluster) rows.
 *
 * Shape: one host per seed URL (politeness never serializes the sweep —
 * measuring scheduler+fetch+extract throughput, not the reference's
 * 1 URL/s/host wall, which is a policy constant, not an engine property).
 * Each page is Turtle with `outlinks` cross-host links into a disjoint
 * `d`-namespace, so a round discovers ~n·outlinks candidate URLs and the
 * URL-seen path (bloom → cuckoo → anti-join) carries real load.
 */
object BenchWeb {

  def seedUrl(i: Long): String = s"http://h$i.bench.example.org/seed.ttl"

  private def mix(x: Long): Long = {
    var h = x * 0x9e3779b97f4a7c15L
    h ^= (h >>> 32); h *= 0xbf58476d1ce4e5b9L; h ^= (h >>> 29)
    h & Long.MaxValue
  }

  def body(i: Long, n: Long, outlinks: Int): String = {
    val self = seedUrl(i)
    val sb = new StringBuilder(outlinks * 64 + 256)
    sb.append(s"""<$self> <http://purl.org/dc/terms/title> "Bench page $i" .\n""")
    var j = 0
    while (j < outlinks) {
      val t = mix(i * 131 + j) % (n * 8)
      sb.append(s"<$self> <http://purl.org/dc/terms/references> ")
      sb.append(s"<http://d$t.bench.example.org/doc$t.ttl> .\n")
      j += 1
    }
    sb.toString
  }

  /** Shared raw header block (one constant — zero per-row allocation). */
  val OkTurtleHeaders: String =
    "HTTP/1.1 200 OK\r\nContent-Type: text/turtle\r\n"

  /** The simulated web: n seed pages, generated per-partition. */
  def web(spark: SparkSession, n: Long, outlinks: Int): Dataset[WebRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      WebRow(seedUrl(i), 900000L,
        body(i, n, outlinks).getBytes(java.nio.charset.StandardCharsets.UTF_8),
        OkTurtleHeaders)
    }
  }

  /** The seed list as a distributed Dataset. */
  def seeds(spark: SparkSession, n: Long): Dataset[String] = {
    import spark.implicits._
    spark.range(n).map(i => seedUrl(i))
  }

  // --- flatness web -------------------------------------------------------
  // Docs stay on the n seed hosts and interlink within a bounded universe
  // of n*16 docs, so a multi-round crawl keeps fetching ~n URLs/round
  // (politeness: one per host) while the frontier grows ~16×. This is the
  // demo shape for the incremental-state claim: per-round wall must track
  // per-round WORK, not total frontier size.

  def flatUrl(d: Long, n: Long): String =
    s"http://h${d % n}.bench.example.org/doc$d.ttl"

  def flatBody(d: Long, n: Long, outlinks: Int): String = {
    val self = flatUrl(d, n)
    val sb = new StringBuilder(outlinks * 64 + 128)
    sb.append(s"""<$self> <http://purl.org/dc/terms/title> "Flat doc $d" .\n""")
    var j = 0
    while (j < outlinks) {
      val t = mix(d * 197 + j * 13 + 7) % (n * 16)
      sb.append(s"<$self> <http://purl.org/dc/terms/references> <${flatUrl(t, n)}> .\n")
      j += 1
    }
    sb.toString
  }

  def flatWeb(spark: SparkSession, n: Long, outlinks: Int): Dataset[WebRow] = {
    import spark.implicits._
    spark.range(n * 16).map { d =>
      WebRow(flatUrl(d, n), 900000L,
        flatBody(d, n, outlinks)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8),
        OkTurtleHeaders)
    }
  }

  def flatSeeds(spark: SparkSession, n: Long): Dataset[String] = {
    import spark.implicits._
    spark.range(n).map(d => flatUrl(d, n))
  }
}
