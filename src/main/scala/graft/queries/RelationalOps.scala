package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Relational core operators over the driver testdata tables — each is the
 * SQL-expressible analog of a crawl-engine operator from SURVEY §2, with a
 * DuckDB oracle (column names aligned on both sides; float aggregation
 * re-expressed in exact integer cents so Spark/DuckDB summation order
 * cannot diverge).
 */
object RelationalOps {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Partial-agg (map-side combine) group-by — the A3/A5 counter-update
    * shape. Exact integer-cents sums. */
  def aggPricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(round(col("l_quantity")).cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("sum_price_cents"),
        count(lit(1)).as("cnt"))

  val aggPricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
      |    AS sum_price_cents,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Per-group top-1 by composite sort — the A1 frontier-dequeue shape
    * (Window.partitionBy + row_number, SURVEY §2.5). */
  def topPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("value").desc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("user_id", "event_id", "value")
  }

  val topPerUserSql: String =
    """SELECT user_id, event_id, value FROM (
      |  SELECT user_id, event_id, value,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY value DESC, event_id) AS rn
      |  FROM events) WHERE rn = 1""".stripMargin

  /** Broadcast-dim join + agg — the J1 frontier⋈hosts shape. */
  def revenueByNation(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(s, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("revenue_cents"),
        countDistinct(col("o_custkey")).as("customers"))

  val revenueByNationSql: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
      |    AS revenue_cents,
      |  COUNT(DISTINCT o_custkey) AS customers
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1""".stripMargin

  /** Left-anti join — the J2/U1 URL-seen insert-if-absent shape (parts
    * with no shipment since mid-2001; the date filter is pushed below the
    * join, mirroring the frontier's next_fetch pushdown). */
  def partsNeverOrdered(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .join(t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("2001-06-01").cast("timestamp"))
          .select("l_partkey"),
        col("p_partkey") === col("l_partkey"), "left_anti")
      .select("p_partkey", "p_name")

  val partsNeverOrderedSql: String =
    """SELECT p_partkey, p_name FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |  WHERE l_partkey = p_partkey
      |    AND l_shipdate >= TIMESTAMP '2001-06-01')""".stripMargin

  /** Per-key min inter-event gap — the A2 politeness-window shape
    * (lag window over event time). */
  def minEventGap(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    t(s, dir, "events")
      .withColumn("ets", unix_timestamp(col("ts")))
      .withColumn("gap", col("ets") - lag(col("ets"), 1).over(w))
      .filter(col("gap").isNotNull)
      .groupBy("user_id")
      .agg(min(col("gap")).as("min_gap_s"), count(lit(1)).as("n_gaps"))
  }

  val minEventGapSql: String =
    """SELECT user_id, MIN(gap) AS min_gap_s, COUNT(*) AS n_gaps FROM (
      |  SELECT user_id,
      |    (epoch_us(ts) // 1000000)
      |      - LAG(epoch_us(ts) // 1000000) OVER (
      |          PARTITION BY user_id ORDER BY ts, event_id) AS gap
      |  FROM events)
      |WHERE gap IS NOT NULL GROUP BY 1""".stripMargin

  /** K1–K3 key derivation (url_hash/shorthash/tinyhash, SURVEY §2.3) over
    * synthetic per-doc URLs — sha2/conv are byte-identical to the
    * reference's truncated-SHA-256 scheme (libcrawl/cache.c:103-129). */
  def urlKeys(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"),
        concat(lit("http://"), col("source"), lit(".example.org/doc/"),
          col("doc_id")).as("url"))
      .withColumn("url_hash", substring(sha2(col("url"), 256), 1, 32))
      .withColumn("shorthash",
        conv(substring(col("url_hash"), 1, 8), 16, 10).cast("long"))
      .withColumn("tinyhash", (col("shorthash") % 256).cast("int"))

  val urlKeysSql: String =
    """SELECT doc_id, url, url_hash,
      |  ('0x' || substr(url_hash, 1, 8))::BIGINT AS shorthash,
      |  (('0x' || substr(url_hash, 1, 8))::BIGINT % 256)::INT AS tinyhash
      |FROM (
      |  SELECT doc_id,
      |    'http://' || source || '.example.org/doc/' || doc_id AS url,
      |    substr(sha256('http://' || source || '.example.org/doc/'
      |      || doc_id), 1, 32) AS url_hash
      |  FROM documents)""".stripMargin

  /** Tumbling-window event aggregation (streaming-shaped, batch-expressed;
    * Structured Streaming uses the same plan with a watermark). */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
          .as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(round(col("value") * 100).cast("long")).as("value_cents"))

  val eventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |    AS hour_start,
      |  event_type, COUNT(*) AS cnt,
      |  CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS value_cents
      |FROM events GROUP BY 1, 2""".stripMargin
}
