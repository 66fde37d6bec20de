package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** One-off per-query wall timing against a testdata dir, same session
  * shape as the bench (local[32], tmpfs shuffle dirs, off-heap state,
  * noop sink so the full computation runs with zero write cost).
  *
  * Usage: runMain graft.tools.TimeQuery <sfDir> <queryName>[,name2,...] [reps]
  *
  * Prints one line per rep per query: `<name> rep<k> <sec>s`. Reps > 1
  * let a warm-JVM second run be read against the first (this VM drifts
  * ±2-3×; compare within a single invocation only).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: TimeQuery <sfDir> <q1,q2,...> [reps]")
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 1
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-timequery")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.compress", "true")
      .config("spark.shuffle.spill.compress", "true")
      .config("spark.rdd.compress", "true")
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "12g")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      names.foreach { name =>
        val fn = SparkEntry.queries.getOrElse(name,
          sys.error(s"unknown query $name; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(",")}"))
        (1 to reps).foreach { k =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(f"$name rep$k ${(System.nanoTime() - t0) / 1e9}%.2fs")
        }
      }
    } finally spark.stop()
  }
}
