package graft.tools

import org.apache.spark.sql.SparkSession
import graft.bench.BenchWeb
import graft.core.CrawlConfig
import graft.driver.CrawlDriver

/**
 * One bench sweep in one JVM — the profiling harness. `Bench` runs whole
 * campaigns (many sessions in one JVM), which smears JFR/GC attribution
 * across sweeps; this main runs exactly one seeded sweep at one
 * parallelism so `SPARK_GRAFT_JVM_EXTRA="-XX:StartFlightRecording=..."`
 * captures a single clean profile.
 *
 * Usage: runMain graft.tools.SweepOnce [cpus=8] [nUrls=1000000]
 */
object SweepOnce {
  def main(args: Array[String]): Unit = {
    val cpus = if (args.length > 0) args(0).toInt else 8
    val n    = if (args.length > 1) args(1).toLong else 1000000L
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-sweep-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      // lz4 on shuffle + checkpointed round-state blocks (default ON,
      // matching Bench — see the A/B rationale there): tmpfs files ARE
      // DRAM, so compression trades spare CPU for memory bandwidth,
      // the binding resource of a saturated 32-thread node
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size",
        sys.env.getOrElse("SPARK_GRAFT_OFFHEAP", "12g"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val t0  = 1000000L
      val drv = new CrawlDriver(spark, CrawlConfig(),
        BenchWeb.web(spark, n, 15), store = None)
      drv.seedDs(BenchWeb.seeds(spark, n), t0 - 1)
      val start = System.nanoTime()
      drv.run(t0, 1)
      val wall = (System.nanoTime() - start) / 1e9
      println(f"[sweep-once] cpus=$cpus n=$n wall=$wall%.2f " +
        f"work=${drv.workPhaseSec}%.2f seq=${drv.seq}")
    } finally spark.stop()
  }
}
