package graft

import org.apache.spark.sql.SparkSession

/**
 * Queries-only benchmark (guide §1.4 isolation) — times the declared
 * queries with EXACTLY the frozen Bench methodology (same session config,
 * same q01 warmup, same alphabetical order, same noop sink) but without
 * the crawl campaigns, so per-query numbers comparable to the driver's
 * BENCH artifact can be re-measured in ~2 min during optimization work.
 * Bench.scala itself is frozen for measurement; this main exists so the
 * optimization loop never touches it.
 *
 * Usage: runMain graft.BenchExtra [q1,q2,... [reps]]
 *   no args   — all queries once, like the driver bench
 *   name list — only those queries
 *   reps > 1  — repeat the whole list (rep 1 ≈ driver bench conditions;
 *               later reps show the warm-plan/codegen floor)
 * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
 *      SPARK_GRAFT_CPUS (default 32).
 */
object BenchExtra {

  private def cleanShm(): Unit = {
    val root = new java.io.File("/dev/shm/graft-spark")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    Option(root.listFiles()).getOrElse(Array.empty).foreach(rm)
  }

  def main(args: Array[String]): Unit = {
    cleanShm()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val names: Seq[String] =
      if (args.nonEmpty && args(0).nonEmpty && args(0) != "all")
        args(0).split(",").toSeq
      else SparkEntry.queries.keys.filterNot(_ == "q00_crawl_trace")
        .toSeq.sorted
    val reps = if (args.length > 1) args(1).toInt else 1

    // session identical to Bench.session(cpus) — keep in sync by eye; the
    // frozen file cannot export it without being edited
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-benchextra-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .config("spark.memory.offHeap.enabled", "true")
      .config("spark.memory.offHeap.size", "12g")
      .config("spark.serializer",
        sys.env.getOrElse("SPARK_GRAFT_SERIALIZER",
          "org.apache.spark.serializer.JavaSerializer"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      // untimed warmup, as in Bench
      SparkEntry.queries("q01_agg_pricing")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (1 to reps).foreach { rep =>
        val times = names.map { name =>
          val fn = SparkEntry.queries.getOrElse(name,
            sys.error(s"unknown query $name"))
          spark.sparkContext.setJobDescription(s"$name rep$rep")
          val t0 = System.nanoTime()
          val ok =
            try {
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              true
            } catch { case e: Throwable =>
              System.err.println(s"[benchextra] $name failed: ${e.getMessage}")
              false
            }
          name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
        }
        val qs = times.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
          .mkString("{", ",", "}")
        val tot = times.map(_._2).sum
        println(f"""{"rep":$rep,"sf":"$sfDir","total_sec":$tot%.2f,"queries":$qs}""")
      }
    } finally { spark.stop(); cleanShm() }
  }
}
