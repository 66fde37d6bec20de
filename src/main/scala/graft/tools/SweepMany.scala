package graft.tools

import org.apache.spark.sql.SparkSession
import graft.bench.BenchWeb
import graft.core.CrawlConfig
import graft.driver.CrawlDriver

/**
 * Several bench sweeps in ONE JVM (shared JIT, like a Bench campaign),
 * each in its own session — the sizing/fixed-cost measurement harness.
 * `SweepOnce` gives one clean profile; this gives back-to-back walls at
 * several (cpus, n) points so the per-sweep FIXED cost (driver planning,
 * job-submission latency, checkpoint barriers — everything that does not
 * scale with n or cpus) can be separated from the parallel work, which is
 * what sizes the 2v8 mini-campaign: eff28 = (c + W/2)/(4c + W/2) caps at
 * (W/2)/(4c + W/2) no matter how well the engine scales.
 *
 * Usage: runMain graft.tools.SweepMany 8:400000 2:1000000 8:1000000 ...
 * (first spec is ALSO used for an untimed JIT warm at n/5)
 */
object SweepMany {
  private def session(cpus: Int, offHeap: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-sweepmany-$cpus")
      .config("spark.sql.shuffle.partitions", (cpus * 2).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.shuffle.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.shuffle.spill.compress",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_COMPRESS", "true"))
      .config("spark.rdd.compress",
        sys.env.getOrElse("SPARK_GRAFT_RDD_COMPRESS", "true"))
      .config("spark.memory.offHeap.enabled", "true")
      // per-sweep override first: each sweep stops its SparkContext, so a
      // fresh memory manager (and pool size) applies per sweep — the only
      // way to A/B pool sizing ADJACENTLY in one JVM on this drifting box
      .config("spark.memory.offHeap.size", offHeap)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Same tmpfs hygiene as Bench.cleanShm: a killed earlier run leaves
    * its shuffle/spill dirs in /dev/shm (no shutdown hook ran), and tmpfs
    * pages are RAM — measured: 52 GB of residue from one SIGKILLed 4M
    * no-compress sweep OOM-killed the next run and silently degraded the
    * ones between. Run when no session is active. */
  private def cleanShm(): Unit = {
    val root = new java.io.File("/dev/shm/graft-spark")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
      f.delete(): Unit
    }
    Option(root.listFiles()).getOrElse(Array.empty).foreach(rm)
  }

  private def gcMs: Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
  }

  private def sweep(cpus: Int, n: Long, label: String,
                    leafThreads: Int = 0, offHeap: String = "",
                    leafMode: String = ""): Unit = {
    // The sysprop is read at CrawlDriver construction, so set/CLEAR it per
    // sweep: without the clear, a spec without :leafThreads that follows
    // one with it silently inherits the override (e.g. `8:2M:1 8:2M` runs
    // BOTH sweeps at 1 leaf thread), corrupting exactly the in-JVM A/B
    // comparisons the flag exists for (ADVICE r4).
    if (leafThreads > 0)
      System.setProperty("graft.leafThreads", leafThreads.toString)
    else
      System.clearProperty("graft.leafThreads")
    // Same set/CLEAR discipline for the state-leaf strategy (StateLeaf
    // reads the sysprop per call, so this is a clean per-sweep A/B knob:
    // `batched` vs `checkpoint` — anything else makes StateLeaf error
    // rather than silently A/B-ing batched against itself).
    if (leafMode.nonEmpty)
      System.setProperty("graft.stateLeaf", leafMode)
    else
      System.clearProperty("graft.stateLeaf")
    // default = the n-scaled rule the Bench campaign runs with, so sizing
    // sweeps here measure what the campaign will actually see
    val spark = session(cpus,
      if (offHeap.nonEmpty) offHeap else graft.Bench.offHeapFor(n))
    try {
      val t0  = 1000000L
      val drv = new CrawlDriver(spark, CrawlConfig(),
        BenchWeb.web(spark, n, 15), store = None)
      drv.seedDs(BenchWeb.seeds(spark, n), t0 - 1)
      val gc0 = gcMs
      val start = System.nanoTime()
      drv.run(t0, 1)
      val wall = (System.nanoTime() - start) / 1e9
      val gc = (gcMs - gc0) / 1000.0
      println(f"[$label] cpus=$cpus n=$n wall=$wall%.2f work=${drv.workPhaseSec}%.2f fixed=${wall - drv.workPhaseSec}%.2f gc=$gc%.2f tput=${n / wall}%.0f")
      drv.close()
    } finally { spark.stop(); cleanShm(); System.gc() }
  }

  def main(args: Array[String]): Unit = {
    val specs = args.toVector.map { a =>
      a.split(":") match {
        case Array(c, n)             => (c.toInt, n.toLong, 0, "", "")
        case Array(c, n, lt)         => (c.toInt, n.toLong, lt.toInt, "", "")
        case Array(c, n, lt, oh)     => (c.toInt, n.toLong, lt.toInt, oh, "")
        case Array(c, n, lt, oh, lm) => (c.toInt, n.toLong, lt.toInt, oh, lm)
        case _ => sys.error(s"bad spec $a")
      }
    }
    require(specs.nonEmpty,
      "usage: SweepMany <cpus>:<n>[:leafThreads[:offHeap[:leafMode]]] ...")
    sweep(specs.head._1, math.max(specs.head._2 / 5, 50000L), "warm")
    specs.zipWithIndex.foreach { case ((c, n, lt, oh, lm), i) =>
      sweep(c, n, s"s$i", lt, oh, lm) }
  }
}
