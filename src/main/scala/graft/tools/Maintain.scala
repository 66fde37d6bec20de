package graft.tools

import org.apache.spark.sql.SparkSession
import graft.tables.SnapshotStore

/**
 * Offline table-maintenance CLI — the Iceberg `rewrite_data_files` +
 * `expire_snapshots` pair for a snapshot root (run BETWEEN crawls, like
 * Iceberg maintenance runs beside, not inside, writers). Compacts every
 * append table's per-checkpoint file list and every COW table's scattered
 * bucket pointers into one version dir each, then expires all but the
 * newest `retain` manifests plus the data version-dirs only they
 * reference.
 *
 * Also hosts the cluster-resize job: `rebucket <N>` rewrites every COW
 * table under a new bucket count (run before resuming the crawl with a
 * driver configured for N buckets — see SnapshotStore.rebucket).
 *
 * Usage: runMain graft.tools.Maintain <snapshotDir> [retain]
 *        runMain graft.tools.Maintain <snapshotDir> rebucket <N>
 */
object Maintain {
  def main(args: Array[String]): Unit = {
    val snapDir = args.headOption.getOrElse(
      sys.error("usage: Maintain <snapshotDir> [retain | rebucket <N>]"))
    if (args.lift(1).contains("rebucket")) { rebucketMain(snapDir, args); return }
    val retain = args.lift(1).map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-maintain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val st = new SnapshotStore(snapDir)
    val snap = st.loadLatest().getOrElse(
      sys.error(s"no snapshots under $snapDir"))
    println(s"[maintain] latest v${snap.version}: " +
      s"${snap.appends.keySet.size} append tables, ${snap.cow.keySet.size} cow tables")

    snap.appends.keys.toSeq.sorted.foreach { t =>
      st.compactAppend(spark, t) match {
        case Some(s) => println(s"[maintain] compacted append $t -> v${s.version}")
        case None    => println(s"[maintain] append $t already compact")
      }
    }
    snap.cow.keys.toSeq.sorted.foreach { t =>
      st.compactCow(spark, t) match {
        case Some(s) => println(s"[maintain] compacted cow $t -> v${s.version}")
        case None    => println(s"[maintain] cow $t already compact")
      }
    }
    val deleted = st.expireSnapshots(retain)
    println(s"[maintain] expired to $retain manifests; " +
      s"deleted ${deleted.size} version dirs")
    deleted.foreach(d => println(s"[maintain]   rm $d"))
    spark.stop()
  }

  private def rebucketMain(snapDir: String, args: Array[String]): Unit = {
    val n = args.lift(2).map(_.toInt).getOrElse(
      sys.error("usage: Maintain <snapshotDir> rebucket <N>"))
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-rebucket")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val st = new SnapshotStore(snapDir)
    st.rebucket(spark, n,
      t => graft.driver.CrawlDriver.cowBucketCol(t, n)) match {
      case Some(s) =>
        println(s"[maintain] rebucketed to $n buckets -> v${s.version}")
        s.cow.toSeq.sortBy(_._1).foreach { case (t, bs) =>
          println(s"[maintain]   $t: ${bs.size} non-empty buckets") }
      case None => println(s"[maintain] no snapshots under $snapDir")
    }
    spark.stop()
  }
}
