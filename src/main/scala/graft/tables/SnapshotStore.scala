package graft.tables

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Snapshot-isolated table store: hash-bucketed copy-on-write parquet plus
 * an atomically-renamed JSON manifest per snapshot.
 *
 * This is the Iceberg-equivalent layer (no Iceberg runtime jar ships in
 * /opt/spark/jars, so per SURVEY §7.2 we implement the same snapshot
 * semantics directly):
 *  - a **snapshot** is a manifest file `snapshots/v%06d.json` written via
 *    two-phase tmp-write + atomic rename — the same crash-consistency
 *    device as the reference cache's `*.tmp` + rename() commit
 *    (reference: libcrawl/caches/disk.c:144-170) and Iceberg's metadata
 *    swap. A crash mid-commit leaves the previous snapshot intact;
 *  - **copy-on-write buckets**: each keyed table (frontier, hosts,
 *    fetch_log, extracted) is split into hash buckets; a commit rewrites
 *    only the buckets containing changed rows and carries forward the
 *    untouched buckets' file pointers — the manifest's bucket→path map IS
 *    the per-partition lineage the north_rule requires. At 10^10-frontier
 *    scale a round touches ≤ (hosts scheduled + URLs discovered) buckets,
 *    not the whole table;
 *  - **append tables** (the crawl trace, page outputs) accumulate file
 *    lists across snapshots;
 *  - **metrics**: each manifest embeds the round's fetch metrics
 *    (Iceberg snapshot-summary analog).
 *
 * Resume = read any manifest and reconstruct every table from its paths
 * (BASELINE.md resumability target).
 */
object SnapshotStore {
  final case class Snapshot(
      version: Int,
      now: Long,
      round: Long,
      seq: Long,
      cow: Map[String, Map[Int, String]],     // table → bucket → parquet dir
      appends: Map[String, Seq[String]],      // table → parquet dirs
      metrics: Map[String, Long])

  /** A keyed table's state for a commit: full current DataFrame (must carry
    * an int `bucket` column) + the set of buckets whose rows changed. */
  final case class CowUpdate(df: DataFrame, changedBuckets: Set[Int])
}

final class SnapshotStore(rootDir: String) {
  import SnapshotStore._

  private val root      = Paths.get(rootDir)
  private val dataDir   = root.resolve("data")
  private val snapsDir  = root.resolve("snapshots")
  Files.createDirectories(dataDir)
  Files.createDirectories(snapsDir)

  // ------------------------------------------------------------ manifest IO

  private def manifestPath(v: Int): Path = snapsDir.resolve(f"v$v%06d.json")

  def latestVersion: Option[Int] = {
    val stream = Files.list(snapsDir)
    val vs =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.matches("v\\d{6}\\.json") =>
          s.substring(1, 7).toInt }
        .toSeq
      finally stream.close()
    if (vs.isEmpty) None else Some(vs.max)
  }

  def load(version: Int): Snapshot = {
    val node = new ObjectMapper().readTree(
      Files.readString(manifestPath(version)))
    def strMap(field: String): Map[String, Map[Int, String]] =
      node.path(field).properties().asScala.map { e =>
        e.getKey -> e.getValue.properties().asScala
          .map(b => b.getKey.toInt -> b.getValue.asText()).toMap
      }.toMap
    Snapshot(
      version = node.path("version").asInt(),
      now     = node.path("now").asLong(),
      round   = node.path("round").asLong(),
      seq     = node.path("seq").asLong(),
      cow     = strMap("cow"),
      appends = node.path("appends").properties().asScala.map { e =>
        e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq
      }.toMap,
      metrics = node.path("metrics").properties().asScala.map { e =>
        e.getKey -> e.getValue.asLong()
      }.toMap)
  }

  def loadLatest(): Option[Snapshot] = latestVersion.map(load)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def writeManifest(s: Snapshot): Unit = {
    val cow = s.cow.map { case (t, bs) =>
      jsonStr(t) + ":{" + bs.toSeq.sortBy(_._1).map { case (b, p) =>
        jsonStr(b.toString) + ":" + jsonStr(p) }.mkString(",") + "}"
    }.mkString("{", ",", "}")
    val appends = s.appends.map { case (t, ps) =>
      jsonStr(t) + ":[" + ps.map(jsonStr).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val metrics = s.metrics.map { case (k, v) =>
      jsonStr(k) + ":" + v }.mkString("{", ",", "}")
    val json =
      s"""{"version":${s.version},"now":${s.now},"round":${s.round},""" +
      s""""seq":${s.seq},"cow":$cow,"appends":$appends,"metrics":$metrics}"""
    val tmp = snapsDir.resolve(f"v${s.version}%06d.json.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, manifestPath(s.version),           // two-phase commit
      StandardCopyOption.ATOMIC_MOVE)
  }

  // -------------------------------------------------------------- commits

  /**
   * Commit one snapshot: rewrite only changed buckets of each COW table,
   * append the new files of each append table, then atomically publish
   * the manifest.
   */
  def commit(
      prev: Option[Snapshot],
      now: Long, round: Long, seq: Long,
      cowUpdates: Map[String, CowUpdate],
      appendData: Map[String, DataFrame],
      metrics: Map[String, Long]): Snapshot = {

    val version = prev.map(_.version + 1).getOrElse(1)

    val cow = cowUpdates.map { case (table, CowUpdate(df, changed)) =>
      val prevBuckets = prev.flatMap(_.cow.get(table)).getOrElse(Map.empty)
      val newBuckets =
        if (changed.isEmpty) prevBuckets
        else {
          val dir = dataDir.resolve(table).resolve(f"v$version%06d").toString
          df.filter(df("bucket").isin(changed.toSeq: _*))
            .write.partitionBy("bucket").parquet(dir)
          // an empty bucket writes no directory — drop its pointer
          val written = changed
            .filter(b => Files.exists(Paths.get(dir, s"bucket=$b")))
          (prevBuckets -- changed) ++ written.map(b => b -> s"$dir/bucket=$b")
        }
      table -> newBuckets
    }

    val appends = appendData.map { case (table, df) =>
      val prevPaths = prev.flatMap(_.appends.get(table)).getOrElse(Nil)
      val dir = dataDir.resolve(table).resolve(f"v$version%06d").toString
      df.write.parquet(dir)
      table -> (prevPaths :+ dir)
    }

    val snap = Snapshot(version, now, round, seq, cow, appends, metrics)
    writeManifest(snap)
    snap
  }

  // ---------------------------------------------------------------- reads

  /** Read a COW table at a snapshot (bucket column not reconstructed —
    * callers re-derive it from the hash key). */
  def readCow(spark: SparkSession, snap: Snapshot, table: String,
              schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val paths = snap.cow.getOrElse(table, Map.empty).values.toSeq
    if (paths.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }

  def readAppend(spark: SparkSession, snap: Snapshot, table: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame = {
    val paths = snap.appends.getOrElse(table, Nil)
    if (paths.isEmpty) spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(paths: _*)
  }
}
