package graft.tables

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{col, lit, row_number}
import com.fasterxml.jackson.databind.ObjectMapper

/**
 * Pluggable snapshot-storage scheme — the analog of the reference cache's
 * swappable disk/S3 backends (libcrawl/cache.c dispatches on the cache URI
 * scheme to caches/disk.c or caches/s3.c; the S3 impl maps commit/rollback
 * to PUT/DELETE at caches/s3.c:189,254,314,366). Bulk table data moves
 * through Spark's Hadoop filesystem layer (so `root` may be any scheme a
 * Hadoop FS serves — file:, hdfs:, s3a:); what this trait abstracts is the
 * small-object manifest IO and existence probes, whose atomic-publish
 * mechanics differ per store (POSIX rename vs conditional PUT).
 */
trait SnapshotIO {
  /** Store root as a Spark-readable path (file path, s3a:// URI, …). */
  def root: String
  def resolve(parts: String*): String = (root +: parts).mkString("/")
  /** File names (not paths) currently under `snapshots/`. */
  def listSnapshotFiles(): Seq[String]
  def readManifest(name: String): String
  /** Publish a manifest atomically: readers see the old set or the new
    * file, never a partial write (disk: tmp + rename, the reference's
    * two-phase commit, caches/disk.c:144-170; S3: single conditional PUT). */
  def writeManifestAtomic(name: String, content: String): Unit
  /** Does a data path (relative to root) exist with content? */
  def exists(relPath: String): Boolean
  /** Maintenance primitives (expire/compact). Defaults throw: a
    * read/commit backend need not allow deletion, and the maintenance
    * jobs are explicit opt-ins (the reference's cache backends likewise
    * split fetch/store from the destructive rollback ops —
    * caches/s3.c:314,366). */
  def deleteManifest(name: String): Unit =
    throw new UnsupportedOperationException(
      "deleteManifest: backend does not support maintenance")
  /** Recursively delete a data dir (relative to root). */
  def deleteDataDir(relPath: String): Unit =
    throw new UnsupportedOperationException(
      "deleteDataDir: backend does not support maintenance")
}

/** Local-filesystem backend (the reference's caches/disk.c analog):
  * manifests via java.nio with ATOMIC_MOVE publish. */
final class LocalFsSnapshotIO(rootDir: String) extends SnapshotIO {
  private val rootP    = Paths.get(rootDir)
  private val snapsDir = rootP.resolve("snapshots")
  Files.createDirectories(rootP.resolve("data"))
  Files.createDirectories(snapsDir)

  override def root: String = rootDir

  override def listSnapshotFiles(): Seq[String] = {
    val stream = Files.list(snapsDir)
    try stream.iterator().asScala.map(_.getFileName.toString).toSeq
    finally stream.close()
  }

  override def readManifest(name: String): String =
    Files.readString(snapsDir.resolve(name))

  override def writeManifestAtomic(name: String, content: String): Unit = {
    val tmp = snapsDir.resolve(name + ".tmp")
    Files.writeString(tmp, content)
    Files.move(tmp, snapsDir.resolve(name), StandardCopyOption.ATOMIC_MOVE)
  }

  override def exists(relPath: String): Boolean =
    Files.exists(rootP.resolve(relPath))

  override def deleteManifest(name: String): Unit =
    Files.deleteIfExists(snapsDir.resolve(name))

  override def deleteDataDir(relPath: String): Unit = {
    require(!relPath.split('/').contains(".."), s"unsafe path $relPath")
    val target = rootP.resolve(relPath).normalize()
    require(target.startsWith(rootP), s"path escapes root: $relPath")
    if (Files.exists(target)) {
      val stream = Files.walk(target)
      try stream.iterator().asScala.toSeq.reverseIterator
        .foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
  }
}

/**
 * Snapshot-isolated table store: hash-bucketed copy-on-write parquet plus
 * an atomically-published JSON manifest per snapshot.
 *
 * This is the Iceberg-equivalent layer (no Iceberg runtime jar ships in
 * /opt/spark/jars, so per SURVEY §7.2 we implement the same snapshot
 * semantics directly):
 *  - a **snapshot** is a manifest `snapshots/v%06d.json` published
 *    atomically via the backend's two-phase primitive — a crash mid-commit
 *    leaves the previous snapshot intact (reference analog:
 *    libcrawl/caches/disk.c:144-170 tmp+rename; Iceberg's metadata swap);
 *  - **copy-on-write buckets**: each keyed table is split into hash
 *    buckets; a commit rewrites only the buckets containing changed rows
 *    and carries forward the untouched buckets' file pointers — the
 *    manifest's bucket→path map IS the per-partition lineage the
 *    north_rule requires. The commit is **bucket-incremental on the read
 *    side too**: a changed bucket's new content is assembled from the
 *    previous snapshot's bucket files plus the pending in-memory deltas
 *    (last-writer-wins by key), so a commit reads and writes
 *    O(changed buckets + delta), never O(table) — the same
 *    round-cost-tracks-work property DeltaState gives the in-memory state;
 *  - **append tables** (the crawl trace) accumulate file lists;
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

  /** A keyed table's pending changes for one commit:
    *  - `delta`: the table's changed rows ONLY (all pending update/insert
    *    parts), carrying an int `bucket` column and an int `_pi` priority
    *    column (higher wins — later parts override earlier ones);
    *  - `keyCols`: the replace-by-key identity;
    *  - `changedBuckets`: buckets with ≥1 delta row (drives both the COW
    *    rewrite set and which previous bucket files are read back). */
  final case class CowDelta(delta: DataFrame, keyCols: Seq[String],
                            changedBuckets: Set[Int])
}

final class SnapshotStore(val io: SnapshotIO) {
  import SnapshotStore._

  def this(rootDir: String) = this(new LocalFsSnapshotIO(rootDir))

  /** Previous-snapshot bucket dirs read back by the last commit —
    * test-visible evidence that a commit reads O(changed buckets), not
    * O(table) (VERDICT r2 "what's wrong" #2). */
  @volatile var lastCommitPrevReads: Map[String, Seq[String]] = Map.empty

  // ------------------------------------------------------------ manifest IO

  private def manifestName(v: Int): String = f"v$v%06d.json"

  def latestVersion: Option[Int] = {
    val vs = io.listSnapshotFiles()
      .collect { case s if s.matches("v\\d{6}\\.json") =>
        s.substring(1, 7).toInt }
    if (vs.isEmpty) None else Some(vs.max)
  }

  def load(version: Int): Snapshot = {
    val node = new ObjectMapper().readTree(
      io.readManifest(manifestName(version)))
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
    io.writeManifestAtomic(manifestName(s.version), json)
  }

  // -------------------------------------------------------------- commits

  /**
   * Commit one snapshot. For each COW table, the changed buckets' new
   * content = previous bucket files (priority 0) ∪ pending delta parts
   * (priority = part ordinal), resolved last-writer-wins per key — the
   * read side touches only the CHANGED buckets of the previous snapshot,
   * never a full table view. Untouched buckets carry their file pointers
   * forward. Append tables get their new files appended. The manifest is
   * published atomically last.
   */
  def commit(
      prev: Option[Snapshot],
      now: Long, round: Long, seq: Long,
      cowDeltas: Map[String, CowDelta],
      appendData: Map[String, DataFrame],
      metrics: Map[String, Long]): Snapshot = {

    val version = prev.map(_.version + 1).getOrElse(1)
    val prevReads = Map.newBuilder[String, Seq[String]]

    val cow = cowDeltas.map { case (table, CowDelta(delta, keyCols, changed)) =>
      val prevBuckets = prev.flatMap(_.cow.get(table)).getOrElse(Map.empty)
      val newBuckets =
        if (changed.isEmpty) prevBuckets
        else {
          val relDir = s"data/$table/" + f"v$version%06d"
          val dir = io.resolve(relDir)
          val spark = delta.sparkSession
          val rowCols = delta.columns.filterNot(c => c == "bucket" || c == "_pi")
          // previous content of ONLY the changed buckets (bucket value is a
          // partition dir in the manifest, not a file column — re-attach it)
          val prevPaths = changed.toSeq.sorted
            .flatMap(b => prevBuckets.get(b).map(b -> _))
          prevReads += table -> prevPaths.map(_._2)
          val prevDf = prevPaths.map { case (b, p) =>
            spark.read.parquet(p)
              .select(rowCols.map(col).toIndexedSeq: _*)
              .withColumn("bucket", lit(b))
              .withColumn("_pi", lit(0))
          }.reduceOption(_ unionByName _)
          val all = prevDf.map(_.unionByName(delta)).getOrElse(delta)
          val w = Window.partitionBy(keyCols.map(col).toIndexedSeq: _*)
            .orderBy(col("_pi").desc)
          // mode overwrite = crash-retry safety: a commit that wrote data
          // but died before the manifest PUT leaves orphan dirs at THIS
          // version; the retry (same version — the manifest was never
          // published, so the number can't have been claimed) overwrites
          // them. Published versions are never rewritten: the manifest
          // publish is a conditional PUT, so a version name is won once.
          all.withColumn("_rn", row_number().over(w))
            .filter(col("_rn") === 1)
            .drop("_pi", "_rn")
            .write.mode("overwrite").partitionBy("bucket").parquet(dir)
          // an empty bucket writes no directory — drop its pointer
          val written = changed.filter(b => io.exists(s"$relDir/bucket=$b"))
          (prevBuckets -- changed) ++ written.map(b => b -> s"$dir/bucket=$b")
        }
      table -> newBuckets
    }

    val appends = appendData.map { case (table, df) =>
      val prevPaths = prev.flatMap(_.appends.get(table)).getOrElse(Nil)
      val dir = io.resolve(s"data/$table/" + f"v$version%06d")
      df.write.mode("overwrite").parquet(dir)
      table -> (prevPaths :+ dir)
    }

    lastCommitPrevReads = prevReads.result()
    val snap = Snapshot(version, now, round, seq, cow, appends, metrics)
    writeManifest(snap)
    snap
  }

  // ---------------------------------------------------------- maintenance
  //
  // Offline table-maintenance jobs, the Iceberg expire_snapshots /
  // rewrite_data_files analogs. Run BETWEEN crawls (a driver mid-crawl
  // holds its own `prev` snapshot pointer; resume() after maintenance),
  // exactly like Iceberg maintenance runs beside, not inside, writers.
  // Without them a long-lived table accretes one version dir per commit:
  // the trace's append file LIST grows per checkpoint (a resume reads
  // every dir), and COW bucket pointers scatter across historical version
  // dirs that can never be reclaimed while one bucket references them.

  /** Version dirs referenced by a snapshot (a COW bucket pointer's parent,
    * or an append dir). The deletable set is derived purely from
    * manifests — no data-dir LIST, so the job works on LIST-less object
    * stores. */
  private def versionDirs(s: Snapshot): Set[String] =
    (s.cow.valuesIterator.flatMap(_.valuesIterator)
      .map(_.replaceFirst("/bucket=\\d+$", "")) ++
      s.appends.valuesIterator.flatten).toSet

  /**
   * Iceberg `expire_snapshots` analog: keep the newest `retain` manifests;
   * delete the older manifests plus every data version-dir referenced ONLY
   * by expired snapshots. Dir granularity is safe by construction: a
   * version dir shared with any retained snapshot (a bucket not rewritten
   * since) survives whole. Expired MANIFESTS go first, data dirs after —
   * a crash mid-expire leaves orphan data (re-expirable) but never a
   * listed manifest with dangling pointers. Returns deleted dirs
   * (root-relative).
   */
  def expireSnapshots(retain: Int): Seq[String] = {
    require(retain >= 1, "retain >= 1")
    val versions = io.listSnapshotFiles()
      .collect { case s if s.matches("v\\d{6}\\.json") =>
        s.substring(1, 7).toInt }.sorted
    if (versions.size <= retain) return Nil
    val (expired, retained) = versions.splitAt(versions.size - retain)
    val keep = retained.map(load).map(versionDirs)
      .fold(Set.empty[String])(_ ++ _)
    val drop = expired.map(load).map(versionDirs)
      .fold(Set.empty[String])(_ ++ _) -- keep
    expired.foreach(v => io.deleteManifest(manifestName(v)))
    val rel = drop.toSeq.sorted.map(_.stripPrefix(io.root + "/"))
    rel.foreach(io.deleteDataDir)
    rel
  }

  /**
   * Iceberg `rewrite_data_files` analog for an APPEND table: consolidate
   * its accumulated per-checkpoint dirs into ONE dir, published as a new
   * snapshot version (older snapshots keep seeing the original files
   * until expireSnapshots). A long crawl checkpoints the trace every
   * round — without this, resume reads one dir per historical checkpoint.
   */
  def compactAppend(spark: SparkSession, table: String): Option[Snapshot] = {
    val snap = loadLatest().getOrElse(return None)
    val paths = snap.appends.getOrElse(table, Nil)
    if (paths.size <= 1) return None
    val version = snap.version + 1
    val dir = io.resolve(s"data/$table/" + f"v$version%06d")
    spark.read.parquet(paths: _*)
      .coalesce(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(dir)
    val out = snap.copy(version = version,
      appends = snap.appends.updated(table, Seq(dir)))
    writeManifest(out)
    Some(out)
  }

  /**
   * `rewrite_data_files` for a COW table: rewrite every bucket into one
   * new version dir so ALL older version dirs become expirable and a
   * resume reads one consolidated layout instead of pointers scattered
   * across every historical commit. O(table) — offline, paid rarely (the
   * disk-side twin of DeltaState.compact's LSM amortization).
   */
  def compactCow(spark: SparkSession, table: String): Option[Snapshot] = {
    val snap = loadLatest().getOrElse(return None)
    val buckets = snap.cow.getOrElse(table, Map.empty)
    if (buckets.isEmpty ||
        buckets.values.map(_.replaceFirst("/bucket=\\d+$", "")).toSet.size <= 1)
      return None
    val version = snap.version + 1
    val dir = io.resolve(s"data/$table/" + f"v$version%06d")
    buckets.toSeq.sortBy(_._1).map { case (b, p) =>
      spark.read.parquet(p).withColumn("bucket", lit(b))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").partitionBy("bucket").parquet(dir)
    val np = buckets.keys.map(b => b -> s"$dir/bucket=$b").toMap
    val out = snap.copy(version = version, cow = snap.cow.updated(table, np))
    writeManifest(out)
    Some(out)
  }

  /**
   * Cluster-resize maintenance: rewrite EVERY COW table under a new bucket
   * count in one atomically-published snapshot version — the step an
   * operator runs between "crawl at N executors" and "resume at 4N" (the
   * BASELINE scaling scenario). The bucket modulus is the COW commit
   * granularity: resuming a store laid out mod B with a driver hashing
   * mod B′ silently corrupts later commits — a changed bucket's LWW merge
   * reads only the OLD bucket-b files while rows that now map to b sit in
   * other dirs, so a key ends up duplicated across bucket dirs. This job
   * re-derives the bucket column per table (`bucketCol`, which must hash
   * exactly as the driver will — CrawlDriver.cowBucketCol) and rewrites
   * each table into one new version dir. O(table), offline, paid once per
   * resize — Iceberg's rewrite_data_files with a new partition spec.
   * Append tables carry forward untouched.
   */
  def rebucket(spark: SparkSession, newBuckets: Int,
               bucketCol: String => Column): Option[Snapshot] = {
    require(newBuckets >= 1, "newBuckets >= 1")
    val snap = loadLatest().getOrElse(return None)
    val version = snap.version + 1
    val cow = snap.cow.map { case (table, buckets) =>
      if (buckets.isEmpty) table -> buckets
      else {
        val relDir = s"data/$table/" + f"v$version%06d"
        val dir = io.resolve(relDir)
        // shuffle to the new bucketing BEFORE partitionBy: without it each
        // input partition can emit a file into every new bucket dir
        // (≈ oldFiles × newBuckets small files, compounding per resize —
        // the overlay partition-bloat cost); with it each bucket dir gets
        // O(1) files
        spark.read.parquet(buckets.values.toSeq: _*)
          .withColumn("bucket", bucketCol(table))
          .repartition(newBuckets, col("bucket"))
          .write.mode("overwrite").partitionBy("bucket").parquet(dir)
        val written = (0 until newBuckets)
          .filter(b => io.exists(s"$relDir/bucket=$b"))
        table -> written.map(b => b -> s"$dir/bucket=$b").toMap
      }
    }
    // record the new modulus: resume fails fast on a mismatched driver
    // instead of silently corrupting later COW commits
    val out = snap.copy(version = version, cow = cow,
      metrics = snap.metrics.updated("num_buckets", newBuckets.toLong))
    writeManifest(out)
    Some(out)
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
