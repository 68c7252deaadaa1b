package graft.pipeline

import java.io.File
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Table maintenance over parquet tables — the M1–M4 surface of the
  * reference (reference: glue-jobs/iceberg_maintenance.py:41-84) re-expressed
  * for the parquet degradation path. On an Iceberg deployment these map 1:1
  * to `CALL system.rewrite_data_files/expire_snapshots/remove_orphan_files`.
  */
object Maintenance {

  final case class Report(table: String, action: String, ok: Boolean,
      detail: String)

  /** Hive partition columns of a table directory (outermost first), read
    * from the `col=value` layout itself. Compaction MUST preserve them:
    * an unpartitioned rewrite keeps the column data (partition discovery
    * folds it back into the DataFrame) but silently destroys the layout —
    * and with it every downstream scan's partition pruning. */
  private[pipeline] def partitionColsOf(tableDir: String): Seq[String] = {
    @scala.annotation.tailrec
    def walk(dir: File, acc: Vector[String]): Vector[String] = {
      val sub = Option(dir.listFiles()).getOrElse(Array.empty[File])
        .find(f => f.isDirectory && f.getName.contains("="))
      sub match {
        case Some(d) => walk(d, acc :+ d.getName.takeWhile(_ != '='))
        case None => acc
      }
    }
    walk(new File(tableDir), Vector.empty)
  }

  /** Number of leaf partition directories (1 for unpartitioned). */
  private def leafPartitionCount(dir: File): Long = {
    val subs = Option(dir.listFiles()).getOrElse(Array.empty[File])
      .filter(f => f.isDirectory && f.getName.contains("="))
    if (subs.isEmpty) 1L else subs.map(leafPartitionCount).sum
  }

  /** M2 analog: binpack small-file compaction — rewrite a table directory
    * into files of ~`targetFileBytes` (reference default 256 MB,
    * glue-jobs/iceberg_maintenance.py:66). Atomic-ish: writes to a temp dir,
    * then swaps. Hive-partitioned layouts are preserved and compacted
    * per-partition: the rewrite shuffles on the partition columns (plus a
    * size-derived salt when a single partition exceeds the target), so
    * each partition directory ends up with ~ceil(bytes/target) files. */
  def compact(spark: SparkSession, tableDir: String,
      targetFileBytes: Long = 256L * 1024 * 1024): Report = {
    try {
      // A VersionedTable root holds immutable manifested snapshots (its
      // v=N dirs LOOK like Hive partitions) — rewriting them would break
      // the commit protocol; its own expire() is the right maintenance.
      if (Files.isDirectory(Paths.get(tableDir, "_versions"))) {
        return Report(tableDir, "compact", ok = false,
          "versioned table: snapshots are immutable, use VersionedTable.expire")
      }
      val size = dirSize(new File(tableDir))
      val numFiles = math.max(1, math.ceil(size.toDouble / targetFileBytes).toInt)
      val parts = partitionColsOf(tableDir)
      val nVals = leafPartitionCount(new File(tableDir))
      val filesPerPart = math.max(1L,
        math.ceil(size.toDouble / targetFileBytes / math.max(1L, nVals)).toLong)
      // Binpack is a no-op when the table is already at (or below) its
      // target file count — rewriting an already-compacted table every
      // maintenance run is pure write amplification (Iceberg's
      // rewrite_data_files applies the same min-input criterion). The
      // steady state after writeTable's partition-aligned writes hits
      // this path, so nightly maintenance only pays for tables that
      // actually fragmented (e.g. via appends).
      val existing = countParquetFiles(new File(tableDir))
      val targetTotal = if (parts.isEmpty) numFiles.toLong
        else nVals * filesPerPart
      if (existing <= targetTotal) {
        return Report(tableDir, "compact", ok = true,
          s"noop: $existing files already <= target $targetTotal")
      }
      val df = spark.read.parquet(tableDir)
      import org.apache.spark.sql.functions.{col, lit, pmod, xxhash64}
      val repartitioned =
        if (parts.isEmpty) df.repartition(numFiles)
        else {
          val keys = parts.map(col) :+
            pmod(xxhash64(df.columns.map(col).toSeq: _*), lit(filesPerPart))
          df.repartition(keys: _*)
        }
      val tmp = tableDir + ".compact_tmp"
      val w = repartitioned.write.mode("overwrite")
      (if (parts.isEmpty) w else w.partitionBy(parts: _*)).parquet(tmp)
      val old = tableDir + ".compact_old"
      Files.move(Paths.get(tableDir), Paths.get(old))
      Files.move(Paths.get(tmp), Paths.get(tableDir))
      deleteRecursively(new File(old))
      Report(tableDir, "compact", ok = true,
        s"rewrote ${size}B into <=$numFiles files" +
          (if (parts.isEmpty) "" else s" preserving partitions ${parts.mkString("/")}"))
    } catch {
      case e: Throwable => Report(tableDir, "compact", ok = false, e.toString)
    }
  }

  /** Compaction + data clustering: like [[compact]], but sorts rows by
    * `sortCols` within each output file so parquet min/max row-group stats
    * become selective — scans filtered on those columns skip most row
    * groups (the parquet-table analogue of Iceberg's sort-order rewrite).
    * Partitioned layouts are preserved: each partition's rows are
    * clustered by `sortCols` within that partition. */
  def compactSorted(spark: SparkSession, tableDir: String,
      sortCols: Seq[String],
      targetFileBytes: Long = 256L * 1024 * 1024): Report = {
    try {
      if (Files.isDirectory(Paths.get(tableDir, "_versions"))) {
        return Report(tableDir, "compact_sorted", ok = false,
          "versioned table: snapshots are immutable, use VersionedTable.expire")
      }
      val size = dirSize(new File(tableDir))
      val numFiles = math.max(1, math.ceil(size.toDouble / targetFileBytes).toInt)
      val parts = partitionColsOf(tableDir)
      val df = spark.read.parquet(tableDir)
      import org.apache.spark.sql.functions.col
      val sorted =
        if (parts.isEmpty)
          df.repartitionByRange(numFiles, sortCols.map(col): _*)
            .sortWithinPartitions(sortCols.map(col): _*)
        else
          df.repartition(parts.map(col): _*)
            .sortWithinPartitions((parts ++ sortCols).map(col): _*)
      val tmp = tableDir + ".compact_tmp"
      val w = sorted.write.mode("overwrite")
      (if (parts.isEmpty) w else w.partitionBy(parts: _*)).parquet(tmp)
      val old = tableDir + ".compact_old"
      Files.move(Paths.get(tableDir), Paths.get(old))
      Files.move(Paths.get(tmp), Paths.get(tableDir))
      deleteRecursively(new File(old))
      Report(tableDir, "compact_sorted", ok = true,
        s"rewrote ${size}B into <=$numFiles files sorted by ${sortCols.mkString(",")}")
    } catch {
      case e: Throwable => Report(tableDir, "compact_sorted", ok = false, e.toString)
    }
  }

  /** M3 analog: remove orphan working files (committer temp dirs, crc
    * leftovers, failed-compaction temps) not referenced by the table. */
  def removeOrphans(tableDir: String): Report = {
    try {
      var removed = 0
      val root = new File(tableDir)
      def walk(f: File): Unit = {
        if (f.isDirectory) {
          if (f.getName == "_temporary" || f.getName.endsWith(".compact_tmp")
              || f.getName.endsWith(".compact_old")) {
            deleteRecursively(f); removed += 1
          } else f.listFiles().foreach(walk)
        } else if (f.getName.endsWith(".crc") && f.getName.startsWith(".")) {
          f.delete(); removed += 1
        }
      }
      if (root.exists()) walk(root)
      Report(tableDir, "remove_orphans", ok = true, s"removed $removed")
    } catch {
      case e: Throwable => Report(tableDir, "remove_orphans", ok = false, e.toString)
    }
  }

  /** M1 analog (snapshot expiry): parquet tables have no snapshots; on the
    * Iceberg path this is `CALL system.expire_snapshots(older_than => now()
    * - retention)`. Kept as an explicit no-op so pipeline wiring matches the
    * reference DAG. */
  def expireSnapshots(tableDir: String, retentionDays: Int = 7): Report =
    Report(tableDir, "expire_snapshots", ok = true,
      s"no-op on parquet tables (retention=${retentionDays}d applies on Iceberg)")

  /** M4: per-table isolation driver — run all actions on every table,
    * continue on error (reference: glue-jobs/iceberg_maintenance.py:46-84). */
  def runAll(spark: SparkSession, tableDirs: Seq[String],
      targetFileBytes: Long = 256L * 1024 * 1024): Seq[Report] =
    tableDirs.flatMap { dir =>
      Seq(
        expireSnapshots(dir),
        compact(spark, dir, targetFileBytes),
        removeOrphans(dir))
    }

  private def countParquetFiles(f: File): Long =
    if (f.isFile) { if (f.getName.endsWith(".parquet")) 1L else 0L }
    else Option(f.listFiles()).map(_.map(countParquetFiles).sum).getOrElse(0L)

  private def dirSize(f: File): Long =
    if (f.isFile) f.length()
    else Option(f.listFiles()).map(_.map(dirSize).sum).getOrElse(0L)

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
  }
}
