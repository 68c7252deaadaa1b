package graft.pipeline

import java.nio.file.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Three-zone medallion warehouse over partitioned parquet tables.
  *
  * The reference's zones are Glue databases `bronze`/`silver`/`gold` over S3
  * (reference: terraform/glue.tf:2-15) with Iceberg tables in silver/gold
  * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:108-110). No Iceberg
  * runtime jar ships in this environment, so we adopt the degradation path
  * the reference itself defines — parquet tables
  * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:147-151) — but as an
  * explicit design, not a silent catch: writes are partitioned
  * (`partitionBy`) so partition pruning works, appends are directory
  * appends, and table maintenance is provided by [[Maintenance]].
  */
final case class Warehouse(root: String) {
  def zone(z: String): String = s"$root/$z"
  def table(z: String, name: String): String = s"$root/$z/$name"
}

object Medallion {
  val Bronze = "bronze"
  val Silver = "silver"
  val Gold = "gold"

  /** S8 analog: idempotent ingest into the bronze zone — copy source files,
    * skipping any that already exist (the reference's head-object
    * exists-check, reference: lambda/nyc_tlc_ingest.py:45-53). Returns
    * (copied, skipped). */
  def ingest(srcFiles: Seq[Path], wh: Warehouse, table: String): (Int, Int) =
    ingestPaths(srcFiles.map(_.toString), wh, table)

  /** The Hadoop-FS form: source and destination resolve independently
    * (each by its own scheme), so local-to-hdfs uploads — the
    * reference's actual ingest shape, local files into the warehouse
    * store — are the same call as local-to-local. Skip-if-exists is an
    * existence probe on the DESTINATION store, exactly the reference's
    * head-object check. */
  def ingestPaths(srcFiles: Seq[String], wh: Warehouse,
      table: String): (Int, Int) = {
    val (dstFs, destDir) = graft.util.Fs.fsFor(wh.table(Bronze, table))
    dstFs.mkdirs(destDir)
    var copied = 0
    var skipped = 0
    srcFiles.foreach { s =>
      val (srcFs, src) = graft.util.Fs.fsFor(s)
      val dest = new org.apache.hadoop.fs.Path(destDir, src.getName)
      if (dstFs.exists(dest)) skipped += 1
      else {
        org.apache.hadoop.fs.FileUtil.copy(srcFs, src, dstFs, dest,
          false, dstFs.getConf)
        copied += 1
      }
    }
    (copied, skipped)
  }

  /** S4/S5/S6: write a zone table. `append` mirrors the incremental fact
    * load; overwrite mirrors the full dimension refresh. Partition columns
    * give Hive-style layout so downstream reads prune. Partitioned writes
    * shuffle on the partition columns first: without it every write task
    * emits a file into every partition directory it touches —
    * tasks × partitions small files, the at-scale anti-pattern compaction
    * then has to clean up. */
  def writeTable(df: DataFrame, wh: Warehouse, zone: String, name: String,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Unit = {
    if (mode == SaveMode.Append) assertSchemaCompatible(df, wh, zone, name)
    val out =
      if (partitionBy.isEmpty) df
      else df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
    val w = out.write.mode(mode)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(wh.table(zone, name))
  }

  /** An append into an existing parquet table with a drifted schema would
    * not fail — it writes mixed files that break at READ time, far from
    * the producer. Fail the write instead (the check Iceberg/Delta do in
    * their commit protocol; column order is not significant). */
  private def assertSchemaCompatible(df: DataFrame, wh: Warehouse,
      zone: String, name: String): Unit = {
    val (fs, dir) = graft.util.Fs.fsFor(wh.table(zone, name))
    if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory) {
      def shape(s: org.apache.spark.sql.types.StructType) =
        s.fields.map(f => (f.name, f.dataType)).sortBy(_._1).toSeq
      val existing = df.sparkSession.read.parquet(dir.toString).schema
      require(shape(existing) == shape(df.schema),
        s"append schema mismatch for $zone.$name: table has " +
          s"${shape(existing)}, append has ${shape(df.schema)}")
    }
  }

  /** Dynamic partition overwrite: replace ONLY the partitions present in
    * `df`, leaving every other partition untouched — the scalable daily
    * pattern (a day's rerun rewrites that day's partitions, not the whole
    * table; the reference's full-table overwrite is its small-scale
    * degenerate form). */
  def overwritePartitions(df: DataFrame, wh: Warehouse, zone: String,
      name: String, partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty, "dynamic overwrite needs partition columns")
    df.repartition(partitionBy.map(org.apache.spark.sql.functions.col): _*)
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionBy: _*)
      .parquet(wh.table(zone, name))
  }

  /** S3 analog: read a zone table (partition discovery included). */
  def readTable(spark: SparkSession, wh: Warehouse, zone: String,
      name: String): DataFrame =
    spark.read.parquet(wh.table(zone, name))

  /** Register all tables of a zone as `<zone>_<table>` temp views, the
    * local stand-in for the Glue catalog the SQL surface queries
    * (reference: README.md:245-276). */
  def registerZone(spark: SparkSession, wh: Warehouse, zone: String): Unit =
    tableDirs(wh, zone).foreach { t =>
      readTable(spark, wh, zone, t).createOrReplaceTempView(s"${zone}_$t")
    }

  /** S7 analog: register the warehouse in the session catalog with real DDL
    * — `CREATE DATABASE` per zone + `CREATE TABLE ... USING parquet
    * LOCATION ...` per table (the reference's explicit create-if-absent,
    * glue-jobs/noaa_ghcn_bronze_to_silver.py:117-138, minus the Iceberg
    * TBLPROPERTIES). Queries then address `silver.events`, `gold.fact_events`
    * etc. exactly as the reference's Athena surface does. */
  def registerCatalog(spark: SparkSession, wh: Warehouse,
      zones: Seq[String] = Seq(Silver, Gold)): Unit =
    zones.foreach { zone =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $zone")
      tableDirs(wh, zone).foreach { t =>
        spark.sql(
          s"""CREATE TABLE IF NOT EXISTS $zone.$t
             |USING parquet LOCATION '${wh.table(zone, t)}'""".stripMargin)
        // A Hive-partitioned external table reads as EMPTY until its
        // partitions are recovered into the catalog — the create above
        // infers the partition columns but not the partition list.
        if (Maintenance.partitionColsOf(wh.table(zone, t)).nonEmpty) {
          spark.sql(s"MSCK REPAIR TABLE $zone.$t")
        }
      }
    }

  /** Catalog statistics collection — the Glue-crawler role in the
    * reference (crawlers populate table/column stats the planner
    * consumes; reference: terraform/glue.tf crawler blocks). ANALYZE
    * gives the optimizer REAL sizeInBytes/rowCount (and per-column NDV +
    * min/max when `columns` is passed) instead of the file-size guess —
    * at warehouse scale the difference between a planned broadcast and a
    * runtime-discovered one, and the input CBO join reordering needs.
    * Call after [[registerCatalog]]; re-run after large appends. */
  def analyzeTables(spark: SparkSession, wh: Warehouse,
      zones: Seq[String] = Seq(Silver, Gold),
      columns: Map[String, Seq[String]] = Map.empty): Unit =
    zones.foreach { zone =>
      tableDirs(wh, zone).foreach { t =>
        spark.sql(s"ANALYZE TABLE $zone.$t COMPUTE STATISTICS")
        columns.get(s"$zone.$t").filter(_.nonEmpty).foreach { cols =>
          spark.sql(s"ANALYZE TABLE $zone.$t COMPUTE STATISTICS " +
            s"FOR COLUMNS ${cols.mkString(", ")}")
        }
      }
    }

  private def tableDirs(wh: Warehouse, zone: String): Seq[String] = {
    val (fs, dir) = graft.util.Fs.fsFor(wh.zone(zone))
    if (!fs.exists(dir) || !fs.getFileStatus(dir).isDirectory) Seq.empty
    else fs.listStatus(dir).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).sorted
  }
}

/** Step-Functions-style retry: N attempts, exponential backoff
  * (reference: terraform/stepfunctions.tf:104-111 — 2 attempts, 60 s base,
  * 2.0 backoff; scaled down for local use). */
object Retry {
  def withRetry[T](attempts: Int = 2, baseDelayMs: Long = 1000,
      backoff: Double = 2.0)(f: => T): T = {
    var delay = baseDelayMs
    var attempt = 1
    while (true) {
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          if (attempt >= attempts) throw e
          Thread.sleep(delay)
          delay = (delay * backoff).toLong
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
