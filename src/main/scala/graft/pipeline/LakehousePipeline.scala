package graft.pipeline

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Cleanse, Dedup, Dims}

/** End-to-end daily pipeline over the events table: the reference's linear
  * Step Functions DAG `Ingest → BronzeToSilver → SilverToGold → Maintenance`
  * (reference: terraform/stepfunctions.tf:72-179) as plain Scala stages with
  * per-stage retry.
  *
  * Zone semantics mirror the reference:
  *  - bronze: raw immutable files, idempotent landing
  *  - silver: cleansed + deduplicated, partitioned by event_date (the
  *    proper version of the reference's unpartitioned year/month/day
  *    columns — SURVEY.md §1.3)
  *  - gold: star schema — fact (append) + dims (overwrite), exactly the
  *    reference's write-mode split
  *    (reference: glue-jobs/noaa_ghcn_silver_to_gold.py:99-121)
  */
object LakehousePipeline {

  /** Per-stage row counts come from `observe` metrics collected DURING
    * each stage's write — no stage pays a second scan (or a re-read of
    * what it just wrote) only to report a count. `factRows` is the rows
    * written by THIS run (equal to the table total in overwrite mode). */
  final case class RunReport(
      ingested: Int, skipped: Int, bronzeRows: Long, silverRows: Long,
      factRows: Long, maintenance: Seq[Maintenance.Report])

  def run(spark: SparkSession, srcEventsParquet: String, wh: Warehouse,
      factAppend: Boolean = false): RunReport = {

    // Stage 1 — ingest (idempotent file landing; S8 analog). Source
    // files list through their own Hadoop FileSystem, so the landing
    // zone can pull from any scheme the destination can't rename on.
    val srcFiles = {
      val (fs, src) = graft.util.Fs.fsFor(srcEventsParquet)
      if (fs.exists(src) && fs.getFileStatus(src).isDirectory)
        fs.listStatus(src).toSeq.map(_.getPath.toString)
          .filter(_.endsWith(".parquet")).sorted
      else Seq(src.toString)
    }
    val (copied, skipped) = Retry.withRetry(attempts = 2, baseDelayMs = 100) {
      Medallion.ingestPaths(srcFiles, wh, "events")
    }

    // Stage 2 — bronze → silver: cleanse + dedup + partition columns
    val (bronzeRows, silverRows) = Retry.withRetry(attempts = 2, baseDelayMs = 100) {
      // Observations are single-use: create them INSIDE the retry body so
      // a retried stage gets fresh ones.
      val bronzeObs = org.apache.spark.sql.Observation("bronze_rows")
      val silverObs = org.apache.spark.sql.Observation("silver_rows")
      // Bronze events carry TIMESTAMP(NANOS); read as raw nanos and
      // floor-convert (same contract as graft.Tables.load). The scan is
      // recursive (the reference reads below the partition root,
      // glue-jobs/noaa_ghcn_bronze_to_silver.py:46-50) and each row keeps
      // its source file for provenance (input_file_name, F1).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read
        .option("recursiveFileLookup", "true")
        .parquet(wh.table(Medallion.Bronze, "events"))
        .withColumn("source_file",
          regexp_extract(input_file_name(), "([^/]+)$", 1))
      val bronze = graft.Tables.normalizeEventTs(raw)
        .observe(bronzeObs, count(lit(1)).as("n"))
      val cleansed = Cleanse.rangeRules(bronze,
        Seq(col("value").isNotNull, col("value") >= 0,
          col("event_type").isNotNull && col("event_type") =!= ""))
      val deduped = Dedup.byKey(cleansed,
        keys = Seq("user_id", "event_type", "ts"),
        tieBreak = Seq(col("event_id")))
      val silver = deduped
        .withColumn("event_date", to_date(col("ts")))
        .observe(silverObs, count(lit(1)).as("n"))
      Medallion.writeTable(silver, wh, Medallion.Silver, "events",
        SaveMode.Overwrite, partitionBy = Seq("event_date"))
      // the write above is the one action; both counts ride on its pass
      (bronzeObs.get("n").asInstanceOf[Long],
        silverObs.get("n").asInstanceOf[Long])
    }

    // Stage 3 — silver → gold: dims overwrite, fact append
    val factRows = Retry.withRetry(attempts = 2, baseDelayMs = 100) {
      val factObs = org.apache.spark.sql.Observation("fact_rows")
      val silver = Medallion.readTable(spark, wh, Medallion.Silver, "events")
      val dimDate = Dims.calendarDim(silver, "ts")
      val dimType = Dims.distinctDim(silver, Seq("event_type"))
      val fact = silver.select(
          col("event_id"), col("user_id"), col("event_type"),
          col("event_date"), col("value"))
        .observe(factObs, count(lit(1)).as("n"))
      Medallion.writeTable(dimDate, wh, Medallion.Gold, "dim_date")
      Medallion.writeTable(dimType, wh, Medallion.Gold, "dim_event_type")
      Medallion.writeTable(fact, wh, Medallion.Gold, "fact_events",
        if (factAppend) SaveMode.Append else SaveMode.Overwrite,
        partitionBy = Seq("event_date"))
      factObs.get("n").asInstanceOf[Long]
    }

    // Stage 4 — maintenance (per-table isolation, continue on error; M4)
    val reports = Maintenance.runAll(spark,
      Seq(wh.table(Medallion.Silver, "events"),
        wh.table(Medallion.Gold, "fact_events")),
      targetFileBytes = 256L * 1024 * 1024)

    RunReport(copied, skipped, bronzeRows, silverRows, factRows, reports)
  }
}
