package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Streaming dedup + streaming merge: the live-path complements of the
  * batch `Dedup` and `pipeline.Cdc` operators for a continuous-crawl
  * ingest (the reference's daily cron, run as a stream instead).
  *
  * Scale design: `dedupedStream` keeps ONLY keys inside the watermark
  * horizon in state (`dropDuplicatesWithinWatermark` expires state as the
  * watermark advances — unbounded-corpus safe, where a plain
  * `dropDuplicates` on a stream would grow state forever); cross-horizon
  * duplicates are the batch operators' job (exact digest dedup /
  * [[graft.operators.NearDupIndex]] probes) downstream. `mergeStream`
  * applies each micro-batch as one MERGE commit — idempotent per batch id
  * via the checkpoint, the standard streaming-CDC-apply shape.
  */
object StreamDedup {

  /** Content-level streaming dedup: one surviving row per `digestCols`
    * combination within the watermark horizon. State is bounded by the
    * horizon: a key's state row is dropped once the event-time watermark
    * on `tsCol` passes it. */
  def dedupedStream(stream: DataFrame, tsCol: String,
      watermarkDelay: String, digestCols: Seq[String]): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(digestCols)

  /** Drain the currently-available files of `srcDir` through
    * content-digest dedup into a parquet sink, exactly-once via
    * `checkpointDir` (Trigger.AvailableNow = bookmark semantics, same as
    * [[IncrementalIngest.runOnce]]). */
  def dedupIngestOnce(spark: SparkSession, srcDir: String,
      schema: StructType, destDir: String, checkpointDir: String,
      tsCol: String, watermarkDelay: String,
      digestCols: Seq[String]): Unit = {
    val q = dedupedStream(
        spark.readStream.schema(schema).parquet(srcDir),
        tsCol, watermarkDelay, digestCols)
      .writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[dedupIngestOnce]] into a Medallion zone table via foreachBatch —
    * the COMPACTABLE sink (a direct parquet stream sink is governed by
    * its _spark_metadata log, which Maintenance.compact refuses to
    * rewrite; table appends have no such log). Dedup state still lives
    * in the checkpoint, so cross-drain duplicates are dropped the same
    * way. */
  def dedupIngestToTable(spark: SparkSession, srcDir: String,
      schema: StructType, wh: graft.pipeline.Warehouse, zone: String,
      table: String, checkpointDir: String, tsCol: String,
      watermarkDelay: String, digestCols: Seq[String]): Unit = {
    val q = dedupedStream(
        spark.readStream.schema(schema).parquet(srcDir),
        tsCol, watermarkDelay, digestCols)
      .writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        graft.pipeline.Medallion.writeTable(batch.toDF(), wh, zone, table,
          org.apache.spark.sql.SaveMode.Append)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Streaming CDC apply: each micro-batch becomes one MERGE commit on a
    * [[graft.pipeline.VersionedTable]] (update-else-insert by key;
    * `deleteCol` rows delete). In-batch duplicates per key are resolved
    * FIRST by max `orderCol` (CDC logs carry multiple updates per key per
    * batch; last-writer-wins is the standard apply rule), so the commit
    * passes the MERGE cardinality check by construction. Returns the
    * number of drained batches. */
  def mergeStream(spark: SparkSession, stream: DataFrame, table: String,
      keys: Seq[String], orderCol: String, checkpointDir: String,
      deleteCol: Option[String] = None): Long = {
    var batches = 0L
    val q = stream.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(keys.map(col): _*)
          .orderBy(desc(orderCol))
        val lastPerKey = batch.toDF()
          .withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        if (!lastPerKey.isEmpty) {
          val changes = lastPerKey.drop(orderCol)
          if (graft.pipeline.VersionedTable.latestVersion(table).isEmpty) {
            // first commit: no base to merge into — the applied change set
            // (minus deletes) IS version 1
            val initial = deleteCol
              .map(d => changes.filter(!coalesce(col(d), lit(false))).drop(d))
              .getOrElse(changes)
            graft.pipeline.VersionedTable.write(initial, table)
          } else {
            graft.pipeline.Cdc.mergeIntoVersioned(batch.sparkSession, table,
              changes, keys, deleteCol)
          }
        }
        batches += 1
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    batches
  }
}
