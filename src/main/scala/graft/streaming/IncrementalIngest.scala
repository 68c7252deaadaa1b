package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType

/** Incremental ingestion via Structured Streaming.
  *
  * The reference's incrementality is daily-cron + Glue job bookmarks +
  * skip-if-exists landing (reference: terraform/glue.tf:158,
  * lambda/nyc_tlc_ingest.py:45-53 — SURVEY.md §2.10). The idiomatic Spark
  * equivalent is a file-source stream with `Trigger.AvailableNow`: the
  * checkpoint IS the bookmark — each source file is processed exactly once
  * across job restarts, and the job drains whatever is available then
  * stops, which is precisely the daily-batch semantics.
  */
object IncrementalIngest {

  /** Drain all currently-available files from `srcDir` through `transform`
    * into a parquet sink at `destDir`, exactly-once across invocations via
    * `checkpointDir`. Blocks until the drain completes. */
  def runOnce(spark: SparkSession, srcDir: String, schema: StructType,
      destDir: String, checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val stream = spark.readStream
      .schema(schema)
      .parquet(srcDir)
    val q = transform(stream).writeStream
      .format("parquet")
      .option("path", destDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream → medallion table: drain available files and append each
    * microbatch to a warehouse zone table via foreachBatch — the streaming
    * form of the pipeline's incremental fact load (checkpoint = bookmark,
    * batch writes go through the same Medallion writer as the batch path). */
  def streamToTable(spark: SparkSession, srcDir: String, schema: StructType,
      wh: graft.pipeline.Warehouse, zone: String, table: String,
      checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.pipeline.Medallion.writeTable(batch.toDF(), wh, zone, table,
          org.apache.spark.sql.SaveMode.Append)
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain `srcDir` into a VERSIONED table (r13): every microbatch
    * commits one exactly-once append snapshot via
    * [[graft.pipeline.VersionedTable.appendBatch]] — the streaming sink
    * whose output is a time-travelable table. Idempotence lives in the
    * manifest (`batch=N` line), so a crash-restart's redelivered batch
    * is a structural no-op: the streamed table and a one-shot batch
    * write of the same data are bit-identical however many times the
    * drain is interrupted. Each batch append is O(batch), the
    * snapshot count grows per drain — `Maintenance`-side compaction is
    * any full rewrite (INSERT OVERWRITE / write()), which also resets
    * the manifest dir list. */
  def streamToVersioned(spark: SparkSession, srcDir: String,
      schema: StructType, table: String, checkpointDir: String,
      transform: DataFrame => DataFrame = identity): Unit = {
    val q = transform(spark.readStream.schema(schema).parquet(srcDir))
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        graft.pipeline.VersionedTable.appendBatch(batch.toDF(), table, batchId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Event-time windowed aggregation with a watermark — counts + exact sums
    * per (window, key). Usable both on a stream (late data beyond the
    * watermark is dropped, state is bounded) and in batch (same plan,
    * watermark ignored). */
  def windowedCounts(df: DataFrame, tsCol: String, keyCol: String,
      windowDuration: String, watermarkDelay: String = "1 hour"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration), col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(keyCol), col("n"), col("total_value"))
}
