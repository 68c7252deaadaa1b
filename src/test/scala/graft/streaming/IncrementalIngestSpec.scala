package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalIngestSpec extends SparkSpec {
  import spark.implicits._

  test("AvailableNow drain processes each file exactly once across runs") {
    val root = Files.createTempDirectory("graft_stream_").toString
    val src = s"$root/src"
    val dest = s"$root/dest"
    val ckpt = s"$root/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(src))

    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    IncrementalIngest.runOnce(spark, src, schema, dest, ckpt,
      df => df.withColumn("tag", lit("x")))
    assert(spark.read.parquet(dest).count() == 2)

    // second batch of files lands; rerun drains only the new ones
    Seq((3L, "c")).toDF("id", "v").write.mode("append").parquet(src)
    IncrementalIngest.runOnce(spark, src, schema, dest, ckpt,
      df => df.withColumn("tag", lit("x")))
    val out = spark.read.parquet(dest)
    assert(out.count() == 3) // exactly once: no reprocessing of batch 1
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("windowedCounts runs as a real stream (AvailableNow + memory sink)") {
    val root = Files.createTempDirectory("graft_stream_agg_").toString
    val src = s"$root/src"
    Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:50:00", "click", 2.0),
      ("2024-01-01 01:10:00", "view", 4.0)
    ).toDF("ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema).parquet(src)
    val q = IncrementalIngest
      .windowedCounts(stream, "ts", "event_type", "1 hour")
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val out = spark.table("win_agg").orderBy("window_start", "event_type").rows
    assert(out.size == 2)
    assert(out.head.getLong(3) == 2 && out.head.getDouble(4) == 3.0)
  }

  test("streamToTable appends microbatches to a medallion zone table") {
    val root = Files.createTempDirectory("graft_stream_tbl_").toString
    val src = s"$root/src"
    val wh = graft.pipeline.Warehouse(s"$root/wh")
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, "a")).toDF("id", "v").write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    IncrementalIngest.streamToTable(spark, src, schema, wh,
      graft.pipeline.Medallion.Silver, "stream_t", s"$root/ckpt")
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(src)
    IncrementalIngest.streamToTable(spark, src, schema, wh,
      graft.pipeline.Medallion.Silver, "stream_t", s"$root/ckpt")
    val out = graft.pipeline.Medallion.readTable(spark, wh,
      graft.pipeline.Medallion.Silver, "stream_t")
    assert(out.count() == 2) // exactly-once across drains
  }

  test("streaming dedup within watermark (W1 in streaming form)") {
    val root = Files.createTempDirectory("graft_stream_dedup_").toString
    val src = s"$root/src"
    Seq(
      (1L, 10L, "click", "2024-01-01 00:00:01"),
      (2L, 10L, "click", "2024-01-01 00:00:01"), // duplicate key
      (3L, 11L, "view", "2024-01-01 00:00:02")
    ).toDF("event_id", "user_id", "event_type", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.parquet(src)
    val schema = spark.read.parquet(src).schema
    val q = spark.readStream.schema(schema).parquet(src)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type", "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("dedup_stream").count() == 2)
  }

  test("append mode drops late data beyond the watermark across drains") {
    val root = Files.createTempDirectory("graft_stream_late_").toString
    val src = s"$root/src"
    val out = s"$root/out"
    val ckpt = s"$root/ckpt"
    def drain(): Unit = {
      val schema = spark.read.parquet(src).schema
      val q = IncrementalIngest.windowedCounts(
          spark.readStream.schema(schema).parquet(src),
          "ts", "event_type", "1 hour", watermarkDelay = "1 hour")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // drain 1: hour-0 window gets one click; the 03:00 event advances the
    // checkpointed watermark to 02:00, sealing every window before it
    Seq(("2024-01-01 00:10:00", "click", 1.0),
        ("2024-01-01 03:00:00", "click", 2.0))
      .toDF("ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    drain()
    // drain 2: a late hour-0 event (far behind the 02:00 watermark) MUST
    // be dropped; a fresh 04:00 event keeps the stream moving
    Seq(("2024-01-01 00:20:00", "click", 100.0),
        ("2024-01-01 04:00:00", "view", 4.0))
      .toDF("ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    drain()
    val rows = spark.read.parquet(out)
      .filter(col("window_start") === to_timestamp(lit("2024-01-01 00:00:00")))
      .rows
    assert(rows.size == 1, s"hour-0 window rows: ${rows.mkString(";")}")
    assert(rows.head.getAs[Long]("n") == 1 &&
      rows.head.getAs[Double]("total_value") == 1.0,
      s"late event leaked into ${rows.head}")
  }

  test("windowedCounts buckets by event time") {
    val df = Seq(
      ("2024-01-01 00:10:00", "click", 1.0),
      ("2024-01-01 00:50:00", "click", 2.0),
      ("2024-01-01 01:10:00", "click", 4.0),
      ("2024-01-01 00:20:00", "view", 8.0)
    ).toDF("ts", "event_type", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = IncrementalIngest.windowedCounts(df, "ts", "event_type", "1 hour")
      .orderBy("window_start", "event_type").rows
    assert(out.size == 3)
    assert(out.head.getLong(3) == 2)               // clicks in hour 0
    assert(out.head.getDouble(4) == 3.0)
    assert(out(2).getLong(3) == 1)                 // clicks in hour 1
  }
}
