package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec

class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def writeParquet(rows: Seq[(Long, Long, String)], dir: String,
      tsName: String, idName: String): Unit =
    rows.toDF(idName, "user_id", "__ts")
      .withColumn(tsName, to_timestamp(col("__ts"))).drop("__ts")
      .write.mode("append").parquet(dir)

  private val views = Seq(
    (100L, 10L, "2024-01-01 00:00:00"),
    (101L, 10L, "2024-01-01 01:00:00"),
    (102L, 11L, "2024-01-01 00:00:00"))
  private val clicks = Seq(
    (200L, 10L, "2024-01-01 00:05:00"), // matches view 100 (5 min later)
    (201L, 10L, "2024-01-01 00:30:00"), // outside 10-min window of 100
    (202L, 12L, "2024-01-01 00:01:00"), // no view for user 12
    (203L, 10L, "2024-01-01 03:00:00")) // watermark pusher; matches nothing

  private def expected = Set((100L, 200L))

  test("interval join: streaming output equals the batch twin") {
    val root = Files.createTempDirectory("graft_ssj_").toString
    writeParquet(views, s"$root/views", "view_ts", "view_id")
    writeParquet(clicks, s"$root/clicks", "click_ts", "click_id")
    val vSchema = spark.read.parquet(s"$root/views").schema
    val cSchema = spark.read.parquet(s"$root/clicks").schema

    def joined(v: DataFrame, c: DataFrame) =
      StreamJoin.intervalJoin(v, c, "user_id", "view_ts", "click_ts",
        maxDelay = "10 MINUTES", watermarkDelay = "1 MINUTE")

    val q = joined(
        spark.readStream.schema(vSchema).parquet(s"$root/views"),
        spark.readStream.schema(cSchema).parquet(s"$root/clicks"))
      .writeStream.format("memory").queryName("ssj")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val streamed = spark.table("ssj")
      .select("view_id", "click_id").rows
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == expected, s"streamed=$streamed")

    val batch = joined(
        spark.read.parquet(s"$root/views"),
        spark.read.parquet(s"$root/clicks"))
      .select("view_id", "click_id").rows
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch == expected, s"batch=$batch")
  }

  test("left-outer STREAMING join emits unmatched views once the watermark seals them") {
    val root = Files.createTempDirectory("graft_ssj_outer_").toString
    writeParquet(views, s"$root/views", "view_ts", "view_id")
    writeParquet(clicks, s"$root/clicks", "click_ts", "click_id")
    val vSchema = spark.read.parquet(s"$root/views").schema
    val cSchema = spark.read.parquet(s"$root/clicks").schema
    def drain(): Unit = {
      val q = StreamJoin.intervalJoin(
          spark.readStream.schema(vSchema).parquet(s"$root/views"),
          spark.readStream.schema(cSchema).parquet(s"$root/clicks"),
          "user_id", "view_ts", "click_ts",
          maxDelay = "10 MINUTES", watermarkDelay = "1 MINUTE",
          joinType = "left_outer")
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // The GLOBAL watermark is min(left, right): a right-side pusher alone
    // never seals view 101 (the left watermark stays at the last view).
    // drain 2 pushes BOTH watermarks forward; drain 3 runs the batch that
    // evicts with them (watermarks commit between batches).
    drain()
    writeParquet(Seq((204L, 99L, "2024-01-01 06:00:00")),
      s"$root/clicks", "click_ts", "click_id")
    writeParquet(Seq((900L, 98L, "2024-01-01 06:00:00")),
      s"$root/views", "view_ts", "view_id")
    drain()
    writeParquet(Seq((205L, 99L, "2024-01-01 07:00:00")),
      s"$root/clicks", "click_ts", "click_id")
    drain()
    val out = spark.read.parquet(s"$root/out")
      .filter(col("view_id") <= 102) // pusher rows seal outside this test
      .select("view_id", "click_id").rows
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(out == Set((100L, Some(200L)), (101L, None), (102L, None)),
      s"got $out")
  }

  test("left-outer interval join emits unmatched views with nulls (batch)") {
    val v = views.toDF("view_id", "user_id", "__ts")
      .withColumn("view_ts", to_timestamp(col("__ts"))).drop("__ts")
    val c = clicks.toDF("click_id", "user_id", "__ts")
      .withColumn("click_ts", to_timestamp(col("__ts"))).drop("__ts")
    val out = StreamJoin.intervalJoin(v, c, "user_id", "view_ts", "click_ts",
        "10 MINUTES", "1 MINUTE", joinType = "left_outer")
      .select("view_id", "click_id").rows
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toSet
    assert(out == Set((100L, Some(200L)), (101L, None), (102L, None)))
  }

  test("column contract: left columns then right minus the key") {
    val v = views.toDF("view_id", "user_id", "__ts")
      .withColumn("view_ts", to_timestamp(col("__ts"))).drop("__ts")
    val c = clicks.toDF("click_id", "user_id", "__ts")
      .withColumn("click_ts", to_timestamp(col("__ts"))).drop("__ts")
    val out = StreamJoin.intervalJoin(v, c, "user_id", "view_ts", "click_ts",
      "10 MINUTES", "1 MINUTE")
    assert(out.columns.toSeq ==
      Seq("view_id", "user_id", "view_ts", "click_id", "click_ts"))
  }
}
