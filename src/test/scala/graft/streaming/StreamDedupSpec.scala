package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.VersionedTable

class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupIngestOnce: duplicates collapse across drains within horizon") {
    val root = Files.createTempDirectory("graft_sdedup_").toString
    val src = s"$root/src"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, "dA", "2024-01-01 00:00:01"),
        (2L, "dA", "2024-01-01 00:00:02"), // in-batch duplicate digest
        (3L, "dB", "2024-01-01 00:00:03"))
      .toDF("id", "digest", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema
    StreamDedup.dedupIngestOnce(spark, src, schema, s"$root/out",
      s"$root/ckpt", "ts", "1 hour", Seq("digest"))
    assert(spark.read.parquet(s"$root/out").count() == 2)

    // drain 2: a re-sent digest within the watermark horizon is dropped by
    // CHECKPOINTED state (cross-micro-batch dedup); a new digest passes
    Seq((4L, "dA", "2024-01-01 00:10:00"),
        (5L, "dC", "2024-01-01 00:10:01"))
      .toDF("id", "digest", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    StreamDedup.dedupIngestOnce(spark, src, schema, s"$root/out",
      s"$root/ckpt", "ts", "1 hour", Seq("digest"))
    val out = spark.read.parquet(s"$root/out")
    assert(out.count() == 3)
    assert(out.select("digest").as[String].collect().sorted.toSeq ==
      Seq("dA", "dB", "dC"))
  }

  test("dedupIngestToTable: checkpointed dedup state + compactable sink") {
    val root = Files.createTempDirectory("graft_sdedup_tbl_").toString
    val src = s"$root/src"
    val wh = graft.pipeline.Warehouse(s"$root/wh")
    Files.createDirectories(java.nio.file.Paths.get(src))
    def drain(): Unit =
      StreamDedup.dedupIngestToTable(spark, src,
        spark.read.parquet(src).schema, wh,
        graft.pipeline.Medallion.Silver, "dd", s"$root/ckpt",
        "ts", "1 hour", Seq("digest"))
    Seq((1L, "dA", "2024-01-01 00:00:01"), (2L, "dB", "2024-01-01 00:00:02"))
      .toDF("id", "digest", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    drain()
    // re-sent digest within the horizon is dropped by checkpointed state
    Seq((3L, "dA", "2024-01-01 00:10:00"), (4L, "dC", "2024-01-01 00:10:01"))
      .toDF("id", "digest", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    drain()
    val tbl = graft.pipeline.Medallion.readTable(spark, wh,
      graft.pipeline.Medallion.Silver, "dd")
    assert(tbl.select("digest").as[String].collect().sorted.toSeq ==
      Seq("dA", "dB", "dC"))
    // and the table sink compacts (no _spark_metadata)
    val r = graft.pipeline.Maintenance.compact(spark,
      wh.table(graft.pipeline.Medallion.Silver, "dd"))
    assert(r.ok, r)
  }

  test("compact refuses a live streaming sink; foreachBatch tables compact") {
    val root = Files.createTempDirectory("graft_sdedup_cmp_").toString
    val src = s"$root/src"
    val out = s"$root/out"
    Files.createDirectories(java.nio.file.Paths.get(src))
    Seq((1L, "d1", "2024-01-01 00:01:00")).toDF("id", "digest", "ts")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(src)
    StreamDedup.dedupIngestOnce(spark, src, spark.read.parquet(src).schema,
      out, s"$root/ckpt", "ts", "1 hour", Seq("digest"))
    // a FileStreamSink dir is governed by its _spark_metadata commit log;
    // rewriting its files would strand the log and break the next drain
    // (verified empirically) — compact must refuse, not corrupt
    val r = graft.pipeline.Maintenance.compact(spark, out)
    assert(!r.ok && r.detail.contains("_spark_metadata"), r)
    // the compactable streaming path: foreachBatch appends into a
    // Medallion table (no sink log) — five drains, then compact shrinks
    val wh = graft.pipeline.Warehouse(s"$root/wh")
    (1 to 5).foreach { i =>
      Seq((i.toLong, s"v$i")).toDF("id", "v").write.mode("append")
        .parquet(s"$root/src2")
      IncrementalIngest.streamToTable(spark, s"$root/src2",
        spark.read.parquet(s"$root/src2").schema, wh,
        graft.pipeline.Medallion.Silver, "st", s"$root/ckpt2")
    }
    val tdir = wh.table(graft.pipeline.Medallion.Silver, "st")
    def files(): Int = new java.io.File(tdir).listFiles().toSeq
      .count(_.getName.endsWith(".parquet"))
    val before = files()
    assert(before >= 5, s"expected one file per drain, got $before")
    val r2 = graft.pipeline.Maintenance.compact(spark, tdir)
    assert(r2.ok, r2)
    assert(files() < before)
    assert(graft.pipeline.Medallion.readTable(spark, wh,
      graft.pipeline.Medallion.Silver, "st").count() == 5)
  }

  test("mergeStream: each micro-batch is one MERGE commit, last-writer-wins") {
    val root = Files.createTempDirectory("graft_smerge_").toString
    val src = s"$root/src"
    val table = s"$root/vt/t"
    Files.createDirectories(java.nio.file.Paths.get(src))

    def drain(): Unit = {
      val schema = spark.read.parquet(src).schema
      StreamDedup.mergeStream(spark,
        spark.readStream.schema(schema).parquet(src), table,
        keys = Seq("k"), orderCol = "seq", checkpointDir = s"$root/ckpt",
        deleteCol = Some("is_delete"))
    }

    // batch 1: insert k1 twice (seq 1 then 2 — last-writer-wins) + k2
    Seq((1L, "v1-old", 1L, false), (1L, "v1-new", 2L, false),
        (2L, "v2", 3L, false))
      .toDF("k", "v", "seq", "is_delete")
      .write.mode("append").parquet(src)
    drain()
    val v1 = VersionedTable.read(spark, table)
      .as[(Long, String)].collect().toMap
    assert(v1 == Map(1L -> "v1-new", 2L -> "v2"))

    // batch 2: update k2, delete k1, insert k3 → one new version
    Seq((2L, "v2-upd", 4L, false), (1L, "", 5L, true),
        (3L, "v3", 6L, false))
      .toDF("k", "v", "seq", "is_delete")
      .write.mode("append").parquet(src)
    drain()
    assert(VersionedTable.versions(table) == Seq(1L, 2L))
    val latest = VersionedTable.read(spark, table)
      .as[(Long, String)].collect().toMap
    assert(latest == Map(2L -> "v2-upd", 3L -> "v3"))
    // time travel still sees the pre-merge state
    val old = VersionedTable.read(spark, table, Some(1L))
      .as[(Long, String)].collect().toMap
    assert(old == Map(1L -> "v1-new", 2L -> "v2"))
  }
}
