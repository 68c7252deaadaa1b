package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.pipeline.VersionedTable

/** Streaming READ from a versioned table (r15): snapshot versions are
  * the offsets — first batch is the full starting snapshot, every
  * later batch exactly the appended rows, checkpoint restarts resume
  * from the committed version, and non-append history refuses loudly. */
class VersionedStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def drain(table: String, out: String, cp: String): Unit = {
    val q = spark.readStream
      .format(classOf[org.apache.spark.sql.graft.VersionedStreamProvider]
        .getName)
      .load(table)
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("initial snapshot + per-append microbatches, exactly-once " +
      "across checkpointed drains; the incremental batch reads ONLY " +
      "the added dirs") {
    val w = Files.createTempDirectory("graft_vss_").toString
    val table = s"$w/t"
    val out = s"$w/out"
    val cp = s"$w/cp"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table)
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), table)

    // drain 1: the full snapshot current at start (v2 = k 1,2,3)
    drain(table, out, cp)
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L))

    // no new snapshot: a re-drain adds nothing (offset already current)
    drain(table, out, cp)
    assert(spark.read.parquet(out).count() == 3)

    // two more appends, one drain: only the added rows arrive
    VersionedTable.append(Seq((4L, "d")).toDF("k", "v"), table)
    VersionedTable.append(Seq((5L, "e")).toDF("k", "v"), table)
    drain(table, out, cp)
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("non-append history between offsets refuses loudly; a fresh " +
      "checkpoint restarts from the rewritten snapshot") {
    val w = Files.createTempDirectory("graft_vss2_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), table)
    drain(table, s"$w/out", s"$w/cp")
    assert(spark.read.parquet(s"$w/out").count() == 1)
    // an overwrite breaks append-only evolution: the next drain must
    // fail loudly, never silently replay or drop rows
    VersionedTable.write(Seq((9L, "z")).toDF("k", "v"), table)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(table, s"$w/out", s"$w/cp")
    }
    assert(e.getMessage.contains("append-only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-only")))
    // fresh checkpoint: the stream restarts from the current snapshot
    drain(table, s"$w/out2", s"$w/cp2")
    assert(spark.read.parquet(s"$w/out2").collect()
      .map(_.getLong(0)).toSeq == Seq(9L))
  }

  test("maxVersionsPerBatch bounds catch-up: a backlog of appends " +
      "drains in multiple rate-limited microbatches, same final rows") {
    val w = Files.createTempDirectory("graft_vss4_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((0L, "z")).toDF("k", "v"), table)
    val q = spark.readStream
      .format(classOf[org.apache.spark.sql.graft.VersionedStreamProvider]
        .getName)
      .option(
        org.apache.spark.sql.graft.VersionedStreamProvider.MaxVersionsPerBatch,
        "2")
      .load(table)
      .writeStream.format("parquet")
      .option("path", s"$w/out")
      .option("checkpointLocation", s"$w/cp")
      .start()
    try {
      q.processAllAvailable() // batch 1: the starting snapshot (1 row)
      (1 to 5).foreach(i => VersionedTable.append(
        Seq((i.toLong, s"r$i")).toDF("k", "v"), table))
      q.processAllAvailable() // throttled catch-up: ceil(5/2) batches
      assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
        .sorted.toSeq == (0L to 5L))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 4,
        s"a 2-version cap over 5 backlogged appends needs >= 3 " +
          s"catch-up batches after the initial one; got $dataBatches")
    } finally q.stop()
  }

  test("skipNonAppendSnapshots=true carries the stream past rewrites, " +
      "delivering only append-added dirs (Iceberg's skip-overwrite)") {
    val w = Files.createTempDirectory("graft_vss5_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), table) // v1
    def drainSkip(): Unit = {
      val q = spark.readStream
        .format(classOf[org.apache.spark.sql.graft.VersionedStreamProvider]
          .getName)
        .option(org.apache.spark.sql.graft.VersionedStreamProvider
          .SkipNonAppendSnapshots, "true")
        .load(table)
        .writeStream.format("parquet")
        .option("path", s"$w/out")
        .option("checkpointLocation", s"$w/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    drainSkip() // initial: full snapshot {1}
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), table)  // v2 +{2}
    VersionedTable.write(Seq((9L, "z")).toDF("k", "v"), table)   // v3 REWRITE
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), table)  // v4 +{3}
    drainSkip()
    // the append steps' rows arrive; the overwrite's correction does
    // NOT (its content replaces already-streamed rows, Iceberg's
    // skip-overwrite contract) — and the stream did not fail
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("a non-versioned path refuses at source creation") {
    val w = Files.createTempDirectory("graft_vss3_").toString
    Seq((1L, "a")).toDF("k", "v").write.parquet(s"$w/plain")
    val e = intercept[Exception] {
      drain(s"$w/plain", s"$w/out", s"$w/cp")
    }
    assert(e.getMessage.contains("versioned") ||
      Option(e.getCause).exists(_.getMessage.contains("versioned")))
  }
}
