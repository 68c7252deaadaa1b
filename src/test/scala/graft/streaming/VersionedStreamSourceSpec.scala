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

  // ---- startingVersion / startingTimestamp (r16) -----------------------

  private def drainFrom(table: String, out: String, cp: String,
      options: Map[String, String]): Unit = {
    // the SHORT NAME resolves via META-INF/services (r16) — using it
    // here keeps the registration itself under test
    val reader = spark.readStream.format("graft-versioned")
    options.foreach { case (k, v) => reader.option(k, v) }
    val q = reader.load(table)
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  test("startingVersion: the first batch is the incremental read " +
      "(start, current] — never the full snapshot; a tag resolves the " +
      "same way; later appends still stream") {
    val w = Files.createTempDirectory("graft_vss6_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), table) // v1
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), table)          // v2
    VersionedTable.append(Seq((4L, "d")).toDF("k", "v"), table)          // v3

    // start AFTER v1: rows of v1 are NOT delivered (exclusive start)
    drainFrom(table, s"$w/out", s"$w/cp",
      Map("startingVersion" -> "1"))
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(3L, 4L),
      "the first batch must be (v1, v3], not the full snapshot")

    // the stream continues normally from its checkpoint
    VersionedTable.append(Seq((5L, "e")).toDF("k", "v"), table)
    drainFrom(table, s"$w/out", s"$w/cp",
      Map("startingVersion" -> "1"))
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(3L, 4L, 5L))

    // a TAG resolves like VERSION AS OF
    VersionedTable.createTag(table, "base", Some(2L))
    drainFrom(table, s"$w/out2", s"$w/cp2",
      Map("startingVersion" -> "base"))
    assert(spark.read.parquet(s"$w/out2").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(4L, 5L))

    // the literal 'latest': "changes from now on" — nothing until the
    // next append, then exactly it
    drainFrom(table, s"$w/out3", s"$w/cp3",
      Map("startingVersion" -> "latest"))
    // the sink may not exist yet, or hold only an empty first batch
    assert(scala.util.Try(spark.read.parquet(s"$w/out3").count())
      .getOrElse(0L) == 0L)
    VersionedTable.append(Seq((6L, "f")).toDF("k", "v"), table)
    drainFrom(table, s"$w/out3", s"$w/cp3",
      Map("startingVersion" -> "latest"))
    assert(spark.read.parquet(s"$w/out3").collect().map(_.getLong(0))
      .toSeq == Seq(6L))
  }

  test("startingTimestamp resolves to the snapshot current at the " +
      "timestamp; options are mutually exclusive; a start behind " +
      "retention refuses loudly") {
    val w = Files.createTempDirectory("graft_vss7_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), table) // v1
    val afterV1 = System.currentTimeMillis()
    Thread.sleep(5)
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), table) // v2

    // ts between v1 and v2 resolves the start to v1 → delivers (v1, v2]
    drainFrom(table, s"$w/out", s"$w/cp",
      Map("startingTimestamp" -> afterV1.toString))
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .toSeq == Seq(2L))

    def mentions(t: Throwable, needle: String): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains(needle)) ||
        mentions(t.getCause, needle))
    val both = intercept[Exception] {
      drainFrom(table, s"$w/outx", s"$w/cpx",
        Map("startingVersion" -> "1",
          "startingTimestamp" -> afterV1.toString))
    }
    assert(mentions(both, "mutually exclusive"))

    // expire v1, then start from it: loud refusal naming retention
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), table) // v3
    VersionedTable.expire(table, keepLast = 2)                  // drops v1
    val gone = intercept[Exception] {
      drainFrom(table, s"$w/outy", s"$w/cpy",
        Map("startingVersion" -> "1"))
    }
    def mentionsRetention(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("not retained") || m.contains("retention")) ||
        mentionsRetention(t.getCause))
    assert(mentionsRetention(gone))
  }

  test("startingVersion caps catch-up too: maxVersionsPerBatch rates " +
      "the FIRST batch when a start is given") {
    val w = Files.createTempDirectory("graft_vss8_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((0L, "z")).toDF("k", "v"), table) // v1
    (1 to 4).foreach(i => VersionedTable.append(
      Seq((i.toLong, s"r$i")).toDF("k", "v"), table))          // v2..v5
    val q = spark.readStream.format("graft-versioned")
      .option("startingVersion", "1")
      .option(
        org.apache.spark.sql.graft.VersionedStreamProvider.MaxVersionsPerBatch,
        "2")
      .load(table)
      .writeStream.format("parquet")
      .option("path", s"$w/out")
      .option("checkpointLocation", s"$w/cp")
      .start()
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
        .sorted.toSeq == (1L to 4L))
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches >= 2,
        s"a 2-version cap over a 4-version catch-up from the start " +
          s"needs >= 2 batches; got $dataBatches")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains a backlog in rate-limited batches " +
      "NATIVELY (r16 admission control — no single-batch fallback): " +
      "the end is fixed at run start, every batch respects the cap") {
    val w = Files.createTempDirectory("graft_vss10_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((0L, "z")).toDF("k", "v"), table)
    def drainCapped(): org.apache.spark.sql.streaming.StreamingQuery = {
      val q = spark.readStream.format("graft-versioned")
        .option(org.apache.spark.sql.graft.VersionedStreamProvider
          .MaxVersionsPerBatch, "2")
        .load(table)
        .writeStream.format("parquet")
        .option("path", s"$w/out")
        .option("checkpointLocation", s"$w/cp")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      q
    }
    drainCapped() // initial: the full starting snapshot (one batch)
    (1 to 5).foreach(i => VersionedTable.append(
      Seq((i.toLong, s"r$i")).toDF("k", "v"), table))
    // ONE AvailableNow run must catch the 5-version backlog up in
    // ceil(5/2) capped batches — the pre-r16 fallback was a single
    // uncapped batch (with an uncommitted-batch caveat to boot)
    val q2 = drainCapped()
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == (0L to 5L))
    val dataBatches = q2.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3,
      s"AvailableNow must respect the 2-version cap; got $dataBatches " +
        "data batches")
  }

  // ---- schema pin across evolution (r16) --------------------------------

  test("additive evolution mid-stream: later batches PROJECT back to " +
      "the pinned schema; an incompatible pin refuses loudly") {
    val w = Files.createTempDirectory("graft_vss9_").toString
    val table = s"$w/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), table)
    drainFrom(table, s"$w/out", s"$w/cp", Map.empty)
    assert(spark.read.parquet(s"$w/out").columns.sorted.toSeq ==
      Seq("k", "v"))

    // the table evolves ADDITIVELY mid-stream: a new column appears in
    // the appended dir — the pinned stream keeps serving (k, v), the
    // extra column carries no promise to this stream
    VersionedTable.append(
      Seq((2L, "b", true)).toDF("k", "v", "w"), table)
    drainFrom(table, s"$w/out", s"$w/cp", Map.empty)
    val got = spark.read.parquet(s"$w/out")
    assert(got.columns.sorted.toSeq == Seq("k", "v"),
      "the pinned stream must keep its start-time schema")
    assert(got.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))

    // an INCOMPATIBLE pin (a column typed differently than the table
    // serves) refuses loudly at the batch instead of misaligning rows
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      val q = spark.readStream.format("graft-versioned")
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("k",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("v",
            org.apache.spark.sql.types.StringType))))
        .load(table)
        .writeStream.format("parquet")
        .option("path", s"$w/out3")
        .option("checkpointLocation", s"$w/cp3")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    def mentionsEvolved(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(_.contains("missing or type-changed")) ||
        mentionsEvolved(t.getCause))
    assert(mentionsEvolved(e))
  }

  // ---- per-trigger listing cost (r17) -----------------------------------

  test("offset discovery rides the mtime-validated cache: no-new-data " +
      "polls cost one stat of the manifest dir, not a LIST per " +
      "trigger; a new commit is seen immediately") {
    import graft.util.CountingLivenessFileSystem
    spark.sparkContext.hadoopConfiguration.set("fs.graftcnt.impl",
      classOf[CountingLivenessFileSystem].getName)
    val local = Files.createTempDirectory("graft_vss10_").toString
    val table = s"graftcnt://$local/t"
    VersionedTable.write(Seq((1L, "a")).toDF("k", "v"), table)
    VersionedTable.append(Seq((2L, "b")).toDF("k", "v"), table)

    // the stream itself runs end-to-end on the counting store
    val w = Files.createTempDirectory("graft_vss10o_").toString
    drain(table, s"$w/out", s"$w/cp")
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L))

    // let the manifest dir mtime SETTLE past the granularity slack,
    // then poll the way latestOffset does: the first poll re-lists
    // (fills the cache), every later no-new-data poll is list-free
    Thread.sleep(2200)
    VersionedTable.versionsCached(table)
    CountingLivenessFileSystem.manifestDirLists.set(0L)
    (1 to 5).foreach { _ =>
      assert(VersionedTable.versionsCached(table) == Seq(1L, 2L))
    }
    assert(CountingLivenessFileSystem.manifestDirLists.get() == 0L,
      "no-new-data polls must answer from the stat-validated cache " +
        s"(paid ${CountingLivenessFileSystem.manifestDirLists.get()} " +
        "LISTs)")

    // a new commit invalidates (same-JVM eagerly; cross-process via
    // the dir mtime): the next poll sees v3 with a fresh list
    VersionedTable.append(Seq((3L, "c")).toDF("k", "v"), table)
    assert(VersionedTable.versionsCached(table) == Seq(1L, 2L, 3L),
      "a fresh commit must be visible to the very next poll")

    // and the drained stream picks up exactly the appended rows
    drain(table, s"$w/out", s"$w/cp")
    assert(spark.read.parquet(s"$w/out").collect().map(_.getLong(0))
      .sorted.toSeq == Seq(1L, 2L, 3L))

    // a store with NO real dir mtime (S3-style pseudo-dir statuses
    // read 0) cannot validate the cache: every poll re-lists —
    // correctness-first fallback to the pre-cache behavior, never a
    // staleness window bounded only by the hard expiry
    CountingLivenessFileSystem.zeroDirMtimes.set(true)
    try {
      VersionedTable.versionsCached(table) // any stale entry refreshes
      CountingLivenessFileSystem.manifestDirLists.set(0L)
      (1 to 3).foreach { _ =>
        assert(VersionedTable.versionsCached(table) == Seq(1L, 2L, 3L))
      }
      assert(CountingLivenessFileSystem.manifestDirLists.get() == 3L,
        "a frozen-mtime store must re-list on every poll (paid " +
          s"${CountingLivenessFileSystem.manifestDirLists.get()} LISTs)")
    } finally CountingLivenessFileSystem.zeroDirMtimes.set(false)
  }
}
