package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Maintenance

class FileIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_test_").toString

  test("stats prune files on a clustered table; pruned read == plain filter") {
    val dir = tmpDir() + "/t"
    (1 to 40000).map(i => ((i * 7919) % 40000, s"v$i")).toDF("k", "v")
      .repartition(20).write.parquet(dir)
    // cluster so file-level min/max become selective
    assert(Maintenance.compactSorted(spark, dir, Seq("k"),
      targetFileBytes = 32L * 1024).ok)
    val stats = FileIndex.buildStats(spark, dir, Seq("k")).cache()
    val total = stats.count()
    assert(total > 5, s"need a multi-file table, got $total files")
    val cand = FileIndex.candidateFiles(stats, "k", lit(100), lit(300))
    assert(cand.size * 3 < total,
      s"narrow range should prune most files: ${cand.size} of $total")
    val pruned = FileIndex.prunedRangeRead(spark, dir, stats, "k",
        lit(100), lit(300))
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSet
    val plain = spark.read.parquet(dir)
      .filter(col("k") >= 100 && col("k") <= 300)
      .select("k", "v").collect().map(r => (r.getInt(0), r.getString(1)))
      .toSet
    assert(pruned == plain && plain.size == 201)
  }

  test("stats are advisory only: unclustered table still returns exact results") {
    val dir = tmpDir() + "/u"
    (1 to 5000).map(i => ((i * 7919) % 5000, i)).toDF("k", "n")
      .repartition(8).write.parquet(dir)
    val stats = FileIndex.buildStats(spark, dir, Seq("k"))
    val got = FileIndex.prunedRangeRead(spark, dir, stats, "k",
      lit(10), lit(20)).count()
    assert(got == 11L)
  }

  test("bloom index prunes files for equality keys min/max cannot") {
    val dir = tmpDir() + "/b"
    // hash-scattered layout: every file's [min, max] spans ~the whole
    // key domain, so range stats prune NOTHING for an equality probe —
    // the case the bloom column exists for. Keys are sparse (every 50th
    // value), files small and many.
    // even keys only: every odd key is a guaranteed hole INSIDE the
    // [min, max] envelope of every file (scattered layout), so range
    // stats cannot prune an odd-key probe but the bloom can
    (1 to 40000).map(i => (2L * i, s"v$i")).toDF("k", "v")
      .repartition(25).write.parquet(dir)
    val stats = FileIndex.buildStatsWithBloom(spark, dir,
      rangeCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 2000L, bloomNumBits = 64L * 1024).cache()
    val total = stats.count()
    assert(total > 5, s"need a multi-file table, got $total files")
    // probe a key that is ABSENT: bloom should prune (almost) all files
    val absent = FileIndex.candidateFilesEquals(stats, "k", 39999L)
    assert(absent.size * 3 < total,
      s"absent-key probe should prune most files: ${absent.size} of $total")
    assert(FileIndex.prunedEqualityRead(spark, dir, stats, "k", 39999L)
      .count() == 0L)
    // range stats CANNOT prune this probe (scattered layout)
    assert(FileIndex.candidateFiles(stats, "k", lit(39999L), lit(39999L)).size
      == total.toInt)
    // present key: exact equality with the plain filter
    val key = 2L * 123
    val pruned = FileIndex.prunedEqualityRead(spark, dir, stats, "k",
      key).select("v").collect().map(_.getString(0)).toSet
    val plain = spark.read.parquet(dir).filter(col("k") === key)
      .select("v").collect().map(_.getString(0)).toSet
    assert(pruned == plain && plain.nonEmpty)
  }

  test("bloom probe is distributed: collected schema is file names only, " +
      "blobs never reach the driver; type-mismatched probes still match") {
    val dir = tmpDir() + "/d"
    (1 to 4000).map(i => (2L * i, s"v$i")).toDF("k", "v")
      .repartition(6).write.parquet(dir)
    val statsDir = tmpDir() + "/stats"
    // parquet round-trip: the BloomTypeKey column metadata must survive
    FileIndex.buildStatsWithBloom(spark, dir,
      rangeCols = Nil, bloomCols = Seq("k"),
      expectedItemsPerFile = 1000L, bloomNumBits = 64L * 1024)
      .write.parquet(statsDir)
    val stats = spark.read.parquet(statsDir)
    assert(stats.schema("k_bloom").metadata.contains(FileIndex.BloomTypeKey))
    // the probe plan's output is ONE string column — the collect that
    // follows it moves file names, never megabyte blobs (the 100 TB
    // driver-memory contract)
    val plan = FileIndex.candidateFilesEqualsPlan(stats, "k", 246L)
    assert(plan.schema.map(_.name) == Seq("file"))
    assert(!plan.queryExecution.executedPlan.output
      .exists(_.name.contains("bloom")))
    // an Int probe against the Long-built bloom must hash as a Long
    // (recorded type), not as an Int — a wrong-width hash would silently
    // prune the file that holds the key
    val viaInt = FileIndex.candidateFilesEquals(stats, "k", 246).toSet
    val viaLong = FileIndex.candidateFilesEquals(stats, "k", 246L).toSet
    assert(viaInt == viaLong && viaLong.nonEmpty)
    assert(FileIndex.prunedEqualityRead(spark, dir, stats, "k", 246)
      .count() === spark.read.parquet(dir).filter(col("k") === 246L).count())
  }

  test("incremental stats: append-day rows union to exactly a full rebuild") {
    val dir = tmpDir() + "/inc"
    (1 to 3000).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(4).write.parquet(dir)
    val standing = FileIndex.buildStats(spark, dir, Seq("k"))
      .localCheckpoint() // freeze: built BEFORE the append lands
    val before = spark.read.parquet(dir).inputFiles.toSet
    (3001 to 4000).map(i => (i, s"v$i")).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(dir)
    val newFiles = spark.read.parquet(dir).inputFiles.toSet -- before
    assert(newFiles.nonEmpty)
    // O(increment): scan only the appended files, union into standing
    val merged = standing.unionByName(
      FileIndex.statsForFiles(spark, newFiles.toSeq, Seq("k")))
    val rebuilt = FileIndex.buildStats(spark, dir, Seq("k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getInt(2), r.getInt(3))).toSet
    assert(rows(merged) == rows(rebuilt))
    // and the merged table serves pruned reads over the appended range
    val got = FileIndex.prunedRangeRead(spark, dir, merged, "k",
      lit(3500), lit(3600)).count()
    assert(got == 101L)
  }

  test("incremental bloom stats: appended files' rows union to exactly a " +
      "full rebuild, blob bytes included") {
    val dir = tmpDir() + "/incb"
    (1 to 3000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(4).write.parquet(dir)
    val standing = FileIndex.buildStatsWithBloom(spark, dir,
        rangeCols = Seq("k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 2000L, bloomNumBits = 1L << 15)
      .localCheckpoint() // freeze: built BEFORE the append lands
    val before = spark.read.parquet(dir).inputFiles.toSet
    (3001 to 4000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(2).write.mode("append").parquet(dir)
    val newFiles = spark.read.parquet(dir).inputFiles.toSet -- before
    assert(newFiles.nonEmpty)
    // O(increment): scan only the appended files — a bloom-indexed
    // table must NOT need the full-table rescan after every append
    val merged = standing.unionByName(
      FileIndex.statsForFilesWithBloom(spark, newFiles.toSeq,
        rangeCols = Seq("k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 2000L, bloomNumBits = 1L << 15))
    val rebuilt = FileIndex.buildStatsWithBloom(spark, dir,
      rangeCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 2000L, bloomNumBits = 1L << 15)
    // per-file facts, INCLUDING the blob: bloom merge is bitwise OR of
    // a deterministic hash family, so same file rows => same bytes
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        r.getAs[Array[Byte]](4).toSeq)).toSet
    assert(rows(merged) == rows(rebuilt))
    // the merged table still carries the probe's type metadata and
    // serves equality reads over the appended range
    assert(FileIndex.prunedEqualityRead(spark, dir, merged, "k", 3500)
      .count() == 1L)
    val probed = FileIndex.candidateFilesEquals(merged, "k", 3500).toSet
    assert(probed.nonEmpty && probed.subsetOf(newFiles))
  }

  test("refreshStats after compaction == full rebuild, blob bytes included") {
    val dir = tmpDir() + "/refresh"
    (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(8).write.parquet(dir)
    val standing = FileIndex.buildStatsWithBloom(spark, dir,
        rangeCols = Seq("k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 4000L, bloomNumBits = 1L << 15)
      .localCheckpoint()
    // compaction REPLACES files: the append-only union path cannot
    // express this — rows must drop AND new files must scan in
    assert(Maintenance.compact(spark, dir,
      targetFileBytes = 256L * 1024 * 1024).ok)
    val after = spark.read.parquet(dir).inputFiles.toSet
    assert(after != standing.select("file").collect()
      .map(_.getString(0)).toSet, "compaction should have replaced files")
    val refreshed = FileIndex.refreshStats(spark, dir, standing,
      rangeCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 4000L, bloomNumBits = 1L << 15)
    val rebuilt = FileIndex.buildStatsWithBloom(spark, dir,
      rangeCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 4000L, bloomNumBits = 1L << 15)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        r.getAs[Array[Byte]](4).toSeq)).toSet
    assert(rows(refreshed) == rows(rebuilt))
    assert(FileIndex.prunedEqualityRead(spark, dir, refreshed, "k", 1234)
      .count() == 1L)
  }

  test("refreshStatsAuto reads columns AND bloom sizing back from the " +
      "standing table: refreshed == rebuilt with the ORIGINAL custom " +
      "sizing, blob bytes included") {
    val dir = tmpDir() + "/auto"
    (1 to 4000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartition(8).write.parquet(dir)
    // NON-default sizing, then a parquet round-trip — the metadata must
    // survive it, because that is how maintenance sees the table
    val statsDir = tmpDir() + "/auto_stats"
    FileIndex.buildStatsWithBloom(spark, dir,
        rangeCols = Seq("k"), bloomCols = Seq("k"),
        expectedItemsPerFile = 2000L, bloomNumBits = 1L << 14)
      .write.parquet(statsDir)
    assert(Maintenance.compact(spark, dir,
      targetFileBytes = 256L * 1024 * 1024).ok)
    val standing = spark.read.parquet(statsDir)
    val refreshed = FileIndex.refreshStatsAuto(spark, dir, standing)
    val rebuilt = FileIndex.buildStatsWithBloom(spark, dir,
      rangeCols = Seq("k"), bloomCols = Seq("k"),
      expectedItemsPerFile = 2000L, bloomNumBits = 1L << 14)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("file", "n_rows", "k_min", "k_max", "k_bloom").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getAs[Array[Byte]](4).toSeq)).toSet
    assert(rows(refreshed) == rows(rebuilt))
  }

  test("refreshStatsAuto on a Hive-partitioned table keeps partition " +
      "COLUMNS in the added-files scan (basePath), so partition-column " +
      "stats refresh instead of throwing") {
    val dir = tmpDir() + "/autopart"
    (1 to 2).foreach { d =>
      (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(s"$dir/day=$d")
    }
    val standing = FileIndex.buildStats(spark, dir, Seq("day", "k"))
      .localCheckpoint()
    // rewrite partition day=2 (new file names) — its rows must rescan,
    // and the rescan must still SEE the day column
    assert(Maintenance.compactSorted(spark, dir, Seq("k")).ok)
    val refreshed = FileIndex.refreshStatsAuto(spark, dir, standing)
    val rebuilt = FileIndex.buildStats(spark, dir, Seq("day", "k"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("file", "n_rows", "day_min", "day_max", "k_min", "k_max")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          r.getInt(3), r.getLong(4), r.getLong(5))).toSet
    assert(rows(refreshed) == rows(rebuilt))
    assert(refreshed.count() == 2)
  }

  test("empty candidate set yields an empty frame with the table schema") {
    val dir = tmpDir() + "/e"
    Seq((1, "x"), (2, "y")).toDF("k", "v").write.parquet(dir)
    val stats = FileIndex.buildStats(spark, dir, Seq("k"))
    val out = FileIndex.prunedRangeRead(spark, dir, stats, "k",
      lit(100), lit(200))
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }

  test("name-list collects are gated: a 1e5-file stats table probes " +
      "within the derived budget; past the gate the probe refuses " +
      "with the knob named instead of OOMing the driver") {
    // the gate is about the LIST, not real files — a synthetic stats
    // table with 100k per-file rows exercises the exact collect path
    val stats = spark.range(100000).select(
      concat(lit("file:/wh/t/part-"), col("id")).as("file"),
      lit(10L).as("n_rows"),
      (col("id") * 10).as("k_min"),
      (col("id") * 10 + 9).as("k_max"))
    assert(FileIndex.derivedNameGate() >= 100000L)
    val names = FileIndex.candidateFiles(stats, "k", lit(0), lit(10000000))
    assert(names.length == 100000)
    // conf override drops the gate below the listing: refusal, not OOM
    spark.conf.set(FileIndex.NameGateConfKey, "1000")
    try {
      val e = intercept[IllegalArgumentException] {
        FileIndex.candidateFiles(stats, "k", lit(0), lit(10000000))
      }
      assert(e.getMessage.contains(FileIndex.NameGateConfKey))
      // a narrow probe under the same gate still works
      assert(FileIndex.candidateFiles(stats, "k", lit(0), lit(50))
        .length == 6)
    } finally spark.conf.unset(FileIndex.NameGateConfKey)
  }
}
