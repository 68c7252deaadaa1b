package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StatsPruning

import graft.SparkSpec

/** The automatic file-skipping rule
  * ([[org.apache.spark.sql.graft.StatsPruning]]): registered tables get
  * planner-time pruning from their stats table with NO query change;
  * results always equal the full scan's; stale appends are
  * conservatively read; unknown tables and the kill switch leave plans
  * untouched. */
class StatsPruningSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    Files.createTempDirectory("graft_prune_").toString

  /** Files the executed plan actually scans. */
  private def scannedFiles(df: DataFrame): Seq[String] = {
    df.collect() // force planning through the optimizer
    df.queryExecution.optimizedPlan.collectLeaves().flatMap {
      case r: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        r.relation
          .asInstanceOf[org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSeq
      case _ => Nil
    }
  }

  /** A table whose files hold disjoint k-ranges: file i has
    * k in [i*1000, i*1000+999]. */
  private def buildTable(dir: String, nFiles: Int): Unit =
    (0 until nFiles).foreach { i =>
      (0 until 1000).map(j => (i * 1000L + j, s"v$i-$j")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
    }

  test("registered table prunes bloom-indexed equality scans to the " +
      "admitting files; results equal the full scan") {
    val dir = tmpDir() + "/t"
    buildTable(dir, 8)
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStatsWithBloom(spark, dir, rangeCols = Seq("k"),
        bloomCols = Seq("k"), expectedItemsPerFile = 2000L,
        bloomNumBits = 1L << 16)
      .write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      val full = spark.read.parquet(dir).where(col("k") === 4321L)
      assert(scannedFiles(full).size < 8,
        "equality scan should read fewer than all 8 files")
      assert(full.collect().map(_.getString(1)).toSeq == Seq("v4-321"))
      // conjunction with an un-indexed predicate still prunes on k
      val conj = spark.read.parquet(dir)
        .where(col("k") === 4321L && col("v").startsWith("v4"))
      assert(scannedFiles(conj).size < 8)
      assert(conj.count() == 1)
      // a key outside every file's bloom scans nothing and returns nothing
      val miss = spark.read.parquet(dir).where(col("k") === 999999L)
      assert(scannedFiles(miss).isEmpty)
      assert(miss.count() == 0)
      // SQL text goes through the same rule
      spark.read.parquet(dir).createOrReplaceTempView("pruned_t")
      assert(spark.sql("SELECT v FROM pruned_t WHERE k = 7007")
        .collect().map(_.getString(0)).toSeq == Seq("v7-7"))
    } finally StatsPruning.unregister(dir)
  }

  test("versioned-table reads prune via the ROOT registration: the " +
      "parent-dir hop covers every snapshot's v=N scan roots (r14)") {
    import graft.pipeline.VersionedTable
    val dir = tmpDir() + "/vt"
    // two snapshots, each one file with a disjoint k-range
    VersionedTable.write(
      (0 until 1000).map(j => (j.toLong, s"a$j")).toDF("k", "v")
        .coalesce(1), dir)
    VersionedTable.append(
      (0 until 1000).map(j => (5000L + j, s"b$j")).toDF("k", "v")
        .coalesce(1), dir)
    val statsDir = tmpDir() + "/stats"
    FileIndex.statsForFiles(spark, VersionedTable.dataDirs(dir), Seq("k"))
      .write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir) // the ROOT, not v=N dirs
    try {
      val q = VersionedTable.read(spark, dir).where(col("k") === 5321L)
      assert(scannedFiles(q).size == 1,
        "only the admitting snapshot dir's file should be read")
      assert(q.collect().map(_.getString(1)).toSeq == Seq("b321"))
      // time travel prunes through the same registration
      val tt = VersionedTable.read(spark, dir, Some(1L))
        .where(col("k") === 321L)
      assert(scannedFiles(tt).size == 1)
      assert(tt.count() == 1)
    } finally StatsPruning.unregister(dir)
  }

  test("min/max-only stats prune equality scans too") {
    val dir = tmpDir() + "/t"
    buildTable(dir, 6)
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStats(spark, dir, Seq("k")).write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      val q = spark.read.parquet(dir).where(col("k") === 2500L)
      assert(scannedFiles(q).size == 1)
      assert(q.count() == 1)
    } finally StatsPruning.unregister(dir)
  }

  test("stale append is conservatively read: files unknown to the " +
      "index are always kept, so no row can be lost") {
    val dir = tmpDir() + "/t"
    buildTable(dir, 4)
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStatsWithBloom(spark, dir, Seq("k"), Seq("k"),
        expectedItemsPerFile = 2000L, bloomNumBits = 1L << 16)
      .write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      // append AFTER the stats build: key 777777 exists only here
      Seq((777777L, "new")).toDF("k", "v")
        .coalesce(1).write.mode("append").parquet(dir)
      val q = spark.read.parquet(dir).where(col("k") === 777777L)
      assert(q.collect().map(_.getString(1)).toSeq == Seq("new"),
        "a file the index has never seen must still be read")
      // and the stale index still prunes among the files it DOES know
      assert(scannedFiles(q).size < 5)
    } finally StatsPruning.unregister(dir)
  }

  /** Files the EXECUTED scan actually read — unlike [[scannedFiles]]
    * (the logical listing), this includes partition-directory pruning,
    * so it proves the two prunings COMPOSE. Call on a FRESH DataFrame:
    * every Dataset action resets SQL metrics, and the driver-side
    * numFiles metric is only posted on the plan's first execution
    * (selectedPartitions is lazy), so a re-collected plan reads 0. */
  private def executedScanFiles(df: DataFrame): Long = {
    df.collect()
    // AQE wraps the physical plan; collect() does not descend into the
    // adaptive wrapper's current plan on its own
    def unwrap(p: org.apache.spark.sql.execution.SparkPlan)
        : org.apache.spark.sql.execution.SparkPlan = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case other => other
    }
    unwrap(df.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }.sum
  }

  test("Hive-partitioned layout: partition pruning composes with " +
      "file-level min/max pruning inside the surviving partition") {
    val dir = tmpDir() + "/t"
    // 3 day partitions × 4 files with disjoint k-envelopes per file
    (1 to 3).foreach { d =>
      (0 until 4).foreach { i =>
        (0 until 250).map(j => (i * 1000L + j, s"d$d-$i-$j")).toDF("k", "v")
          .coalesce(1).write.mode("append").parquet(s"$dir/day=2024-01-0$d")
      }
    }
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStats(spark, dir, Seq("k")).write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      def q = spark.read.parquet(dir)
        .where(col("day") === "2024-01-02" && col("k") === 2100L)
      // file-level: k=2100 admits only file i=2 of each day (3 of 12)
      assert(scannedFiles(q).size == 3,
        "envelope pruning should keep one file per partition")
      // composed with partition pruning: exactly ONE file is read
      assert(executedScanFiles(q) == 1L)
      assert(q.collect().map(_.getString(1)).toSeq == Seq("d2-2-100"))
      // partition-only predicate: no participating file stats on day
      // (day has no stats columns) -> plain partition pruning, 4 files
      val qp = spark.read.parquet(dir).where(col("day") === "2024-01-03")
      assert(executedScanFiles(qp) == 4L)
      assert(qp.count() == 1000)
    } finally StatsPruning.unregister(dir)
  }

  test("multi-root scan: each registered root prunes from its own " +
      "stats table; unregistered roots are always read") {
    val dirA = tmpDir() + "/a"
    val dirB = tmpDir() + "/b"
    buildTable(dirA, 3)
    (0 until 3).foreach { i =>
      (0 until 1000).map(j => (100000L + i * 1000L + j, s"b$i-$j"))
        .toDF("k", "v").coalesce(1).write.mode("append").parquet(dirB)
    }
    val statsA = tmpDir() + "/sa"
    val statsB = tmpDir() + "/sb"
    FileIndex.buildStats(spark, dirA, Seq("k")).write.parquet(statsA)
    FileIndex.buildStats(spark, dirB, Seq("k")).write.parquet(statsB)
    StatsPruning.register(spark, dirA, statsA)
    try {
      // only A registered: B's 3 files are unknown -> always read
      val q1 = spark.read.parquet(dirA, dirB).where(col("k") === 1500L)
      assert(scannedFiles(q1).size == 4,
        "1 admitted file of A + all 3 unregistered files of B")
      assert(q1.count() == 1)
      // both registered: one admitted file across the 6
      StatsPruning.register(spark, dirB, statsB)
      val q2 = spark.read.parquet(dirA, dirB).where(col("k") === 101500L)
      assert(scannedFiles(q2).size == 1)
      assert(q2.collect().map(_.getString(1)).toSeq == Seq("b1-500"))
    } finally {
      StatsPruning.unregister(dirA); StatsPruning.unregister(dirB)
    }
  }

  test("compaction refreshes the registered stats index: pruning fires " +
      "immediately after the rewrite with no manual step") {
    val dir = tmpDir() + "/t"
    buildTable(dir, 8)
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStats(spark, dir, Seq("k")).write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      assert(scannedFiles(
        spark.read.parquet(dir).where(col("k") === 4321L)).size == 1)
      // sorted compaction REPLACES every file (new names); the action
      // must refresh the registered index as part of the swap
      val bytes = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length).sum
      val rep = graft.pipeline.Maintenance.compactSorted(spark, dir,
        Seq("k"), targetFileBytes = math.max(1L, bytes / 4))
      assert(rep.ok, rep.detail)
      assert(rep.detail.contains("stats index refreshed"), rep.detail)
      val current = spark.read.parquet(dir).inputFiles
        .map(FileIndex.canonicalFileKey).toSet
      assert(current.size > 1, "compaction should leave several files")
      // the refreshed index describes exactly the current listing
      val described = FileIndex
        .describedFiles(spark.read.parquet(statsDir))
        .map(FileIndex.canonicalFileKey).toSet
      assert(described == current)
      // and pruning fires on the NEW layout without re-registering
      val q = spark.read.parquet(dir).where(col("k") === 4321L)
      assert(scannedFiles(q).size == 1,
        s"expected 1 scanned of ${current.size} after refresh")
      assert(q.collect().map(_.getString(1)).toSeq == Seq("v4-321"))
    } finally StatsPruning.unregister(dir)
  }

  test("unregistered tables, unindexed predicates, range pruning, and " +
      "the kill switch") {
    val dir = tmpDir() + "/t"
    buildTable(dir, 3)
    // unregistered: all files scanned
    val q0 = spark.read.parquet(dir).where(col("k") === 10L)
    assert(scannedFiles(q0).size == 3)
    val statsDir = tmpDir() + "/stats"
    FileIndex.buildStats(spark, dir, Seq("k")).write.parquet(statsDir)
    StatsPruning.register(spark, dir, statsDir)
    try {
      // one-sided ranges prune off the min/max envelope: k < 500 can
      // only live in file 0
      val qr = spark.read.parquet(dir).where(col("k") < 500L)
      assert(scannedFiles(qr).size == 1)
      assert(qr.count() == 500)
      // and a two-sided conjunction intersects both envelopes
      val q2 = spark.read.parquet(dir)
        .where(col("k") >= 1200L && col("k") <= 1300L)
      assert(scannedFiles(q2).size == 1)
      assert(q2.count() == 101)
      // an unindexed-column predicate alone stays a full scan
      val qv = spark.read.parquet(dir).where(col("v") === "v0-1")
      assert(scannedFiles(qv).size == 3)
      assert(qv.count() == 1)
      // kill switch
      spark.conf.set(StatsPruning.EnabledKey, "false")
      val qk = spark.read.parquet(dir).where(col("k") === 10L)
      assert(scannedFiles(qk).size == 3)
      spark.conf.unset(StatsPruning.EnabledKey)
      assert(scannedFiles(
        spark.read.parquet(dir).where(col("k") === 10L)).size == 1)
    } finally StatsPruning.unregister(dir)
  }
}
