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
