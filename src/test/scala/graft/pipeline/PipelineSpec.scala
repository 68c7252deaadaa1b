package graft.pipeline

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Base for non-`file:` test schemes backed by the local tree.
  * RawLocal's lazy DeprecatedRawLocalFileStatus loads permissions via
  * `new java.io.File(uri)`, which rejects non-file schemes — a local-FS
  * quirk a real remote FS (hdfs, s3a) doesn't have. Materialize plain
  * statuses so these stand-ins behave like the remote stores they play.
  * Subclasses are instantiated REFLECTIVELY by Hadoop's FileSystem
  * registry (public no-arg ctors), so code under test exercises the
  * same scheme-resolution machinery a real remote root would. */
abstract class PlainStatusLocalFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  import org.apache.hadoop.fs.{FileStatus, Path => HPath}
  private def plain(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize, st.getModificationTime, st.getAccessTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      "graft", "graft", st.getPath)
  override def getFileStatus(p: HPath): FileStatus =
    plain(super.getFileStatus(p))
  override def listStatus(p: HPath): Array[FileStatus] =
    super.listStatus(p).map(plain)
}

/** A genuinely non-`file:` rename-capable Hadoop scheme. */
class StubLocalFileSystem extends PlainStatusLocalFileSystem {
  override def getScheme: String = "stub"
  override def getUri: java.net.URI = java.net.URI.create("stub:///")
}

/** Fake object-store scheme: the rename-atomicity guards must refuse
  * mutations through it, while read paths still work. */
class FakeObjectStoreFileSystem extends PlainStatusLocalFileSystem {
  override def getScheme: String = "s3a"
  override def getUri: java.net.URI = java.net.URI.create("s3a:///")
}

class PipelineSpec extends SparkSpec {

  private def tmpDir(): String =
    Files.createTempDirectory("graft_test_").toString

  test("full medallion run: ingest -> silver -> gold -> maintenance") {
    val wh = Warehouse(tmpDir())
    val report = LakehousePipeline.run(spark,
      "/root/testdata/sf0.001/events.parquet", wh)
    assert(report.ingested == 1 && report.skipped == 0)
    assert(report.silverRows > 0 && report.silverRows <= 1000)
    // observe-metric counts: cleanse+dedup can only shrink the stage
    assert(report.bronzeRows >= report.silverRows,
      s"bronze ${report.bronzeRows} < silver ${report.silverRows}")
    assert(report.factRows == report.silverRows)
    assert(report.maintenance.forall(_.ok))
    // the observed count must equal what actually landed on disk
    assert(spark.read.parquet(wh.table(Medallion.Silver, "events"))
      .count() == report.silverRows)
    // silver is partitioned by event_date (hive layout)
    val silverDirs = Files.list(Paths.get(wh.table(Medallion.Silver, "events")))
    assert(silverDirs.iterator().hasNext)
    // gold dims exist
    assert(Medallion.readTable(spark, wh, Medallion.Gold, "dim_date").count() > 0)
    assert(Medallion.readTable(spark, wh, Medallion.Gold, "dim_event_type").count() == 5)
  }

  test("rerun is idempotent at the ingest layer (skip-if-exists)") {
    val wh = Warehouse(tmpDir())
    val first = LakehousePipeline.run(spark,
      "/root/testdata/sf0.001/events.parquet", wh)
    val second = LakehousePipeline.run(spark,
      "/root/testdata/sf0.001/events.parquet", wh)
    assert(first.ingested == 1)
    assert(second.ingested == 0 && second.skipped == 1)
    assert(second.factRows == first.factRows) // overwrite mode: no dup rows
  }

  test("registerZone exposes tables to the SQL surface") {
    val wh = Warehouse(tmpDir())
    LakehousePipeline.run(spark, "/root/testdata/sf0.001/events.parquet", wh)
    Medallion.registerZone(spark, wh, Medallion.Gold)
    val n = spark.sql(
      "SELECT event_type, count(*) n FROM gold_fact_events GROUP BY 1").count()
    assert(n == 5)
  }

  test("registerCatalog: DDL databases + tables, queried as zone.table") {
    val wh = Warehouse(tmpDir())
    LakehousePipeline.run(spark, "/root/testdata/sf0.001/events.parquet", wh)
    Medallion.registerCatalog(spark, wh)
    assert(spark.sql("SELECT count(*) FROM silver.events").rows.head.getLong(0) > 0)
    assert(spark.sql("SELECT count(*) FROM gold.dim_event_type").rows.head.getLong(0) == 5)
    // silver carries per-row provenance from the recursive bronze scan
    val files = spark.sql("SELECT DISTINCT source_file FROM silver.events").rows
    assert(files.map(_.getString(0)) == Seq("events.parquet"))
  }

  test("analyzeTables hands the planner real row counts and column stats") {
    val wh = Warehouse(tmpDir())
    LakehousePipeline.run(spark, "/root/testdata/sf0.001/events.parquet", wh)
    Medallion.registerCatalog(spark, wh)
    Medallion.analyzeTables(spark, wh,
      columns = Map("gold.dim_event_type" -> Seq("event_type")))
    val stats = spark.sql("DESCRIBE TABLE EXTENDED gold.dim_event_type")
      .rows.map(r => r.getString(0) -> r.getString(1)).toMap
    // table-level: ANALYZE recorded bytes AND an exact row count
    assert(stats.contains("Statistics"), stats)
    assert(stats("Statistics").contains("5 rows"), stats("Statistics"))
    // column-level: NDV for the analyzed column
    val colStats = spark
      .sql("DESCRIBE TABLE EXTENDED gold.dim_event_type event_type")
      .rows.map(r => r.getString(0) -> r.getString(1)).toMap
    assert(colStats.get("distinct_count").contains("5"), colStats)
  }

  test("repartitionTable evolves the layout; data identical, old key kept") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    Seq((1L, "a", "2024-01-01"), (2L, "b", "2024-01-01"),
      (3L, "a", "2024-01-02"))
      .toDF("id", "k", "d")
      .write.partitionBy("k").parquet(dir)
    val before = spark.read.parquet(dir)
      .select("id", "k", "d").rows.map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet

    val rep = Maintenance.repartitionTable(spark, dir, Seq("d"))
    assert(rep.ok, rep.detail)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted.toSeq
    assert(dirs == Seq("d=2024-01-01", "d=2024-01-02"), dirs)
    // path readers infer the new partition column's type from the dir
    // names (date-shaped -> DATE); cast back for the value comparison —
    // catalog-registered tables pin the type (see scaladoc)
    val after = spark.read.parquet(dir)
      .select(col("id"), col("k"), col("d").cast("string")).rows.map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(after == before) // the old partition key survives as a column

    // pruning works on the NEW key
    val scanned = spark.read.parquet(dir).filter(col("d") === "2024-01-02")
    assert(scanned.count() == 1)

    // un-partitioning flattens the layout, data still identical
    val flat = Maintenance.repartitionTable(spark, dir, Nil)
    assert(flat.ok, flat.detail)
    assert(new java.io.File(dir).listFiles().forall(!_.isDirectory))
    assert(spark.read.parquet(dir)
      .select(col("id"), col("k"), col("d").cast("string")).rows.map(r =>
        (r.getLong(0), r.getString(1), r.getString(2))).toSet == before)
  }

  test("repartitionTable refuses versioned roots and bad columns") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    Seq((1L, "a")).toDF("id", "k").write.parquet(dir)
    assert(!Maintenance.repartitionTable(spark, dir, Seq("nope")).ok)
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir, "_versions"))
    assert(!Maintenance.repartitionTable(spark, dir, Seq("k")).ok)
  }

  test("silver partition layout supports partition pruning") {
    val wh = Warehouse(tmpDir())
    LakehousePipeline.run(spark, "/root/testdata/sf0.001/events.parquet", wh)
    // The Hive layout must survive the FULL pipeline including the
    // maintenance compaction pass (which once rewrote tables flat —
    // caught in round 3 because this assert was a vacuous substring
    // check: "PartitionFilters: []" contains "PartitionFilters").
    val silverDir = new java.io.File(wh.table(Medallion.Silver, "events"))
    assert(silverDir.listFiles().exists(_.getName.startsWith("event_date=")),
      s"no event_date= partition dirs in ${silverDir.listFiles().map(_.getName).mkString(",")}")
    val silver = Medallion.readTable(spark, wh, Medallion.Silver, "events")
    val someDate = silver.select("event_date").limit(1).rows.head.getDate(0)
    val pruned = silver.filter(org.apache.spark.sql.functions.col("event_date")
      === someDate)
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert("PartitionFilters: \\[[^\\]]*event_date".r.findFirstIn(scan).nonEmpty,
      s"no non-empty partition filter on event_date in:\n$scan")
    assert(pruned.count() > 0)
  }

  test("append with a drifted schema fails at write time, not read time") {
    import spark.implicits._
    val wh = Warehouse(tmpDir())
    Medallion.writeTable(Seq((1L, "a")).toDF("id", "v"), wh,
      Medallion.Silver, "t")
    // same shape, different column order: fine
    Medallion.writeTable(Seq(("b", 2L)).toDF("v", "id"), wh,
      Medallion.Silver, "t", SaveMode.Append)
    assert(Medallion.readTable(spark, wh, Medallion.Silver, "t").count() == 2)
    // drifted type: refused
    intercept[IllegalArgumentException] {
      Medallion.writeTable(Seq((3, "c")).toDF("id", "v"), wh,
        Medallion.Silver, "t", SaveMode.Append) // id is int, table has long
    }
    // drifted columns: refused
    intercept[IllegalArgumentException] {
      Medallion.writeTable(Seq((4L, "d", 1.0)).toDF("id", "v", "extra"), wh,
        Medallion.Silver, "t", SaveMode.Append)
    }
  }

  test("overwritePartitions replaces only the partitions present in the data") {
    import spark.implicits._
    val wh = Warehouse(tmpDir())
    Medallion.writeTable(
      Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "d"),
      wh, Medallion.Silver, "t", partitionBy = Seq("d"))
    // rerun day 2 with corrected data; day 1 must be untouched
    Medallion.overwritePartitions(
      Seq((20L, "2024-01-02"), (21L, "2024-01-02")).toDF("id", "d"),
      wh, Medallion.Silver, "t", Seq("d"))
    val out = Medallion.readTable(spark, wh, Medallion.Silver, "t")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(out == Seq(1L, 20L, 21L), s"got $out")
  }

  test("compact refuses a versioned-table root (immutable snapshots)") {
    import spark.implicits._
    val dir = tmpDir() + "/vt"
    VersionedTable.write((1 to 10).toDF("x"), dir)
    val rep = Maintenance.compact(spark, dir)
    assert(!rep.ok && rep.detail.contains("versioned"))
    // snapshot still readable
    assert(VersionedTable.read(spark, dir).count() == 10)
  }

  test("compact preserves a Hive-partitioned layout and its pruning") {
    import spark.implicits._
    val dir = tmpDir() + "/pt"
    (1 to 300).map(i => (i.toLong, i % 3)).toDF("id", "k")
      .repartition(10).write.partitionBy("k").parquet(dir)
    val filesBefore = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("k="))
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    val rep = Maintenance.compact(spark, dir, targetFileBytes = 256L * 1024 * 1024)
    assert(rep.ok, rep.detail)
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("k="))
    assert(partDirs.length == 3, s"partition dirs lost: ${partDirs.mkString(",")}")
    val filesAfter = partDirs
      .map(d => d.listFiles().count(_.getName.endsWith(".parquet"))).sum
    assert(filesAfter < filesBefore && filesAfter <= 3,
      s"$filesBefore -> $filesAfter files")
    val back = spark.read.parquet(dir)
    assert(back.count() == 300)
    val scan = back.filter($"k" === 1)
      .queryExecution.executedPlan.collectLeaves().head.toString
    assert("PartitionFilters: \\[[^\\]]*k".r.findFirstIn(scan).nonEmpty,
      s"no partition filter after compact:\n$scan")
  }

  test("compact preserves two-level partitioning (NOAA year/month shape)") {
    import spark.implicits._
    val dir = tmpDir() + "/pt2"
    (1 to 200).map(i => (i.toLong, 2024 + i % 2, 1 + i % 3)).toDF("id", "year", "month")
      .repartition(8).write.partitionBy("year", "month").parquet(dir)
    assert(Maintenance.compact(spark, dir).ok)
    val years = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("year="))
    assert(years.length == 2)
    assert(years.forall(_.listFiles().count(_.getName.startsWith("month=")) == 3))
    assert(spark.read.parquet(dir).count() == 200)
  }

  test("compact rewrites many small files into few; rerun is a noop") {
    import spark.implicits._
    val dir = tmpDir() + "/t"
    (1 to 100).toDF("x").repartition(50).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    val rep = Maintenance.compact(spark, dir, targetFileBytes = 256L * 1024 * 1024)
    assert(rep.ok)
    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before == 50 && after == 1)
    assert(spark.read.parquet(dir).count() == 100)
    // already at the target: the second pass must not rewrite anything
    val f = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val mtime = f.lastModified()
    val rep2 = Maintenance.compact(spark, dir, targetFileBytes = 256L * 1024 * 1024)
    assert(rep2.ok && rep2.detail.contains("noop"), rep2.detail)
    assert(f.lastModified() == mtime && f.exists())
  }

  test("compactSorted clusters data so min/max stats are selective") {
    import spark.implicits._
    val dir = tmpDir() + "/t3"
    // write shuffled keys across many files -> every file spans the range
    (1 to 10000).map(i => ((i * 7919) % 10000, s"v$i")).toDF("k", "v")
      .repartition(20).write.parquet(dir)
    val rep = Maintenance.compactSorted(spark, dir, Seq("k"),
      targetFileBytes = 64L * 1024)
    assert(rep.ok)
    // data is range-partitioned + sorted by k: each file covers a narrow
    // k range, so the global ordering concatenated per file is sorted
    val df = spark.read.parquet(dir)
    assert(df.count() == 10000)
    val perFile = df
      .groupBy(input_file_name().as("f"))
      .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
      .rows.map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(perFile.size > 1)
    // non-overlapping ranges across files
    perFile.sliding(2).foreach {
      case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("compact criterion is per leaf partition: skew is no noop, healthy leaves untouched") {
    import spark.implicits._
    val dir = tmpDir() + "/skew"
    // k=0 fragmented into ~30 files; k=1 already at one file
    (1 to 300).map(i => (i.toLong, 0)).toDF("id", "k")
      .repartition(30).write.partitionBy("k").parquet(dir)
    (1 to 300).map(i => (i.toLong, 1)).toDF("id", "k")
      .coalesce(1).write.mode("append").partitionBy("k").parquet(dir)
    val k1 = new java.io.File(s"$dir/k=1")
    val k1Before = k1.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    val rep = Maintenance.compact(spark, dir,
      targetFileBytes = 256L * 1024 * 1024)
    assert(rep.ok && !rep.detail.contains("noop"), rep.detail)
    // the fragmented leaf collapsed; the healthy one was not rewritten
    assert(new java.io.File(s"$dir/k=0").listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
    val k1After = k1.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> f.lastModified()).toMap
    assert(k1After == k1Before, "healthy leaf partition was rewritten")
    assert(spark.read.parquet(dir).count() == 600)
    // second pass: everything at target now
    val rep2 = Maintenance.compact(spark, dir,
      targetFileBytes = 256L * 1024 * 1024)
    assert(rep2.ok && rep2.detail.contains("noop"), rep2.detail)
  }

  test("compactSorted honors targetFileBytes inside Hive partitions") {
    import spark.implicits._
    val dir = tmpDir() + "/psort"
    (1 to 40000).map(i => ((i * 7919) % 40000, i % 2, s"value$i"))
      .toDF("k", "p", "v")
      .repartition(10).write.partitionBy("p").parquet(dir)
    val rep = Maintenance.compactSorted(spark, dir, Seq("k"),
      targetFileBytes = 64L * 1024)
    assert(rep.ok, rep.detail)
    // each partition dir must hold SEVERAL files (64 KB target), each
    // covering a non-overlapping k range within that partition
    Seq(0, 1).foreach { p =>
      val pd = new java.io.File(s"$dir/p=$p")
      assert(pd.listFiles().count(_.getName.endsWith(".parquet")) > 1,
        s"p=$p not split to target size")
      val ranges = spark.read.parquet(pd.toString)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("k")).as("lo"), max(col("k")).as("hi"))
        .rows.map(r => (r.getInt(1), r.getInt(2))).sortBy(_._1)
      ranges.sliding(2).foreach {
        case Seq((_, hi1), (lo2, _)) => assert(hi1 <= lo2)
        case _ =>
      }
    }
    assert(spark.read.parquet(dir).count() == 40000)
  }

  test("compactSorted pruning payoff: filtered scan decodes a fraction of the rows") {
    import spark.implicits._
    val dir = tmpDir() + "/t4"
    // shuffled keys across many files: every row group spans the whole
    // k range, so a point filter can skip nothing
    (1 to 40000).map(i => ((i * 7919) % 40000, s"value$i")).toDF("k", "v")
      .repartition(20).write.parquet(dir)
    // rows DECODED by the parquet scan (post row-group/page pruning,
    // pre re-filter): the scan leaf's numOutputRows metric
    def decodedRows(): Long = {
      val df = spark.read.parquet(dir).filter(col("k") === 1234)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      scan.metrics("numOutputRows").value
    }
    val before = decodedRows()
    assert(before == 40000L,
      s"unsorted layout should decode every row, got $before")
    val rep = Maintenance.compactSorted(spark, dir, Seq("k"),
      targetFileBytes = 64L * 1024)
    assert(rep.ok, rep.detail)
    val after = decodedRows()
    // clustered layout: only the row groups / pages whose min-max admits
    // k=1234 are decoded — the actual payoff of the sort-order rewrite
    assert(after * 4 < before,
      s"sorted scan still decoded $after of $before rows")
    assert(spark.read.parquet(dir).filter(col("k") === 1234).count() == 1)
  }

  test("removeOrphans restores a leaf from a crash between swap renames") {
    import spark.implicits._
    val dir = tmpDir() + "/crash"
    (1 to 100).map(i => (i.toLong, i % 2)).toDF("id", "k")
      .write.partitionBy("k").parquet(dir)
    // simulate the window after Files.move(leaf, old): leaf gone, the
    // old dir (only copy) and a finished tmp both sit next to the root
    val enc = java.net.URLEncoder.encode("k=1", "UTF-8")
    Files.move(Paths.get(s"$dir/k=1"), Paths.get(s"$dir.compact_old.$enc"))
    Files.createDirectories(Paths.get(s"$dir.compact_tmp.$enc"))
    val rep = Maintenance.removeOrphans(dir)
    assert(rep.ok && rep.detail.contains("restored"), rep.detail)
    // the original data is back; the tmp was deleted once the leaf existed
    assert(spark.read.parquet(dir).filter($"k" === 1).count() == 50)
    assert(!Files.exists(Paths.get(s"$dir.compact_old.$enc")))
    assert(!Files.exists(Paths.get(s"$dir.compact_tmp.$enc")))
    // stale temps next to an intact table are simply removed
    Files.createDirectories(Paths.get(s"$dir.compact_tmp.$enc"))
    assert(Maintenance.removeOrphans(dir).ok)
    assert(!Files.exists(Paths.get(s"$dir.compact_tmp.$enc")))
    assert(spark.read.parquet(dir).count() == 100)
  }

  test("compactSorted tolerates sort columns that are partition columns") {
    import spark.implicits._
    val dir = tmpDir() + "/psortpart"
    (1 to 2000).map(i => ((i * 7919) % 2000, i % 2, s"v$i")).toDF("k", "p", "v")
      .repartition(4).write.partitionBy("p").parquet(dir)
    // p is a partition column: constant per leaf, absent from leaf files
    val rep = Maintenance.compactSorted(spark, dir, Seq("p", "k"),
      targetFileBytes = 256L * 1024 * 1024)
    assert(rep.ok, rep.detail)
    assert(spark.read.parquet(dir).count() == 2000)
    // all-partition-column sort degrades to binpack, not an error
    val rep2 = Maintenance.compactSorted(spark, dir, Seq("p"),
      targetFileBytes = 256L * 1024 * 1024)
    assert(rep2.ok, rep2.detail)
    assert(spark.read.parquet(dir).count() == 2000)
  }

  test("removeOrphans clears temp dirs, retry retries") {
    val dir = tmpDir() + "/t2"
    import spark.implicits._
    (1 to 10).toDF("x").write.parquet(dir)
    Files.createDirectories(Paths.get(dir, "_temporary"))
    val rep = Maintenance.removeOrphans(dir)
    assert(rep.ok && !Files.exists(Paths.get(dir, "_temporary")))

    var calls = 0
    val out = Retry.withRetry(attempts = 3, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) sys.error("flaky")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    intercept[RuntimeException] {
      Retry.withRetry(attempts = 2, baseDelayMs = 1)(sys.error("always"))
    }
  }

  test("nightly pass: one maintainAll drives table compaction AND " +
      "stream-state compaction; serving answers unchanged") {
    import spark.implicits._
    val root = tmpDir()
    val table = s"$root/events_t"
    // fragmented table (many small files) + a two-drain KLL stream state
    (1 to 4000).map(i => (i.toLong, (i % 997).toDouble)).toDF("id", "v")
      .repartition(16).write.parquet(table)
    val all = (1 to 400).map(i => (s"g${i % 2}", (i % 97).toDouble))
      .toDF("g", "v")
    all.filter(col("v") < 50).write.mode("append").parquet(s"$root/src")
    graft.operators.Kll.sketchIngestOnce(spark, s"$root/src", all.schema,
      s"$root/state", s"$root/ckpt", Seq("g"), "v", k = 512)
    all.filter(col("v") >= 50).write.mode("append").parquet(s"$root/src")
    graft.operators.Kll.sketchIngestOnce(spark, s"$root/src", all.schema,
      s"$root/state", s"$root/ckpt", Seq("g"), "v", k = 512)
    val stats = graft.operators.FileIndex.buildStatsWithBloom(spark, table,
        rangeCols = Seq("id"), bloomCols = Seq("id"),
        expectedItemsPerFile = 4000L, bloomNumBits = 1L << 14)
      .localCheckpoint()
    def profile() = graft.operators.Kll
      .profile(spark, s"$root/state", Seq("g"), Seq(50, 100))
      .collect().map(r => (r.getString(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    val beforeProfile = profile()
    val beforeData = spark.read.parquet(table)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val filesBefore = spark.read.parquet(table).inputFiles.length

    // the state is NOT passed: maintainAll must find it on disk via the
    // meta its ingest wrote (an un-registered state silently going
    // uncompacted is the gap discovery closes)
    val discovered = Maintenance.discoverStreamStates(Seq(root))
    assert(discovered.map(st => (st.kind, st.stateDir)) ==
      Seq(("kll", s"$root/state")))
    val reports = Maintenance.maintainAll(spark,
      tableDirs = Seq(table),
      streamStates = Nil,
      targetFileBytes = 256L * 1024 * 1024,
      discoverStateRoots = Seq(root))
    assert(reports.forall(_.ok), reports.filterNot(_.ok).mkString("; "))
    assert(reports.map(_.action).count(_ == "compact") == 1)
    assert(reports.exists(_.action.startsWith("compact_stream_state")))
    // meta survives the compaction swap, so the NEXT nightly pass can
    // still discover the state; explicit+discovered dedups to one entry
    assert(Maintenance.discoverStreamStates(Seq(root))
      .map(_.stateDir) == Seq(s"$root/state"))
    val rereports = Maintenance.maintainAll(spark, tableDirs = Nil,
      streamStates = Seq(Maintenance.StreamState.kll(
        s"$root/state", Seq("g"))),
      discoverStateRoots = Seq(root))
    assert(rereports.count(_.action.startsWith("compact_stream_state")) == 1)

    // compaction really happened, data identical, profile identical
    assert(spark.read.parquet(table).inputFiles.length < filesBefore)
    assert(spark.read.parquet(table)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
      == beforeData)
    assert(profile() == beforeProfile)
    assert(spark.read.parquet(s"$root/state")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq ==
      Seq(graft.streaming.BatchPartitionIngest.CompactedBatchId))
    // the stats table reconciles post-compaction and still serves
    val refreshed = graft.operators.FileIndex.refreshStats(spark, table,
      stats, rangeCols = Seq("id"), bloomCols = Seq("id"),
      expectedItemsPerFile = 4000L, bloomNumBits = 1L << 14)
    assert(graft.operators.FileIndex
      .prunedEqualityRead(spark, table, refreshed, "id", 1234).count() == 1L)
  }

  test("fault injection: ONE truncated state meta cannot abort the " +
      "nightly pass — every other table and state still maintains, the " +
      "bad dir is reported, and the next pass heals after repair") {
    import spark.implicits._
    val root = tmpDir()
    val table = s"$root/t"
    (1 to 2000).map(i => (i.toLong, i % 7)).toDF("id", "k")
      .repartition(8).write.parquet(table)
    def drain(name: String): Unit = {
      val df = (1 to 200).map(i => (s"g${i % 2}", (i % 97).toDouble))
        .toDF("g", "v")
      df.write.mode("append").parquet(s"$root/$name/src")
      graft.operators.Kll.sketchIngestOnce(spark, s"$root/$name/src",
        df.schema, s"$root/$name/state", s"$root/$name/ckpt",
        Seq("g"), "v", k = 512)
    }
    drain("good"); drain("bad")
    // crash mid-write: the meta is cut mid-byte (no closing brace)
    val badMeta = Paths.get(s"$root/bad/state",
      graft.streaming.BatchPartitionIngest.StateMetaFile)
    val intact = Files.readAllBytes(badMeta)
    Files.write(badMeta, intact.take(intact.length / 2))

    // discovery itself must not throw, and must still see BOTH dirs
    val discovered = Maintenance.discoverStreamStates(Seq(root))
    assert(discovered.map(_.stateDir).sorted ==
      Seq(s"$root/bad/state", s"$root/good/state"))
    val reports = Maintenance.maintainAll(spark, tableDirs = Seq(table),
      discoverStateRoots = Seq(root))
    // the healthy table AND the healthy state both maintained
    assert(reports.filter(_.table == table).forall(_.ok))
    val goodRep = reports.filter(_.table == s"$root/good/state")
    assert(goodRep.nonEmpty && goodRep.forall(_.ok))
    assert(spark.read.parquet(s"$root/good/state")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq ==
      Seq(graft.streaming.BatchPartitionIngest.CompactedBatchId))
    // the poisoned dir surfaces as a failed report, not an exception
    val badRep = reports.filter(_.table == s"$root/bad/state")
    assert(badRep.nonEmpty && badRep.forall(!_.ok))
    assert(badRep.exists(_.detail.contains("unreadable")))
    // repair = re-asserting the meta at the next ingest (writeStateMeta
    // treats an unreadable file as repairable); the pass then heals
    graft.streaming.BatchPartitionIngest.writeStateMeta(s"$root/bad/state",
      graft.streaming.BatchPartitionIngest.StateMeta("kll", Seq("g")))
    val healed = Maintenance.maintainAll(spark, tableDirs = Nil,
      discoverStateRoots = Seq(root))
    assert(healed.nonEmpty && healed.forall(_.ok),
      healed.filterNot(_.ok).mkString("; "))
  }

  test("Hadoop-FileSystem discovery walk finds the same states as the " +
      "nio walk (incl. corrupt-meta skip-and-report) and accepts " +
      "scheme-qualified roots") {
    import graft.streaming.BatchPartitionIngest._
    val root = tmpDir()
    // three sketch states + a near-dup index root + swap leftovers +
    // one corrupt meta — the full recognition surface, no Spark jobs
    writeStateMeta(s"$root/a/kll_state", StateMeta("kll", Seq("g")))
    writeStateMeta(s"$root/b/nested/cms_state", StateMeta("cms", Seq("s")))
    writeStateMeta(s"$root/b/theta_state", StateMeta("theta", Nil))
    writeStateMeta(s"$root/corrupt_state", StateMeta("hll", Seq("u")))
    Files.write(Paths.get(s"$root/corrupt_state", StateMetaFile),
      """{"kind":"hl""".getBytes)
    Files.createDirectories(Paths.get(s"$root/ndroot"))
    Files.write(Paths.get(s"$root/ndroot", "_graft_meta.json"),
      """{"idCol":"doc_id"}""".getBytes)
    Files.createDirectories(Paths.get(s"$root/ignored.old/x"))
    Files.createDirectories(Paths.get(s"$root/ignored.new"))

    def summarize(states: Seq[Maintenance.StreamState]) =
      states.map(st => (st.kind,
        st.stateDir.stripPrefix("file:").stripPrefix(root))).sorted
    val nio = Maintenance.discoverStreamStates(Seq(root))
    val hadoop = Maintenance.discoverStreamStatesHadoop(spark, Seq(root))
    assert(summarize(nio) ==
      Seq(("cms", s"/b/nested/cms_state"), ("kll", s"/a/kll_state"),
        ("neardup_index", s"/ndroot"), ("theta", s"/b/theta_state"),
        ("unreadable_meta", s"/corrupt_state")).sorted)
    assert(summarize(hadoop) == summarize(nio))
    // a scheme-qualified root resolves through the same connector path
    // an hdfs:// or s3a:// root would take
    val qualified = Maintenance.discoverStreamStatesHadoop(spark,
      Seq(s"file:$root"))
    assert(summarize(qualified) == summarize(nio))
  }

  test("maintenance rewrites run through a non-file Hadoop scheme " +
      "(stub://) and refuse object-store schemes before touching data") {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.stub.impl", classOf[StubLocalFileSystem].getName)
    hc.set("fs.s3a.impl", classOf[FakeObjectStoreFileSystem].getName)
    import spark.implicits._
    val local = tmpDir() + "/stubtable"
    val dir = "stub:" + local
    (1 to 1000).map(i => (i.toLong, i % 4, s"v$i")).toDF("id", "k", "v")
      .repartition(8).write.partitionBy("k").parquet(dir)
    // the scheme really resolved through the stub onto the local tree
    assert(Files.isDirectory(Paths.get(local)))
    def leafFiles(k: Int) =
      Option(new java.io.File(s"$local/k=$k").listFiles())
        .getOrElse(Array.empty).count(_.getName.endsWith(".parquet"))
    assert((0 to 3).map(leafFiles).sum > 4, "fixture should be fragmented")
    val rep = Maintenance.compact(spark, dir,
      targetFileBytes = 256L * 1024 * 1024)
    assert(rep.ok && rep.detail.contains("rewrote"), rep.detail)
    assert((0 to 3).forall(k => leafFiles(k) == 1))
    assert(spark.read.parquet(dir).count() == 1000)
    assert(Maintenance.compactSorted(spark, dir, Seq("id")).ok)
    assert(Maintenance.removeOrphans(spark, dir).ok)
    assert(spark.read.parquet(dir).count() == 1000)
    // object-store scheme: refused with the boundary named, data untouched
    val s3 = Maintenance.compact(spark, "s3a:" + local)
    assert(!s3.ok && s3.detail.contains("non-atomic"), s3.detail)
    assert(!Maintenance.compactSorted(spark, "s3a:" + local, Seq("id")).ok)
    assert(!Maintenance.compactZorder(spark, "s3a:" + local, Seq("id")).ok)
    assert(!Maintenance.repartitionTable(spark, "s3a:" + local, Nil).ok)
    assert(spark.read.parquet(dir).count() == 1000)
  }

  test("state meta write is atomic: a crash between temp-write and " +
      "rename leaves the OLD meta readable and the orphaned temp inert") {
    import graft.streaming.BatchPartitionIngest._
    val dir = tmpDir() + "/state"
    writeStateMeta(dir, StateMeta("hll", Seq("a", "b")))
    // simulate the crash: a half-written, uniquely-named temp next to a
    // good meta (the shape writeFileAtomic's pid-thread temps leave)
    val tmp = Paths.get(dir, "." + StateMetaFile + ".999-1.tmp")
    Files.write(tmp, """{"kind":"hl""".getBytes)
    assert(readStateMeta(dir).contains(StateMeta("hll", Seq("a", "b"))))
    // re-asserting the same meta succeeds; the orphan never shadows the
    // real meta (dot-prefixed unique name, never re-read)
    writeStateMeta(dir, StateMeta("hll", Seq("a", "b")))
    assert(readStateMeta(dir).contains(StateMeta("hll", Seq("a", "b"))))
    // the conflicting-declaration refusal is untouched by the new path
    intercept[IllegalArgumentException] {
      writeStateMeta(dir, StateMeta("cms", Seq("a")))
    }
  }

  test("concurrent writers to the same meta never race: each renames " +
      "its own pid-thread temp, every write lands or throws nothing") {
    import graft.streaming.BatchPartitionIngest._
    val dir = tmpDir() + "/state"
    Files.createDirectories(Paths.get(dir))
    val meta = StateMeta("hll", Seq("g"))
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 8).map { _ =>
      new Thread(() =>
        try (1 to 50).foreach(_ => writeStateMeta(dir, meta))
        catch { case t: Throwable => errs.add(t) })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errs.isEmpty, s"concurrent writeStateMeta threw: ${errs}")
    assert(readStateMeta(dir).contains(meta))
  }

  test("medallion ingest copies ACROSS filesystems (local source -> " +
      "stub warehouse), idempotently; zone tables list on the scheme") {
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.stub.impl", classOf[StubLocalFileSystem].getName)
    val srcDir = tmpDir() + "/src"
    (1 to 100).toDF("x").coalesce(1).write.parquet(srcDir)
    val srcFiles = Option(new java.io.File(srcDir).listFiles())
      .getOrElse(Array.empty).map(_.toString)
      .filter(_.endsWith(".parquet")).toSeq
    val wh = Warehouse("stub:" + tmpDir() + "/wh")
    val (copied, skipped) = Medallion.ingestPaths(srcFiles, wh, "events")
    assert(copied == 1 && skipped == 0)
    // skip-if-exists probes the DESTINATION store
    val (copied2, skipped2) = Medallion.ingestPaths(srcFiles, wh, "events")
    assert(copied2 == 0 && skipped2 == 1)
    assert(spark.read.parquet(wh.table(Medallion.Bronze, "events"))
      .count() == 100)
    // a partitioned silver write + read-back through the scheme
    Medallion.writeTable(
      (1 to 50).map(i => (i, i % 2)).toDF("v", "p"), wh, Medallion.Silver,
      "t", partitionBy = Seq("p"))
    assert(Medallion.readTable(spark, wh, Medallion.Silver, "t")
      .count() == 50)
  }

  test("stream-state meta + compaction swap + serving read run through " +
      "a non-file Hadoop scheme; object-store schemes refuse mutation") {
    import graft.streaming.BatchPartitionIngest._
    import spark.implicits._
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.stub.impl", classOf[StubLocalFileSystem].getName)
    hc.set("fs.s3a.impl", classOf[FakeObjectStoreFileSystem].getName)
    val local = tmpDir() + "/state"
    val dir = "stub:" + local
    // seed two batch partitions the way ingestOnce's layout lands them
    Seq(("a", 1L), ("b", 2L)).toDF("k", "n").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").mode("append").parquet(dir)
    Seq(("a", 10L)).toDF("k", "n").withColumn("batch_id", lit(1L))
      .write.partitionBy("batch_id").mode("append").parquet(dir)
    writeStateMeta(dir, StateMeta("hll", Seq("k")))
    assert(readStateMeta(dir).contains(StateMeta("hll", Seq("k"))))
    compactState(spark, dir)(df =>
      df.groupBy(col("k")).agg(sum(col("n")).as("n")))
    val folded = readState(spark, dir)
      .select(col("k"), col("n"), col("batch_id").cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(folded == Set(("a", 11L, CompactedBatchId),
      ("b", 2L, CompactedBatchId)))
    // the meta survived the swap, on the foreign scheme
    assert(readStateMeta(dir).contains(StateMeta("hll", Seq("k"))))
    assert(Files.isRegularFile(Paths.get(local, StateMetaFile)))
    // object-store scheme: meta writes and compaction refuse
    intercept[IllegalArgumentException] {
      writeStateMeta("s3a:" + local, StateMeta("hll", Seq("k")))
    }
    intercept[IllegalArgumentException] {
      compactState(spark, "s3a:" + local)(identity)
    }
  }

  test("non-local swap branch recovers a crash window: state dir " +
      "missing with .old present is repaired by the serving read") {
    import graft.streaming.BatchPartitionIngest._
    import spark.implicits._
    spark.sparkContext.hadoopConfiguration
      .set("fs.stub.impl", classOf[StubLocalFileSystem].getName)
    val local = tmpDir() + "/state"
    val dir = "stub:" + local
    Seq(("a", 1L)).toDF("k", "n").withColumn("batch_id", lit(0L))
      .write.partitionBy("batch_id").parquet(dir)
    // simulate the crash between the two swap renames: cur -> cur.old
    // done, cur.new -> cur not yet
    Files.move(Paths.get(local), Paths.get(local + ".old"))
    assert(!Files.exists(Paths.get(local)))
    // the serving read's recovery preamble repairs it — via the stub
    // scheme's (non-delegating) Hadoop branch
    assert(readState(spark, dir).count() == 1)
    assert(Files.isDirectory(Paths.get(local)))
    assert(!Files.exists(Paths.get(local + ".old")))
  }

  test("an IOException-shaped unreadable meta refuses the write " +
      "instead of silently overwriting a possibly-valid declaration") {
    import graft.streaming.BatchPartitionIngest._
    val dir = tmpDir() + "/state"
    writeStateMeta(dir, StateMeta("hll", Seq("a")))
    val metaPath = Paths.get(dir, StateMetaFile)
    // a directory where the meta file should be makes readAllBytes
    // throw a real IOException (not parse corruption)
    Files.delete(metaPath)
    Files.createDirectories(metaPath)
    intercept[java.io.IOException] {
      writeStateMeta(dir, StateMeta("cms", Seq("b")))
    }
    Files.delete(metaPath)
    // true parse corruption stays repairable
    Files.write(metaPath, "not json".getBytes)
    writeStateMeta(dir, StateMeta("cms", Seq("b")))
    assert(readStateMeta(dir).contains(StateMeta("cms", Seq("b"))))
  }

  test("nightly branch-retention policy (r17): runAll expires matching " +
      "branches by glob pattern; head, fork base, and unmatched " +
      "branches survive") {
    import spark.implicits._
    val table = tmpDir() + "/t"
    VersionedTable.write(Seq(1).toDF("x"), table) // main v1 = fork base
    VersionedTable.createBranch(table, "audit-a")
    VersionedTable.createBranch(table, "keep-me")
    (1 to 3).foreach(i => VersionedTable.appendToBranch(
      Seq(i * 10).toDF("x"), table, "audit-a"))
    (1 to 2).foreach(i => VersionedTable.appendToBranch(
      Seq(i + 100).toDF("x"), table, "keep-me"))

    val reports = Maintenance.runAll(spark, Seq(table),
      branchRetention = Seq(Maintenance.BranchRetention("audit-*", 1)))
    val bret = reports.filter(_.action == "expire_branch_snapshots")
    assert(bret.size == 1 && bret.head.ok, bret.mkString("; "))
    assert(bret.head.detail.contains("audit-a"))

    // the matched branch holds only its head; the unmatched branch and
    // main are untouched
    assert(VersionedTable.branchHistory(table, "audit-a").size == 1)
    assert(VersionedTable.branchHistory(table, "keep-me").size == 2)
    assert(VersionedTable.versions(table) == Seq(1L))
    // retention was metadata-only: the retained head still serves the
    // full branch content (staged dirs carried by reference)
    assert(VersionedTable.readBranch(spark, table, "audit-a").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 10, 20, 30))
    assert(VersionedTable.read(spark, table).collect()
      .map(_.getInt(0)).toSeq == Seq(1))

    // a policy with max age keeps young snapshots even beyond
    // retain_last: everything just committed is younger than one hour
    val r2 = Maintenance.runAll(spark, Seq(table),
      branchRetention = Seq(Maintenance.BranchRetention("keep-*", 1,
        maxAgeMillis = Some(3600 * 1000L))))
    assert(r2.filter(_.action == "expire_branch_snapshots")
      .forall(r => r.ok && r.detail.contains("noop")))
    assert(VersionedTable.branchHistory(table, "keep-me").size == 2)
  }
}
