package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.Maintenance

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_test_").toString

  private def mortonLocal(bits: Int, xs: Seq[Long]): Long = {
    var z = 0L
    val n = xs.size
    for (b <- 0 until bits; i <- 0 until n)
      z |= ((xs(i) >> b) & 1L) << (b * n + i)
    z
  }

  test("zAddress equals the local Morton interleave over random inputs") {
    val rnd = new scala.util.Random(42)
    val rows = Seq.fill(200)((rnd.nextInt(1024).toLong,
      rnd.nextInt(1024).toLong, rnd.nextInt(1024).toLong))
    val got = rows.toDF("a", "b", "c")
      .select(col("a"), col("b"), col("c"),
        ZOrder.zAddress(10, col("a"), col("b"), col("c")).as("z"))
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    rows.foreach { case t @ (a, b, c) =>
      assert(got(t) == mortonLocal(10, Seq(a, b, c)), s"drift at $t")
    }
  }

  test("zAddress preserves order in each dimension when others are fixed") {
    // monotone in every coordinate: z(x1,y) < z(x2,y) iff x1 < x2
    for (y <- Seq(0L, 5L, 1023L)) {
      val zs = (0L until 64L).map(x => mortonLocal(10, Seq(x, y)))
      assert(zs == zs.sorted, s"non-monotone at y=$y")
    }
  }

  test("scaled clamps to [0, 2^bits) and degenerate bounds collapse to 0") {
    val df = Seq(-5.0, 0.0, 50.0, 100.0, 250.0).toDF("x")
    val out = df.select(ZOrder.scaled(col("x"), 0.0, 100.0, 4).as("s"))
      .rows.map(_.getLong(0))
    assert(out.forall(s => s >= 0 && s <= 15))
    assert(out(0) == 0L && out(1) == 0L && out(3) == 15L && out(4) == 15L)
    val deg = df.select(ZOrder.scaled(col("x"), 7.0, 7.0, 4).as("s"))
      .rows.map(_.getLong(0))
    assert(deg.forall(_ == 0L))
  }

  test("guards: no columns, zero bits, lane overflow") {
    intercept[IllegalArgumentException] { ZOrder.zAddress(10) }
    intercept[IllegalArgumentException] { ZOrder.zAddress(0, col("x")) }
    intercept[IllegalArgumentException] {
      ZOrder.zAddress(32, col("x"), col("y"))
    }
  }

  test("compactZorder payoff: filtered scans prune on BOTH clustered columns") {
    val rnd = new scala.util.Random(7)
    val n = 40000
    val rows = (1 to n).map { i =>
      (rnd.nextInt(1024), rnd.nextInt(1024), s"value$i")
    }
    // rows DECODED by the scan (post row-group/page pruning): the scan
    // leaf's numOutputRows metric — PipelineSpec's compactSorted gate
    def decodedRows(dir: String, c: String, v: Int): Long = {
      val df = spark.read.parquet(dir).filter(col(c) === v)
      df.collect()
      val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }.getOrElse(fail("no FileSourceScanExec leaf"))
      scan.metrics("numOutputRows").value
    }
    // single-column sort: k2 filters decode everything
    val sortedDir = tmpDir() + "/zsorted"
    rows.toDF("k1", "k2", "v").repartition(20).write.parquet(sortedDir)
    assert(Maintenance.compactSorted(spark, sortedDir, Seq("k1"),
      targetFileBytes = 64L * 1024).ok)
    val sortedK2 = decodedRows(sortedDir, "k2", 123)
    assert(sortedK2 > n / 2L,
      s"k1-sorted layout should not prune k2 filters, decoded $sortedK2")
    // z-order on (k1, k2): BOTH dimensions prune
    val zDir = tmpDir() + "/zorder"
    rows.toDF("k1", "k2", "v").repartition(20).write.parquet(zDir)
    val rep = Maintenance.compactZorder(spark, zDir, Seq("k1", "k2"),
      bits = 10, targetFileBytes = 16L * 1024)
    assert(rep.ok, rep.detail)
    val zK1 = decodedRows(zDir, "k1", 123)
    val zK2 = decodedRows(zDir, "k2", 123)
    info(s"decoded rows of $n: k1-sorted k2-filter=$sortedK2, " +
      s"zorder k1-filter=$zK1, k2-filter=$zK2")
    assert(zK1 * 2 < n, s"z-order k1 pruning too weak: $zK1 of $n")
    assert(zK2 * 2 < n, s"z-order k2 pruning too weak: $zK2 of $n")
    assert(zK2 * 2 < sortedK2,
      s"z-order must beat single-sort on the second dimension: " +
        s"$zK2 vs $sortedK2")
    // data round-trips: same rows, no derived column leaked into schema
    val back = spark.read.parquet(zDir)
    assert(back.columns.toSet == Set("k1", "k2", "v"))
    assert(back.count() == n)
    assert(back.agg(sum(col("k1")), sum(col("k2"))).head() ==
      rows.toDF("k1", "k2", "v").agg(sum(col("k1")), sum(col("k2"))).head())
  }

  test("compactZorder preserves Hive partition layout and excludes partition cols") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 4000).map { i =>
      (rnd.nextInt(256), rnd.nextInt(256), i % 2, s"v$i")
    }
    val dir = tmpDir() + "/zpart"
    rows.toDF("a", "b", "p", "v").repartition(8)
      .write.partitionBy("p").parquet(dir)
    val rep = Maintenance.compactZorder(spark, dir, Seq("a", "b", "p"),
      bits = 8, targetFileBytes = 32L * 1024)
    assert(rep.ok, rep.detail)
    assert(rep.detail.contains("a,b"), rep.detail)
    assert(new java.io.File(s"$dir/p=0").isDirectory)
    assert(spark.read.parquet(dir).count() == 4000)
  }
}
