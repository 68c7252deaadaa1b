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

  test("empty candidate set yields an empty frame with the table schema") {
    val dir = tmpDir() + "/e"
    Seq((1, "x"), (2, "y")).toDF("k", "v").write.parquet(dir)
    val stats = FileIndex.buildStats(spark, dir, Seq("k"))
    val out = FileIndex.prunedRangeRead(spark, dir, stats, "k",
      lit(100), lit(200))
    assert(out.columns.toSeq == Seq("k", "v"))
    assert(out.count() == 0L)
  }
}
