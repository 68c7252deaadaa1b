package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._

import graft.TestSpark
import graft.operators.FileIndex
import graft.pipeline.Maintenance

/** Randomized gate for the stats-table LIFECYCLE claim: under any
  * sequence of appends and compactions, maintaining the stats table
  * incrementally (append → union the new files' rows; compact →
  * [[FileIndex.refreshStats]]) must land on EXACTLY the table a full
  * rebuild produces — per-file facts, blob bytes included. Trials are
  * few (each writes real parquet + compacts) but seeded, so failures
  * replay exactly. */
object FileStatsProps extends Properties("graft.fileStats") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(4)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1),
      r.getLong(2), r.getLong(3),
      r.getAs[Array[Byte]](4).toSeq)).toSet

  property("random append/compact sequence: incremental stats == rebuild") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      val rnd = new scala.util.Random(seed)
      val dir = java.nio.file.Files
        .createTempDirectory("graft_fsp_").toString + "/t"
      try {
        def build() = FileIndex.buildStatsWithBloom(spark, dir,
          rangeCols = Seq("k"), bloomCols = Seq("k"),
          expectedItemsPerFile = 5000L, bloomNumBits = 1L << 14)
        def batch(lo: Int, n: Int, parts: Int) =
          (lo until lo + n).map(i => (i.toLong, s"v$i")).toDF("k", "v")
            .repartition(parts)
        // initial table + stats
        batch(0, 500 + rnd.nextInt(500), 2 + rnd.nextInt(3))
          .write.parquet(dir)
        var stats = build().localCheckpoint()
        var next = 2000
        def append(): Unit = {
          // APPEND: scan only the new files, union into standing
          val before = spark.read.parquet(dir).inputFiles.toSet
          batch(next, 200 + rnd.nextInt(300), 1 + rnd.nextInt(3))
            .write.mode("append").parquet(dir)
          next += 1000
          val added = spark.read.parquet(dir).inputFiles.toSet -- before
          stats = stats.unionByName(
              FileIndex.statsForFilesWithBloom(spark, added.toSeq,
                rangeCols = Seq("k"), bloomCols = Seq("k"),
                expectedItemsPerFile = 5000L, bloomNumBits = 1L << 14))
            .localCheckpoint()
        }
        def compact(): Unit = {
          // COMPACT: files replaced -> reconcile against the listing
          assert(Maintenance.compact(spark, dir,
            targetFileBytes = 256L * 1024 * 1024).ok)
          stats = FileIndex.refreshStats(spark, dir, stats,
              rangeCols = Seq("k"), bloomCols = Seq("k"),
              expectedItemsPerFile = 5000L, bloomNumBits = 1L << 14)
            .localCheckpoint()
        }
        // forced append -> compact -> append prefix (the day-2 lifecycle
        // a refresh that misses replaced files breaks), then 0-2 random
        // extra events; equality vs a full rebuild is asserted at EVERY
        // step, not just at the end — a transiently wrong table that a
        // later full-rescan fallback repairs must still fail
        val events: Seq[() => Unit] =
          Seq(append _, compact _, append _) ++
            (0 until rnd.nextInt(3)).map(_ =>
              if (rnd.nextBoolean()) append _ else compact _)
        val ok = events.zipWithIndex.forall { case (ev, i) =>
          ev()
          val same = rows(stats) == rows(build())
          if (!same) println(s"[fsp] seed=$seed diverged at step $i")
          same
        }
        ok
      } finally graft.util.Fs.deleteRecursively(
        new java.io.File(new java.io.File(dir).getParent))
    }
}
