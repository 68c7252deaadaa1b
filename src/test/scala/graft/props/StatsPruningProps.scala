package graft.props

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StatsPruning

import graft.TestSpark
import graft.operators.FileIndex

/** Randomized safety gate for the automatic file-skipping rule: under
  * ANY file layout (overlapping key ranges, duplicate keys, stragglers
  * appended after the stats build) and ANY supported predicate shape
  * (equality / one-sided ranges / conjunctions, either operand order,
  * keys present or absent), the pruned plan's RESULT must equal the
  * kill-switched full scan's — pruning may only shrink IO, never the
  * answer. Trials are few (each writes real parquet) but seeded, so
  * failures replay exactly. */
object StatsPruningProps extends Properties("graft.statsPruning") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(4)

  private def collectSet(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1))).toSet

  property("pruned result == full-scan result on random layouts and " +
      "predicates") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      val rnd = new scala.util.Random(seed)
      val base = java.nio.file.Files
        .createTempDirectory("graft_spp_").toString
      val dir = base + "/t"
      try {
        // 3-6 files of 50-300 rows over OVERLAPPING ranges with dup keys
        val nFiles = 3 + rnd.nextInt(4)
        (0 until nFiles).foreach { i =>
          val lo = rnd.nextInt(2000)
          val n = 50 + rnd.nextInt(251)
          (0 until n).map { _ =>
            val k = (lo + rnd.nextInt(500)).toLong
            (k, s"f$i-$k")
          }.toDF("k", "v").coalesce(1).write.mode("append").parquet(dir)
        }
        val statsDir = base + "/stats"
        FileIndex.buildStatsWithBloom(spark, dir, rangeCols = Seq("k"),
            bloomCols = Seq("k"), expectedItemsPerFile = 1000L,
            bloomNumBits = 1L << 14)
          .write.parquet(statsDir)
        StatsPruning.register(spark, dir, statsDir)
        // one straggler the index never saw
        if (rnd.nextBoolean()) {
          Seq((999999L, "straggler")).toDF("k", "v")
            .coalesce(1).write.mode("append").parquet(dir)
        }
        val k = col("k")
        def randLit() = lit(rnd.nextInt(3000).toLong)
        val predicates: Seq[Column] = Seq.fill(6) {
          rnd.nextInt(6) match {
            case 0 => k === randLit()
            case 1 => k > randLit()
            case 2 => k <= randLit()
            case 3 => randLit() < k
            case 4 => k === randLit() && k >= randLit()
            case _ => k > randLit() && k < randLit()
          }
        }
        predicates.forall { pred =>
          val pruned = collectSet(
            spark.read.parquet(dir).where(pred))
          spark.conf.set(StatsPruning.EnabledKey, "false")
          val full =
            try collectSet(spark.read.parquet(dir).where(pred))
            finally spark.conf.unset(StatsPruning.EnabledKey)
          pruned == full
        }
      } finally {
        StatsPruning.unregister(dir)
        graft.util.Fs.deleteRecursively(new java.io.File(base))
      }
    }
}
