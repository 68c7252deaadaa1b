package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.BatchPartitionIngest

/** Gates for the streamed HLL and CMS builds (the last two sketch
  * families to gain exactly-once ingest) plus the compaction hardening
  * shared by every [[BatchPartitionIngest]] state: folded rows land in
  * the sentinel partition (never a real batch id), and a crash inside
  * the two-rename swap window is repaired by the recovery preamble. */
class StreamSketchSpec extends SparkSpec {
  import spark.implicits._

  private def rmrf(p: String): Unit =
    graft.util.Fs.deleteRecursively(new java.io.File(p))

  test("hll streamed estimates: within bound of exact, compaction keeps " +
      "them, ingest continues") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_hll_stream_").toString
    try {
      val all = (0 until 900).map(i => (s"t${i % 3}", (i % 500).toLong))
        .toDF("t", "uid")
      all.filter(col("uid") < 250).write.mode("append").parquet(s"$root/src")
      Sketches.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("t"), "uid")
      all.filter(col("uid") >= 250).write.mode("append")
        .parquet(s"$root/src")
      Sketches.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("t"), "uid")
      def est() = Sketches.profile(spark, s"$root/state", Seq("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val exact = all.groupBy(col("t"))
        .agg(countDistinct(col("uid")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val streamed = est()
      assert(streamed.keySet == exact.keySet)
      exact.foreach { case (t, n) =>
        assert(math.abs(streamed(t) - n) <= math.max(1L, n / 20),
          s"type $t: streamed=${streamed(t)} exact=$n")
      }
      // a lost drain would halve an audience — pin against the direct
      // one-shot build too (sparse-mode regime: estimates coincide)
      val direct = Sketches.estimate(
          Sketches.build(all, Seq("t"), "uid"), Seq("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(streamed == direct,
        s"streamed=$streamed direct=$direct")
      // compaction: sentinel partition, estimates unchanged
      Sketches.compactState(spark, s"$root/state", Seq("t"))
      assert(spark.read.parquet(s"$root/state")
        .select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq ==
        Seq(BatchPartitionIngest.CompactedBatchId))
      assert(est() == streamed, "compaction changed HLL estimates")
      // serving rollup partial-aggregates the blobs map-side (the
      // |batches|x|groups| -> |groups| fold is an ObjectHashAggregate
      // with partial modes, like every sketch union in the repo)
      val servePlan = Sketches.rollup(
          spark.read.parquet(s"$root/state").drop("batch_id"), Seq("t"))
        .queryExecution.executedPlan.toString
      assert(servePlan.contains("ObjectHashAggregate") &&
        servePlan.contains("partial"), servePlan)
      // exactly-once: nothing-new drain leaves the state as-is
      val rows = spark.read.parquet(s"$root/state").count()
      Sketches.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("t"), "uid")
      assert(spark.read.parquet(s"$root/state").count() == rows)
    } finally rmrf(root)
  }

  test("cms streamed counts == one-shot build; compaction + continued " +
      "ingest keep them") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_cms_stream_").toString
    try {
      val all = (0 until 600).map(i => (s"s${i % 2}", s"w${i % 37}"))
        .toDF("src", "term")
      all.filter(substring(col("term"), 2, 10).cast("int") < 18)
        .write.mode("append").parquet(s"$root/src")
      Cms.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("src"), "term")
      all.filter(substring(col("term"), 2, 10).cast("int") >= 18)
        .write.mode("append").parquet(s"$root/src")
      Cms.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("src"), "term")
      val vocab = (0 until 37).map(i => s"w$i")
      def counts() = {
        val blob = Cms.serveState(spark, s"$root/state", Nil)
          .collect().head.getAs[Array[Byte]](0)
        Cms.estimate(blob, vocab).toMap
      }
      val oneShot = {
        val blob = Cms.rollup(Cms.build(all, Seq("src"), "term"), Nil)
          .collect().head.getAs[Array[Byte]](0)
        Cms.estimate(blob, vocab).toMap
      }
      val streamed = counts()
      // cell-wise-sum merge with a seed-pinned hash family: the folded
      // streamed state must answer IDENTICALLY to the one-shot build —
      // and a double-landed drain would double every count
      assert(streamed == oneShot, s"streamed=$streamed oneShot=$oneShot")
      // stronger: the folded BLOB is bit-identical to the one-shot blob
      // (commutative cell-wise sums + pinned hash family ⇒ the merge
      // order across partitions/batches cannot perturb a single byte)
      val streamedBlob = Cms.serveState(spark, s"$root/state", Nil)
        .collect().head.getAs[Array[Byte]](0)
      val oneShotBlob = Cms.rollup(Cms.build(all, Seq("src"), "term"), Nil)
        .collect().head.getAs[Array[Byte]](0)
      assert(java.util.Arrays.equals(streamedBlob, oneShotBlob),
        "folded streamed CMS blob must be bit-identical to one-shot")
      Cms.compactState(spark, s"$root/state", Seq("src"))
      assert(spark.read.parquet(s"$root/state")
        .select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq ==
        Seq(BatchPartitionIngest.CompactedBatchId))
      assert(counts() == streamed, "compaction changed CMS counts")
      // post-compaction ingest: new terms fold in on top of the sentinel
      Seq(("s0", "extra"), ("s0", "extra")).toDF("src", "term")
        .write.mode("append").parquet(s"$root/src")
      Cms.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("src"), "term")
      val after = {
        val blob = Cms.serveState(spark, s"$root/state", Nil)
          .collect().head.getAs[Array[Byte]](0)
        Cms.estimate(blob, vocab :+ "extra").toMap
      }
      assert(after("extra") == 2L && vocab.forall(w =>
        after(w) == streamed(w)))
    } finally rmrf(root)
  }

  test("a crash inside the state swap window is repaired by the next " +
      "compactState") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_swap_crash_").toString
    try {
      val all = (1 to 200).map(i => (s"g${i % 2}", (i % 97).toDouble))
        .toDF("g", "v")
      all.write.mode("append").parquet(s"$root/src")
      Kll.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("g"), "v", k = 512)
      def prof() = Kll.profile(spark, s"$root/state", Seq("g"),
          Seq(50, 100))
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          r.getDouble(3)).toMap
      val before = prof()
      // crash between move(cur, old) and move(new, cur)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(s"$root/state"),
        java.nio.file.Paths.get(s"$root/state.old"))
      Kll.compactState(spark, s"$root/state", Seq("g"))
      assert(prof() == before,
        "recovery preamble must restore the half-swapped state")
    } finally rmrf(root)
  }

  test("maintainAll compacts registered stream states with per-entry " +
      "isolation") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_maint_stream_").toString
    try {
      val all = (1 to 200).map(i => (s"g${i % 2}", (i % 97).toDouble))
        .toDF("g", "v")
      all.filter(col("v") < 50).write.mode("append").parquet(s"$root/src")
      Kll.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("g"), "v", k = 512)
      all.filter(col("v") >= 50).write.mode("append").parquet(s"$root/src")
      Kll.sketchIngestOnce(spark, s"$root/src", all.schema,
        s"$root/state", s"$root/ckpt", Seq("g"), "v", k = 512)
      def prof() = Kll.profile(spark, s"$root/state", Seq("g"),
          Seq(50, 100))
        .collect().map(r => (r.getString(0), r.getLong(2)) ->
          r.getDouble(3)).toMap
      val before = prof()
      val reports = graft.pipeline.Maintenance.maintainAll(spark,
        tableDirs = Nil,
        streamStates = Seq(
          graft.pipeline.Maintenance.StreamState.kll(
            s"$root/state", Seq("g")),
          // a broken entry must not stop the others (M4 discipline)
          graft.pipeline.Maintenance.StreamState.kll(
            s"$root/missing", Seq("g"))))
      assert(reports.count(_.action.startsWith("compact_stream_state")) == 2)
      assert(reports.exists(r => r.table == s"$root/state" && r.ok))
      assert(reports.exists(r => r.table == s"$root/missing" && !r.ok))
      assert(prof() == before, "maintenance changed the served profile")
      assert(spark.read.parquet(s"$root/state")
        .select(col("batch_id").cast("long")).distinct()
        .collect().map(_.getLong(0)).toSeq ==
        Seq(BatchPartitionIngest.CompactedBatchId))
    } finally rmrf(root)
  }
}
