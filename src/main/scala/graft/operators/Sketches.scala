package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, exposed
  * through Spark's `hll_sketch_agg`/`hll_union_agg` — public API): the
  * one aggregate [[graft.pipeline.IncrementalAgg]] cannot maintain
  * incrementally, made maintainable. Exact distinct is not mergeable —
  * `distinct(day1 ∪ day2) ≠ f(distinct(day1), distinct(day2))` — so the
  * reference-style nightly gold rebuild pays a full-history scan for
  * every distinct-count measure. A per-partition sketch table merges in
  * O(new partitions): the Athena/Iceberg sketch-column discipline.
  *
  * Sketches are deterministic for a given input multiset (no RNG), but
  * the merged-path estimate is NOT bit-identical to the direct full-scan
  * sketch once sketches leave sparse mode (union promotes the internal
  * HLL representation) — both paths are gated against EXACT distinct
  * counts within the algorithm's error bound instead (±~1.6% at lgK=12),
  * and determinism is gated by re-running the merge. */
object Sketches {

  /** Per-group sketch table: one binary sketch column per group —
    * the incremental building block ([[merge]] folds new days in). */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(valueCol), lgK).as("sketch"))

  /** Fold a sketch table to coarser grouping (drop the partition column
    * from a daily table, union the days): the incremental rollup. All
    * inputs must share one lgK ([[build]]'s contract) — mixed-precision
    * unions silently degrade to the coarsest sketch, so they're refused
    * rather than allowed. */
  def rollup(sketches: DataFrame, groupCols: Seq[String]): DataFrame =
    sketches.groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("sketch"),
        allowDifferentLgConfigK = false).as("sketch"))

  /** Merge sketch tables (same group columns): union → per-group sketch
    * union. O(|a| + |b|) sketch rows, never raw data. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    rollup(a.unionByName(b), groupCols)

  /** (groupCols…, distinct_est): read the estimates off a sketch table. */
  def estimate(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "sketch"): DataFrame =
    sketches.select(
      groupCols.map(col) :+
        hll_sketch_estimate(col(sketchCol)).cast("long")
          .as("distinct_est"): _*)

  /** Stream-maintained distinct-count sketches: per-microbatch HLL
    * sketches landed exactly-once under `stateDir/batch_id=N/` — the
    * [[graft.streaming.BatchPartitionIngest]] primitive shared with
    * [[Kll.sketchIngestOnce]] / [[Theta.sketchIngestOnce]], closing the
    * family symmetry (HLL was the one sketch whose daily-append path
    * still required a batch rebuild). Serve with [[rollup]] over the
    * state dir, then [[estimate]]; HLL union is associative, so the
    * streamed profile equals the one-shot build within representation
    * effects ([[Sketches]] scaladoc — both are gated against exact). */
  def sketchIngestOnce(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      stateDir: String, checkpointDir: String, groupCols: Seq[String],
      valueCol: String, lgK: Int = 12): Unit = {
    graft.streaming.BatchPartitionIngest.writeStateMeta(stateDir,
      graft.streaming.BatchPartitionIngest.StateMeta("hll", groupCols))
    graft.streaming.BatchPartitionIngest.ingestOnce(
      spark, srcDir, schema, stateDir, checkpointDir)(
      build(_, groupCols, valueCol, lgK))
  }

  /** Fold a [[sketchIngestOnce]] state dir's batch partitions into one
    * (HLL union per group) — the [[Kll.compactState]] discipline;
    * union associativity keeps every estimate unchanged. */
  def compactState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, groupCols: Seq[String]): Unit =
    graft.streaming.BatchPartitionIngest.compactState(spark, stateDir)(
      rollup(_, groupCols))

  /** Estimates off a [[sketchIngestOnce]] state dir — the serving read:
    * fold the per-batch sketch rows (|batches|×|groups| KB blobs, never
    * raw rows), then read the estimates. */
  def profile(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      groupCols: Seq[String]): DataFrame =
    estimate(rollup(
      graft.streaming.BatchPartitionIngest.readState(spark, stateDir)
        .drop("batch_id"), groupCols), groupCols)
}
