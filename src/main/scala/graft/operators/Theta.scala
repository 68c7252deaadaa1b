package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ThetaFunctions

/** Mergeable distinct-set algebra via theta sketches — the set-operation
  * member of the sketch family ([[Sketches]]/HLL = distinct counts,
  * [[Cms]] = frequency, [[Kll]] = quantiles). A per-segment sketch
  * table answers |A|, |A ∪ B|, |A ∩ B| and |A \ B| from KB blobs: the
  * audience-overlap / cross-segment-retention questions whose exact
  * form is a distinct self-join over raw ids (O(corpus) shuffle per
  * question) become O(|segments|²) blob algebra after ONE scan.
  *
  * 100 TB shape: `build` partial-aggregates map-side (object-buffer
  * Union per group, same path as hll_sketch_agg); per-day sketch tables
  * [[rollup]] in O(new partitions); every set-operation probe is
  * serving-side on group rows. Exact while each segment's distinct
  * count stays under 2^lgK (θ = 1), estimation-mode beyond — size the
  * lgK to the segment cardinality you need exact, or accept the
  * ~1/√(2^lgK) relative error. */
object Theta {

  /** Per-group sketch table: (groupCols…, theta binary). */
  def build(df: DataFrame, groupCols: Seq[String], valueCol: String,
      lgK: Int = 14): DataFrame = {
    val agg = ThetaFunctions.thetaAgg(col(valueCol), lgK).as("theta")
    if (groupCols.isEmpty) df.agg(agg)
    else df.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Fold a sketch table to coarser grouping (blob union). */
  def rollup(sketches: DataFrame, groupCols: Seq[String],
      sketchCol: String = "theta"): DataFrame = {
    val agg = ThetaFunctions.thetaUnion(col(sketchCol)).as(sketchCol)
    if (groupCols.isEmpty) sketches.agg(agg)
    else sketches.groupBy(groupCols.map(col): _*).agg(agg)
  }

  /** Rounded-long distinct estimate column (exact in exact mode). */
  def estimateLong(sketch: Column): Column =
    round(ThetaFunctions.thetaEstimate(sketch)).cast("long")

  /** Stream-maintained segment sketches: per-microbatch theta sketches
    * landed exactly-once under batch_id=N/ (the
    * [[graft.streaming.BatchPartitionIngest]] primitive shared with
    * [[Kll.sketchIngestOnce]]); serve with [[rollup]] over the state
    * dir, then [[pairwiseOverlap]] / [[estimateLong]]. */
  def sketchIngestOnce(spark: org.apache.spark.sql.SparkSession,
      srcDir: String, schema: org.apache.spark.sql.types.StructType,
      stateDir: String, checkpointDir: String, groupCols: Seq[String],
      valueCol: String, lgK: Int = 14): Unit = {
    graft.streaming.BatchPartitionIngest.writeStateMeta(stateDir,
      graft.streaming.BatchPartitionIngest.StateMeta("theta", groupCols))
    graft.streaming.BatchPartitionIngest.ingestOnce(
      spark, srcDir, schema, stateDir, checkpointDir)(
      build(_, groupCols, valueCol, lgK))
  }

  /** Fold a [[sketchIngestOnce]] state dir's batch partitions into one
    * (theta union per group) — the [[Kll.compactState]] discipline for
    * the set-operation family; union associativity keeps every overlap
    * answer unchanged across compaction. */
  def compactState(spark: org.apache.spark.sql.SparkSession,
      stateDir: String, groupCols: Seq[String]): Unit =
    graft.streaming.BatchPartitionIngest.compactState(spark, stateDir)(
      rollup(_, groupCols))

  /** All segment pairs (a < b on `segCol`) with distinct sizes, overlap
    * |A ∩ B| and difference |A \ B| — pure blob algebra over the sketch
    * table self-join (|segments|² pair rows, corpus never re-read). */
  def pairwiseOverlap(sketches: DataFrame, segCol: String,
      sketchCol: String = "theta"): DataFrame = {
    val a = sketches.select(col(segCol).as("seg_a"),
      col(sketchCol).as("__ta"))
    val b = sketches.select(col(segCol).as("seg_b"),
      col(sketchCol).as("__tb"))
    a.join(b, col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        estimateLong(col("__ta")).as("users_a"),
        estimateLong(col("__tb")).as("users_b"),
        estimateLong(ThetaFunctions.thetaIntersect(col("__ta"), col("__tb")))
          .as("overlap"),
        estimateLong(ThetaFunctions.thetaAnotB(col("__ta"), col("__tb")))
          .as("only_a"))
  }
}
