// In org.apache.spark.sql.graft because TypedImperativeAggregate and
// ExpressionUtils are private[sql]; the public surface is re-exported by
// graft.operators.Kll.
package org.apache.spark.sql.graft

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.quantilescommon.QuantileSearchCriteria

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType}

/** KLL quantile sketch aggregate (Karnin-Lang-Liberty, FOCS'16; the
  * DataSketches implementation Spark already ships for HLL). Buffers a
  * heap `KllDoublesSketch` per group through ObjectHashAggregateExec —
  * the same execution path as Spark's own `hll_sketch_agg`, so partial
  * aggregation combines map-side and only compact sketch blobs (KBs,
  * independent of n) cross the shuffle. This is the mergeable-quantiles
  * member of the sketch family ([[graft.operators.Sketches]] = distinct,
  * [[graft.operators.Cms]] = frequency): per-partition/day sketch tables
  * roll up in O(new partitions) and answer any-rank quantile queries at
  * normalized error ~1.7%/k·... (k=200 ⇒ ~1.65% rank error), versus the
  * fixed-grid histogram quantiles (q162) which need a known value range.
  *
  * Exactness window: a KLL sketch retains ALL values until the number of
  * items exceeds its internal capacity (>= k), so for groups with
  * n <= k the returned quantiles are EXACT order statistics — the
  * construction-pinned-oracle regime q164 uses (q153's CMS discipline).
  */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_agg"

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllSketchAgg =
    copy(child = newChild)
}

/** Lossless union of KLL sketch blobs — the `hll_union_agg` analog for
  * quantiles: folds serialized sketches (the incremental rollup path;
  * shuffles kilobytes per partition, never raw rows). The buffer starts
  * at the maximum k so the result's accuracy is governed by the smallest
  * input k, per the KLL merge rule. */
case class KllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_kll_union_agg"

  // 65535 is DataSketches' max k; merging any smaller-k sketch into it
  // takes on that sketch's (lower) accuracy, so an empty max-k buffer is
  // the identity element.
  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(65535)

  override def update(buffer: KllDoublesSketch,
      input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(
        Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch,
      other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] =
    buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(n: Int): KllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KllUnionAgg =
    copy(child = newChild)
}

/** Scalar probe: quantile at `rank` (0..1, INCLUSIVE search — smallest
  * value whose inclusive rank >= the target, i.e. the `100·cum >= p·N`
  * rule q162 pins) read from a serialized sketch. CodegenFallback is
  * deliberate: probes run once per GROUP row (|groups| rows, not the
  * fact scan), so interpretation cost is nil and heapify stays off the
  * hot path. NULL rank or sketch propagates NULL. */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, DoubleType)
  override def dataType: DataType = DoubleType
  // An EMPTY sketch (all-null group) evaluates to NULL even when both
  // children are non-nullable (KllSketchAgg declares nullable=false), so
  // nullability cannot be inherited from the children — a non-nullable
  // graft_kll_quantile(kll, 0.5d) would unbox the null downstream.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"

  override protected def nullSafeEval(sketch: Any, rank: Any): Any = {
    val s = KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]]))
    if (s.isEmpty) null
    else s.getQuantile(rank.asInstanceOf[Double],
      QuantileSearchCriteria.INCLUSIVE)
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}

/** Scalar probe: number of items the sketch has seen (exact). */
case class KllN(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "graft_kll_n"

  override protected def nullSafeEval(sketch: Any): Any =
    KllDoublesSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]])).getN

  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}

object KllFunctions {
  /** Expose the KLL family to the SQL surface (the reference's primary
    * interface is SQL-over-catalog): `graft_kll_agg(v, k)` (k an int
    * literal — evaluated at registration, same contract as
    * graft_shingles), `graft_kll_union_agg(blob)`,
    * `graft_kll_quantile(blob, rank)`, `graft_kll_n(blob)`. Bare
    * AggregateFunctions from the registry are wrapped in
    * AggregateExpression by the analyzer, as for built-in aggregates. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_kll_agg",
      exprs => {
        val k = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_kll_agg k must be an int literal, got $other")
        }
        KllSketchAgg(exprs(0), k)
      }, "built-in")
    registry.createOrReplaceTempFunction("graft_kll_union_agg",
      exprs => KllUnionAgg(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_kll_quantile",
      exprs => KllQuantile(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_kll_n",
      exprs => KllN(exprs(0)), "built-in")
  }

  def kllAgg(value: Column, k: Int): Column =
    ExpressionUtils.column(
      KllSketchAgg(ExpressionUtils.expression(value), k)
        .toAggregateExpression())

  def kllUnion(sketch: Column): Column =
    ExpressionUtils.column(
      KllUnionAgg(ExpressionUtils.expression(sketch))
        .toAggregateExpression())

  def kllQuantile(sketch: Column, rank: Column): Column =
    ExpressionUtils.column(KllQuantile(
      ExpressionUtils.expression(sketch), ExpressionUtils.expression(rank)))

  def kllN(sketch: Column): Column =
    ExpressionUtils.column(KllN(ExpressionUtils.expression(sketch)))
}
