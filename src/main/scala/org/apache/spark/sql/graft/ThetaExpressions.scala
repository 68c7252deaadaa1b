// In org.apache.spark.sql.graft because TypedImperativeAggregate and
// ExpressionUtils are private[sql]; the public surface is re-exported by
// graft.operators.Theta.
package org.apache.spark.sql.graft

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, DoubleType, LongType, StringType, TypeCollection}
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketch aggregate (Dasgupta et al., "Theta-Sketch Framework",
  * 2016; the DataSketches implementation Spark already ships) — the SET-
  * OPERATION member of the sketch family. HLL answers |A| and |A ∪ B|;
  * theta additionally answers |A ∩ B| and |A \ B| from the sketches
  * alone, which is what audience-overlap / cross-segment-distinct
  * questions need at 100 TB (the exact answer is a distinct-join over
  * raw ids; the sketch answer is KB-blob algebra). The aggregation
  * buffer is a theta Union — the same ObjectHashAggregate object-buffer
  * path as [[KllSketchAgg]]: partials combine map-side, only compact
  * blobs cross the shuffle.
  *
  * Exactness window: an update sketch stays in exact mode (θ = 1, every
  * hash retained) until retained entries exceed the nominal 2^lgK, and
  * unions/intersections of exact sketches are exact — the construction-
  * pinned-oracle regime q167 uses (q153/q164 discipline). */
case class ThetaSketchAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(TypeCollection(LongType, StringType))
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_agg"

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long => buffer.update(l.longValue())
      case s: UTF8String => buffer.update(s.toString)
      case other => throw new IllegalStateException(
        s"graft_theta_agg: unsupported input ${other.getClass}")
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaSketchAgg =
    copy(child = newChild)
}

/** Lossless union of serialized theta sketches (rollup path). The
  * buffer is a MAX-size Union (lgK=26, DataSketches' ceiling), the
  * KllUnionAgg discipline: a union buffer never adds error beyond its
  * inputs', but a small one (e.g. a pinned 14) would silently cap
  * nominal entries and drop exact-mode inputs built at lgK>14 into
  * estimation mode — breaking the construction-pinned-oracle contract.
  * The result's theta is governed entirely by the input sketches. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with ExpectsInputTypes with UnaryLike[Expression] {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_theta_union_agg"

  // 26 = org.apache.datasketches.thetacommon.ThetaUtil.MAX_LG_NOM_LONGS
  private def maxUnion(): Union =
    SetOperation.builder().setLogNominalEntries(26).buildUnion()

  override def createAggregationBuffer(): Union = maxUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = maxUnion()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Distinct estimate off a serialized sketch (exact while the sketch
  * never left exact mode). Serving-side CodegenFallback, as the KLL
  * probes: runs on |groups| rows, never the fact scan. */
case class ThetaEstimate(child: Expression)
  extends UnaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_theta_estimate"
  override protected def nullSafeEval(sketch: Any): Any =
    CompactSketch.heapify(
      Memory.wrap(sketch.asInstanceOf[Array[Byte]])).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** |A ∩ B| sketch: intersection of two serialized sketches, as a
  * serialized compact sketch (compose with [[ThetaEstimate]]). */
case class ThetaIntersect(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_intersect"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val i = SetOperation.builder().buildIntersection()
    i.intersect(Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])))
    i.intersect(Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]])))
    i.getResult.toByteArray
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaIntersect =
    copy(left = newLeft, right = newRight)
}

/** |A \ B| sketch: set difference of two serialized sketches. */
case class ThetaAnotB(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_theta_a_not_b"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val op = SetOperation.builder().buildANotB()
    op.aNotB(
      Sketch.wrap(Memory.wrap(a.asInstanceOf[Array[Byte]])),
      Sketch.wrap(Memory.wrap(b.asInstanceOf[Array[Byte]]))).toByteArray
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ThetaAnotB =
    copy(left = newLeft, right = newRight)
}

object ThetaFunctions {
  /** SQL surface: graft_theta_agg(v, lgK-literal), graft_theta_union_agg,
    * graft_theta_estimate, graft_theta_intersect, graft_theta_a_not_b. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("graft_theta_agg",
      exprs => {
        val lgK = exprs(1).eval(null) match {
          case i: Int => i
          case other => throw new IllegalArgumentException(
            s"graft_theta_agg lgK must be an int literal, got $other")
        }
        ThetaSketchAgg(exprs(0), lgK)
      }, "built-in")
    registry.createOrReplaceTempFunction("graft_theta_union_agg",
      exprs => ThetaUnionAgg(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_theta_estimate",
      exprs => ThetaEstimate(exprs(0)), "built-in")
    registry.createOrReplaceTempFunction("graft_theta_intersect",
      exprs => ThetaIntersect(exprs(0), exprs(1)), "built-in")
    registry.createOrReplaceTempFunction("graft_theta_a_not_b",
      exprs => ThetaAnotB(exprs(0), exprs(1)), "built-in")
  }

  def thetaAgg(value: Column, lgK: Int): Column =
    ExpressionUtils.column(
      ThetaSketchAgg(ExpressionUtils.expression(value), lgK)
        .toAggregateExpression())

  def thetaUnion(sketch: Column): Column =
    ExpressionUtils.column(
      ThetaUnionAgg(ExpressionUtils.expression(sketch))
        .toAggregateExpression())

  def thetaEstimate(sketch: Column): Column =
    ExpressionUtils.column(ThetaEstimate(ExpressionUtils.expression(sketch)))

  def thetaIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaIntersect(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def thetaAnotB(a: Column, b: Column): Column =
    ExpressionUtils.column(ThetaAnotB(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
