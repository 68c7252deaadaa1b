// Hosted under org.apache.spark.sql for the same private[sql] seams as
// VectorExpressions (AbstractDataType, classic.ExpressionUtils).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Intersection of two SORTED ascending array<bigint> columns as a single
  * two-pointer merge — the per-edge neighborhood intersection of the
  * triangle edge-iterator ([[graft.operators.Triangles]]).
  *
  * Exists because the built-in `array_intersect` builds a hash set per
  * ROW (measured 4.2 s for 1.2M edges × ~34-element adjacency arrays at
  * sf0.1, the whole stage GC-bound), while graph adjacency lists are
  * already sorted once at build time — a merge scan does the same work
  * in sequential primitive reads with zero per-element allocation.
  *
  * Contract: both inputs sorted ascending, null-free, duplicate-free
  * (guaranteed by `sort_array(collect_list(...))` over distinct edges);
  * on unsorted input the result is undefined (it is NOT a general
  * array_intersect replacement). Null arrays propagate null. */
case class SortedLongIntersect(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {
  override def prettyName: String = "graft_sorted_intersect"
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    val buf = new Array[Long](math.min(n, m))
    var i = 0
    var j = 0
    var k = 0
    while (i < n && j < m) {
      val xi = x.getLong(i)
      val yj = y.getLong(j)
      if (xi < yj) i += 1
      else if (xi > yj) j += 1
      else { buf(k) = xi; k += 1; i += 1; j += 1 }
    }
    new GenericArrayData(java.util.Arrays.copyOf(buf, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val xi = ctx.freshName("xi")
      val yj = ctx.freshName("yj")
      val buf = ctx.freshName("buf")
      s"""
         |int $n = $a.numElements();
         |int $m = $b.numElements();
         |long[] $buf = new long[java.lang.Math.min($n, $m)];
         |int $i = 0, $j = 0, $k = 0;
         |while ($i < $n && $j < $m) {
         |  long $xi = $a.getLong($i);
         |  long $yj = $b.getLong($j);
         |  if ($xi < $yj) { $i++; }
         |  else if ($xi > $yj) { $j++; }
         |  else { $buf[$k++] = $xi; $i++; $j++; }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($buf, $k));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedLongIntersect = copy(newLeft, newRight)
}

object ArrayFunctions {
  def sortedIntersect(a: Column, b: Column): Column =
    ExpressionUtils.column(SortedLongIntersect(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
