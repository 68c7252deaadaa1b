// Hosted under org.apache.spark.sql for the same reason as
// VectorExpressions: the ExpectsInputTypes contract and the
// Column<->Expression bridge are private[sql].
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types._

/** Order-sensitive rolling hash over a token array: the chained-xxhash64
  * fold `acc_i = xxhash64(acc_{i-1}, token_i)` (acc_0 = 0) as ONE codegen'd
  * expression. The `aggregate` higher-order formulation computes the same
  * values but evaluates its lambda interpreted per element with boxing —
  * this keeps the whole corpus fingerprint scan inside WholeStageCodegen.
  * Bit-identical to `aggregate(tokens, 0L, (acc, t) => xxhash64(acc, t))`:
  * each step is hashLong(acc, 42) then hashUnsafeBytes(token, that). */
case class RollingXxHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_xxhash64"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = XxHash64Function.hash(acc, LongType, 42L)
      // mirror xxhash64's null handling: a null element leaves the token
      // step out but the accumulator step still applies
      if (!arr.isNullAt(i)) {
        acc = XxHash64Function.hash(arr.getUTF8String(i), StringType, acc)
      }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val t = ctx.freshName("t")
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc = $xxh.hashLong($acc, 42L);
         |  if (!$a.isNullAt($i)) {
         |    UTF8String $t = $a.getUTF8String($i);
         |    $acc = $xxh.hashUnsafeBytes($t.getBaseObject(), $t.getBaseOffset(),
         |      $t.numBytes(), $acc);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingXxHash64 =
    copy(newChild)
}

/** Column-level API for the text expressions. */
object TextExpressionFunctions {
  def rollingXxHash64(tokens: Column): Column =
    ExpressionUtils.column(RollingXxHash64(ExpressionUtils.expression(tokens)))
}
