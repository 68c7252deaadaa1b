// In org.apache.spark.sql.graft to reach Spark's internal bloom
// expressions (the exact machinery AQE runtime join filters use).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

/** Column wrappers over Spark's OWN bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — what the
  * optimizer injects for runtime join filters): build a bloom per
  * group, probe it codegen'd. Values are hashed with `XxHash64` on both
  * sides, matching the runtime-filter convention (the aggregate's input
  * contract is a 64-bit hash). */
object BloomFunctions {

  /** Bloom blob of xxhash64(value) per group. `numBits` bounds the blob
    * (numBits/8 bytes); fpp ≈ 0.6185^(numBits/numItems). */
  def bloomAgg(value: Column, estimatedNumItems: Long, numBits: Long): Column =
    ExpressionUtils.column(
      new BloomFilterAggregate(
        new XxHash64(Seq(ExpressionUtils.expression(value))),
        Literal(estimatedNumItems), Literal(numBits))
        .toAggregateExpression())

  /** Codegen'd membership probe for a CONSTANT bloom (the only shape
    * `might_contain` admits — it is built for broadcast runtime
    * filters): scan-side filtering against one known sketch. */
  def mightContain(bloomBytes: Array[Byte], value: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal.create(bloomBytes,
        org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(ExpressionUtils.expression(value)))))

  /** Driver-side probe of a serialized bloom blob against a literal
    * value (planner shape: one probe per FILE row, bounded by file
    * count). Hash = the same `XxHash64` the aggregate applied. */
  def mightContainBlob(blob: Array[Byte], value: Any): Boolean = {
    val h = new XxHash64(Seq(Literal(value))).eval(null)
      .asInstanceOf[Long]
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(blob))
      .mightContainLong(h)
  }
}
