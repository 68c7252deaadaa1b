// In org.apache.spark.sql.graft to reach Spark's internal bloom
// expressions (the exact machinery AQE runtime join filters use).
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, BloomFilterMightContain, ExpectsInputTypes, Expression, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, BooleanType, ByteType, DataType, IntegerType, LongType, ShortType}

/** Column wrappers over Spark's OWN bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — what the
  * optimizer injects for runtime join filters): build a bloom per
  * group, probe it codegen'd. Values are hashed with `XxHash64` on both
  * sides, matching the runtime-filter convention (the aggregate's input
  * contract is a 64-bit hash).
  *
  * Type discipline: `XxHash64` hashes IntegerType and LongType
  * DIFFERENTLY, so a probe must hash its literal with the SAME Spark
  * type the bloom column was built from — otherwise the filter returns
  * silent false negatives (pruning files that contain the key). Every
  * probe here therefore threads an explicit `DataType` (the indexed
  * column's), and widening-compatible scala values (Int vs Long) are
  * coerced before hashing. */
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

  /** A numeric scala value matched to the indexed column's exact JVM
    * width, so `xxhash64(Literal)` sees the type the build side hashed
    * (an Int probed against a Long-built bloom must hash as a Long). */
  private def coerce(value: Any, dt: DataType): Any = (value, dt) match {
    case (n: java.lang.Number, LongType)    => n.longValue()
    case (n: java.lang.Number, IntegerType) => n.intValue()
    case (n: java.lang.Number, ShortType)   => n.shortValue()
    case (n: java.lang.Number, ByteType)    => n.byteValue()
    case (v, _)                             => v
  }

  /** The 64-bit hash the bloom build applied to `value`, computed once
    * driver-side with the indexed column's declared type. */
  def hashValue(value: Any, dt: DataType): Long =
    new XxHash64(Seq(Literal.create(coerce(value, dt), dt))).eval(null)
      .asInstanceOf[Long]

  /** Rebind a DataFrame's logical plan to `session` (same shared
    * SparkContext): lets an operator run one sub-query under an ISOLATED
    * SQL conf (`SparkSession.newSession`) instead of mutating — and
    * racing concurrent queries on — the caller's session conf. The plan
    * must not depend on the origin session's catalog/temp-view state;
    * localCheckpointed (LogicalRDD) plans qualify. */
  def inSession(session: org.apache.spark.sql.SparkSession,
      df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      session.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      df.queryExecution.logical)

  /** Executor-side membership probe over a PER-ROW blob column against a
    * constant pre-hashed key — the shape `might_contain` cannot express
    * (its sketch must be constant). This is what lets a file-stats
    * table be probed as a distributed filter: blobs stay on executors,
    * only matching file names return. Interpretation cost is one blob
    * deserialize per STATS row (|files| rows, never the fact scan), the
    * same serving-side budget as the KLL/theta probes. */
  def mightContainHashed(blob: Column, hash: Long): Column =
    ExpressionUtils.column(BloomBlobMightContain(
      ExpressionUtils.expression(blob), Literal(hash)))

  /** Driver-side probe of one serialized bloom blob against a value of
    * declared type `dt` (must be the indexed column's type — see the
    * type discipline above). */
  def mightContainBlob(blob: Array[Byte], value: Any, dt: DataType): Boolean =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(blob))
      .mightContainLong(hashValue(value, dt))

  /** Driver-side probe with the value's INFERRED type — only safe when
    * the scala value's JVM width matches the indexed column exactly.
    * Prefer the typed overload. */
  def mightContainBlob(blob: Array[Byte], value: Any): Boolean =
    mightContainBlob(blob, value, Literal(value).dataType)
}

/** `bloom(blob_col) might contain hash` with a NON-constant sketch:
  * deserializes the row's blob and probes the constant 64-bit hash.
  * CodegenFallback is deliberate — this runs over stats tables
  * (|files| rows), never over fact scans. */
case class BloomBlobMightContain(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_blob_might_contain"

  override protected def nullSafeEval(blob: Any, hash: Any): Any =
    org.apache.spark.util.sketch.BloomFilter
      .readFrom(new java.io.ByteArrayInputStream(blob.asInstanceOf[Array[Byte]]))
      .mightContainLong(hash.asInstanceOf[Long])

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BloomBlobMightContain =
    copy(left = newLeft, right = newRight)
}
