package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join: match each fact row to the interval [lo, hi)
  * containing its value.
  *
  * Spark plans a raw `v >= lo AND v < hi` join as a nested loop — fine
  * when the interval table is broadcast-small, quadratic otherwise. The
  * bucketed form decomposes every interval into the fixed-width buckets it
  * covers and equi-joins on the bucket id, then re-checks the exact bounds:
  * the shuffle keys on a long, and each fact row meets only intervals
  * overlapping its bucket. */
object RangeJoin {

  final case class Interval(lo: Double, hi: Double, label: String)

  /** Equi-join by bucket decomposition. `bucketWidth` trades interval-side
    * replication (hi−lo)/width against candidate count per row. */
  def byBucket(fact: DataFrame, valueCol: String, intervals: Seq[Interval],
      bucketWidth: Double): DataFrame = {
    val spark = fact.sparkSession
    import spark.implicits._
    val ivals = intervals.toDF("lo", "hi", "label")
      .withColumn("__b", explode(sequence(
        floor(col("lo") / bucketWidth).cast("long"),
        // hi is exclusive: a hi exactly on a bucket edge does not reach the
        // next bucket. Degenerate intervals (hi <= lo on a bucket edge)
        // would make stop < start — sequence() then counts DOWN, spraying
        // spurious candidate buckets — so clamp stop to start.
        greatest(
          floor(col("lo") / bucketWidth).cast("long"),
          ceil(col("hi") / bucketWidth).cast("long") - 1))))
    fact
      .withColumn("__b", floor(col(valueCol) / bucketWidth).cast("long"))
      .join(broadcast(ivals), Seq("__b"))
      .filter(col(valueCol) >= col("lo") && col(valueCol) < col("hi"))
      .drop("__b", "lo", "hi")
  }
}
