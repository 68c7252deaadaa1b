package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val tiers = Seq(
    RangeJoin.Interval(0.0, 50.0, "low"),
    RangeJoin.Interval(50.0, 150.0, "mid"),
    RangeJoin.Interval(150.0, 1000.0, "high"))

  test("byBucket matches the naive non-equi join exactly") {
    val fact = Seq(0.0, 49.99, 50.0, 100.0, 149.99, 150.0, 999.99, 1000.0, -5.0)
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val fast = RangeJoin.byBucket(fact, "v", tiers, bucketWidth = 64.0)
      .rows.map(r => r.getLong(0) -> r.getString(2)).sorted
    val ivals = tiers.toDF("lo", "hi", "label")
    val naive = fact.join(ivals, col("v") >= col("lo") && col("v") < col("hi"))
      .rows.map(r => r.getLong(0) -> r.getString(4)).sorted
    assert(fast == naive)
    assert(fast.map(_._2) == Seq("low", "low", "mid", "mid", "mid", "high", "high"))
    // 1000.0 (== last hi, exclusive) and -5.0 match nothing
    assert(!fast.map(_._1).contains(7L) && !fast.map(_._1).contains(8L))
  }

  test("bucket edges: interval ending exactly on a bucket boundary") {
    val fact = Seq((1L, 63.9), (2L, 64.0)).toDF("id", "v")
    val iv = Seq(RangeJoin.Interval(0.0, 64.0, "a"))
    val out = RangeJoin.byBucket(fact, "v", iv, bucketWidth = 64.0)
      .rows.map(_.getLong(0))
    assert(out == Seq(1L)) // 64.0 is outside [0, 64)
  }
}
