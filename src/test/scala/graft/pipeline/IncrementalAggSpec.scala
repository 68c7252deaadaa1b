package graft.pipeline

import graft.SparkSpec

class IncrementalAggSpec extends SparkSpec {
  import spark.implicits._

  test("merge combines overlapping and disjoint keys; min/max/sum semantics") {
    val gold = Seq(("a", 2L, 10.0, 1.0, 5.0), ("b", 1L, 3.0, 3.0, 3.0))
      .toDF("k", "n", "total", "vmin", "vmax")
    val inc = Seq(("a", 1L, 7.0, 0.5, 2.0), ("c", 4L, 8.0, 2.0, 2.0))
      .toDF("k", "n", "total", "vmin", "vmax")
    val out = IncrementalAgg.merge(gold, inc, Seq("k"),
        sums = Seq("n", "total"), mins = Seq("vmin"), maxs = Seq("vmax"))
      .orderBy("k")
      .as[(String, Long, Double, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 3L, 17.0, 0.5, 5.0),
      ("b", 1L, 3.0, 3.0, 3.0),
      ("c", 4L, 8.0, 2.0, 2.0)))
  }

  test("merge rejects mismatched columns") {
    val gold = Seq(("a", 1L)).toDF("k", "n")
    val inc = Seq(("a", 1L, 2.0)).toDF("k", "n", "extra")
    intercept[IllegalArgumentException] {
      IncrementalAgg.merge(gold, inc, Seq("k"), sums = Seq("n"))
    }
  }
}
