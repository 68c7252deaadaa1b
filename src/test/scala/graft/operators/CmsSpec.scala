package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CmsSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    ("a", "x"), ("a", "x"), ("a", "y"),
    ("b", "x"), ("b", "z"), ("b", "z"), ("b", "z")
  ).toDF("source", "term")

  test("collision-free sketch: estimates equal exact counts") {
    val sk = Cms.build(corpus, Nil, "term").collect()
      .head.getAs[Array[Byte]](0)
    assert(Cms.estimate(sk, Seq("x", "y", "z")).toMap ==
      Map("x" -> 3L, "y" -> 1L, "z" -> 3L))
  }

  test("merged per-source sketches == one global sketch (cell-wise sum)") {
    val perSource = Cms.build(corpus, Seq("source"), "term")
    val merged = Cms.rollup(perSource, Nil).collect()
      .head.getAs[Array[Byte]](0)
    val direct = Cms.build(corpus, Nil, "term").collect()
      .head.getAs[Array[Byte]](0)
    // CMS union is exact cell-wise addition: merged == direct, bitwise
    assert(java.util.Arrays.equals(merged, direct))
  }

  test("estimate never undercounts; absent items can only overestimate") {
    val sk = Cms.build(corpus, Nil, "term").collect()
      .head.getAs[Array[Byte]](0)
    val est = Cms.estimate(sk, Seq("x", "z", "absent")).toMap
    assert(est("x") >= 3L && est("z") >= 3L && est("absent") >= 0L)
  }

  test("tiny sketch overestimates under forced collisions, never under") {
    // width ⌈e/0.9⌉ = 4 with 40 distinct terms: collisions guaranteed
    val many = (0 until 40).flatMap(i => Seq.fill(i % 3 + 1)(s"t$i"))
      .toDF("term")
    val sk = Cms.build(many, Nil, "term", eps = 0.9, confidence = 0.5)
      .collect().head.getAs[Array[Byte]](0)
    val exact = (0 until 40).map(i => s"t$i" -> (i % 3 + 1).toLong).toMap
    val est = Cms.estimate(sk, exact.keys.toSeq).toMap
    assert(exact.forall { case (t, c) => est(t) >= c })
    assert(est.values.sum > exact.values.sum) // collisions really happened
  }

  test("determinism: same multiset, different partitioning, same bytes") {
    val a = Cms.build(corpus.repartition(1), Nil, "term").collect()
      .head.getAs[Array[Byte]](0)
    val b = Cms.build(corpus.repartition(7), Nil, "term").collect()
      .head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }
}
