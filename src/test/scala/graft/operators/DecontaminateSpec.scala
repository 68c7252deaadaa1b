package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  // eval doc 100 shares its first 8 words with train doc 1 only
  private lazy val train = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta extra tail words here"),
    (2L, "completely unrelated training content with no overlap at all today"),
    (3L, "short doc")
  ).toDF("doc_id", "text")
  private lazy val eval = Seq(
    (100L, "alpha beta gamma delta epsilon zeta eta theta different ending")
  ).toDF("doc_id", "text")

  test("overlapCounts flags exactly the contaminated doc with its gram count") {
    val out = Decontaminate.overlapCounts(train, eval, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the shared span is 8 words -> exactly one shared 8-gram
    assert(out == Map(1L -> 1L))
  }

  test("removeContaminated keeps clean and sub-n docs, drops flagged ones") {
    val kept = Decontaminate.removeContaminated(train, eval, "doc_id", "text",
        n = 8)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L))
  }

  test("longer shared spans count every sliding n-gram") {
    val t2 = Seq((7L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val e2 = Seq((9L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = Decontaminate.overlapCounts(t2, e2, "doc_id", "text", n = 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(7L -> 3L)) // 10 tokens -> 3 sliding 8-grams
  }

  test("overlapRatio keeps zero-overlap docs and computes exact ppm") {
    val out = Decontaminate.overlapRatio(train, eval, "doc_id", "text", n = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1: 5 distinct 8-grams (12 tokens), 1 shared -> 200000 ppm
    assert(out(1L) == ((5L, 1L, 200000L)))
    // doc 2: 10 tokens -> 3 shingles, none shared -> present with 0
    assert(out(2L) == ((3L, 0L, 0L)))
    // doc 3: below n tokens -> no shingles -> absent
    assert(!out.contains(3L))
  }

  test("bloom prefilter path equals the exact path; probe is codegen, not a UDF") {
    // a larger random-ish corpus so the bloom actually prunes
    val t3 = (1L to 200L).map(i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    val e3 = (1L to 5L).map(i =>
      (i, (0 until 12).map(j => s"w${(i * 7 + j * 3) % 97}").mkString(" ")))
      .toDF("doc_id", "text")
    def toMapOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = toMapOf(
      Decontaminate.overlapCounts(t3, e3, "doc_id", "text", n = 4))
    val bloomed = Decontaminate.overlapCountsBloom(t3, e3, "doc_id", "text",
      n = 4, expectedEvalShingles = 1000L)
    assert(toMapOf(bloomed) == exact)
    assert(exact.nonEmpty) // the equivalence must not be vacuous
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan)
    assert(!plan.toLowerCase.contains("batchevalpython")
      && !plan.contains("ScalaUDF"), plan)
  }
}
