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
}
