package graft.operators

import graft.SparkSpec

class CategoryEncodeSpec extends SparkSpec {
  import spark.implicits._

  test("fit orders by frequency desc then value asc, 0-based") {
    val df = Seq("b", "b", "b", "a", "a", "c", "d", "d").toDF("x")
    val got = CategoryEncode.fit(df, "x")
      .rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    // b:3 -> 0; a:2 and d:2 tie -> lexical: a -> 1, d -> 2; c:1 -> 3
    assert(got == Map("b" -> 0L, "a" -> 1L, "d" -> 2L, "c" -> 3L))
  }

  test("fit excludes nulls; transform encodes OOV as -1") {
    val train = Seq(Some("x"), Some("x"), Some("y"), None).toDF("c")
    val dict = CategoryEncode.fit(train, "c")
    assert(dict.count() == 2)
    val serve = Seq(Some("y"), Some("zzz"), None).toDF("c")
    val got = CategoryEncode.transform(serve, "c", dict, "c_idx")
      .select("c", "c_idx")
      .rows.map(r => (Option(r.getString(0)), r.getLong(1)))
    assert(got.toSet == Set((Some("y"), 1L), (Some("zzz"), -1L), (None, -1L)))
  }

  test("transform against a persisted dictionary is stable across batches") {
    val dict = CategoryEncode.fit(Seq("p", "p", "q").toDF("c"), "c")
    // a later batch with different frequencies still uses the SAME map
    val later = Seq("q", "q", "q", "p").toDF("c")
    val got = CategoryEncode.transform(later, "c", dict, "i")
      .rows.map(r => r.getString(0) -> r.getLong(1)).toSet
    assert(got == Set("p" -> 0L, "q" -> 1L))
  }

  test("fit is deterministic under repartitioning") {
    val vals = (1 to 300).map(i => s"v${i % 17}")
    val a = CategoryEncode.fit(vals.toDF("c"), "c")
      .rows.map(r => (r.getString(0), r.getLong(1))).toSet
    val b = CategoryEncode.fit(vals.toDF("c").repartition(7), "c")
      .rows.map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("maxCategories fails fast on id-like columns") {
    val df = (1 to 100).map(_.toString).toDF("id")
    val e = intercept[IllegalArgumentException] {
      CategoryEncode.fit(df, "id", maxCategories = 10)
    }
    assert(e.getMessage.contains("distinct values"))
  }
}
