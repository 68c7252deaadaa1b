package graft.operators

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // two fixed cells: the x-axis and y-axis directions
  private val model = Ivf.Model(IndexedSeq(
    IndexedSeq(1.0, 0.0), IndexedSeq(0.0, 1.0)))

  test("drops lower-priority semantic duplicates within a cell only") {
    val docs = Seq(
      1L -> Seq(1.0, 0.01),   // cell 0, keeper (min id of its dup group)
      2L -> Seq(0.99, 0.0),   // cell 0, cos≈1 with id 1 -> dropped
      3L -> Seq(0.9, -0.9),   // cell 0, cos≈0.70 with id 1 -> kept
      4L -> Seq(0.0, 1.0),    // cell 1, keeper
      5L -> Seq(0.01, 0.99)   // cell 1, dup of id 4 -> dropped
    ).map { case (id, v) => (id, v) }.toDF("vec_id", "embedding")
    val kept = SemDedup.semanticDedup(docs, "vec_id", "embedding",
        model, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(kept == Set((1L, 0), (3L, 0), (4L, 1)))
  }

  test("near-identical vectors in different cells are both kept") {
    // the diagonal pair straddles the cell boundary: cos≈1 but they are
    // assigned to different cells, so cell-local dedup keeps both (the
    // documented recall trade of the published algorithm)
    val docs = Seq(
      1L -> Seq(1.0, 0.95),
      2L -> Seq(0.95, 1.0)
    ).toDF("vec_id", "embedding")
    val kept = SemDedup.semanticDedup(docs, "vec_id", "embedding",
        model, threshold = 0.9)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L))
  }

  test("dedup is deterministic and idempotent") {
    val docs = (1L to 200L)
      .map(i => (i, Seq(1.0 + (i % 7) * 0.001, (i % 5) * 0.002)))
      .toDF("vec_id", "embedding")
    val once = SemDedup.semanticDedup(docs, "vec_id", "embedding",
      model, threshold = 0.999999)
    val ids = once.collect().map(_.getLong(0)).toSet
    assert(SemDedup.semanticDedup(docs, "vec_id", "embedding",
      model, threshold = 0.999999).collect().map(_.getLong(0)).toSet == ids)
    // idempotent: a survivor had no similar lower id in the FULL set, so
    // it cannot acquire one in the smaller survivor set — re-running on
    // the output is the identity
    val survivors = docs.join(once.select("vec_id"), Seq("vec_id"))
    assert(SemDedup.semanticDedup(survivors, "vec_id", "embedding",
      model, threshold = 0.999999).collect().map(_.getLong(0)).toSet == ids)
  }

  test("oversized cells fail fast instead of going quadratic") {
    val docs = (1L to 500L).map(i => (i, Seq(1.0, 0.0)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(docs, "vec_id", "embedding", model,
        threshold = 0.9, maxClusterSize = 100).count()
    }
    assert(e.getMessage.contains("maxClusterSize"))
  }
}
