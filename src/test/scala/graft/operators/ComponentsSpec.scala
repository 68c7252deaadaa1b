package graft.operators

import graft.SparkSpec

class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("chains collapse to one component (a-b, b-c -> min id)") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(pairs)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp(1L) == 1L && comp(2L) == 1L && comp(3L) == 1L)
    assert(comp(10L) == 10L && comp(11L) == 10L)
  }

  test("long path converges within iteration budget") {
    val pairs = (1L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(pairs)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.values.toSet == Set(1L))
  }

  test("driver union-find and distributed propagation agree") {
    val pairs = Seq((5L, 9L), (9L, 2L), (30L, 31L), (2L, 1L), (40L, 40L))
      .toDF("id_a", "id_b")
    val fast = Components.connectedComponents(pairs)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = Components.connectedComponents(pairs, driverThreshold = 0L)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == dist)
    assert(fast(5L) == 1L && fast(9L) == 1L && fast(2L) == 1L && fast(1L) == 1L)
    assert(fast(30L) == 30L && fast(31L) == 30L)
  }

  test("distributed star contraction collapses a 60-node chain (diameter 59)") {
    // The old min-label propagation needed diameter rounds and silently
    // returned wrong labels past maxIters=20; star contraction needs ~log2.
    val pairs = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Components.connectedComponents(pairs, driverThreshold = 0L)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp.size == 60)
    assert(comp.values.toSet == Set(1L))
  }

  test("keepClusterRepresentatives keeps min-id per cluster + untouched rows") {
    val docs = Seq((1L, "x"), (2L, "x'"), (3L, "x''"), (7L, "y"))
      .toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val out = Components.keepClusterRepresentatives(docs, "doc_id", pairs)
      .rows.map(_.getLong(0)).sorted
    assert(out == Seq(1L, 7L))
  }

  test("keepClusterBest keeps the highest-score row per cluster, min id on ties") {
    val docs = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5), // cluster {1,2,3}: 2 wins on score
      (5L, 0.7), (6L, 0.7),            // cluster {5,6}: score tie -> 5
      (9L, 0.0)                        // never in a pair -> survives
    ).toDF("doc_id", "quality")
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Components.keepClusterBest(docs, "doc_id", "quality", pairs)
      .rows.map(_.getLong(0)).sorted
    assert(out == Seq(2L, 5L, 9L))
  }
}
