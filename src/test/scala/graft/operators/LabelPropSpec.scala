package graft.operators

import graft.SparkSpec

class LabelPropSpec extends SparkSpec {
  import spark.implicits._

  // local replay of the exact HashMin update (directed propagation)
  private def local(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    var l = nodes.map(n => n -> n).toMap
    (1 to iters).foreach { _ =>
      val in = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(p => l(p._1)).min
      }
      l = nodes.map(n => n -> math.min(l(n), in.getOrElse(n, l(n)))).toMap
    }
    l
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelProp.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def sym(edges: Seq[(Long, Long)]): Seq[(Long, Long)] =
    edges ++ edges.map(_.swap)

  test("path graph floods the minimum one hop per iteration") {
    // 0-1-2-3 undirected: after k iters, node i carries max(0, i-k)
    val e = sym(Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(run(e, 1) == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L))
    assert(run(e, 2) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 1L))
    assert(run(e, 3) == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("iters >= diameter yields connected components") {
    // two components {0,1,2} and {10,11}; diameter 2
    val e = sym(Seq((0L, 1L), (1L, 2L), (10L, 11L)))
    val got = run(e, 2)
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 10L, 11L -> 10L))
  }

  test("directed edges propagate along direction only") {
    // 5 -> 1: node 1 takes min(1, 5) = 1; node 5 keeps 5 (no in-edge)
    // 1 -> 7: node 7 takes 1
    val got = run(Seq((5L, 1L), (1L, 7L)), 1)
    assert(got == Map(5L -> 5L, 1L -> 1L, 7L -> 1L))
  }

  test("matches the local replay on a random symmetric graph at every k") {
    val rnd = new scala.util.Random(11)
    val e = sym(Seq.fill(50)(
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter(p => p._1 != p._2))
    for (k <- 1 to 4)
      assert(run(e, k) == local(e, k), s"drift at iters=$k")
  }

  test("labels agree with union-find components once converged") {
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(30)(
      (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter(p => p._1 != p._2)
    val labels = run(sym(base), 25) // iters >= any diameter on 25 nodes
    val comp = Components.connectedComponents(
      base.toDF("id_a", "id_b"))
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // same partition: equal labels iff equal components
    val nodes = labels.keySet
    for (x <- nodes; y <- nodes)
      assert((labels(x) == labels(y)) == (comp(x) == comp(y)),
        s"partition mismatch at ($x, $y)")
  }

  test("assumeDistinct on a duplicate-free edge set is bit-identical " +
      "to the defensive-distinct path (r17)") {
    val rnd = new scala.util.Random(9)
    val e = sym(Seq.fill(40)(
      (rnd.nextInt(14).toLong, rnd.nextInt(14).toLong))
      .filter(p => p._1 != p._2).distinct).distinct
    def m(ad: Boolean) = LabelProp
      .run(e.toDF("src", "dst"), "src", "dst", iters = 4,
        assumeDistinct = ad)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(true) == m(false) && m(true) == local(e, 4))
  }
}
