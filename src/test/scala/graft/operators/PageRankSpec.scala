package graft.operators

import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  // local replay of the exact fixed-point update
  private def local(edges: Seq[(Long, Long)], iters: Int,
      dampingPct: Long = 85L): Map[Long, Long] = {
    val e = edges.distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val outd = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    (1 to iters).foreach { _ =>
      val contrib = e.groupBy(_._2).map { case (d, es) =>
        d -> es.map(p => r(p._1) / outd(p._1)).sum
      }
      r = nodes.map(n =>
        n -> ((100L - dampingPct) * 10000L +
          dampingPct * contrib.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("one iteration on a hand-checked triangle") {
    // 1->2, 2->3, 3->1: every node has outdeg 1, so after one round
    // every rank is 150000 + 85*1000000/100 = 1000000 (the fixed point)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    assert(run(edges, 1) == Map(1L -> 1000000L, 2L -> 1000000L,
      3L -> 1000000L))
  }

  test("star graph concentrates rank on the hub; spokes get base only") {
    // 1..4 -> 0: hub receives 4 full contributions, spokes receive none
    val edges = (1L to 4L).map(i => (i, 0L))
    val got = run(edges, 1)
    assert(got(0L) == 150000L + 85L * 4000000L / 100L)
    (1L to 4L).foreach(i => assert(got(i) == 150000L))
  }

  test("matches the local fixed-point replay over iterations on a random graph") {
    val rnd = new scala.util.Random(3)
    val edges = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .filter(p => p._1 != p._2)
    for (iters <- Seq(1, 2, 3)) {
      assert(run(edges, iters) == local(edges, iters),
        s"drift at iters=$iters")
    }
  }

  test("dangling nodes keep base rank flowing in but leak their own mass") {
    // 1 -> 2, 2 has no out-edges: node 2's mass leaks (documented)
    val edges = Seq((1L, 2L))
    val got = run(edges, 2)
    assert(got == local(edges, 2))
    // node 1 receives nothing both rounds
    assert(got(1L) == 150000L)
  }

  test("duplicate edges collapse before degree counting") {
    val got = run(Seq((1L, 2L), (1L, 2L), (1L, 3L)), 1)
    // outdeg(1) must be 2, not 3
    assert(got(2L) == 150000L + 85L * (1000000L / 2L) / 100L)
    assert(got(2L) == got(3L))
  }

  test("assumeDistinct on a duplicate-free edge set is bit-identical " +
      "to the defensive-distinct path (r17)") {
    val rnd = new scala.util.Random(5)
    val e = Seq.fill(60)((rnd.nextInt(12).toLong, rnd.nextInt(12).toLong))
      .distinct
    def m(ad: Boolean) = PageRank
      .run(e.toDF("src", "dst"), "src", "dst", iters = 3,
        assumeDistinct = ad)
      .rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(true) == m(false) && m(true) == local(e, 3))
  }
}
