package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.operators.Components

/** Random-graph cross-check of the distributed large-star/small-star
  * contraction (driverThreshold = 0 forces the iterative path) against a
  * plain in-memory union-find: same component label (= min reachable id)
  * for every node, on arbitrary graphs — chains, self-loops, duplicate
  * and reversed edges, forests of singleton edges. */
object ComponentsProps extends Properties("graft.components") {
  private lazy val spark = TestSpark.spark

  // Each trial drives an iterative Spark job (several actions per star
  // round); 15 random graphs per property is plenty of coverage without
  // dominating suite runtime.
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val edgesGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 30)                  // node id space
    m <- Gen.choose(1, 40)                  // edge count
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong)
      b <- Gen.choose(0L, n.toLong)
    } yield (a, b))
  } yield edges

  /** Long chains are the adversarial case for propagation-style
    * algorithms (round count vs diameter) — generate them explicitly. */
  private val chainGen: Gen[List[(Long, Long)]] = for {
    len <- Gen.choose(2, 24)
    // Shuffle with a generated seed so the edge ordering is a pure
    // function of ScalaCheck's seed — a failing trial replays exactly.
    seed <- Gen.choose(Long.MinValue, Long.MaxValue)
  } yield new scala.util.Random(seed).shuffle(
    (0 until len).map(i => (i.toLong, i.toLong + 1)).toList)

  private def unionFind(edges: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      r
    }
    edges.foreach { case (a, b) =>
      parent.getOrElseUpdate(a, a)
      parent.getOrElseUpdate(b, b)
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    parent.keys.map(id => id -> find(id)).toMap
  }

  private def check(edges: List[(Long, Long)]): Prop = {
    import spark.implicits._
    val pairs = edges.toDF("id_a", "id_b")
    val got = Components.connectedComponents(pairs, driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = unionFind(edges)
    Prop(got == want) :| s"star-contraction $got != union-find $want"
  }

  property("star contraction == union-find on random graphs") =
    Prop.forAll(edgesGen)(check)

  property("star contraction == union-find on shuffled chains") =
    Prop.forAll(chainGen)(check)
}
