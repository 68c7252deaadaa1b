package graft.props

import org.scalacheck.{Gen, Prop, Properties}

import graft.TestSpark
import graft.operators.{Kll, Theta}
import org.apache.spark.sql.functions._

/** Randomized cross-checks for the sketch families' EXACT regimes — the
  * regimes the DuckDB oracles (q164–q167) rely on. For random seeded
  * inputs under capacity:
  *  - theta: estimate / intersection / difference over two random sets
  *    equal the exact Scala Set algebra (any inexactness here would
  *    silently poison q167's oracle claim);
  *  - KLL: every integer-percent quantile equals the exact order
  *    statistic under the INCLUSIVE rank rule `100·cum >= p·n`.
  * Inputs are seeded per trial so failures reproduce exactly; trial
  * count is bounded (Spark jobs are not free).
  */
object SketchProps extends Properties("graft.sketches") {
  private lazy val spark = TestSpark.spark

  override def overrideParameters(p: org.scalacheck.Test.Parameters) =
    p.withMinSuccessfulTests(8)

  property("theta exact-mode set algebra == Set algebra") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val universe = 2000
      val a = Set.fill(200 + rnd.nextInt(400))(rnd.nextInt(universe).toLong)
      val b = Set.fill(200 + rnd.nextInt(400))(rnd.nextInt(universe).toLong)
      val df = (a.toSeq.map(("A", _)) ++ b.toSeq.map(("B", _)))
        .toDF("seg", "uid")
      val got = Theta.pairwiseOverlap(
          Theta.build(df, Seq("seg"), "uid", lgK = 12), "seg")
        .collect().head
      got.getLong(2) == a.size.toLong &&
        got.getLong(3) == b.size.toLong &&
        got.getLong(4) == (a intersect b).size.toLong &&
        got.getLong(5) == (a diff b).size.toLong
    }

  property("KLL exact-regime quantiles == order statistics") =
    Prop.forAll(Gen.choose(0L, Long.MaxValue / 2)) { seed =>
      import spark.implicits._
      val rnd = new scala.util.Random(seed)
      val n = 50 + rnd.nextInt(900)            // < k=1024: exact retention
      val vals = IndexedSeq.fill(n)(rnd.nextInt(10000).toDouble)
      val pcts = Seq(1, 10, 25, 50, 75, 90, 99, 100)
      val got = Kll.quantiles(
          Kll.build(vals.map(Tuple1(_)).toDF("v"), Nil, "v", k = 1024),
          Nil, pcts)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val sorted = vals.sorted
      pcts.forall { p =>
        val exact = sorted(
          sorted.indices.find(i => 100L * (i + 1) >= p.toLong * n).get)
        got(p.toLong) == exact
      }
    }
}
