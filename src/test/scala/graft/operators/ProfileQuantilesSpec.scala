package graft.operators

import graft.SparkSpec

class ProfileQuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def quantiles(xs: Seq[Double], buckets: Int,
      pcts: Seq[Int]): Map[Long, Double] =
    Profile.histogramQuantiles(xs.toDF("x"), "x", buckets, pcts)
      .rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap

  test("hand-checked: one value per bin, upper-edge rule") {
    // 0..7 over 8 bins: one row per bin, width 7/8; pct p -> bin
    // ceil(8p/100)-1, answer = that bin's upper edge
    val got = quantiles((0 to 7).map(_.toDouble), 8, Seq(1, 50, 100))
    assert(got(1L) == 0.875)   // bin 0
    assert(got(50L) == 3.5)    // bin 3: cum 4 reaches 50% of 8
    assert(got(100L) == 7.0)   // last bin's edge is pinned to max
  }

  test("answer brackets the exact percentile within one bin width") {
    val rnd = new scala.util.Random(5)
    val xs = Seq.fill(500)(rnd.nextDouble() * 100 - 50)
    val buckets = 16
    val width = (xs.max - xs.min) / buckets
    val pcts = Seq(5, 25, 50, 75, 95, 100)
    val got = quantiles(xs, buckets, pcts)
    val sorted = xs.sorted
    pcts.foreach { p =>
      // rank the integer-arithmetic rule selects: first cum >= p*N/100
      val r = math.ceil(p * xs.size / 100.0).toInt
      val exact = sorted(r - 1)
      assert(got(p.toLong) >= exact,
        s"pct $p: ${got(p.toLong)} < exact $exact")
      assert(got(p.toLong) <= exact + width + 1e-9,
        s"pct $p: ${got(p.toLong)} overshoots $exact by > bin width")
    }
  }

  test("constant column answers the constant at every percentile") {
    val got = quantiles(Seq.fill(40)(3.25), 8, Seq(1, 50, 99, 100))
    assert(got.values.forall(_ == 3.25))
  }

  test("deterministic under repartitioning") {
    val xs = (1 to 400).map(i => (i % 37).toDouble)
    val a = Profile.histogramQuantiles(
      xs.toDF("x"), "x", 12, Seq(10, 50, 90)).rows.map(_.toSeq).toSet
    val b = Profile.histogramQuantiles(
      xs.toDF("x").repartition(9), "x", 12, Seq(10, 50, 90))
      .rows.map(_.toSeq).toSet
    assert(a == b)
  }

  test("percent bounds are validated") {
    intercept[IllegalArgumentException] {
      Profile.histogramQuantiles(Seq(1.0).toDF("x"), "x", 4, Seq(0))
    }
    intercept[IllegalArgumentException] {
      Profile.histogramQuantiles(Seq(1.0).toDF("x"), "x", 4, Nil)
    }
  }
}
