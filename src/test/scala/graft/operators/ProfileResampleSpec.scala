package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ProfileResampleSpec extends SparkSpec {
  import spark.implicits._

  test("Profile.summary: one pass, exact stats, nulls counted") {
    val df = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, null), (2.0, 30.0), (null, 10.0))
      .toDF("a", "b")
    val out = Profile.summary(df, Seq("a", "b"))
      .orderBy("column")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 4L, 1L, 2L, 1.0, 2.0),
      ("b", 4L, 1L, 2L, 10.0, 30.0)))
    // single aggregation over a single scan (one pass — Expand for the
    // multi-column distinct is allowed, a second FileScan is not)
    val plan = Profile.summary(df, Seq("a", "b"))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan|Scan".r.findAllMatchIn(plan).size <= 1, plan)
  }

  test("Profile.histogram: exact bins, max in last bin, empty bins emitted") {
    // values 0..10 into 5 bins of width 2: [0,2) [2,4) [4,6) [6,8) [8,10]
    val df = Seq(0.0, 1.9, 2.0, 5.0, 10.0, 10.0).toDF("x")
    val out = Profile.histogram(df, "x", 5)
      .orderBy("bin")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0.0, 2.0, 2L),   // 0.0, 1.9
      (1L, 2.0, 4.0, 1L),   // 2.0 (left-closed)
      (2L, 4.0, 6.0, 1L),   // 5.0
      (3L, 6.0, 8.0, 0L),   // empty bin still emitted
      (4L, 8.0, 10.0, 2L))) // max lands in the LAST bin, twice
  }

  test("Profile.histogram: constant column collapses to one bin") {
    val out = Profile.histogram(Seq(7.0, 7.0, 7.0).toDF("x"), "x", 4)
      .orderBy("bin")
      .as[(Long, Double, Double, Long)].collect().toSeq
    assert(out.map(_._4).sum == 3L)
    assert(out.head == ((0L, 7.0, 7.0, 3L)))
    assert(out.size == 4 && out.tail.forall(_._4 == 0L))
  }

  test("Profile.outliers: flags per-group, moments exact, schema appended") {
    // group "a": nine 10.0s and one 100.0 -> mean 19, var = (9*81+6561)/10
    // = 729, std 27; |100-19| = 81 = 3std exactly -> NOT an outlier at
    // z=3 (strict >), IS at z=2.9
    val df = ((1 to 9).map(i => (i.toLong, "a", 10.0)) :+ ((10L, "a", 100.0)))
      .toDF("id", "g", "v")
    def flagged(z: Double) = Profile.outliers(df, "g", "v", z)
      .filter(col("is_outlier")).collect().map(_.getLong(0)).toSeq
    assert(flagged(3.0) == Seq())
    assert(flagged(2.9) == Seq(10L))
    val out = Profile.outliers(df, "g", "v", 3.0)
    assert(out.columns.toSeq == Seq("id", "g", "v", "is_outlier"))
    assert(out.count() == 10)
  }

  test("Profile.psi: identical slices score ~0, shifted slice flags the moved bins") {
    val ref = (1 to 100).map(_.toDouble % 10).toDF("x")
    val same = Profile.psi(ref, ref, "x", 5)
      .collect().map(_.getDouble(3))
    assert(same.forall(_ == 0.0), s"identical slices drifted: ${same.toSeq}")
    // current slice compressed into the low bins; out-of-range values
    // clamp into the edge bin instead of vanishing
    val cur = ((1 to 100).map(_ => 1.0) ++ Seq(-50.0, 500.0)).toDF("x")
    val out = Profile.psi(ref, cur, "x", 5)
      .orderBy("bin")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.map(_._3).sum == 102L, s"clamped rows lost: ${out.toSeq}")
    assert(out.head._3 == 101L) // 1.0s plus the -50 clamp in bin 0
    assert(out.last._3 == 1L)   // the 500 clamp in the top bin
    val total = out.map(_._4).sum
    assert(total > 0.2, s"gross drift under the action threshold: $total")
  }

  test("gapFillHourly: dense buckets, zero counts, carried totals") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      ("x", ts("2024-01-01 00:10:00"), 1.0),
      ("x", ts("2024-01-01 00:40:00"), 2.0),
      // hours 01 and 02 are gaps
      ("x", ts("2024-01-01 03:20:00"), 4.0),
      ("y", ts("2024-01-01 05:00:00"), 9.0)
    ).toDF("k", "ts", "v")
    val out = Resample.gapFillHourly(ev, "k", "ts", "v")
      .orderBy("k", "bucket")
      .select(col("k"), hour(col("bucket")).as("h"), col("n"),
        col("filled_total"))
      .as[(String, Int, Long, Double)].collect().toSeq
    assert(out == Seq(
      ("x", 0, 2L, 3.0),  // two events, sum 3
      ("x", 1, 0L, 3.0),  // gap: carried
      ("x", 2, 0L, 3.0),  // gap: carried
      ("x", 3, 1L, 4.0),  // new observation replaces the carry
      ("y", 5, 1L, 9.0))) // single-bucket key: no scaffold beyond range
  }
}
