package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  // 3 groups x overlapping member sets across 4 "days"
  private lazy val rows = for {
    g <- Seq("a", "b", "c")
    d <- 1 to 4
    i <- 1 to 400
  } yield (g, d, (i * (g.hashCode.abs % 7 + 1) + d * 13) % 900L)
  private lazy val df = rows.toDF("g", "day", "uid")

  private def estMap(e: org.apache.spark.sql.DataFrame) =
    e.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("merged daily sketches track exact counts and are deterministic") {
    // NOTE: merged is NOT bit-identical to the direct sketch in general
    // (union promotes the internal HLL mode) — the honest gates are
    // accuracy vs EXACT counts and determinism of the merge itself
    val exact = df.groupBy("g").agg(countDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val daily = Sketches.build(df, Seq("g", "day"), "uid")
    def mergedOnce() = estMap(Sketches.estimate(
      Sketches.rollup(daily, Seq("g")), Seq("g")))
    val merged = mergedOnce()
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.05,
        s"group $g: merged est ${merged(g)} vs exact $n")
    }
    assert(mergedOnce() == merged, "sketch merge must be deterministic")
  }

  test("estimates land within 5% of exact distinct counts") {
    val exact = df.groupBy("g").agg(countDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val est = estMap(Sketches.estimate(
      Sketches.build(df, Seq("g"), "uid"), Seq("g")))
    exact.foreach { case (g, n) =>
      assert(math.abs(est(g) - n).toDouble / n < 0.05,
        s"group $g: est ${est(g)} vs exact $n")
    }
  }

  test("two-table merge tracks exact counts of the unioned input") {
    val d1 = df.filter(col("day") <= 2)
    val d2 = df.filter(col("day") > 2)
    val merged = estMap(Sketches.estimate(
      Sketches.merge(
        Sketches.build(d1, Seq("g"), "uid"),
        Sketches.build(d2, Seq("g"), "uid"), Seq("g")),
      Seq("g")))
    val exact = df.groupBy("g").agg(countDistinct(col("uid")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (g, n) =>
      assert(math.abs(merged(g) - n).toDouble / n < 0.05,
        s"group $g: merged est ${merged(g)} vs exact $n")
    }
  }
}
