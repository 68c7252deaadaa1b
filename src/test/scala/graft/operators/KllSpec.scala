package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (n <= k): quantiles are exact order statistics") {
    // 3 groups, <= 200 values each, k=200 → sketch retains everything
    val df = (1 to 450).map(i => (s"g${i % 3}", (i * 7919 % 1000).toDouble))
      .toDF("g", "v")
    val sk = Kll.build(df, Seq("g"), "v", k = 200)
    val got = Kll.quantiles(sk, Seq("g"), Seq(25, 50, 75, 100))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val byG = df.collect().map(r => r.getString(0) -> r.getDouble(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toIndexedSeq).toMap
    for ((g, vs) <- byG; p <- Seq(25, 50, 75, 100)) {
      // INCLUSIVE rule: smallest v with 100*(# <= v) >= p*n
      val n = vs.size
      val exact = vs(vs.indices.find(i => 100L * (i + 1) >= p.toLong * n).get)
      assert(got((g, p.toLong)) == exact, s"group $g pct $p")
    }
  }

  test("approximate regime: rank error bounded, n exact") {
    val n = 100000
    val df = (1 to n).map(i => ((i.toLong * 104729L) % n).toDouble).toDF("v")
    val sk = Kll.build(df, Nil, "v", k = 200)
    val q = Kll.quantiles(sk, Nil, Seq(50)).collect().head.getDouble(1)
    // value universe is 0..n-1 uniformly, so value/n ~ rank; KLL k=200
    // guarantees ~1.65% normalized rank error (use 3% slack)
    assert(math.abs(q / n - 0.5) < 0.03, s"p50 estimate $q")
    val cnt = Kll.counts(sk, Nil).collect().head.getLong(0)
    assert(cnt == n)
  }

  test("rollup union == direct build in the exact regime; n merges exactly") {
    val df = (1 to 300).map(i => (s"s${i % 5}", (i * 31 % 997).toDouble))
      .toDF("src", "v")
    val direct = Kll.build(df.withColumn("all", lit(1)), Seq("all"), "v",
      k = 2048)
    val merged = Kll.rollup(
      Kll.build(df.withColumn("all", lit(1)), Seq("all", "src"), "v",
        k = 2048), Seq("all"))
    val qs = Seq(10, 25, 50, 75, 90, 100)
    val a = Kll.quantiles(direct, Seq("all"), qs)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    val b = Kll.quantiles(merged, Seq("all"), qs)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(a == b, "merged sketch diverged from direct in exact regime")
    assert(Kll.counts(merged, Seq("all")).collect().head.getLong(1) == 300)
  }

  test("nulls are skipped; empty group yields NULL quantile") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("b", None))
      .toDF("g", "v")
    val sk = Kll.build(df, Seq("g"), "v", k = 200)
    val rows = Kll.quantiles(sk, Seq("g"), Seq(50))
      .collect().map(r => r.getString(0) -> Option(r.get(2))).toMap
    assert(rows("a").contains(1.0))
    assert(rows("b").isEmpty, "empty sketch must probe to NULL")
  }
}
