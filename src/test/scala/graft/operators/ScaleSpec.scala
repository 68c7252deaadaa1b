package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedSumCount equals the unsalted aggregate bit-for-bit") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
        .as("sum_l_quantity"), count(lit(1)).as("n"))
      .rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    val salted = Scale.saltedSumCount(li, Seq("l_returnflag"), "l_quantity", 16)
      .rows.map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sorted
    assert(salted == direct)
  }

  test("saltedJoin equals the plain join") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderstatus"))
    val plain = li.join(o, Seq("l_orderkey")).count()
    val salted = Scale.saltedJoin(li, o, "l_orderkey", factor = 4).count()
    assert(salted == plain && plain > 0)
  }

  test("selective dim join injects a runtime bloom filter on the fact side") {
    // The at-scale lever this pins: a selective dimension filter becomes a
    // bloom filter evaluated inside the FACT scan, so a shuffle join reads
    // and shuffles only probably-matching fact rows. Thresholds are tuned
    // for production sizes; lower them so the sf0.001 fixture qualifies.
    val dir = "/root/testdata/sf0.001"
    val li = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").as("l_orderkey"))
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.get(k))
    try {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = li.join(o, Seq("l_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.count() > 0)
    } finally saved.foreach { case (k, v) => spark.conf.set(k, v) }
  }

  test("bucketed tables join without a shuffle") {
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    Scale.writeBucketed(o.select("o_orderkey", "o_totalprice"),
      "bt_orders", "o_orderkey", 4)
    Scale.writeBucketed(o.select("o_orderkey", "o_orderpriority"),
      "bt_orders2", "o_orderkey", 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bt_orders")
        .join(spark.table("bt_orders2"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      assert(joined.count() == o.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bt_orders")
      spark.sql("DROP TABLE IF EXISTS bt_orders2")
    }
  }

  test("zOrder2 interleaves bits (locality for both dimensions)") {
    val out = Seq((0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (0xFFFF, 0xFFFF))
      .toDF("x", "y")
      .select(col("x"), col("y"), Scale.zOrder2(col("x"), col("y")).as("z"))
      .rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    assert(out((0, 0)) == 0L)
    assert(out((1, 0)) == 1L)      // x in even bits
    assert(out((0, 1)) == 2L)      // y in odd bits
    assert(out((1, 1)) == 3L)
    assert(out((2, 0)) == 4L)
    assert(out((0, 2)) == 8L)
    assert(out((0xFFFF, 0xFFFF)) == 0xFFFFFFFFL)
  }

  test("GraftExtensions injects without error") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.GraftExtensions().apply(ext)
  }

  test("skewReport: exact counts, ppm shares, deterministic tie-break") {
    import spark.implicits._
    val df = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      Seq.fill(5)("b") ++ Seq.fill(5)("a")).toDF("k")
    val out = Scale.skewReport(df, "k", 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq(
      ("hot", 60L, 600000L),
      ("warm", 30L, 300000L),
      ("a", 5L, 50000L))) // 5-count tie: "a" beats "b" on the key
  }
}
