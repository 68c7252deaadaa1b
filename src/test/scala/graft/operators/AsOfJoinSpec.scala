package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("leftAsOf picks the latest right row at or before each left ts") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:05")),
      (2L, "A", ts("2024-01-01 10:00:30")),
      (3L, "B", ts("2024-01-01 10:00:10")),
      (4L, "A", ts("2024-01-01 09:59:00")) // before any quote -> null
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(
      ("A", ts("2024-01-01 10:00:00"), 100.0, 5L),
      ("A", ts("2024-01-01 10:00:20"), 101.0, 6L),
      ("A", ts("2024-01-01 10:00:30"), 102.0, 7L), // equal ts matches
      ("B", ts("2024-01-01 10:00:09"), 50.0, 8L)
    ).toDF("sym", "ts", "price", "qid")
    val out = AsOfJoin.leftAsOf(trades, quotes, Seq("sym"), "ts",
        Seq("price", "qid"), col("trade_id"), col("qid"))
      .orderBy("trade_id").rows
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))) == Seq(
      (1L, Some(100.0)), (2L, Some(102.0)), (3L, Some(50.0)), (4L, None)))
    // carried columns come from the same right row
    assert(out.head.getLong(4) == 5L && out(1).getLong(4) == 7L)
  }

  test("within tolerance: stale matches null out, boundary is inclusive") {
    val trades = Seq(
      (1L, "A", ts("2024-01-01 10:00:10")), // quote 10s old, within 10s
      (2L, "A", ts("2024-01-01 10:00:30")), // quote 30s old -> nulled
      (3L, "A", ts("2024-01-01 09:00:00"))  // no quote at all -> null
    ).toDF("trade_id", "sym", "ts")
    val quotes = Seq(("A", ts("2024-01-01 10:00:00"), 100.0))
      .toDF("sym", "ts", "price")
    val out = AsOfJoin.leftAsOf(trades, quotes, Seq("sym"), "ts",
        Seq("price"), col("trade_id"), lit(0L),
        within = Some((l, r) => l.cast("long") - r.cast("long") <= 10L))
      .orderBy("trade_id").rows
    assert(out.map(r => (r.getLong(0), Option(r.get(3)))) == Seq(
      (1L, Some(100.0)), (2L, None), (3L, None)))
  }

  test("all carried columns always come from one right row") {
    val left = Seq((1L, "K", ts("2024-01-01 00:00:10"))).toDF("id", "k", "ts")
    val right = Seq(
      ("K", ts("2024-01-01 00:00:01"), "r1", 1.0),
      ("K", ts("2024-01-01 00:00:05"), "r2", 2.0)
    ).toDF("k", "ts", "tag", "v")
    val out = AsOfJoin.leftAsOf(left, right, Seq("k"), "ts",
      Seq("tag", "v"), col("id"), lit(0L)).rows.head
    assert(out.getString(3) == "r2" && out.getDouble(4) == 2.0)
  }

  test("reserved internal column names are rejected up front") {
    val left = Seq((1L, "K", ts("2024-01-01 00:00:10"))).toDF("id", "k", "ts")
    val right = Seq(("K", ts("2024-01-01 00:00:01"), 1.0))
      .toDF("k", "ts", "__rts")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left, right, Seq("k"), "ts",
        Seq("__rts"), col("id"), lit(0L))
    }
    assert(e.getMessage.contains("__rts"))
    intercept[IllegalArgumentException] {
      AsOfJoin.leftAsOf(left.withColumn("__src", lit(1)), right, Seq("k"),
        "ts", Seq.empty, col("id"), lit(0L))
    }
  }
}
