package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("distinctDim returns unique attribute combinations") {
    val df = Seq(("F", "HIGH"), ("F", "HIGH"), ("O", "LOW")).toDF("s", "p")
    assert(Dims.distinctDim(df, Seq("s", "p")).count() == 2)
  }

  test("scd2Merge versions changed attributes and passes unchanged keys") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val current = Seq(
      ("S1", "Station One", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp]),
      ("S2", "Station Two", ts("2024-01-01 00:00:00"), null.asInstanceOf[java.sql.Timestamp])
    ).toDF("station_id", "name", "valid_from", "valid_to")
    val updates = Seq(
      ("S1", "Station One Renamed", ts("2024-06-01 00:00:00")),
      ("S2", "Station Two", ts("2024-06-01 00:00:00")) // unchanged attrs
    ).toDF("station_id", "name", "uts")
    val out = Dims.scd2Merge(current, updates, "station_id", Seq("name"),
      col("uts")).orderBy("station_id", "valid_from").rows
    // S1: two versions, first closed at the update ts; S2: one open version
    assert(out.size == 3)
    val s1 = out.filter(_.getString(0) == "S1")
    assert(s1.head.getString(1) == "Station One" &&
      s1.head.getTimestamp(3) == ts("2024-06-01 00:00:00"))
    assert(s1(1).getString(1) == "Station One Renamed" && s1(1).isNullAt(3))
    val s2 = out.filter(_.getString(0) == "S2")
    assert(s2.size == 1 && s2.head.isNullAt(3))
  }

  test("calendarDim derives the full calendar attribute set") {
    val df = Seq("2024-02-29", "2024-02-29", "2024-12-31").toDF("d")
      .withColumn("d", to_date(col("d")))
    val out = Dims.calendarDim(df, "d").orderBy("date").rows
    assert(out.size == 2)
    val leap = out.head
    assert(leap.getInt(1) == 2024 && leap.getInt(2) == 2 && leap.getInt(3) == 29)
    assert(leap.getInt(4) == 1)       // quarter
    assert(leap.getInt(5) == 5)       // Thursday (Sunday=1)
    assert(leap.getInt(6) == 60)      // day of leap year
    assert(leap.getInt(7) == 9)       // ISO week
    val nye = out(1)
    assert(nye.getInt(6) == 366 && nye.getInt(4) == 4)
  }
}
