package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DimsSpec extends SparkSpec {
  import spark.implicits._

  test("distinctDim returns unique attribute combinations") {
    val df = Seq(("F", "HIGH"), ("F", "HIGH"), ("O", "LOW")).toDF("s", "p")
    assert(Dims.distinctDim(df, Seq("s", "p")).count() == 2)
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
