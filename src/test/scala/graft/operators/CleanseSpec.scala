package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Reference-shaped fixture (FIXTURES.md B1): NOAA-like observation rows —
  * null measures are dropped, non-empty quality flags are dropped, schema
  * normalizes UPPERCASE→snake_case with casts
  * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:76-90). */
class CleanseSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    ("ST1", 20240101, Some(251.0), null.asInstanceOf[String]), // keep
    ("ST1", 20240102, Some(-30.0), ""),                        // keep (empty flag)
    ("ST2", 20240103, None, null.asInstanceOf[String]),        // drop: null value
    ("ST2", 20240104, Some(100.0), "G")                        // drop: quality flag
  ).toDF("ID", "DATE", "DATA_VALUE", "Q_FLAG")

  test("qualityFilter keeps present values with absent/empty flags") {
    val out = Cleanse.qualityFilter(fixture, "DATA_VALUE", "Q_FLAG")
    assert(out.select("ID", "DATE").rows.map(r => r.getInt(1)).sorted ==
      Seq(20240101, 20240102))
  }

  test("normalize renames, casts, and prunes in one projection") {
    val out = Cleanse.normalize(fixture, Seq(
      Cleanse.FieldSpec("ID", "station_id"),
      Cleanse.FieldSpec(to_date(col("DATE").cast(StringType), "yyyyMMdd"), "obs_date"),
      Cleanse.FieldSpec("DATA_VALUE", "value", DoubleType)))
    assert(out.schema.fieldNames.toSeq == Seq("station_id", "obs_date", "value"))
    assert(out.schema("obs_date").dataType == DateType)
    assert(out.rows.head.getDate(1).toString == "2024-01-01")
  }

  test("rangeRules ANDs all predicates") {
    val out = Cleanse.rangeRules(fixture, Seq(
      col("DATA_VALUE").isNotNull,
      col("DATA_VALUE").between(-50, 300)))
    assert(out.count() == 3) // 251, -30, 100 pass; None dropped
  }

  test("nonEmptyKey drops null and empty keys") {
    val df = Seq(("a", 1), ("", 2), (null, 3)).toDF("k", "v")
    assert(Cleanse.nonEmptyKey(df, "k").rows.map(_.getInt(1)) == Seq(1))
  }
}
