package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Silver→Gold dimension builders (star schema).
  *
  * Capability parity with the reference's gold job, which builds
  * `dim_element` / `dim_date` via project+distinct and a calendar-function
  * fan-out (reference: glue-jobs/noaa_ghcn_silver_to_gold.py:56-79).
  */
object Dims {

  /** A2: dimension = distinct projection of the fact's attribute columns.
    * The distinct is a hash aggregate over only the projected columns, so
    * the shuffle width is the dim width, not the fact width. */
  def distinctDim(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*).distinct()

  /** F13: calendar dimension derived from a date/timestamp column.
    * Distinct FIRST over the 4-byte date, then derive the seven calendar
    * attributes — at 100 TB this shuffles dates (≤ a few K distinct values
    * after partial aggregation), not the derived row. */
  /** SCD Type-2 merge without a table-format MERGE INTO: rebuild the
    * versioned dimension from the current version table plus an updates
    * batch. Attribute changes close the previous version
    * (`valid_to` = new `valid_from`) and open a new current one; unchanged
    * keys pass through. One window pass per key — no row-by-row upserts.
    *
    * Inputs: `current` with (key, attrs..., valid_from, valid_to NULL for
    * open rows); `updates` with (key, attrs..., effective ts). */
  def scd2Merge(current: DataFrame, updates: DataFrame, keyCol: String,
      attrCols: Seq[String], updateTs: Column): DataFrame = {
    val upd = updates.select(
      (col(keyCol) +: attrCols.map(col)) ++ Seq(
        updateTs.as("valid_from"),
        lit(null).cast("timestamp").as("valid_to")): _*)
    val all = current
      .select((col(keyCol) +: attrCols.map(col)) ++ Seq(
        col("valid_from"), col("valid_to")): _*)
      .unionByName(upd)
    val w = Window.partitionBy(col(keyCol)).orderBy(col("valid_from"))
    // Drop consecutive versions with identical attributes, then re-close
    // each version at the next version's start.
    val attrStruct = struct(attrCols.map(col): _*)
    all
      .withColumn("__prev", lag(attrStruct, 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= attrStruct)
      .withColumn("valid_to", lead(col("valid_from"), 1).over(w))
      .drop("__prev")
  }

  def calendarDim(df: DataFrame, dateCol: String): DataFrame =
    df.select(to_date(col(dateCol)).as("date")).distinct()
      .select(
        col("date"),
        year(col("date")).as("year"),
        month(col("date")).as("month"),
        dayofmonth(col("date")).as("day"),
        quarter(col("date")).as("quarter"),
        dayofweek(col("date")).as("day_of_week"),
        dayofyear(col("date")).as("day_of_year"),
        weekofyear(col("date")).as("week_of_year"))
}
