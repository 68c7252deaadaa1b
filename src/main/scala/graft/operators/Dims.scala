package graft.operators

import org.apache.spark.sql.DataFrame
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
