package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: bucket events to a fixed grain, scaffold
  * the missing buckets per key, and gap-fill by carrying the last
  * observed value forward — the sparse→dense step before any
  * window/forecast consumer (which silently mis-computes over gaps).
  *
  * Scale shape: the scaffold is generated per key from that key's
  * [min, max] bucket bounds (`sequence` + explode — no driver loop, no
  * cross join with a global calendar), the actuals meet it in a left
  * join on (key, bucket), and the carry-forward is one window pass. Keys
  * are independent; everything shuffles on the key exactly once by
  * bucket count, never raw events. */
object Resample {

  /** Hourly gap-fill: per (keyCol, hour) counts and exact sums, dense
    * over each key's observed range; missing hours get n = 0 and the
    * last observed sum carried forward. Output: keyCol, bucket
    * (timestamp), n, total (this bucket's sum or null), filled_total. */
  def gapFillHourly(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String): DataFrame = {
    val hourly = df
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("total"))
    val scaffold = hourly.groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__mn"), max(col("bucket")).as("__mx"))
      .select(col(keyCol),
        explode(sequence(col("__mn"), col("__mx"),
          expr("interval 1 hour"))).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scaffold.join(hourly, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n"), lit(0L)).as("n"), col("total"),
        last(col("total"), ignoreNulls = true).over(w).as("filled_total"))
  }
}
