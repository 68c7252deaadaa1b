package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column summary statistics in ONE pass —
  * the ingest-time health check a lakehouse runs on every new partition
  * (row counts, null rates, cardinalities, ranges) before promoting it.
  *
  * Scale shape: all measures for all columns fold into a single
  * aggregation over one scan (5·k agg expressions, partial+final), then
  * the one result row unpivots driver-side into (column, stats) rows —
  * k rows, not k passes. Exact COUNT(DISTINCT) over several columns
  * plans one Expand (k× the scan rows into the partial agg, combined
  * map-side); for quick-look profiling at extreme widths, callers can
  * profile column subsets. */
object Profile {

  /** One row per profiled numeric column: n, n_null, n_distinct (exact),
    * min, max. Column values must be castable to double. */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // stack the single wide row into per-column rows (k is tiny; the
    // stack is a projection, not another scan)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("mn"), col(s"__mx_$c").as("mx"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }
}
