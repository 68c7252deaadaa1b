package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic categorical encoding (the StringIndexer shape of
  * feature pipelines, reproducible across engines): category index =
  * dense rank by (frequency DESC, value ASC), so the most common value
  * gets 0 and ties break lexically — no RNG, no insertion order, no
  * engine dependence. The fitted dictionary is itself a table, so a
  * training run can persist it and score later batches against the
  * SAME mapping (the train/serve skew everyone gets bitten by).
  *
  * Scale shape: `fit` is one partial-aggregated groupBy over the
  * column (shuffle carries one row per distinct value per map
  * partition) followed by a row_number over the aggregated dictionary
  * — a single-partition sort of |dictionary| rows, which is the point
  * of a categorical column; `maxCategories` fails fast if someone
  * passes an id-like column instead of letting one reducer eat 10^9
  * rows. `transform` is a broadcast left join: OOV values encode as
  * -1, mirroring a closed-vocabulary model input. */
object CategoryEncode {

  /** (value, idx) dictionary, idx 0-based by (count DESC, value ASC).
    * NULLs are excluded (encode them upstream if they are a level). */
  def fit(df: DataFrame, c: String, maxCategories: Int = 100000): DataFrame = {
    require(maxCategories > 0,
      s"maxCategories must be positive, got $maxCategories")
    val counts = df.filter(col(c).isNotNull)
      .groupBy(col(c).as("value")).agg(count(lit(1)).as("n"))
      .ckpt()
    val nCats = counts.count()
    require(nCats <= maxCategories,
      s"column $c has $nCats distinct values (> $maxCategories): " +
        "not a categorical column, refusing the single-partition sort")
    counts.select(col("value"),
      (row_number().over(
        Window.orderBy(col("n").desc, col("value"))) - 1)
        .cast("long").as("idx"))
  }

  /** `df` with `outCol` = the dictionary index of `c` (-1 for values
    * absent from `mapping`). `mapping` is broadcast — it is bounded by
    * `maxCategories` at fit time. */
  def transform(df: DataFrame, c: String, mapping: DataFrame,
      outCol: String): DataFrame = {
    val m = broadcast(mapping.select(col("value"), col("idx")))
    df.join(m, df(c) === m("value"), "left")
      .drop("value")
      .withColumn(outCol, coalesce(col("idx"), lit(-1L)))
      .drop("idx")
  }
}
