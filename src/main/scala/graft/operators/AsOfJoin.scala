package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, the most recent right row (by `tsCol`,
  * right.ts <= left.ts) with the same key — the standard time-series
  * enrichment operator (trades↔quotes, events↔latest-state).
  *
  * Composed from built-ins per the custom-operator preference ladder
  * (SURVEY.md §7.1 — compose first): tag and union both sides, then one
  * window pass per key carries the latest right-side row forward
  * (`last(struct, ignoreNulls)` over an unbounded-preceding frame — a
  * single struct, so all carried columns come from the SAME right row).
  * One shuffle on the key, one sort: the cost profile of a sort-merge
  * join, with no range-condition blowup. Right rows sort before left ties
  * (src ordering) so right.ts == left.ts matches.
  */
object AsOfJoin {

  /** Left as-of join. `valueCols` are the right-side columns to carry; they
    * appear in the output as `asof_<name>` (null when no right row precedes
    * the left row). The tie-break columns (one per side — each side only
    * sees its own schema) must totally order rows within (key, ts) for
    * deterministic results.
    *
    * `within` is the pandas-merge_asof tolerance: a predicate over
    * (left ts, matched right ts) — when present, a carried match that
    * fails it nulls out (e.g. only purchases in the last 24 h count).
    * Tolerance costs nothing extra: the matched ts rides inside the
    * already-carried struct, so the plan is still one union + one window
    * pass. */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, valueCols: Seq[String], leftTieBreak: Column,
      rightTieBreak: Column,
      within: Option[(Column, Column) => Column] = None): DataFrame = {
    // the carried struct and the union reserve these names; a colliding
    // right-side column would duplicate a struct field and silently
    // corrupt tolerance evaluation (mirrors Similarity's 'bucket' guard)
    val reserved = Set("__rts", "__src", "__tb", "__rv", "__carried")
    val clash = (valueCols ++ left.columns ++ right.columns)
      .filter(reserved.contains).distinct
    require(clash.isEmpty,
      s"column name(s) ${clash.mkString(", ")} collide with AsOfJoin " +
        "internals — rename them before joining")
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(tsCol),
        lit(0).as("__src"),
        rightTieBreak.as("__tb"),
        struct(valueCols.map(col) :+ col(tsCol).as("__rts"): _*).as("__rv")): _*)
    val lTagged = left
      .withColumn("__src", lit(1))
      .withColumn("__tb", leftTieBreak)
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__src"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__carried", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__src") === 1)
      .select(left.columns.toIndexedSeq.map(col) ++
        valueCols.map { v =>
          val carried = col(s"__carried.$v")
          within
            .map(p => when(p(col(tsCol), col("__carried.__rts")), carried))
            .getOrElse(carried).as(s"asof_$v")
        }: _*)
  }
}
