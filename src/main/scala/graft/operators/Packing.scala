package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sequence packing: assign documents to ~`targetTokens`
  * bins — the batch-construction step of a training pipeline (pack short
  * documents into fixed token budgets, one bin = one training sequence).
  *
  * Assignment is by running token offset in a stable order: bin =
  * floor((cumulative tokens before this doc) / target), computed with an
  * integer `div` so there is no float in the path at all. Docs larger
  * than the target get a bin of their own plus spillover — the simple
  * offset rule keeps every bin's START aligned to the budget, which is
  * what sequence packers actually need, and makes the assignment a pure
  * function of (shard, order, token counts): reruns, engines, and
  * repartitionings all agree.
  *
  * Scale: the cumulative sum is a window WITHIN each shard (`shardCols`)
  * — never a global single-reducer ordering. Real packers pack per
  * worker/shard anyway; choose shards (language, domain, hash bucket)
  * so one shard fits a reducer. */
object Packing {

  def packBins(df: DataFrame, idCol: String, tokenCol: String,
      shardCols: Seq[String], targetTokens: Int): DataFrame = {
    require(shardCols.nonEmpty,
      "packing needs shard columns — a global ordering would serialize " +
        "the corpus through one reducer")
    val w = Window.partitionBy(shardCols.map(col): _*)
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("bin",
        expr(s"(__cum - `$tokenCol`) div $targetTokens").cast("long"))
      .drop("__cum")
  }

  /** The emission stage on top of [[packBins]]: one row per (shard,
    * bin) holding the ACTUAL training sequence — member documents
    * concatenated in packing order with `separator` between them — plus
    * the doc and token tallies. The bin window and the reassembly group
    * share the shard-keyed distribution, and member order inside a bin
    * is pinned by the same id ordering the bin assignment used, so the
    * emitted sequence is a pure function of (shard, ids, token counts)
    * at any parallelism. */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
      tokenCol: String, shardCols: Seq[String], targetTokens: Int,
      separator: String = " <eod> "): DataFrame =
    packBins(df, idCol, tokenCol, shardCols, targetTokens)
      .groupBy((shardCols.map(col) :+ col("bin")): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).cast("long").as("n_tokens_total"),
        array_join(transform(
          array_sort(collect_list(struct(col(idCol), col(textCol)))),
          s => s.getField(textCol)), separator).as("sequence"))
}
