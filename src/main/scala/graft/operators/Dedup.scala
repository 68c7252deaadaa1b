package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * W1 (window dedup over a composite key) is the reference's declared dedup
  * (reference: README.md:85,95,307); `exact*` generalizes it to
  * content-hash dedup for document pipelines.
  *
  * Scale notes: both shapes are a single hash-partition shuffle on the dedup
  * key. For wide rows `exactKeepFirst` shuffles a 32-byte digest + key
  * columns only, then semi-joins winners back — at 100 TB that is the
  * difference between shuffling 100 TB and shuffling ~1% of it.
  */
object Dedup {

  /** W1: keep exactly one row per composite key. `tieBreak` must order rows
    * totally within a key group (include a unique id) or results are
    * nondeterministic run-to-run — the reference's declared design omits
    * this; we require it. */
  def byKey(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && tieBreak.nonEmpty)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup summary: one row per distinct content digest with
    * the surviving (minimum) id and the duplicate count. Groups on a 256-bit
    * digest, never the payload, so the shuffle carries 32 bytes per row. */
  def exactSummary(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact content dedup: return the surviving full rows (min-id winner per
    * digest), via winners semi-joined back to the input so only digests and
    * ids shuffle. */
  def exactKeepFirst(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val winners = exactSummary(df, contentCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }
}
