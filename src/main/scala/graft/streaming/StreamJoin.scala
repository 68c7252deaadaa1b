package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape: each
  * right-side event (click) joined to the left-side events (views) of the
  * same key that precede it by at most `maxDelay`.
  *
  * This is the one Structured Streaming state regime the other streaming
  * operators here don't exercise: BOTH sides buffer, and eviction is
  * driven by the other side's watermark — a left row can be dropped only
  * once the right watermark passes `leftTs + maxDelay` (no more matches
  * can arrive), which is exactly the bound the interval condition hands
  * the planner. Without the interval bound the state grows without limit;
  * with it, per-key state is O(events within the delay window).
  *
  * The same call works in batch (watermarks become no-ops, the join is a
  * plain interval join) — the batch twin is what the DuckDB oracle
  * checks, and StreamJoinSpec pins stream output == batch output.
  *
  * At scale: both streams shuffle on `keyCol` once; the range condition
  * is evaluated inside the keyed state store, never as a cross join. */
object StreamJoin {

  /** Join `left` and `right` on `keyCol` equality with
    * `leftTs < rightTs <= leftTs + maxDelay`. Timestamp columns must be
    * named differently on the two sides (rename before calling);
    * `joinType` may be "inner" or "left_outer" (unmatched left rows are
    * emitted with nulls — in streaming, only after the right watermark
    * has sealed their window). Output: all left columns, then the right
    * columns minus the duplicate key. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: String, rightTs: String, maxDelay: String,
      watermarkDelay: String, joinType: String = "inner"): DataFrame = {
    require(leftTs != rightTs,
      s"rename one side's timestamp column ($leftTs on both sides)")
    val l = left.withWatermark(leftTs, watermarkDelay).alias("l")
    val r = right.withWatermark(rightTs, watermarkDelay).alias("r")
    val cond = col(s"l.$keyCol") === col(s"r.$keyCol") &&
      col(s"r.$rightTs") > col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxDelay")
    l.join(r, cond, joinType)
      .select(col("l.*") +:
        right.columns.filter(_ != keyCol).map(c => col(s"r.$c"))
          .toIndexedSeq: _*)
  }
}
