package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) addressing for multi-column data clustering: bit-wise
  * interleaving maps N columns onto one integer whose ordering is local in
  * EVERY dimension at once, so a table range-partitioned and sorted by the
  * z-address gets selective parquet min/max stats on all N columns — the
  * layout Delta/Iceberg `ZORDER BY` produces, done the parquet-table way
  * (Morton 1966; public technique). Clustering on (a, b) by plain sort
  * gives pruning on `a` only; z-order trades a little of `a`'s locality
  * for pruning on both — each file covers ~(1/F)^(1/N) of every
  * dimension's range instead of 1/F of one and 100% of the rest.
  *
  * The address is a pure integer projection (shift/and/or chains —
  * whole-stage codegen, no UDF, no shuffle), so it is also exactly
  * replayable by a SQL oracle.
  *
  * Scale shape: the z-address costs nothing at read time (it is not
  * stored); [[graft.pipeline.Maintenance.compactZorder]] pays one rewrite
  * to buy every later scan's multi-dimension file/row-group skipping —
  * the economics that matter when the table is 100 TB and the queries
  * filter on whichever of the N columns the analyst picks. */
object ZOrder {

  /** Morton address: interleave the low `bits` bits of each column
    * (column i owns bit lanes i, i+N, i+2N, …). Inputs must already lie
    * in [0, 2^bits) — see [[scaled]] for mapping arbitrary numerics —
    * values outside contribute only their low bits (masked, not failed,
    * matching how layout addressing must never error a rewrite).
    * N·bits ≤ 63 keeps the address in one positive BIGINT. */
  def zAddress(bits: Int, cols: Column*): Column = {
    require(cols.nonEmpty, "zAddress needs at least one column")
    require(bits > 0 && cols.size * bits <= 63,
      s"need 0 < bits and cols*bits <= 63, got ${cols.size} cols * $bits bits")
    val n = cols.size
    val terms = for {
      b <- 0 until bits
      (c, i) <- cols.zipWithIndex
    } yield shiftleft(
      shiftright(c.cast("long"), b).bitwiseAND(lit(1L)), b * n + i)
    terms.reduceLeft[Column](_ bitwiseOR _)
  }

  /** Linear min/max scaling of a numeric column into [0, 2^bits):
    * floor((x − lo)·(2^bits − 1)/(hi − lo)), clamped — the per-rewrite
    * normalization [[graft.pipeline.Maintenance.compactZorder]] derives
    * from each leaf's own one-row bounds aggregate. Degenerate bounds
    * (hi ≤ lo) collapse to 0, which z-orders as "this dimension carries
    * no information" — correct, since every row has the same value. */
  def scaled(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(bits > 0 && bits <= 62, s"bits must be in [1, 62], got $bits")
    val top = (1L << bits) - 1
    if (hi <= lo) lit(0L)
    else least(lit(top), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) * lit(top.toDouble) /
        lit(hi - lo)).cast("long")))
  }
}
