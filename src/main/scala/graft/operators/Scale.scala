package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew and co-location tools for cluster-scale runs.
  *
  * AQE (on by default) already splits skewed shuffle partitions for joins;
  * these operators cover the cases AQE does not: hot-key *aggregation* skew
  * (a single group key that overwhelms one reducer) and repeated large
  * joins on the same key (bucketing amortizes the shuffle across queries).
  */
object Scale {

  /** Deterministic per-row salt in [0, buckets): hashed from the given
    * columns (use high-cardinality payload columns, not the group key). */
  def salt(buckets: Int, from: Seq[Column]): Column =
    pmod(xxhash64(from: _*), lit(buckets.toLong)).cast("int")

  /** Two-phase salted sum/count: phase 1 aggregates on (keys, salt) so a
    * hot key spreads over `saltBuckets` reducers; phase 2 folds the
    * partials. Exact decimal accumulation, so the result is bit-identical
    * to the unsalted aggregate. */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val keyCols = keys.map(col)
    val partial = df
      .withColumn("__salt", salt(saltBuckets, Seq(col(valueCol))))
      .groupBy(keyCols :+ col("__salt"): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(18, 2))).as("__psum"),
        count(lit(1)).as("__pn"))
    partial.groupBy(keyCols: _*)
      .agg(
        sum(col("__psum")).cast(DoubleType).as(s"sum_$valueCol"),
        sum(col("__pn")).as("n"))
  }

  /** Salted equi join for a skewed big side: the big side gets a
    * deterministic salt in [0, factor); the small side is replicated
    * `factor` times, so each hot-key partition lands on `factor` reducers.
    * Semantically identical to `big.join(small, key)`. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      salt(factor, big.columns.map(col).toSeq))
    val replicated = small
      .withColumn("__salt", explode(sequence(lit(0), lit(factor - 1))))
    saltedBig.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** 32-bit Morton (z-order) interleave of two int columns — sort by this
    * before writing and parquet min/max stats become selective for filters
    * on EITHER column (multi-dimensional clustering; the Iceberg/Delta
    * Z-ORDER rewrite). Pure bit arithmetic, codegen'd. */
  def zOrder2(a: Column, b: Column): Column = {
    // spread the low 16 bits of x to even bit positions
    def spread(x: Column): Column = {
      var v = x.cast("bigint").bitwiseAND(lit(0xFFFFL))
      v = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(lit(0x00FF00FFL))
      v = (v.bitwiseOR(shiftleft(v, 4))).bitwiseAND(lit(0x0F0F0F0FL))
      v = (v.bitwiseOR(shiftleft(v, 2))).bitwiseAND(lit(0x33333333L))
      v = (v.bitwiseOR(shiftleft(v, 1))).bitwiseAND(lit(0x55555555L))
      v
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Write a bucketed + sorted catalog table: joins and aggregations on the
    * bucket column then run shuffle-free (the write pays the partitioning
    * once; every subsequent query reuses it — the reference's Iceberg
    * tables would carry the same role via partition + sort order). */
  /** Skew diagnosis: the top `topN` hottest key values with exact counts
    * and corpus share (ppm, exact integer arithmetic) — the report you
    * read BEFORE reaching for [[saltedJoin]]/[[saltedSumCount]] (was the
    * hot key 1% or 40%?). One partial-aggregated count pass; the total
    * rides as a broadcast single row; top-N is TakeOrderedAndProject
    * with a deterministic (count desc, key) tie-break. */
  def skewReport(df: DataFrame, keyCol: String, topN: Int): DataFrame = {
    require(topN > 0, s"topN must be positive, got $topN")
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("n"))
    val total = df.agg(count(lit(1)).as("__t"))
    counts.crossJoin(broadcast(total))
      .select(col(keyCol), col("n"),
        expr("(n * 1000000) div __t").as("share_ppm"))
      .orderBy(desc("n"), col(keyCol))
      .limit(topN)
  }

  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
      numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)
}
