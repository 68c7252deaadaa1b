package graft.typed

import java.math.{BigDecimal => JBigDecimal}

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed `Dataset[T]` surface over the silver schema — the idiomatic-Scala
  * hardening SURVEY.md §7 proposes (the reference itself is untyped
  * PySpark): case-class rows give compile-time field checks, and custom
  * typed aggregation runs through `Aggregator`.
  */
object TypedOps {

  final case class Order(o_orderkey: Long, o_custkey: Long,
      o_orderstatus: String, o_totalprice: Double)

  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
      .as[Order]
  }

  /** Exact monetary sum: accumulates in BigDecimal (2dp, the currency
    * grain) so the result is identical under any aggregation order —
    * the typed counterpart of the engine's decimal-sum-cast-double rule. */
  final class ExactMoneySum extends Aggregator[Order, JBigDecimal, Double] {
    override def zero: JBigDecimal = JBigDecimal.ZERO
    override def reduce(b: JBigDecimal, o: Order): JBigDecimal =
      b.add(new JBigDecimal(java.lang.Double.toString(o.o_totalprice))
        .setScale(2, java.math.RoundingMode.HALF_UP))
    override def merge(a: JBigDecimal, b: JBigDecimal): JBigDecimal = a.add(b)
    override def finish(r: JBigDecimal): Double = r.doubleValue()
    override def bufferEncoder: Encoder[JBigDecimal] = Encoders.DECIMAL
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Total spend per customer via typed groupByKey + Aggregator. */
  def spendByCustomer(ds: Dataset[Order]): DataFrame = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.o_custkey)
      .agg(new ExactMoneySum().toColumn.name("total_spend"))
      .toDF("o_custkey", "total_spend")
  }
}
