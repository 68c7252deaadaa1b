package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Expectations
import graft.operators.Expectations.Check

/** Declarative data-quality gate queries: the contract a lakehouse
  * evaluates before promoting a partition — per-check violation report
  * (row-level checks in ONE scan, plus key-uniqueness and referential
  * integrity rows) and the pass/quarantine split with per-row reasons. */
object QualityQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** The fixed lineitem contract: a mix of passing and failing rules so
    * the report exercises both outcomes. */
  private def lineitemChecks = Seq(
    Check("discount_cap", col("l_discount") <= 0.06),
    Check("linenumber_bounds", col("l_linenumber").between(1, 7)),
    Check("price_positive", col("l_extendedprice") > 0),
    Check("quantity_range", col("l_quantity").between(1, 45)),
    Check("returnflag_domain", col("l_returnflag").isin("A", "N", "R")),
    Check("shipdate_present", col("l_shipdate").isNotNull))

  /** q151: full expectation report — 6 row-level checks folded into one
    * lineitem scan, a key-uniqueness row over orders, and two
    * referential-integrity rows (lineitem→orders broadcast anti-join,
    * events→customer). */
  def q151Expectations(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    Expectations.report(li, lineitemChecks)
      .unionAll(Expectations.uniqueness(t(s, dir, "orders"),
        Seq("o_orderkey"), "orders_key_unique"))
      .unionAll(Expectations.refIntegrity(li, "l_orderkey",
        t(s, dir, "orders"), "o_orderkey", "lineitem_orders_ri"))
      .unionAll(Expectations.refIntegrity(t(s, dir, "events"), "user_id",
        t(s, dir, "customer"), "c_custkey", "events_customer_ri"))
      .orderBy(col("check"))
  }

  /** q152: the quarantine side of the split — every failing lineitem row
    * with its comma-joined failure reasons (declaration order), keyed. */
  def q152Quarantine(s: SparkSession, dir: String): DataFrame = {
    val (_, bad) = Expectations.quarantine(t(s, dir, "lineitem"),
      lineitemChecks)
    bad.select(col("l_orderkey"), col("l_linenumber"), col("reasons"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q151_expectations" -> (q151Expectations _),
    "q152_quarantine" -> (q152Quarantine _))

  /** Oracle mirrors: same predicate text, violations counted as
    * count(CASE WHEN coalesce(pred,false) THEN NULL ELSE 1 END). */
  private val checkSqls = Seq(
    "discount_cap" -> "l_discount <= 0.06",
    "linenumber_bounds" -> "l_linenumber BETWEEN 1 AND 7",
    "price_positive" -> "l_extendedprice > 0",
    "quantity_range" -> "l_quantity BETWEEN 1 AND 45",
    "returnflag_domain" -> "l_returnflag IN ('A','N','R')",
    "shipdate_present" -> "l_shipdate IS NOT NULL")

  private def reportRow(name: String, pred: String): String =
    s"""SELECT '$name' AS "check", count(*) AS n_rows,
       |  count(CASE WHEN coalesce($pred, false) THEN NULL ELSE 1 END)
       |    AS n_violations,
       |  count(CASE WHEN coalesce($pred, false) THEN NULL ELSE 1 END) = 0
       |    AS pass
       |FROM lineitem""".stripMargin

  def oracles: Map[String, String] = Map(
    "q151_expectations" -> (
      checkSqls.map { case (n, p) => reportRow(n, p) } ++ Seq(
        """SELECT 'orders_key_unique' AS "check", count(*) AS n_rows,
          |  count(*) - count(DISTINCT o_orderkey) AS n_violations,
          |  count(*) = count(DISTINCT o_orderkey) AS pass FROM orders"""
          .stripMargin,
        """SELECT 'lineitem_orders_ri' AS "check",
          |  (SELECT count(*) FROM lineitem) AS n_rows,
          |  count(*) AS n_violations, count(*) = 0 AS pass
          |FROM lineitem WHERE l_orderkey IS NOT NULL
          |  AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)"""
          .stripMargin,
        """SELECT 'events_customer_ri' AS "check",
          |  (SELECT count(*) FROM events) AS n_rows,
          |  count(*) AS n_violations, count(*) = 0 AS pass
          |FROM events WHERE user_id IS NOT NULL
          |  AND user_id NOT IN (SELECT c_custkey FROM customer)"""
          .stripMargin))
      .mkString("", "\nUNION ALL\n", "\nORDER BY \"check\""),
    "q152_quarantine" -> {
      val reasons = checkSqls.map { case (n, p) =>
        s"CASE WHEN coalesce($p, false) THEN NULL ELSE '$n' END"
      }.mkString(", ")
      s"""SELECT l_orderkey, l_linenumber,
         |  concat_ws(',', $reasons) AS reasons
         |FROM lineitem
         |WHERE concat_ws(',', $reasons) <> ''
         |ORDER BY l_orderkey, l_linenumber""".stripMargin
    })
}
