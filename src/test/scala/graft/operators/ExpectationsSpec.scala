package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Expectations.Check

class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def data = Seq(
    (1L, Some(10.0), "A"),
    (2L, Some(-5.0), "A"),    // fails positive
    (3L, Some(200.0), "X"),   // fails domain
    (4L, None, "A"),          // null amount: null predicate -> violation
    (5L, Some(50.0), null)    // null category -> isin null -> violation
  ).toDF("id", "amount", "cat")

  private def checks = Seq(
    Check("amount_positive", col("amount") > 0),
    Check("cat_domain", col("cat").isin("A", "B")))

  test("report counts violations per check in one scan") {
    val r = Expectations.report(data, checks).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2),
        x.getBoolean(3)))).toMap
    // -5 fails; null amount -> null predicate counts as violation
    assert(r("amount_positive") == ((5L, 2L, false)))
    // X fails, null-cat fails (null predicate counts as violation)
    assert(r("cat_domain") == ((5L, 2L, false)))
  }

  test("report is a single-scan aggregate: no join, no window") {
    val plan = Expectations.report(data, checks)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"join in plan:\n$plan")
    assert(!plan.contains("Window"), s"window in plan:\n$plan")
  }

  test("uniqueness flags duplicate keys") {
    val dup = data.unionAll(data.filter($"id" === 1L))
    val r = Expectations.uniqueness(dup, Seq("id"), "u").collect().head
    assert(r.getLong(1) == 6L && r.getLong(2) == 1L && !r.getBoolean(3))
    val ok = Expectations.uniqueness(data, Seq("id"), "u").collect().head
    assert(ok.getLong(2) == 0L && ok.getBoolean(3))
  }

  test("refIntegrity counts orphans, ignores null fact keys") {
    val fact = Seq(Some(1L), Some(2L), Some(99L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val r = Expectations.refIntegrity(fact, "fk", dim, "k", "ri")
      .collect().head
    assert(r.getLong(1) == 4L)   // n_rows counts all fact rows
    assert(r.getLong(2) == 1L)   // only 99 is an orphan; null not counted
    assert(!r.getBoolean(3))
  }

  test("refIntegrity broadcasts the dim keys (fact side never shuffles)") {
    val fact = Seq(1L, 2L).toDF("fk")
    val dim = Seq(1L).toDF("k")
    val plan = Expectations.refIntegrity(fact, "fk", dim, "k", "ri")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), s"no broadcast:\n$plan")
  }

  test("quarantine splits losslessly with declaration-order reasons") {
    val (good, bad) = Expectations.quarantine(data, checks)
    assert(good.count() + bad.count() == 5)
    val reasons = bad.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("reasons")).toMap
    assert(reasons(2L) == "amount_positive")
    assert(reasons(3L) == "cat_domain")
    assert(reasons(4L) == "amount_positive")
    assert(reasons(5L) == "cat_domain")
    assert(good.columns.toSeq == Seq("id", "amount", "cat")) // no residue
  }

  test("a row failing every check lists all reasons comma-joined") {
    val row = Seq((9L, -1.0, "Z")).toDF("id", "amount", "cat")
    val (_, bad) = Expectations.quarantine(row, checks)
    assert(bad.collect().head.getAs[String]("reasons") ==
      "amount_positive,cat_domain")
  }

  test("degenerate inputs rejected") {
    intercept[IllegalArgumentException] { Expectations.report(data, Nil) }
    intercept[IllegalArgumentException] {
      Expectations.report(data, Seq(checks.head, checks.head))
    }
    intercept[IllegalArgumentException] {
      Expectations.quarantine(data, Nil)
    }
  }
}
