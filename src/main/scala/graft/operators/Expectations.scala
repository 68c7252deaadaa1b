package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations over a table — the contract gate
  * a lakehouse runs before promoting a partition (the Deequ/DBT-tests
  * shape, re-expressed as single-pass Spark aggregation).
  *
  * Two check classes with different scale shapes:
  *   - ROW-LEVEL predicates (not-null, range, set, regex, cross-column):
  *     ALL checks fold into ONE aggregation over ONE scan — k checks cost
  *     one `sum(when(!p,1))` each, partial+final, no shuffle wider than
  *     one row. At 100 TB this is the same pass that computes any other
  *     ingest stat; adding a check is free.
  *   - DATASET-LEVEL checks (key uniqueness, referential integrity):
  *     each is its own aggregate/join — uniqueness is count vs
  *     count(distinct) in the same single-pass agg; referential
  *     integrity is a broadcast-able semi-join against the dimension's
  *     key column only (never the fact side shuffled).
  *
  * [[quarantine]] splits rows into pass/fail WITH per-row reasons in one
  * projection (no second scan, no join back): the reason string is a
  * null-skipping concat of per-check `when` markers, so the split is
  * codegen'd row-local work.
  */
object Expectations {

  /** One named row-level expectation: rows where `predicate` is false
    * (or null) are violations. */
  final case class Check(name: String, predicate: Column)

  private def viol(c: Check): Column =
    when(coalesce(c.predicate, lit(false)), lit(null)).otherwise(lit(1))

  /** Per-check violation report, ONE scan for all row-level checks.
    * Output: (check, n_rows, n_violations, pass) ordered by check name. */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks declared")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names")
    val aggs = count(lit(1)).as("__n") +:
      checks.map(c => count(viol(c)).as(s"__v_${c.name}"))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val stacked = checks.map { c =>
      struct(lit(c.name).as("check"), col("__n").as("n_rows"),
        col(s"__v_${c.name}").as("n_violations"),
        (col(s"__v_${c.name}") === 0).as("pass"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
      .orderBy(col("check"))
  }

  /** Key-uniqueness check as a report row: n_violations = n_rows minus
    * distinct keys (0 ⇔ the column set is a key). Same output schema as
    * [[report]] so callers union the two. */
  def uniqueness(df: DataFrame, keyCols: Seq[String],
      name: String): DataFrame = {
    require(keyCols.nonEmpty, "uniqueness needs key columns")
    df.agg(count(lit(1)).as("__n"),
        countDistinct(col(keyCols.head), keyCols.tail.map(col): _*)
          .as("__nd"))
      .select(lit(name).as("check"), col("__n").as("n_rows"),
        (col("__n") - col("__nd")).as("n_violations"),
        (col("__n") === col("__nd")).as("pass"))
  }

  /** Referential-integrity check as a report row: violations = fact rows
    * whose (non-null) `factKey` has no match in `dim.dimKey`. The dim is
    * reduced to its distinct key column and broadcast when small — the
    * fact side never shuffles. */
  def refIntegrity(fact: DataFrame, factKey: String, dim: DataFrame,
      dimKey: String, name: String): DataFrame = {
    val keys = dim.select(col(dimKey).as("__k")).distinct()
    val orphans = fact
      .filter(col(factKey).isNotNull)
      .join(broadcast(keys), col(factKey) === col("__k"), "left_anti")
    fact.agg(count(lit(1)).as("__n"))
      .crossJoin(orphans.agg(count(lit(1)).as("__o")))
      .select(lit(name).as("check"), col("__n").as("n_rows"),
        col("__o").as("n_violations"), (col("__o") === 0).as("pass"))
  }

  /** Split into (passing, quarantined) in one row-local projection.
    * Quarantined rows carry `reasons`: comma-joined names of every
    * failed check, in declaration order (concat_ws skips the nulls of
    * passing checks — engine-portable, no array functions needed). */
  def quarantine(df: DataFrame, checks: Seq[Check])
      : (DataFrame, DataFrame) = {
    require(checks.nonEmpty, "no checks declared")
    val reasons = concat_ws(",",
      checks.map(c => when(coalesce(c.predicate, lit(false)), lit(null))
        .otherwise(lit(c.name))): _*)
    val tagged = df.withColumn("reasons", reasons)
    (tagged.filter(col("reasons") === "").drop("reasons"),
      tagged.filter(col("reasons") =!= ""))
  }
}
