package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Bronze→Silver cleansing operators, re-expressed as reusable declarative
  * transforms (capability parity with the reference's bronze→silver job —
  * reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:76-99).
  *
  * Everything here stays inside Catalyst: the narrowed projection and all
  * predicates are pushed into the parquet scan (`PushedFilters`/`ReadSchema`
  * in the physical plan), so at 100 TB only the referenced columns and
  * surviving row groups are read — no custom code path to defeat pushdown.
  */
object Cleanse {

  /** One output field of a schema normalization: source column, target name,
    * optional cast (P1 — UPPERCASE→snake_case + type coercion in the
    * reference). */
  final case class FieldSpec(from: Column, to: String,
      castTo: Option[DataType] = None)

  object FieldSpec {
    def apply(from: String, to: String): FieldSpec = FieldSpec(col(from), to)
    def apply(from: String, to: String, dt: DataType): FieldSpec =
      FieldSpec(col(from), to, Some(dt))
  }

  /** P1: project + rename + cast schema normalization in a single `select`
    * so column pruning reaches the scan. */
  def normalize(df: DataFrame, fields: Seq[FieldSpec]): DataFrame =
    df.select(fields.map { f =>
      f.castTo.map(f.from.cast).getOrElse(f.from).as(f.to)
    }: _*)

  /** P3: quality filter — keep rows whose measure is present and whose
    * quality flag is absent or empty
    * (reference: glue-jobs/noaa_ghcn_bronze_to_silver.py:86-90). */
  def qualityFilter(df: DataFrame, valueCol: String, qualityFlag: String): DataFrame =
    df.filter(col(valueCol).isNotNull &&
      (col(qualityFlag).isNull || col(qualityFlag) === ""))

  /** P4: non-empty join-key filter
    * (reference: glue-jobs/noaa_dimensions_bronze_to_silver.py:86-88). */
  def nonEmptyKey(df: DataFrame, key: String): DataFrame =
    df.filter(col(key).isNotNull && col(key) =!= "")

  /** P5: declared data-quality range rules (reference: README.md:90-94),
    * ANDed into one predicate so Catalyst can push them down together. */
  def rangeRules(df: DataFrame, rules: Seq[Column]): DataFrame =
    if (rules.isEmpty) df else df.filter(rules.reduce(_ && _))
}
