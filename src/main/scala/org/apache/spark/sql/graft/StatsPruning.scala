package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

import graft.operators.{FileIndex => GraftFileIndex}

/** AUTOMATIC planner-time file skipping from a materialized
  * [[graft.operators.FileIndex]] stats table — the Catalyst rule that
  * makes the index transparent to SQL: once a table directory is
  * [[StatsPruning.register]]ed, `SELECT … FROM t WHERE k = 42` reads
  * only the files whose bloom/min-max stats admit `k = 42`, with no
  * code change in the query (the Iceberg/Delta data-skipping shape, on
  * the parquet path — the one place the engine's semantics genuinely
  * need a custom `Rule[LogicalPlan]` rather than a built-in).
  *
  * CONSERVATIVE BY CONSTRUCTION — the safety argument, in order:
  *  1. only equality and one-sided range conjuncts on columns the
  *     stats table indexes participate (equality via bloom when
  *     present, envelope otherwise; ranges via the min/max envelope);
  *     everything else leaves the plan untouched.
  *  2. a file is dropped ONLY when the index describes it AND every
  *     participating predicate's candidate set excludes it. Files the
  *     index has never seen (appended after the last stats refresh)
  *     are always read — a stale index wastes IO, it cannot lose rows.
  *  3. the Filter node itself is untouched: bloom false positives and
  *     min/max envelope slack are discharged by the exact predicate,
  *     so a pruned plan's RESULT equals the unpruned plan's whenever
  *     the index rows are truthful about the files they describe
  *     (the index-integrity contract: maintain stats through
  *     `statsForFiles`/`refreshStats` on the write path, like any
  *     secondary index).
  *
  * Scope guards: single-root unpartitioned relations only (Hive
  * partition pruning already owns partitioned layouts), driver cost is
  * one tiny stats-table scan per matched query (bounded by
  * [[graft.operators.FileIndex.resolveNameGate]] like every name
  * collect), and a rewritten relation's root paths are its FILES — they
  * no longer match any registered root, so the rule is idempotent
  * across optimizer iterations. Disable globally with
  * `spark.graft.statsPruning.enabled=false`. */
object StatsPruning {

  val EnabledKey = "spark.graft.statsPruning.enabled"

  // canonical table root -> stats table path; process-wide like the
  // session-cache registries in ExtQueries (a registration names disk
  // layout, not session state)
  private val registry = TrieMap.empty[String, String]

  private def canon(path: String): String =
    GraftFileIndex.canonicalFileKey(
      graft.util.Fs.fsFor(path)._2.toString)

  /** Register `tableDir`'s stats table and make sure the rule runs in
    * `spark` (idempotently appended to `experimental.extraOptimizations`
    * for sessions not built with GraftExtensions). */
  def register(spark: SparkSession, tableDir: String,
      statsDir: String): Unit = {
    registry.put(canon(tableDir), statsDir)
    ensureRule(spark)
  }

  def unregister(tableDir: String): Unit = registry.remove(canon(tableDir))

  def clear(): Unit = registry.clear()

  def ensureRule(spark: SparkSession): Unit = synchronized {
    val present = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[PruneScanByFileStats])
    if (!present)
      spark.experimental.extraOptimizations ++= Seq(PruneScanByFileStats(spark))
  }

  private[graft] def statsDirFor(rootPaths: Seq[org.apache.hadoop.fs.Path])
      : Option[String] =
    if (registry.isEmpty || rootPaths.size != 1) None
    else registry.get(GraftFileIndex.canonicalFileKey(rootPaths.head.toString))

  private[graft] def hasRegistrations: Boolean = registry.nonEmpty
}

case class PruneScanByFileStats(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!StatsPruning.hasRegistrations ||
        !spark.conf.get(StatsPruning.EnabledKey, "true").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(cond,
          rel @ LogicalRelation(hfsr: HadoopFsRelation, _, _, _, _))
          if hfsr.partitionSchema.isEmpty && !rel.isStreaming =>
        StatsPruning.statsDirFor(hfsr.location.rootPaths)
          .flatMap(prune(f, cond, rel, hfsr, _)).getOrElse(f)
    }
  }

  private def prune(f: Filter, cond: Expression, rel: LogicalRelation,
      hfsr: HadoopFsRelation, statsDir: String): Option[LogicalPlan] =
    try {
      val stats = spark.read.parquet(statsDir)
      val statsCols = stats.columns.toSet
      def hasRange(c: String) =
        statsCols(s"${c}_min") && statsCols(s"${c}_max")
      def colMin(c: String) =
        org.apache.spark.sql.functions.col(s"${c}_min")
      def colMax(c: String) =
        org.apache.spark.sql.functions.col(s"${c}_max")
      def litCol(l: Literal) = ExpressionUtils.column(l)

      /** Equality conjunct -> admitted files: bloom when indexed
        * (selective on unclustered layout), min/max envelope otherwise. */
      def eqSet(c: String, l: Literal): Option[Seq[String]] = {
        val external =
          CatalystTypeConverters.convertToScala(l.value, l.dataType)
        if (external == null) None
        else if (statsCols(s"${c}_bloom"))
          Some(GraftFileIndex.candidateFilesEquals(stats, c, external))
        else if (hasRange(c))
          Some(GraftFileIndex.candidateFiles(stats, c, litCol(l), litCol(l)))
        else None
      }
      def rangeSet(c: String, l: Literal,
          admit: org.apache.spark.sql.Column): Option[Seq[String]] =
        if (hasRange(c) && l.value != null)
          Some(GraftFileIndex.candidateFilesWhere(stats, admit,
            s"range probe on $c"))
        else None

      // per participating conjunct: the files whose stats ADMIT it.
      // Null literals match nothing under every comparison — leave them
      // to the exact filter rather than reasoning about them here.
      // One-sided ranges read directly off the envelope: `c > v` can
      // only match files whose max exceeds v, etc.
      val admittedSets = splitConjunctivePredicates(cond).flatMap {
        case EqualTo(a: AttributeReference, l: Literal) => eqSet(a.name, l)
        case EqualTo(l: Literal, a: AttributeReference) => eqSet(a.name, l)
        case GreaterThan(a: AttributeReference, l: Literal) =>
          rangeSet(a.name, l, colMax(a.name) > litCol(l))
        case LessThan(l: Literal, a: AttributeReference) =>
          rangeSet(a.name, l, colMax(a.name) > litCol(l))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeSet(a.name, l, colMax(a.name) >= litCol(l))
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeSet(a.name, l, colMax(a.name) >= litCol(l))
        case LessThan(a: AttributeReference, l: Literal) =>
          rangeSet(a.name, l, colMin(a.name) < litCol(l))
        case GreaterThan(l: Literal, a: AttributeReference) =>
          rangeSet(a.name, l, colMin(a.name) < litCol(l))
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeSet(a.name, l, colMin(a.name) <= litCol(l))
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeSet(a.name, l, colMin(a.name) <= litCol(l))
        case _ => None
      }
      if (admittedSets.isEmpty) None
      else {
        val admitted = admittedSets
          .map(_.map(GraftFileIndex.canonicalFileKey).toSet)
          .reduce(_ intersect _)
        val described = GraftFileIndex.describedFiles(stats)
          .map(GraftFileIndex.canonicalFileKey).toSet
        val current = hfsr.location.inputFiles.toSeq
        val kept = current.filter { file =>
          val k = GraftFileIndex.canonicalFileKey(file)
          !described(k) || admitted(k)
        }
        if (kept.size >= current.size) None
        else {
          logInfo(s"graft stats pruning: ${current.size} -> ${kept.size} " +
            s"files for ${hfsr.location.rootPaths.head}")
          val prunedIndex = new InMemoryFileIndex(spark,
            kept.map(new org.apache.hadoop.fs.Path(_)),
            hfsr.options, Some(hfsr.dataSchema))
          // same output attributes: the Filter's references still bind
          Some(f.copy(child =
            rel.copy(relation = hfsr.copy(location = prunedIndex)(spark))))
        }
      }
    } catch {
      // a missing/unreadable stats table must degrade to a full scan,
      // never fail the user's query — advisory-index discipline
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft stats pruning skipped for $statsDir: $e")
        None
    }
}
