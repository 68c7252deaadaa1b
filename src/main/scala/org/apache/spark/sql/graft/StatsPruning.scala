package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

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

/** The parent listing filtered to the admitted files — NO re-listing:
  * the original relation already holds every FileStatus, so the pruned
  * relation reuses them (on an object store, re-listing N kept files
  * would be N HEAD calls the parent's one LIST already paid for). */
private[graft] final class PrunedFileIndex(
    parent: org.apache.spark.sql.execution.datasources.FileIndex,
    keepKeys: Set[String])
    extends org.apache.spark.sql.execution.datasources.FileIndex {
  private def kept(p: org.apache.hadoop.fs.Path): Boolean =
    keepKeys(GraftFileIndex.canonicalFileKey(p.toString))
  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = parent.rootPaths
  override def listFiles(
      partitionFilters: Seq[Expression], dataFilters: Seq[Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
    parent.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))
  override def inputFiles: Array[String] =
    parent.inputFiles.filter(f =>
      keepKeys(GraftFileIndex.canonicalFileKey(f)))
  override def refresh(): Unit = parent.refresh()
  override def sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files).map(_.getLen).sum
  override def partitionSchema: org.apache.spark.sql.types.StructType =
    parent.partitionSchema
}

case class PruneScanByFileStats(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!StatsPruning.hasRegistrations ||
        !spark.conf.get(StatsPruning.EnabledKey, "true").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(cond,
          rel @ LogicalRelation(hfsr: HadoopFsRelation, _, _, _, _))
          if hfsr.partitionSchema.isEmpty && !rel.isStreaming &&
            // already-pruned relations keep their parent rootPaths —
            // the type check is what makes the rule idempotent across
            // fixed-point optimizer iterations
            !hfsr.location.isInstanceOf[PrunedFileIndex] =>
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

      /** Equality conjunct -> its admission test over the stats row:
        * bloom when indexed (selective on unclustered layout), min/max
        * envelope otherwise. */
      def eqAdmit(c: String, l: Literal): Option[Column] = {
        val external =
          CatalystTypeConverters.convertToScala(l.value, l.dataType)
        if (external == null) None
        else if (statsCols(s"${c}_bloom"))
          Some(GraftFileIndex.bloomAdmits(stats, c, external))
        else if (hasRange(c))
          Some(colMax(c) >= litCol(l) && colMin(c) <= litCol(l))
        else None
      }
      def rangeAdmit(c: String, l: Literal,
          admit: => Column): Option[Column] =
        if (hasRange(c) && l.value != null) Some(admit) else None

      // per participating conjunct: the admission test its stats row
      // must pass. Null literals match nothing under every comparison —
      // leave them to the exact filter rather than reasoning here.
      // One-sided ranges read directly off the envelope: `c > v` can
      // only match files whose max exceeds v, etc.
      val admits: Seq[Column] = splitConjunctivePredicates(cond).flatMap {
        case EqualTo(a: AttributeReference, l: Literal) => eqAdmit(a.name, l)
        case EqualTo(l: Literal, a: AttributeReference) => eqAdmit(a.name, l)
        case GreaterThan(a: AttributeReference, l: Literal) =>
          rangeAdmit(a.name, l, colMax(a.name) > litCol(l))
        case LessThan(l: Literal, a: AttributeReference) =>
          rangeAdmit(a.name, l, colMax(a.name) > litCol(l))
        case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeAdmit(a.name, l, colMax(a.name) >= litCol(l))
        case LessThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeAdmit(a.name, l, colMax(a.name) >= litCol(l))
        case LessThan(a: AttributeReference, l: Literal) =>
          rangeAdmit(a.name, l, colMin(a.name) < litCol(l))
        case GreaterThan(l: Literal, a: AttributeReference) =>
          rangeAdmit(a.name, l, colMin(a.name) < litCol(l))
        case LessThanOrEqual(a: AttributeReference, l: Literal) =>
          rangeAdmit(a.name, l, colMin(a.name) <= litCol(l))
        case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
          rangeAdmit(a.name, l, colMin(a.name) <= litCol(l))
        case _ => None
      }
      if (admits.isEmpty) None
      else {
        // ONE stats pass answers both questions the rewrite needs —
        // which files the index describes, and which it admits (the
        // N+1-jobs-per-query shape this replaced dominated the rule's
        // constant; measured 0.7 s -> ~0.25 s per point query)
        import org.apache.spark.sql.functions.coalesce
        import org.apache.spark.sql.functions.lit
        val gate = GraftFileIndex.resolveNameGate(spark)
        val lim = math.min(gate + 1L, Int.MaxValue.toLong).toInt
        val pairs = stats.select(
            org.apache.spark.sql.functions.col("file"),
            coalesce(admits.reduce(_ && _), lit(false)).as("adm"))
          .limit(lim).collect()
        require(pairs.length <= gate,
          s"stats table exceeds the driver name-list gate ($gate); raise " +
            s"${GraftFileIndex.NameGateConfKey} or partition the index")
        val described = pairs
          .map(r => GraftFileIndex.canonicalFileKey(r.getString(0))).toSet
        val admitted = pairs.filter(_.getBoolean(1))
          .map(r => GraftFileIndex.canonicalFileKey(r.getString(0))).toSet
        val current = hfsr.location.inputFiles.toSeq
        val kept = current.filter { file =>
          val k = GraftFileIndex.canonicalFileKey(file)
          !described(k) || admitted(k)
        }
        if (kept.size >= current.size) None
        else {
          logInfo(s"graft stats pruning: ${current.size} -> ${kept.size} " +
            s"files for ${hfsr.location.rootPaths.head}")
          val prunedIndex = new PrunedFileIndex(hfsr.location,
            kept.map(GraftFileIndex.canonicalFileKey).toSet)
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
