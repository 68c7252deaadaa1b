package org.apache.spark.sql.graft

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  *     `statsForFiles`/`refreshStats` on the write path — or let the
  *     maintenance actions do it, [[StatsPruning.refreshRegistered]]).
  *
  * LAYOUT SCOPE (r13): Hive-partitioned layouts and multi-root scans
  * participate. Partition pruning COMPOSES with file pruning — the
  * [[PrunedFileIndex]] delegates `listFiles(partitionFilters, …)` to
  * the parent listing (so directory-level pruning happens exactly as
  * without the rule) and then drops non-admitted files within the
  * surviving partitions, the Iceberg skip-files-within-partitions
  * shape. A multi-root scan prunes per registered root; files under
  * unregistered roots are unknown to every stats table and therefore
  * always read.
  *
  * PLAN-TIME COST (r13): the driver pays one stats-table scan per
  * DISTINCT (stats table, extracted predicate) — results are memoized
  * in [[StatsPruning.admissionCache]] keyed by the stats directory's
  * modification time, so fixed-point re-runs within one optimization
  * and repeated queries across the session hit the cache. Staleness is
  * conservative by the same argument as rule safety: a stale entry can
  * only describe files that no longer exist, and the keep decision is
  * taken against the CURRENT listing, so unknown (new) files are kept.
  *
  * Idempotence rests on the `isInstanceOf[PrunedFileIndex]` guard: a
  * rewritten relation is recognized by its location type and left
  * untouched on later fixed-point iterations (NOT on root-path
  * divergence — [[PrunedFileIndex.rootPaths]] deliberately returns the
  * parent's roots verbatim so downstream path-identity checks hold).
  * Disable globally with `spark.graft.statsPruning.enabled=false`. */
object StatsPruning extends org.apache.spark.internal.Logging {

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
    invalidate(statsDir)
    ensureRule(spark)
  }

  def unregister(tableDir: String): Unit = registry.remove(canon(tableDir))

  def clear(): Unit = { registry.clear(); invalidateAll() }

  /** The stats dir registered for a table, if any — resolution is by
    * canonical path, same as the rule's. */
  def registeredStatsDir(tableDir: String): Option[String] =
    registry.get(canon(tableDir))

  def ensureRule(spark: SparkSession): Unit = synchronized {
    // a GraftExtensions-built session already carries the rule in its
    // optimizer (injectOptimizerRule); appending a second copy to
    // extraOptimizations would make every matched-but-unprunable
    // Filter pay the stats admission twice per optimization pass
    val injected =
      try spark.sessionState.optimizer.extendedOperatorOptimizationRules
        .exists(_.isInstanceOf[PruneScanByFileStats])
      catch { case scala.util.control.NonFatal(_) => false }
    val present = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[PruneScanByFileStats])
    if (!injected && !present)
      spark.experimental.extraOptimizations ++= Seq(PruneScanByFileStats(spark))
  }

  /** Stats tables registered for any of `rootPaths` — directly, or via
    * a bounded ANCESTOR walk: a [[graft.pipeline.VersionedTable]]
    * snapshot scan roots at `v=N` data dirs (one hop below the
    * registered root), a partitioned snapshot's or a
    * rewrite_manifests-collapsed snapshot's scan roots are FILES one
    * or two levels deeper still — so one ROOT registration covers
    * every read shape of a versioned table. Four levels bound
    * root/v=N/pcol=x/file; the registry is a tiny map, so the extra
    * lookups are free. */
  private[graft] def statsDirsFor(rootPaths: Seq[org.apache.hadoop.fs.Path])
      : Seq[String] =
    if (registry.isEmpty) Nil
    else rootPaths
      .flatMap { p =>
        Iterator.iterate(p)(_.getParent)
          .takeWhile(_ != null).take(4)
          .flatMap(a => registry.get(GraftFileIndex.canonicalFileKey(a.toString)))
          .nextOption()
      }
      .distinct

  private[graft] def hasRegistrations: Boolean = registry.nonEmpty

  // ---- plan-time memoization -----------------------------------------

  /** (statsDir, statsDir mtime, predicate key) ->
    *   None            = matched but unprunable (no participating
    *                     conjunct) — cached so the unprunable case pays
    *                     the stats read once, not once per fixed-point
    *                     iteration (the r12 advice finding). REFUSALS
    *                     (name-gate exceeded, unreadable stats) cache as
    *                     None too: same inputs → same refusal, and an
    *                     uncached refusal would re-pay the gated stats
    *                     collect on every fixed-point pass of every
    *                     query (measured 3× per query at 10⁵ described
    *                     files before r13 cached it);
    *   Some((described, admitted)) = the two canonical-key sets one
    *                     gated stats pass produced.
    * The mtime key self-invalidates on any stats rewrite (refresh,
    * swap); a same-second race reads STALE sets, which is conservative:
    * rewritten files have new names, stale sets describe only vanished
    * names, and the keep decision runs against the current listing. */
  private[graft] val admissionCache =
    TrieMap.empty[(String, Long, String), Option[(Set[String], Set[String])]]

  /** (session uuid, statsDir, mtime) -> loaded stats DataFrame, so the
    * schema-inference footer read is paid once per stats table version
    * per session rather than once per optimizer invocation. */
  private val statsDfCache = TrieMap.empty[(String, String, Long), DataFrame]

  private def invalidate(statsDir: String): Unit = {
    admissionCache.filterInPlace { case ((d, _, _), _) => d != statsDir }
    statsDfCache.filterInPlace { case ((_, d, _), _) => d != statsDir }
  }

  private[graft] def invalidateAll(): Unit = {
    admissionCache.clear(); statsDfCache.clear()
  }

  private def boundedPut[K, V](m: TrieMap[K, V], k: K, v: V): V = {
    // crude bound: these are per-(table, predicate-shape) entries — a
    // handful in any real workload; a pathological generator of unique
    // literals just degrades to the uncached constant
    if (m.size > 1024) m.clear()
    m.putIfAbsent(k, v)
    v
  }

  private[graft] def statsMtime(statsDir: String): Long = {
    val (fs, p) = graft.util.Fs.fsFor(statsDir)
    fs.getFileStatus(p).getModificationTime
  }

  private[graft] def loadStats(spark: SparkSession,
      statsDir: String, mtime: Long): DataFrame = {
    // identityHashCode keys the cache per live session object (a
    // DataFrame is session-bound); collisions after session GC would
    // only resurface a stale DataFrame for a statsDir+mtime that still
    // exists — same bytes, so still correct
    val key = (System.identityHashCode(spark).toString, statsDir, mtime)
    statsDfCache.get(key)
      .getOrElse(boundedPut(statsDfCache, key, spark.read.parquet(statsDir)))
  }

  // ---- admission (shared by the v1 rule and the v2 scan builder) ------

  import PruneScanByFileStats.{CmpEq, CmpGe, CmpGt, CmpLe, CmpLt, Conjunct, conjKey}

  /** Memoized admission for one stats table: the (described, admitted)
    * canonical-key sets for this predicate, or None when no conjunct
    * participates in this table's columns. One gated stats job on
    * cache miss; zero on hit. */
  private[graft] def admissionFor(spark: SparkSession, statsDir: String,
      conjuncts: Seq[Conjunct]): Option[(Set[String], Set[String])] = {
    val mtime = statsMtime(statsDir)
    // the resolved name gate is part of the key: a gate-exceeded refusal
    // is cached, and the cached refusal must stop applying the moment the
    // user raises the gate conf (r13 advice: a key without the gate made
    // the documented remedy — raise the conf — a no-op until the stats
    // table's mtime happened to change)
    val gate = GraftFileIndex.resolveNameGate(spark)
    val key = (statsDir, mtime, s"gate=$gate&${conjKey(conjuncts)}")
    admissionCache.get(key).getOrElse {
      val computed =
        try computeAdmission(spark, statsDir, mtime, conjuncts)
        catch {
          // refusal (name gate, unreadable stats rows): degrade to "no
          // pruning from this table" and CACHE it — the mtime key
          // re-admits the table as soon as its stats change; warning
          // once per (table version, predicate), not once per
          // fixed-point pass
          case scala.util.control.NonFatal(e) =>
            logWarning(s"graft stats pruning skipped for $statsDir " +
              s"(cached until the stats table changes): $e")
            None
        }
      if (admissionCache.size > 1024) admissionCache.clear()
      admissionCache.putIfAbsent(key, computed)
      computed
    }
  }

  private def computeAdmission(spark: SparkSession, statsDir: String,
      mtime: Long, conjuncts: Seq[Conjunct])
      : Option[(Set[String], Set[String])] = {
    val stats = loadStats(spark, statsDir, mtime)
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
    // must pass. One-sided ranges read directly off the envelope:
    // `c > v` can only match files whose max exceeds v, etc.
    val admits: Seq[Column] = conjuncts.flatMap {
      case Conjunct(CmpEq, c, l) => eqAdmit(c, l)
      case Conjunct(CmpGt, c, l) => rangeAdmit(c, l, colMax(c) > litCol(l))
      case Conjunct(CmpGe, c, l) => rangeAdmit(c, l, colMax(c) >= litCol(l))
      case Conjunct(CmpLt, c, l) => rangeAdmit(c, l, colMin(c) < litCol(l))
      case Conjunct(CmpLe, c, l) => rangeAdmit(c, l, colMin(c) <= litCol(l))
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
      Some((described, admitted))
    }
  }

  /** The keep-set for a CURRENT file listing under this predicate, or
    * None when nothing prunes — the shared decision both integration
    * points apply: a file is dropped only when some registered stats
    * table describes it and every describing table refuses it. */
  private[graft] def keepKeysFor(spark: SparkSession,
      statsDirs: Seq[String], conjuncts: Seq[Conjunct],
      currentFiles: Seq[String]): Option[Set[String]] = {
    val perDir = statsDirs.flatMap(admissionFor(spark, _, conjuncts))
    if (perDir.isEmpty) None
    else {
      val kept = currentFiles.filter { file =>
        val k = GraftFileIndex.canonicalFileKey(file)
        perDir.forall { case (described, admitted) =>
          !described(k) || admitted(k)
        }
      }
      if (kept.size >= currentFiles.size) None
      else Some(kept.map(GraftFileIndex.canonicalFileKey).toSet)
    }
  }

  // ---- maintenance integration ---------------------------------------

  /** Refresh the registered stats table after a layout rewrite
    * (compaction, z-order, partition evolution) — the wiring that keeps
    * automatic pruning effective across maintenance with no manual
    * step: without it, a compaction leaves the index describing only
    * vanished files and every query silently degrades to a full scan
    * until someone re-registers. Column set and bloom sizing are read
    * back from the standing stats table itself
    * ([[graft.operators.FileIndex.refreshStatsAuto]]), the rewrite
    * lands in a sibling `.new` dir and swaps in atomically
    * ([[graft.util.Fs.swapInNewFs]] — same protocol as every other
    * rename commit), and the plan-time caches invalidate. Returns a
    * detail string when a registered table was refreshed; None when
    * the table has no registration (the common case — callers chain
    * this unconditionally). Failures degrade to advisory staleness
    * (conservative: the pruning contract keeps unknown files), so a
    * refresh error must not fail the maintenance action that
    * triggered it — it is reported in the detail instead. */
  def refreshRegistered(spark: SparkSession, tableDir: String)
      : Option[String] =
    registeredStatsDir(tableDir).map { statsDir =>
      try {
        val stats = spark.read.parquet(statsDir)
        val refreshed =
          GraftFileIndex.refreshStatsAuto(spark, tableDir, stats)
        val (fs, p) = graft.util.Fs.fsFor(statsDir)
        refreshed.write.mode("overwrite").parquet(statsDir + ".new")
        graft.util.Fs.swapInNewFs(fs, p)
        invalidate(statsDir)
        s"stats index refreshed: $statsDir"
      } catch {
        case scala.util.control.NonFatal(e) =>
          invalidate(statsDir)
          s"stats index refresh FAILED (pruning degrades to stale-" +
            s"conservative until refreshStats): $e"
      }
    }
}

/** The parent listing filtered to the admitted files — NO re-listing:
  * the original relation already holds every FileStatus, so the pruned
  * relation reuses them (on an object store, re-listing N kept files
  * would be N HEAD calls the parent's one LIST already paid for).
  * Partition-aware by delegation: `listFiles` hands the partition
  * filters to the parent (directory pruning unchanged) and drops
  * non-admitted files from the surviving partition directories. */
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
  // memoized: the planner asks for size estimates repeatedly per plan,
  // and each call was an O(kept files) walk over the parent listing
  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files).map(_.getLen).sum
  override def partitionSchema: org.apache.spark.sql.types.StructType =
    parent.partitionSchema
}

case class PruneScanByFileStats(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  import PruneScanByFileStats._

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!StatsPruning.hasRegistrations ||
        !spark.conf.get(StatsPruning.EnabledKey, "true").toBoolean) plan
    else plan.transformDown {
      case f @ Filter(cond,
          rel @ LogicalRelation(hfsr: HadoopFsRelation, _, _, _, _))
          if !rel.isStreaming &&
            // already-pruned relations keep their parent rootPaths —
            // the type check is what makes the rule idempotent across
            // fixed-point optimizer iterations
            !hfsr.location.isInstanceOf[PrunedFileIndex] =>
        val statsDirs = StatsPruning.statsDirsFor(hfsr.location.rootPaths)
        if (statsDirs.isEmpty) f
        else prune(f, cond, rel, hfsr, statsDirs).getOrElse(f)
    }
  }

  private def prune(f: Filter, cond: Expression, rel: LogicalRelation,
      hfsr: HadoopFsRelation, statsDirs: Seq[String]): Option[LogicalPlan] =
    try {
      val conjuncts = extractConjuncts(splitConjunctivePredicates(cond))
      if (conjuncts.isEmpty) None
      else {
        // per registered stats table: its (described, admitted) sets;
        // a file must be admitted by EVERY table that describes it
        // (disjoint tables in practice — per-root indexes — but the
        // all-tables fold is the conservative composition either way)
        StatsPruning.keepKeysFor(spark, statsDirs, conjuncts,
            hfsr.location.inputFiles.toSeq).map { keep =>
          logInfo(s"graft stats pruning: " +
            s"${hfsr.location.inputFiles.length} -> ${keep.size} " +
            s"files for ${hfsr.location.rootPaths.head}")
          val prunedIndex = new PrunedFileIndex(hfsr.location, keep)
          // same output attributes: the Filter's references still bind
          f.copy(child =
            rel.copy(relation = hfsr.copy(location = prunedIndex)(spark)))
        }
      }
    } catch {
      // a missing/unreadable stats table must degrade to a full scan,
      // never fail the user's query — advisory-index discipline
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft stats pruning skipped for " +
          s"${statsDirs.mkString(",")}: $e")
        None
    }
}

object PruneScanByFileStats {

  /** One extractable comparison conjunct, literal normalized to the
    * right — the value-level key the admission memoization hashes on
    * (attribute exprIds and Column identities deliberately absent, so
    * the same predicate TEXT in two queries shares one cache entry). */
  private[graft] sealed trait Cmp
  private[graft] case object CmpEq extends Cmp
  private[graft] case object CmpGt extends Cmp
  private[graft] case object CmpGe extends Cmp
  private[graft] case object CmpLt extends Cmp
  private[graft] case object CmpLe extends Cmp

  private[graft] final case class Conjunct(cmp: Cmp, col: String,
      lit: Literal)

  private[graft] def extractConjuncts(
      preds: Seq[Expression]): Seq[Conjunct] = preds.flatMap {
    case EqualTo(a: AttributeReference, l: Literal) =>
      Some(Conjunct(CmpEq, a.name, l))
    case EqualTo(l: Literal, a: AttributeReference) =>
      Some(Conjunct(CmpEq, a.name, l))
    case GreaterThan(a: AttributeReference, l: Literal) =>
      Some(Conjunct(CmpGt, a.name, l))
    case LessThan(l: Literal, a: AttributeReference) =>
      Some(Conjunct(CmpGt, a.name, l))
    case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
      Some(Conjunct(CmpGe, a.name, l))
    case LessThanOrEqual(l: Literal, a: AttributeReference) =>
      Some(Conjunct(CmpGe, a.name, l))
    case LessThan(a: AttributeReference, l: Literal) =>
      Some(Conjunct(CmpLt, a.name, l))
    case GreaterThan(l: Literal, a: AttributeReference) =>
      Some(Conjunct(CmpLt, a.name, l))
    case LessThanOrEqual(a: AttributeReference, l: Literal) =>
      Some(Conjunct(CmpLe, a.name, l))
    case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
      Some(Conjunct(CmpLe, a.name, l))
    case _ => None
  }

  /** Cache key text for a conjunct set: order-insensitive, value-level
    * (literal value + type, never expression identity). Null literals
    * are representable but never admitted (eqAdmit/rangeAdmit skip
    * them), matching pre-memoization behavior. */
  private[graft] def conjKey(cs: Seq[Conjunct]): String =
    cs.map(c =>
        s"${c.cmp}(${c.col},${String.valueOf(c.lit.value)}:${c.lit.dataType.catalogString})")
      .sorted.mkString("&")
}
