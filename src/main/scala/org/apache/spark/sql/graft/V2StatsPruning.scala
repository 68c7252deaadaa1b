package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, PredicateHelper}
import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Scan, ScanBuilder, SupportsPushDownAggregates, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.execution.datasources.{FileStatusCache, PartitionDirectory, PartitioningAwareFileIndex, PartitionSpec}
import org.apache.spark.sql.execution.datasources.v2.parquet.{ParquetScan, ParquetScanBuilder}
import org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
import org.apache.spark.sql.types.StructType

import graft.operators.{FileIndex => GraftFileIndex}

/** AUTOMATIC file skipping for DSv2 parquet scans — the catalog-served
  * face of [[StatsPruning]] (r14). The v1 rule
  * ([[PruneScanByFileStats]]) matches `LogicalRelation` and therefore
  * never fires on `DataSourceV2Relation`s a
  * [[graft.sql.GraftProcedureCatalog]] serves; this builder closes
  * that gap AT THE SCAN, where the pushed filters and the file listing
  * meet anyway:
  *
  *   - every pushdown capability of the wrapped [[ParquetScanBuilder]]
  *     is forwarded verbatim (catalyst filters, column pruning,
  *     aggregate pushdown), so a catalog read loses nothing;
  *   - `build()` consults the registered stats tables with the SAME
  *     conjunct extraction and admission memoization as the v1 rule
  *     ([[StatsPruning.keepKeysFor]] — one gated stats pass per
  *     distinct (stats table, predicate), cached), and when files
  *     prune, rebuilds the [[ParquetScan]] around a filtered
  *     [[PrunedV2FileIndex]];
  *   - a versioned table's registration names the table ROOT while its
  *     scan roots at `v=N` dirs — [[StatsPruning.statsDirsFor]]'s
  *     parent hop resolves it, so ONE registration covers every
  *     snapshot, including time travel.
  *
  * Safety is inherited: admission is conservative (undescribed files
  * always read), aggregate-pushdown scans are never pruned (a pushed
  * `count(*)` computes from footers of ALL files — pruning would
  * change results; in practice aggregates only push when no filter is
  * present, so nothing would prune anyway — the guard makes the
  * invariant structural), and any stats failure degrades to the
  * unpruned scan. */
final class GraftStatsScanBuilder(
    spark: SparkSession,
    inner: ParquetScanBuilder)
  extends ScanBuilder
  with SupportsPushDownRequiredColumns
  with SupportsPushDownCatalystFilters
  with SupportsPushDownAggregates
  with PredicateHelper
  with org.apache.spark.internal.Logging {

  private var pushedCatalyst: Seq[Expression] = Nil

  override def pruneColumns(requiredSchema: StructType): Unit =
    inner.pruneColumns(requiredSchema)

  override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
    pushedCatalyst = filters
    inner.pushFilters(filters)
  }

  override def pushedFilters: Array[Predicate] = inner.pushedFilters

  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    inner.supportCompletePushDown(aggregation)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    inner.pushAggregation(aggregation)

  override def build(): Scan = {
    val built = inner.build()
    built match {
      case ps: ParquetScan
          if ps.pushedAggregate.isEmpty &&
            StatsPruning.hasRegistrations &&
            spark.conf.get(StatsPruning.EnabledKey, "true").toBoolean =>
        try prune(ps) catch {
          // a missing/unreadable stats table must degrade to a full
          // scan, never fail the query — advisory-index discipline
          case scala.util.control.NonFatal(e) =>
            logWarning(s"graft v2 stats pruning skipped: $e")
            ps
        }
      case s => s
    }
  }

  private def prune(ps: ParquetScan): Scan = {
    val conjuncts = PruneScanByFileStats.extractConjuncts(
      pushedCatalyst.flatMap(splitConjunctivePredicates))
    if (conjuncts.isEmpty) return ps
    val statsDirs = StatsPruning.statsDirsFor(ps.fileIndex.rootPaths)
    if (statsDirs.isEmpty) return ps
    StatsPruning.keepKeysFor(spark, statsDirs, conjuncts,
        ps.fileIndex.inputFiles.toSeq) match {
      case Some(keep) =>
        ps.copy(fileIndex = new PrunedV2FileIndex(spark, ps.fileIndex, keep))
      case None => ps
    }
  }
}

/** The v2 counterpart of [[PrunedFileIndex]]: the parent listing
  * filtered to the admitted canonical keys, NO re-listing. Must be a
  * [[PartitioningAwareFileIndex]] (the type [[ParquetScan]] carries);
  * the abstract members are served from the parent's public surface,
  * filtered, so partition pruning composes exactly as unpruned and the
  * dropped files simply vanish from every listing the scan takes. */
private[graft] final class PrunedV2FileIndex(
    spark: SparkSession,
    parent: PartitioningAwareFileIndex,
    keepKeys: Set[String])
  extends PartitioningAwareFileIndex(
    spark, Map.empty, None, FileStatusCache.getOrCreate(spark)) {

  private def kept(p: org.apache.hadoop.fs.Path): Boolean =
    keepKeys(GraftFileIndex.canonicalFileKey(p.toString))

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = parent.rootPaths

  override def partitionSpec(): PartitionSpec = parent.partitionSpec()

  override def leafFiles
      : scala.collection.mutable.LinkedHashMap[org.apache.hadoop.fs.Path,
        org.apache.hadoop.fs.FileStatus] = {
    val m = scala.collection.mutable.LinkedHashMap
      .empty[org.apache.hadoop.fs.Path, org.apache.hadoop.fs.FileStatus]
    parent.allFiles().foreach { f =>
      if (kept(f.getPath)) m.put(f.getPath, f)
    }
    m
  }

  override def leafDirToChildrenFiles
      : Map[org.apache.hadoop.fs.Path, Array[org.apache.hadoop.fs.FileStatus]] =
    parent.allFiles().filter(f => kept(f.getPath))
      .groupBy(f => f.getPath.getParent)
      .map { case (d, fs) => d -> fs.toArray }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    parent.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files = pd.files.filter(f => kept(f.getPath))))

  override def inputFiles: Array[String] =
    parent.inputFiles.filter(f => keepKeys(GraftFileIndex.canonicalFileKey(f)))

  override def refresh(): Unit = parent.refresh()

  // memoized: the planner asks repeatedly per plan
  override lazy val sizeInBytes: Long =
    listFiles(Nil, Nil).flatMap(_.files).map(_.getLen).sum
}
