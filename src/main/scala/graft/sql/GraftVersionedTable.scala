package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.connector.catalog.{SupportsDelete, SupportsRead, SupportsRowLevelOperations, SupportsWrite, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, RowLevelOperation, RowLevelOperationBuilder, RowLevelOperationInfo, SupportsTruncate, V1Write, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.functions.{coalesce, col, lit, not}
import org.apache.spark.sql.sources
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pipeline.VersionedTable

/** The DSv2 face of a [[VersionedTable]] root — the Iceberg table shape
  * from plain SQL (reference: README.md:87-90 — the time-travel +
  * SQL-managed table claims):
  *
  *   - reads delegate to Spark's own parquet scan over the snapshot's
  *     RESOLVED data-dir list (append snapshots are multi-dir), so
  *     pushdown/pruning/vectorization are stock Spark;
  *   - `INSERT INTO` commits an INCREMENTAL append snapshot — O(new
  *     rows), prior data carried by reference (manifest `dirs=` list);
  *   - `INSERT OVERWRITE` / CTAS commit a full snapshot;
  *   - `DELETE FROM … WHERE` is copy-on-write at data-dir granularity:
  *     one metadata-column scan finds the dirs containing affected rows,
  *     untouched dirs carry into the new snapshot by reference, only
  *     affected dirs rewrite (Iceberg's CoW with file-level pruning,
  *     at this layer's dir granularity);
  *   - `TRUNCATE TABLE` commits an empty snapshot;
  *   - every mutation is a manifest commit: history stays
  *     time-travelable, and a write to a TIME-TRAVEL-pinned relation
  *     refuses (a snapshot is immutable by definition).
  *
  * The write path is a [[V1Write]]: the committed DataFrame is written
  * by the engine's own distributed parquet write — V1 here means "hand
  * the planned query back as a DataFrame", not a driver-side
  * materialization; at 100 TB the write is the same
  * `df.write.parquet` every pipeline stage uses. */
final class GraftVersionedTable(
    identName: String,
    root: String,
    pinnedVersion: Option[Long],
    spark: SparkSession)
  extends Table with SupportsRead with SupportsWrite with SupportsDelete
  with SupportsRowLevelOperations {

  private def dataDirs: Seq[String] =
    VersionedTable.dataDirs(root, pinnedVersion)

  /** Fresh per call: a snapshot commit between two loads must be
    * visible to the next scan (the catalog caches nothing). Partitioned
    * tables scan with `basePath` at the root — see
    * [[VersionedTable.readDirs]]: the snapshot level becomes a
    * partition column the projection never requests, and partition
    * pruning on the declared columns works across all snapshot dirs in
    * one relation. */
  private def delegate: ParquetTable = {
    val opts =
      if (VersionedTable.partitionColsOf(root).nonEmpty)
        new CaseInsensitiveStringMap(
          java.util.Collections.singletonMap("basePath", root))
      else CaseInsensitiveStringMap.empty()
    ParquetTable(identName, spark, opts, dataDirs,
      VersionedTable.storedSchema(root), classOf[ParquetFileFormat])
  }

  override def name(): String = identName

  /** The DECLARED schema when one exists — the delegate's would append
    * the internal snapshot-level partition column on partitioned
    * layouts (basePath discovery); analysis must never see it. */
  override def schema(): StructType =
    VersionedTable.storedSchema(root).getOrElse(delegate.schema)

  override def partitioning(): Array[Transform] =
    VersionedTable.partitionColsOf(root)
      .map(c => Expressions.identity(c)).toArray

  override def properties(): util.Map[String, String] =
    Map("location" -> root,
      "format" -> "parquet",
      "provider" -> "graft").asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(
      TableCapability.BATCH_READ,
      TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    delegate.newScanBuilder(options)

  // ---- writes ---------------------------------------------------------

  private def refusePinned(op: String): Unit =
    require(pinnedVersion.isEmpty,
      s"$op on $identName VERSION AS OF ${pinnedVersion.get}: snapshots " +
        "are immutable — write to the table, not to a point in its history")

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    refusePinned("write")
    new WriteBuilder with SupportsTruncate {
      private var overwriteAll = false
      override def truncate(): WriteBuilder = { overwriteAll = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: sources.InsertableRelation =
          new sources.InsertableRelation {
            override def insert(data: DataFrame, overwrite: Boolean): Unit =
              if (overwriteAll) VersionedTable.write(data, root)
              else VersionedTable.append(data, root)
          }
      }
    }
  }

  override def truncateTable(): Boolean = {
    refusePinned("TRUNCATE")
    VersionedTable.truncate(spark, root)
    true
  }

  // ---- UPDATE / MERGE INTO: group-based copy-on-write -----------------
  //
  // SQL `UPDATE` and `MERGE INTO` ride Spark's own group-based
  // row-level rewrite (RewriteUpdateTable / RewriteMergeIntoTable): the
  // operation's scan reads the current snapshot, the runtime plans the
  // full post-statement state, and the write below commits it as a new
  // snapshot — Iceberg's copy-on-write shape. Translatable `DELETE
  // FROM` still downgrades to the dir-granular metadata path above
  // (OptimizeMetadataOnlyDeleteFromTable consults canDeleteWhere);
  // untranslatable DELETEs now run the rewrite instead of erroring.
  // Scale note: without runtime group filtering the rewrite is
  // O(table) — the cost Iceberg CoW pays on its worst case; at 100 TB
  // the merge-on-read/delta path is the table-format seam documented
  // in SCALING.md.

  override def newRowLevelOperationBuilder(
      info: RowLevelOperationInfo): RowLevelOperationBuilder = {
    refusePinned(info.command.toString)
    () => new RowLevelOperation {
      override def command: RowLevelOperation.Command = info.command
      /** The rewrite's scan must read the WHOLE table: ReplaceData's
        * contract is "the write replaces exactly the groups the scan
        * read", and this table's write commits a full snapshot — one
        * group. A pushdown-capable scan here would let the planner
        * prune row groups by the command's condition and the rewrite
        * would silently DROP every unmatched row it pruned (observed:
        * an UPDATE whose condition pruned a parquet row group lost that
        * row group's rows). Exposing only build() refuses every
        * pushdown interface, so the scan is always the full table and
        * the full-snapshot commit is exact. File-granular CoW needs the
        * scan↔write group coordination a table format carries —
        * the Iceberg seam, SCALING.md. */
      override def newScanBuilder(
          options: CaseInsensitiveStringMap): ScanBuilder = {
        val inner = delegate.newScanBuilder(options)
        // column pruning stays (it also projects away the internal
        // snapshot-level partition column on partitioned layouts);
        // filter/aggregate/limit pushdown is deliberately absent
        new ScanBuilder with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns {
          override def pruneColumns(requiredSchema: StructType): Unit =
            inner match {
              case c: org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns =>
                c.pruneColumns(requiredSchema)
              case _ => ()
            }
          override def build(): org.apache.spark.sql.connector.read.Scan =
            inner.build()
        }
      }
      override def newWriteBuilder(wi: LogicalWriteInfo): WriteBuilder =
        new WriteBuilder {
          override def build(): Write = new GraftReplaceWrite(root, spark,
            wi, VersionedTable.partitionColsOf(root))
        }
    }
  }

  // ---- DELETE FROM: copy-on-write at data-dir granularity -------------

  override def canDeleteWhere(filters: Array[sources.Filter]): Boolean =
    pinnedVersion.isEmpty && filters.forall(translate(_).isDefined)

  override def deleteWhere(filters: Array[sources.Filter]): Unit = {
    refusePinned("DELETE")
    val pred = filters.flatMap(translate).reduceOption(_ && _)
      .getOrElse(lit(true))
    val dirs = dataDirs
    if (dirs.isEmpty) return // declared-but-empty table: nothing to delete
    val current = VersionedTable.read(spark, root)
    // ONE scan answers which data dirs contain affected rows — the
    // file-metadata column costs no data-column IO beyond the
    // predicate's own columns, and stock pushdown prunes the scan.
    // The dir VERSION is extracted distributed-side so the driver
    // collects at most |snapshot dirs| longs, never a file-path list
    // (the gated-collect discipline every other driver list follows).
    // The pattern is ANCHORED past the table root (regex-quoted last
    // root segment, the same anchoring dirVersionOf applies driver
    // side): an UNanchored "/v=(\d+)/" would match the FIRST such
    // segment anywhere in the path, so a warehouse rooted at, say,
    // /data/v=3/wh would resolve every file to the root's own segment
    // and the DELETE would silently keep matching rows (r13 advice).
    val touched = current
      .filter(pred)
      .select(org.apache.spark.sql.functions.regexp_extract(
        col("_metadata.file_path"),
        java.util.regex.Pattern.quote(s"/$rootTail") + "/v=(\\d+)/",
        1).as("dv"))
      .filter(col("dv") =!= "")
      .distinct()
      .collect()
      .map(_.getString(0).toLong)
      .toSet
    if (touched.isEmpty) return // no row matches: current snapshot stands
    val allVersions = dirs.flatMap(d => dirVersionOf(d + "/"))
    val kept = allVersions.filterNot(touched)
    // rewrite ONLY the touched dirs' survivors; DELETE drops rows where
    // the predicate is TRUE, so survivors are false-or-null rows
    val survivors = VersionedTable
      .readDirs(spark, root, touched.toSeq.sorted.map(v => s"$root/v=$v"))
      .filter(not(coalesce(pred, lit(false))))
    VersionedTable.replace(survivors, root, kept)
  }

  /** The owning `v=K` data version of a file path under this root, if
    * any (paths may be URI-qualified while `root` is not — match on
    * the `/v=K/` segment past the root's tail). */
  private def dirVersionOf(path: String): Option[Long] = {
    val marker = "/v="
    val i = path.indexOf(marker, math.max(0, path.indexOf(rootTail)))
    if (i < 0) None
    else path.substring(i + marker.length).takeWhile(_.isDigit).toLongOption
  }
  private val rootTail = root.substring(root.lastIndexOf('/') + 1)

  /** v1 source filter -> Column, the standard translatable subset; None
    * refuses the DELETE at analysis (canDeleteWhere) rather than
    * half-applying it. */
  private def translate(f: sources.Filter): Option[Column] = f match {
    case sources.EqualTo(a, v) => Some(col(a) === lit(v))
    case sources.EqualNullSafe(a, v) => Some(col(a) <=> lit(v))
    case sources.GreaterThan(a, v) => Some(col(a) > lit(v))
    case sources.GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case sources.LessThan(a, v) => Some(col(a) < lit(v))
    case sources.LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case sources.In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case sources.IsNull(a) => Some(col(a).isNull)
    case sources.IsNotNull(a) => Some(col(a).isNotNull)
    case sources.StringStartsWith(a, v) => Some(col(a).startsWith(v))
    case sources.StringEndsWith(a, v) => Some(col(a).endsWith(v))
    case sources.StringContains(a, v) => Some(col(a).contains(v))
    case sources.AlwaysTrue() => Some(lit(true))
    case sources.AlwaysFalse() => Some(lit(false))
    case sources.And(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc && rc
    case sources.Or(l, r) =>
      for (lc <- translate(l); rc <- translate(r)) yield lc || rc
    case sources.Not(c) => translate(c).map(!_)
    case _ => None
  }
}

/** The write half of a group-based row-level operation (ReplaceData):
  * the rewritten table state lands as a NEW snapshot via the engine's
  * own distributed parquet `BatchWrite` — executors write through
  * Spark's FileBatchWrite into the snapshot's directory, and the
  * driver-side commit() publishes the manifest, so a failed or aborted
  * rewrite is invisible (no manifest → no version, the VersionedTable
  * torn-write argument verbatim).
  *
  * Partitioned layouts: Spark's v2 file BatchWrite does not lay out
  * Hive partitions, so the rewrite stages flat (partition columns live
  * in the files) and commit() re-lays the staging dir into the
  * snapshot's declared `col=value` structure with one distributed
  * partitionBy pass, then removes the staging dir. That second pass is
  * bounded by the rewritten data, not the table. */
private final class GraftReplaceWrite(
    root: String,
    spark: SparkSession,
    info: LogicalWriteInfo,
    partitionCols: Seq[String]) extends Write {

  override def toBatch: BatchWrite = {
    val next = VersionedTable.latestVersion(root).getOrElse(0L) + 1L
    val target = s"$root/v=$next"
    val stagingDir =
      if (partitionCols.isEmpty) target
      else s"$root/.replace-staging-$next-${java.util.UUID.randomUUID().toString.take(8)}"
    val staged = ParquetTable("graft-replace-staging", spark,
      CaseInsensitiveStringMap.empty(), Seq(stagingDir),
      Some(info.schema()), classOf[ParquetFileFormat])
    val inner = staged.newWriteBuilder(info).build().toBatch

    new BatchWrite {
      override def createBatchWriterFactory(
          pi: PhysicalWriteInfo): DataWriterFactory =
        new GraftReplaceWriterFactory(
          inner.createBatchWriterFactory(pi), info.schema())

      // the file commit protocol coordinates its own task commits —
      // letting the V2 task ALSO ask the OutputCommitCoordinator
      // double-registers each partition and the second ask is denied
      override def useCommitCoordinator: Boolean =
        inner.useCommitCoordinator

      override def onDataWriterCommit(message: WriterCommitMessage): Unit =
        inner.onDataWriterCommit(message)

      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        inner.commit(messages)
        if (partitionCols.nonEmpty) {
          spark.read.schema(info.schema()).parquet(stagingDir)
            .write.partitionBy(partitionCols: _*).parquet(target)
          deleteDir(stagingDir)
        }
        // publish: the snapshot becomes visible only here
        VersionedTable.publishFull(root, next)
      }

      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        inner.abort(messages)
        deleteDir(stagingDir)
        if (stagingDir != target) deleteDir(target)
      }

      private def deleteDir(d: String): Unit = {
        val (fs, p) = graft.util.Fs.fsFor(d)
        fs.delete(p, true)
      }
    }
  }
}

/** Adapts the row stream a group-based ReplaceData produces to the
  * parquet data writer. When the operation declares no metadata
  * attributes, ReplaceDataExec falls back to the plain writing task
  * (`ReplaceDataExec.writingTask` requires BOTH projections) and hands
  * the writer the RAW rewrite rows — `__row_operation` int first, data
  * columns after (RowDeltaUtils.OPERATION_COLUMN; the projection-less
  * path is unexercised upstream because Iceberg always declares
  * metadata attrs). The adapter recognizes both shapes per row:
  * op-less rows (width == data schema) pass through; op-prefixed rows
  * are projected down to the data columns, with DELETE-op rows (1)
  * skipped defensively — group-based rewrites express deletes by
  * omission, so one should never appear; every other op code
  * (UPDATE/INSERT/REINSERT/WRITE/WRITE_WITH_METADATA = 2..6) writes.
  * The projection is built ON THE EXECUTOR (UnsafeProjection is not
  * serializable); the factory ships only the schema. */
private final class GraftReplaceWriterFactory(
    inner: DataWriterFactory,
    dataSchema: StructType) extends DataWriterFactory {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
  import org.apache.spark.sql.connector.write.DataWriter

  override def createWriter(partitionId: Int,
      taskId: Long): DataWriter[InternalRow] = {
    val w = inner.createWriter(partitionId, taskId)
    val stripOp = UnsafeProjection.create(
      dataSchema.fields.zipWithIndex.toSeq.map { case (f, i) =>
        BoundReference(i + 1, f.dataType, f.nullable) })
    new DataWriter[InternalRow] {
      override def write(r: InternalRow): Unit =
        if (r.numFields == dataSchema.length) w.write(r)
        else if (r.getInt(0) != 1) w.write(stripOp(r)) // 1 = DELETE op
      override def commit(): WriterCommitMessage = w.commit()
      override def abort(): Unit = w.abort()
      override def close(): Unit = w.close()
    }
  }
}
