package graft.sql

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read.{LocalScan, Scan, ScanBuilder}
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.pipeline.VersionedTable

/** Iceberg's metadata-table shape for versioned roots (r14):
  * `SELECT * FROM <cat>.<ns>.<t>.history` (alias `snapshots`) serves
  * the snapshot listing — one row per RETAINED version with commit
  * time, resolved data version, and currency — the exact rows the
  * `graft_history` TVF serves, so the two front doors agree by
  * construction (both fold [[VersionedTable.history]]). Rows are
  * |versions|-bounded driver rows computed AT SCAN time (a commit
  * between analysis and execution is visible, like every other
  * catalog read here). */
final class GraftMetadataTable(
    identName: String,
    root: String,
    metaName: String,
    pinned: Option[Long] = None) extends Table with SupportsRead {

  override def name(): String = identName

  private def isRefs: Boolean = metaName == "refs"
  private def isFiles: Boolean = metaName == "files"
  private def isPartitions: Boolean = metaName == "partitions"

  override def schema(): StructType =
    if (isRefs) GraftMetadataTable.RefsSchema
    else if (isFiles) GraftMetadataTable.FilesSchema
    else if (isPartitions) GraftMetadataTable.PartitionsSchema
    else GraftMetadataTable.HistorySchema

  override def properties(): util.Map[String, String] =
    Map("location" -> root, "metadata" -> metaName).asJava

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  /** `refs`/`history` rows are |refs|/|versions|-bounded driver rows —
    * a [[LocalScan]] is the right shape. `files` rows are FILE-COUNT
    * sized, so that view serves as a DISTRIBUTED scan instead (r15): a
    * [[org.apache.spark.sql.connector.read.V1Scan]] whose relation
    * plans [[VersionedTable.filesView]]'s executor-side listing —
    * `SELECT * FROM t.files` on a million-file table never
    * materializes a driver-side row list (Iceberg's files metadata
    * table is distributed for the same reason). */
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder =
    if (isFiles || isPartitions)
      () => new org.apache.spark.sql.connector.read.V1Scan {
      override def readSchema(): StructType = schema()
      override def toV1TableScan[
          T <: org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan](
          context: org.apache.spark.sql.SQLContext): T =
        (new org.apache.spark.sql.sources.BaseRelation
            with org.apache.spark.sql.sources.TableScan {
          override def sqlContext: org.apache.spark.sql.SQLContext = context
          override def schema: StructType =
            GraftMetadataTable.this.schema()
          override def buildScan()
              : org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
            // `pinned` (r16): `t.files VERSION AS OF v` serves the
            // HISTORICAL snapshot's listing — the same per-snapshot
            // addressing the graft_files/graft_partitions TVFs already
            // take as their second argument, so the two front doors
            // stay symmetric
            (if (isPartitions)
              VersionedTable.partitionsView(context.sparkSession, root,
                pinned)
            else VersionedTable.filesView(context.sparkSession, root,
              pinned)).rdd
          override def toString: String = "GraftDistributedFilesRelation"
        }).asInstanceOf[T]
      override def description(): String =
        s"graft $metaName of $root (distributed)"
    }
    else () => new LocalScan {
      override def readSchema(): StructType = schema()
      override def rows(): Array[InternalRow] = {
        val spark = SparkSession.active
        if (isRefs)
          VersionedTable.refs(spark, root).collect().map { r =>
            InternalRow(
              org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)),
              org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(1)),
              r.getLong(2),
              r.getTimestamp(3).getTime * 1000L) // micros
          }
        else
          VersionedTable.history(spark, root).collect().map { r =>
            InternalRow(
              r.getLong(0),
              r.getTimestamp(1).getTime * 1000L, // micros
              r.getLong(2),
              r.getBoolean(3),
              org.apache.spark.unsafe.types.UTF8String
                .fromString(r.getString(4)))
          }
      }
      override def description(): String = s"graft $metaName of $root"
    }
}

object GraftMetadataTable {
  /** Recognized metadata-view names (`history` is the TVF's name;
    * `snapshots` the Iceberg spelling; `refs` lists tags and `files`
    * the current snapshot's data files, r14; `partitions` the
    * per-partition stats, r15). */
  val Names: Set[String] =
    Set("history", "snapshots", "refs", "files", "partitions")

  private[sql] val HistorySchema = StructType(Seq(
    StructField("version", LongType, nullable = false),
    StructField("committed_at", TimestampType, nullable = false),
    StructField("data_version", LongType, nullable = false),
    StructField("is_current", BooleanType, nullable = false),
    // the commit kind (r15, Iceberg's snapshot operation field);
    // "unknown" for pre-r15 manifests
    StructField("operation", org.apache.spark.sql.types.StringType,
      nullable = false)))

  private[sql] val FilesSchema = StructType(Seq(
    StructField("file_path", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("data_version", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  private[sql] val PartitionsSchema = StructType(Seq(
    StructField("partition", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("record_count", LongType, nullable = false),
    StructField("file_count", LongType, nullable = false),
    StructField("size_bytes", LongType, nullable = false)))

  private[sql] val RefsSchema = StructType(Seq(
    StructField("name", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("type", org.apache.spark.sql.types.StringType,
      nullable = false),
    StructField("version", LongType, nullable = false),
    StructField("created_at", TimestampType, nullable = false)))
}
