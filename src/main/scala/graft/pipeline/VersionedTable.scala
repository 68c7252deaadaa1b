package graft.pipeline

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal snapshot/time-travel layer over parquet: every write creates an
  * immutable `v=N` directory; reads address the latest or any retained
  * version; expiry deletes old versions — the parquet-path realization of
  * the reference's Iceberg snapshot semantics (time travel: README.md:87-88;
  * expire_snapshots: glue-jobs/iceberg_maintenance.py:48-55).
  *
  * Commit protocol: data lands in `v=N` first, then a one-line manifest
  * `_versions/N` is created — readers only see manifested versions, so a
  * torn write is invisible (no manifest → no version). */
object VersionedTable {

  private def manifestDir(table: String): Path = Paths.get(table, "_versions")

  def versions(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.isDirectory(dir)) Seq.empty
    else Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .toSeq.sorted
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  /** Append a new immutable version; returns its number. */
  def write(df: DataFrame, table: String): Long = {
    val next = latestVersion(table).getOrElse(0L) + 1L
    df.write.parquet(s"$table/v=$next")
    Files.createDirectories(manifestDir(table))
    Files.writeString(manifestDir(table).resolve(next.toString),
      s"${System.currentTimeMillis()}\n")
    next
  }

  /** Read a specific version (time travel) or the latest. */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no versions in $table"))
    require(versions(table).contains(v), s"version $v not retained in $table")
    spark.read.parquet(s"$table/v=$v")
  }

  /** Logical-plan builder for the `graft_version('table'[, version])` SQL
    * table-valued function (registered via GraftExtensions /
    * GraftFunctions.register) — the reference's time-travel user feature
    * (reference: README.md:87-88) from plain SQL:
    * `SELECT * FROM graft_version('/path/t', 2)`. Omitting the version
    * reads the latest manifest. */
  def tvfBuilder: Seq[Expression] => LogicalPlan = exprs => {
    require(exprs.nonEmpty && exprs.size <= 2 && exprs.forall(_.foldable),
      "graft_version expects literal arguments: (table_path[, version])")
    val table = exprs.head.eval().toString
    val version = exprs.lift(1).map(_.eval().toString.toLong)
    read(SparkSession.active, table, version).queryExecution.analyzed
  }

  /** M1: expire old snapshots, keeping the newest `keepLast`. The manifest
    * is removed first so readers can never resolve a half-deleted version. */
  def expire(table: String, keepLast: Int): Seq[Long] = {
    val vs = versions(table)
    val drop = vs.dropRight(keepLast)
    drop.foreach { v =>
      Files.deleteIfExists(manifestDir(table).resolve(v.toString))
      val dir = new java.io.File(s"$table/v=$v")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
    drop
  }
}
