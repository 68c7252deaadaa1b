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

  /** The data directory a manifested version resolves to: its own
    * `v=N` unless the manifest carries a `data=K` redirect line (a
    * [[rollback]] commit — content-free, pointing at the restored
    * snapshot's data). Redirects are written pre-resolved, so one hop
    * always lands on a real data version. */
  private def dataVersion(table: String, v: Long): Long = {
    val m = manifestDir(table).resolve(v.toString)
    Files.readAllLines(m).asScala
      .collectFirst { case l if l.startsWith("data=") =>
        l.stripPrefix("data=").trim.toLong }
      .getOrElse(v)
  }

  /** Read a specific version (time travel) or the latest. */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(table)).getOrElse(
      throw new IllegalStateException(s"no versions in $table"))
    require(versions(table).contains(v), s"version $v not retained in $table")
    spark.read.parquet(s"$table/v=${dataVersion(table, v)}")
  }

  /** Iceberg's `rollback_to_snapshot` for this layer: make `toVersion`'s
    * content current WITHOUT rewriting data or erasing history — a new
    * manifest commits a `data=` redirect at the old snapshot's data
    * directory (pre-resolved, so redirect chains never form). History
    * stays time-travelable; the bad intermediate versions remain
    * readable until [[expire]]d. Returns the new current version. */
  def rollback(table: String, toVersion: Long): Long = {
    require(versions(table).contains(toVersion),
      s"version $toVersion not retained in $table")
    val next = latestVersion(table).get + 1L
    Files.writeString(manifestDir(table).resolve(next.toString),
      s"${System.currentTimeMillis()}\ndata=${dataVersion(table, toVersion)}\n")
    next
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
    * is removed first so readers can never resolve a half-deleted version.
    * A data directory referenced by a RETAINED manifest's `data=` redirect
    * (a [[rollback]] target) survives even when its own manifest expires —
    * deleting it would corrupt the current snapshot. */
  def expire(table: String, keepLast: Int): Seq[Long] = {
    val vs = versions(table)
    val drop = vs.dropRight(keepLast)
    // resolve BEFORE dropping manifests: kept versions' data dirs are live
    val live = vs.drop(math.max(0, vs.size - keepLast))
      .map(dataVersion(table, _)).toSet
    drop.foreach { v =>
      Files.deleteIfExists(manifestDir(table).resolve(v.toString))
      if (!live.contains(v)) {
        val dir = new java.io.File(s"$table/v=$v")
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete()
        }
        rm(dir)
      }
    }
    drop
  }
}
