package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  * torn write is invisible (no manifest → no version). The manifest
  * itself lands via temp-write + rename, so a reader can never observe
  * a HALF-WRITTEN manifest either (matters for rollback redirects,
  * where truncated content would silently mean "data=self").
  *
  * Substrate (r12): all I/O runs over Hadoop's `FileSystem`, resolved
  * per table path — the same code commits on `file:`, `hdfs:`, or NFS
  * mounts. The protocol's atomicity rests on rename being an atomic
  * metadata operation, so MUTATING calls refuse object-store schemes
  * ([[Maintenance.NonAtomicRenameSchemes]]) the way the compaction swap
  * does: on that deployment this layer IS the table format (Iceberg's
  * catalog CAS), per SCALING.md's boundary note. Reads work anywhere.
  * Concurrency: one writer per table (the reference's Glue-job model);
  * concurrent committers need the catalog CAS this layer stands in for. */
object VersionedTable {

  private def confOf(): Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(table: String): (FileSystem, Path) = {
    val raw = new Path(table)
    val fs = raw.getFileSystem(confOf())
    (fs, fs.makeQualified(raw))
  }

  private def manifestDir(root: Path): Path = new Path(root, "_versions")

  private def requireRenameCapable(fs: FileSystem, table: String,
      action: String): Unit = {
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    require(!Maintenance.NonAtomicRenameSchemes(scheme),
      s"VersionedTable.$action on '$table': scheme '$scheme' has no " +
        "atomic rename, so the manifest commit protocol is unsound — " +
        "use a catalog-backed table format (Iceberg) on object stores")
  }

  private def versionsOn(fs: FileSystem, root: Path): Seq[Long] = {
    val dir = manifestDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq
      .map(_.getPath.getName)
      .flatMap(n => scala.util.Try(n.toLong).toOption)
      .sorted
  }

  def versions(table: String): Seq[Long] = {
    val (fs, root) = fsFor(table)
    versionsOn(fs, root)
  }

  def latestVersion(table: String): Option[Long] = versions(table).lastOption

  /** Manifest commit: temp in `_versions` (dot-prefixed, skipped by the
    * numeric-name filter in [[versionsOn]]) + atomic rename. */
  private def commitManifest(fs: FileSystem, root: Path, v: Long,
      content: String): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val tmp = new Path(dir,
      s".$v.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, v.toString))) {
      fs.delete(tmp, false)
      sys.error(s"manifest commit failed for version $v in $root")
    }
  }

  /** Append a new immutable version; returns its number. */
  def write(df: DataFrame, table: String): Long = {
    val (fs, root) = fsFor(table)
    requireRenameCapable(fs, table, "write")
    val next = versionsOn(fs, root).lastOption.getOrElse(0L) + 1L
    df.write.parquet(new Path(root, s"v=$next").toString)
    commitManifest(fs, root, next, s"${System.currentTimeMillis()}\n")
    next
  }

  /** The data directory a manifested version resolves to: its own
    * `v=N` unless the manifest carries a `data=K` redirect line (a
    * [[rollback]] commit — content-free, pointing at the restored
    * snapshot's data). Redirects are written pre-resolved, so one hop
    * always lands on a real data version. */
  private def dataVersionOn(fs: FileSystem, root: Path, v: Long): Long = {
    val m = new Path(manifestDir(root), v.toString)
    val in = fs.open(m)
    val content =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    content.linesIterator
      .collectFirst { case l if l.startsWith("data=") =>
        l.stripPrefix("data=").trim.toLong }
      .getOrElse(v)
  }

  /** Read a specific version (time travel) or the latest. */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None): DataFrame =
    spark.read.parquet(dataDir(table, version))

  /** Resolved DATA directory of a manifested version (or the latest) —
    * the path a DSv2 TableCatalog binds `VERSION AS OF` to
    * ([[graft.sql.GraftProcedureCatalog]]): redirects are followed one
    * hop exactly as [[read]] does, so a catalog-served snapshot and a
    * TVF-served one read the same bytes by construction. */
  def dataDir(table: String, version: Option[Long] = None): String = {
    val (fs, root) = fsFor(table)
    val vs = versionsOn(fs, root)
    val v = version.orElse(vs.lastOption).getOrElse(
      throw new IllegalStateException(s"no versions in $table"))
    require(vs.contains(v), s"version $v not retained in $table")
    new Path(root, s"v=${dataVersionOn(fs, root, v)}").toString
  }

  /** The snapshot current AT `timestampMillis` — the newest retained
    * version whose commit time is <= the timestamp (Iceberg's
    * `TIMESTAMP AS OF` resolution). Refuses a timestamp before the
    * first retained commit: there was no table then. */
  def versionAt(table: String, timestampMillis: Long): Long = {
    val (fs, root) = fsFor(table)
    val vs = versionsOn(fs, root)
    require(vs.nonEmpty, s"no versions in $table")
    vs.filter(commitTimeOn(fs, root, _) <= timestampMillis).lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"timestamp $timestampMillis predates every retained " +
          s"snapshot of $table"))
  }

  /** True iff `table` is a versioned-table root (manifest dir present). */
  def isVersioned(table: String): Boolean = {
    val (fs, root) = fsFor(table)
    val d = manifestDir(root)
    fs.exists(d) && fs.getFileStatus(d).isDirectory
  }

  /** Iceberg's `rollback_to_snapshot` for this layer: make `toVersion`'s
    * content current WITHOUT rewriting data or erasing history — a new
    * manifest commits a `data=` redirect at the old snapshot's data
    * directory (pre-resolved, so redirect chains never form). History
    * stays time-travelable; the bad intermediate versions remain
    * readable until [[expire]]d. Returns the new current version. */
  def rollback(table: String, toVersion: Long): Long = {
    val (fs, root) = fsFor(table)
    requireRenameCapable(fs, table, "rollback")
    val vs = versionsOn(fs, root)
    require(vs.contains(toVersion),
      s"version $toVersion not retained in $table")
    val next = vs.last + 1L
    commitManifest(fs, root, next,
      s"${System.currentTimeMillis()}\ndata=${dataVersionOn(fs, root, toVersion)}\n")
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

  /** Commit wall-clock of a manifested version (the first manifest
    * line, epoch millis — written by [[write]]/[[rollback]]). */
  private def commitTimeOn(fs: FileSystem, root: Path, v: Long): Long = {
    val in = fs.open(new Path(manifestDir(root), v.toString))
    val content =
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    content.linesIterator.nextOption()
      .flatMap(_.trim.toLongOption).getOrElse(0L)
  }

  /** Snapshot history — the `table$snapshots` metadata surface
    * (Iceberg's snapshot listing, the reference's audit view of
    * `expire_snapshots` targets): one row per RETAINED version with its
    * commit time, the data version it resolves to (≠ version for
    * rollback redirect commits), and whether it is current. Driver cost
    * is |versions| manifest reads — the same budget every expiry pass
    * already has. */
  def history(spark: SparkSession, table: String): DataFrame = {
    val (fs, root) = fsFor(table)
    val vs = versionsOn(fs, root)
    import spark.implicits._
    vs.map { v =>
      (v, new java.sql.Timestamp(commitTimeOn(fs, root, v)),
        dataVersionOn(fs, root, v), v == vs.last)
    }.toDF("version", "committed_at", "data_version", "is_current")
  }

  private def expireDrop(fs: FileSystem, root: Path, vs: Seq[Long],
      drop: Seq[Long]): Seq[Long] = {
    val dropSet = drop.toSet
    // resolve BEFORE dropping manifests: kept versions' data dirs are live
    val live = vs.filterNot(dropSet)
      .map(dataVersionOn(fs, root, _)).toSet
    drop.foreach { v =>
      fs.delete(new Path(manifestDir(root), v.toString), false)
      if (!live.contains(v)) {
        fs.delete(new Path(root, s"v=$v"), true)
      }
    }
    drop
  }

  /** M1: expire old snapshots, keeping the newest `keepLast`. The manifest
    * is removed first so readers can never resolve a half-deleted version.
    * A data directory referenced by a RETAINED manifest's `data=` redirect
    * (a [[rollback]] target) survives even when its own manifest expires —
    * deleting it would corrupt the current snapshot. */
  def expire(table: String, keepLast: Int): Seq[Long] = {
    val (fs, root) = fsFor(table)
    requireRenameCapable(fs, table, "expire")
    val vs = versionsOn(fs, root)
    expireDrop(fs, root, vs, vs.dropRight(keepLast))
  }

  /** Iceberg's `expire_snapshots(older_than => ts, retain_last => n)`
    * semantics: drop versions committed BEFORE `olderThanMillis`, but
    * always retain at least the newest `retainLast` regardless of age
    * (so an idle table can never expire itself empty). Same
    * redirect-target data protection as [[expire]]. */
  def expireOlderThan(table: String, olderThanMillis: Long,
      retainLast: Int = 1): Seq[Long] = {
    val (fs, root) = fsFor(table)
    requireRenameCapable(fs, table, "expireOlderThan")
    val vs = versionsOn(fs, root)
    val guarded = vs.takeRight(math.max(1, retainLast)).toSet
    val drop = vs.filter(v =>
      !guarded(v) && commitTimeOn(fs, root, v) < olderThanMillis)
    expireDrop(fs, root, vs, drop)
  }

  /** `graft_history('table')` — [[history]] as a SQL table-valued
    * function, the `SELECT * FROM table$snapshots` shape. */
  def historyTvfBuilder: Seq[Expression] => LogicalPlan = exprs => {
    require(exprs.size == 1 && exprs.head.foldable,
      "graft_history expects one literal argument: (table_path)")
    history(SparkSession.active, exprs.head.eval().toString)
      .queryExecution.analyzed
  }
}
