package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max statistics index for a parquet table — Iceberg's
  * manifest-stats pruning re-created the parquet way. Parquet footers
  * already carry row-group min/max, but at 100 TB the planner must OPEN
  * every footer to use them (one S3 GET per file per query); a
  * materialized stats table answers "which files can match?" from ONE
  * tiny scan, and only the surviving files are listed in the read. This
  * is the layer that makes [[graft.pipeline.Maintenance.compactSorted]]/
  * `compactZorder` clustering pay off at planning time, not just at
  * decode time.
  *
  * The pruned read re-applies the predicate exactly, so stats can only
  * REDUCE IO, never change results — the index is advisory, the filter
  * is the truth (gated by an oracle that computes from the raw table). */
object FileIndex {

  /** Session-conf override for the driver-side file-NAME budget — the
    * ops knob, no code change to re-budget a deployment. */
  val NameGateConfKey = "spark.graft.fileindex.maxNames"

  /** THE driver-side name-list bound, derived from driver memory at
    * call time (the [[Triangles.derivedGate]] discipline — a named,
    * derived budget instead of an unstated assumption): every probe and
    * refresh here collects file NAMES only (never blobs, never rows),
    * at ~512 bytes of driver heap per name (URI string + char array +
    * collection slot). Budget = driver heap / 16 → names = heap / 16 /
    * 512. The 8 GB sandbox derives ~1M names; a 64 GB production
    * driver ~8M — both clear of the ~400k files a 100 TB table holds
    * at the 256 MB compaction target, while a mis-pointed probe
    * against a 10⁸-file listing fails fast with sizing guidance
    * instead of OOMing the driver. Floor of 100k keeps a tiny test
    * heap from rejecting legitimate tables. */
  def derivedNameGate(): Long =
    (Runtime.getRuntime.maxMemory / 16L / 512L).max(100000L)

  /** Resolution order: session conf > derived-from-memory. */
  def resolveNameGate(spark: SparkSession): Long =
    spark.conf.getOption(NameGateConfKey).map(_.toLong)
      .getOrElse(derivedNameGate())

  /** The ONE gated collect every name-list path goes through: pulls at
    * most gate+1 rows (single pass, bounded memory even when failing)
    * and refuses past the gate, naming the knob. */
  private def collectNames(names: DataFrame, what: String): Seq[String] = {
    val gate = resolveNameGate(names.sparkSession)
    val lim = math.min(gate + 1L, Int.MaxValue.toLong).toInt
    val got = names.limit(lim).collect().map(_.getString(0)).toSeq
    require(got.length <= gate,
      s"$what exceeds the driver name-list gate ($gate names, " +
        s"~${gate * 512 / (1024 * 1024)} MB of heap): raise " +
        s"$NameGateConfKey or run with a larger driver heap, or narrow " +
        "the probe (per-partition stats tables)")
    got
  }

  private def rangeStatsOf(src: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "buildStats needs at least one column")
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    src.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
  }

  /** One row per parquet file: (file, n_rows, <c>_min, <c>_max per
    * stats column). One full scan to build; rebuild per partition after
    * compaction (or append-merge via [[statsForFiles]] — stats rows are
    * per-file facts). */
  def buildStats(spark: SparkSession, tableDir: String,
      cols: Seq[String]): DataFrame =
    rangeStatsOf(spark.read.parquet(tableDir), cols)

  /** Stats rows for SPECIFIC files — the incremental-maintenance path:
    * after a day's append, scan ONLY the new files and union the rows
    * into the standing stats table (`stats.unionByName(...)`). Stats
    * rows are per-file facts, so the union equals a full rebuild by
    * construction (`FileIndexSpec` pins it) — upkeep is O(increment),
    * never O(table), which is what keeps a 400k-file stats table
    * maintainable at one append per day. Compaction REPLACES files, so
    * compacted partitions still need their rows rebuilt (drop rows
    * whose file no longer exists, add the new files' rows — both sides
    * O(touched files)). */
  def statsForFiles(spark: SparkSession, files: Seq[String],
      cols: Seq[String]): DataFrame = {
    require(files.nonEmpty, "statsForFiles needs at least one file")
    rangeStatsOf(spark.read.parquet(files: _*), cols)
  }

  /** [[buildStats]] extended with per-file BLOOM membership sketches for
    * `bloomCols` — the Iceberg/Delta file-skipping shape for EQUALITY
    * predicates, where min/max envelopes are useless unless the table
    * is clustered on the column (a needle key's [min, max] spans almost
    * everything under arbitrary layout, but its bloom bit pattern does
    * not). Reuses Spark's own runtime-join-filter machinery
    * (`BloomFilterAggregate`/`BloomFilterMightContain`, xxhash64'd on
    * both sides), so build and probe are the codegen'd paths the
    * optimizer itself trusts. `bloomNumBits` bounds each blob at
    * numBits/8 bytes per file per column. */
  def buildStatsWithBloom(spark: SparkSession, tableDir: String,
      rangeCols: Seq[String], bloomCols: Seq[String],
      expectedItemsPerFile: Long = 1000000L,
      bloomNumBits: Long = 8L * 1024 * 1024): DataFrame =
    bloomStatsOf(spark.read.parquet(tableDir), rangeCols, bloomCols,
      expectedItemsPerFile, bloomNumBits)

  /** [[statsForFiles]] for a bloom-indexed table — the incremental path
    * that keeps BLOOM stats O(increment) too: scan only the appended
    * files, union the rows into the standing stats table. Blooms are
    * per-file facts exactly like min/max (each row's blob is built from
    * that file's rows alone, independent of every other file), so the
    * union equals `buildStatsWithBloom` over the whole table — including
    * blob bytes, since the aggregate is deterministic in (file rows,
    * numItems, numBits); `FileIndexSpec` pins blob equality. Without
    * this, a 400k-file bloom-indexed table needs a full O(table) rescan
    * after every daily append, which breaks the stats layer's own
    * 100 TB maintenance story. Pass the SAME item/bit sizing as the
    * standing table: blooms sized differently are still correct (probe
    * hashes match) but the fpp claim drifts. */
  def statsForFilesWithBloom(spark: SparkSession, files: Seq[String],
      rangeCols: Seq[String], bloomCols: Seq[String],
      expectedItemsPerFile: Long = 1000000L,
      bloomNumBits: Long = 8L * 1024 * 1024): DataFrame = {
    require(files.nonEmpty, "statsForFilesWithBloom needs at least one file")
    bloomStatsOf(spark.read.parquet(files: _*), rangeCols, bloomCols,
      expectedItemsPerFile, bloomNumBits)
  }

  /** Reconcile a standing stats table with the CURRENT file listing —
    * the post-compaction refresh the append-only paths
    * ([[statsForFiles]] / [[statsForFilesWithBloom]]) cannot express:
    * compaction REPLACES files, so rows for vanished files must drop
    * and rows for the rewritten files must be scanned in. Cost is
    * O(changed files) data scan + O(|files|) driver-side NAME
    * bookkeeping (the same string-list budget every probe here has —
    * ~400k names at 100 TB, never blobs, never rows): vanished rows are
    * dropped via a semi-join against the current listing, added files
    * are scanned with the same per-file aggregation as the full build.
    * Stats rows are per-file facts, so the result equals a full rebuild
    * bit-for-bit, blob bytes included (FileIndexSpec pins it against
    * an actual compaction). `bloomCols` empty ⇒ min/max-only table. */
  /** [[refreshStats]] with the column set and bloom sizing read back
    * from the standing stats table ITSELF: `<c>_min`/`<c>_max` pairs
    * name the range columns, `<c>_bloom` columns name the bloom
    * columns, and the sizing ([[BloomItemsKey]]/[[BloomBitsKey]]
    * column metadata, written by [[buildStatsWithBloom]] since r13)
    * rides along — so maintenance can refresh any registered index
    * without being told how it was built
    * ([[org.apache.spark.sql.graft.StatsPruning.refreshRegistered]]).
    * Stats tables from before r13 carry no sizing metadata and fall
    * back to the build defaults: still correct (probe hashes match any
    * sizing), only the fpp claim drifts — the documented
    * statsForFilesWithBloom caveat. */
  def refreshStatsAuto(spark: SparkSession, tableDir: String,
      stats: DataFrame): DataFrame = {
    val cols = stats.columns.toSet
    val rangeCols = stats.columns.toSeq
      .filter(_.endsWith("_min")).map(_.stripSuffix("_min"))
      .filter(c => cols(s"${c}_max"))
    val bloomCols = stats.columns.toSeq
      .filter(_.endsWith("_bloom")).map(_.stripSuffix("_bloom"))
    require(rangeCols.nonEmpty || bloomCols.nonEmpty,
      s"not a stats table: no <c>_min/<c>_max or <c>_bloom columns in " +
        s"[${stats.columns.mkString(", ")}]")
    val sizing = bloomCols.headOption.map { c =>
      val meta = stats.schema(s"${c}_bloom").metadata
      (if (meta.contains(BloomItemsKey)) meta.getLong(BloomItemsKey)
       else 1000000L,
        if (meta.contains(BloomBitsKey)) meta.getLong(BloomBitsKey)
        else 8L * 1024 * 1024)
    }.getOrElse((1000000L, 8L * 1024 * 1024))
    refreshStats(spark, tableDir, stats, rangeCols, bloomCols,
      sizing._1, sizing._2)
  }

  def refreshStats(spark: SparkSession, tableDir: String, stats: DataFrame,
      rangeCols: Seq[String], bloomCols: Seq[String] = Nil,
      expectedItemsPerFile: Long = 1000000L,
      bloomNumBits: Long = 8L * 1024 * 1024): DataFrame = {
    // kept/added are decided on CANONICAL keys: `DataFrame.inputFiles`
    // and the stats rows' `input_file_name()` strings can differ in URI
    // %-encoding on some stores, and comparing them raw would silently
    // classify every surviving file as both vanished and added — still
    // correct (it equals a full rebuild) but O(table), losing the
    // O(changed files) property this method exists for. The semi-join
    // itself still keys on the stats side's ORIGINAL strings.
    // inputFiles is Spark's OWN planner listing (the driver holds it for
    // any scan of the table regardless of this index); the stats-side
    // collect is ours and rides the derived name gate.
    val currentRaw = spark.read.parquet(tableDir).inputFiles.toSeq
    val knownRaw = collectNames(stats.select(col("file")),
      "refreshStats standing-stats listing")
    val currentKeys = currentRaw.map(canonicalFileKey).toSet
    val knownKeys = knownRaw.map(canonicalFileKey).toSet
    val keptNames = knownRaw.filter(f => currentKeys(canonicalFileKey(f)))
    val keptDf = spark.createDataset(keptNames)(
      org.apache.spark.sql.Encoders.STRING).toDF("file")
    val kept = stats.join(keptDf, Seq("file"), "left_semi")
    val added = currentRaw.filterNot(f => knownKeys(canonicalFileKey(f)))
    if (added.isEmpty) kept
    else {
      // basePath keeps Hive partition COLUMNS alive when scanning leaf
      // files directly: without it, a partitioned table whose stats
      // index a partition column would lose that column on the
      // added-files read and the refresh would throw (or worse,
      // silently produce a narrower stats row). Harmless on
      // unpartitioned layouts (no partition inference either way).
      val addedDf = spark.read.option("basePath", tableDir)
        .parquet(added: _*)
      kept.unionByName(
        if (bloomCols.isEmpty) rangeStatsOf(addedDf, rangeCols)
        else bloomStatsOf(addedDf, rangeCols, bloomCols,
          expectedItemsPerFile, bloomNumBits))
    }
  }

  /** Canonical identity for a file path string: scheme + authority +
    * DECODED path via `java.net.URI`, so `a b` and `a%20b` spellings of
    * the same file compare equal across the two listing APIs. Unparsable
    * strings fall back to themselves (comparison degrades to raw
    * equality, never throws). */
  def canonicalFileKey(s: String): String =
    try {
      val u = new java.net.URI(s)
      if (u.getPath == null || u.getPath.isEmpty) s
      else {
        val sb = new StringBuilder
        Option(u.getScheme).foreach(sc => sb.append(sc).append(':'))
        Option(u.getAuthority).foreach(a => sb.append("//").append(a))
        sb.append(u.getPath).toString
      }
    } catch { case _: java.net.URISyntaxException => s }

  private def bloomStatsOf(src: DataFrame, rangeCols: Seq[String],
      bloomCols: Seq[String], expectedItemsPerFile: Long,
      bloomNumBits: Long): DataFrame = {
    require(bloomCols.nonEmpty, "buildStatsWithBloom needs bloom columns")
    val rangeAggs = rangeCols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    // Record the indexed column's Spark type AS COLUMN METADATA on the
    // bloom column (survives a parquet round-trip of the stats table):
    // XxHash64 hashes IntegerType and LongType differently, so probes
    // MUST hash their literal with the build-side type or silently
    // false-negative — the metadata makes the probe self-describing.
    val bloomAggs = bloomCols.map { c =>
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(BloomTypeKey, src.schema(c).dataType.json)
        // sizing rides the column metadata (survives the parquet
        // round-trip of the stats table) so a later refresh can build
        // byte-identical blooms without being told the parameters
        .putLong(BloomItemsKey, expectedItemsPerFile)
        .putLong(BloomBitsKey, bloomNumBits).build()
      org.apache.spark.sql.graft.BloomFunctions
        .bloomAgg(col(c), expectedItemsPerFile, bloomNumBits)
        .as(s"${c}_bloom", meta)
    }
    src.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("n_rows"), (rangeAggs ++ bloomAggs): _*)
  }

  /** Metadata key carrying the indexed column's DataType JSON on a
    * `<c>_bloom` stats column. */
  val BloomTypeKey = "graft_bloom_type"

  /** Metadata keys carrying the bloom build sizing on a `<c>_bloom`
    * stats column — what [[refreshStatsAuto]] reads back so refreshed
    * blooms are built with the standing table's own parameters. */
  val BloomItemsKey = "graft_bloom_items"
  val BloomBitsKey = "graft_bloom_bits"

  /** Files whose bloom admits `c = value` (false positives possible —
    * the pruned read's exact predicate discharges them; false negatives
    * impossible by bloom construction, so no row can be lost). The
    * probe is a DISTRIBUTED filter over the stats table: each executor
    * deserializes only its own rows' blobs against the constant
    * pre-hashed key, and only the surviving file NAMES are collected —
    * at 100 TB / 256 MB files that is ~400k name strings, where
    * collecting the blobs themselves (~1 MB × files × columns) would
    * OOM the driver. A NULL blob (all-null file) is conservatively kept.
    * The probe hash uses the build-side column type recorded by
    * [[buildStatsWithBloom]] ([[BloomTypeKey]] metadata), so an Int
    * probe against a Long-built bloom cannot silently false-negative. */
  def candidateFilesEquals(stats: DataFrame, c: String,
      value: Any): Seq[String] =
    collectNames(candidateFilesEqualsPlan(stats, c, value),
      s"bloom probe on $c")

  /** The probe as an un-collected single-column plan (file names only) —
    * exposed so specs can assert the collected schema carries no blob. */
  def candidateFilesEqualsPlan(stats: DataFrame, c: String,
      value: Any): DataFrame =
    stats.filter(bloomAdmits(stats, c, value)).select(col("file"))

  /** The bloom admission test for `c = value` as a boolean COLUMN, so
    * several predicates can share one stats pass (the one-job probe
    * [[org.apache.spark.sql.graft.StatsPruning]] runs). A NULL blob
    * (all-null file) is conservatively admitted. */
  def bloomAdmits(stats: DataFrame, c: String, value: Any): Column = {
    val bloomCol = s"${c}_bloom"
    val meta = stats.schema(bloomCol).metadata
    val dt =
      if (meta.contains(BloomTypeKey))
        org.apache.spark.sql.types.DataType.fromJson(
          meta.getString(BloomTypeKey))
      else org.apache.spark.sql.catalyst.expressions.Literal(value).dataType
    val h = org.apache.spark.sql.graft.BloomFunctions.hashValue(value, dt)
    col(bloomCol).isNull ||
      org.apache.spark.sql.graft.BloomFunctions
        .mightContainHashed(col(bloomCol), h)
  }

  /** Equality read through the bloom index: read only files that might
    * contain the key, re-apply the exact predicate (advisory-index
    * discipline — results can never differ from a full-scan filter). */
  def prunedEqualityRead(spark: SparkSession, tableDir: String,
      stats: DataFrame, c: String, value: Any): DataFrame = {
    val files = candidateFilesEquals(stats, c, value)
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(col(c) === lit(value))
  }

  /** Every file the stats table describes — the universe a pruning
    * decision may exclude from. Files NOT in this set are unknown to
    * the index and must always be read (the conservative contract
    * [[org.apache.spark.sql.graft.StatsPruning]] builds on: a stale
    * index can waste IO on files it doesn't know, never lose them). */
  def describedFiles(stats: DataFrame): Seq[String] =
    collectNames(stats.select(col("file")), "stats-table file listing")

  /** Files whose [min, max] envelope admits `lo <= c <= hi`. */
  def candidateFiles(stats: DataFrame, c: String, lo: Column,
      hi: Column): Seq[String] =
    collectNames(
      stats.filter(col(s"${c}_max") >= lo && col(s"${c}_min") <= hi)
        .select(col("file")),
      s"range probe on $c")

  /** Files admitted by an arbitrary predicate over the stats columns —
    * the composition point [[org.apache.spark.sql.graft.StatsPruning]]
    * uses for one-sided ranges (`c > lit` → `c_max > lit`). Same gated
    * name collect as every other probe. */
  def candidateFilesWhere(stats: DataFrame, cond: Column,
      what: String): Seq[String] =
    collectNames(stats.filter(cond).select(col("file")), what)

  /** Range read through the index: list candidate files from the stats
    * table (a driver-side file list — bounded by file count, the same
    * cardinality every planner materializes), read ONLY those, re-apply
    * the exact predicate. Empty candidate set → empty frame with the
    * table's schema. */
  def prunedRangeRead(spark: SparkSession, tableDir: String,
      stats: DataFrame, c: String, lo: Column, hi: Column): DataFrame = {
    val files = candidateFiles(stats, c, lo, hi)
    val pred = col(c) >= lo && col(c) <= hi
    if (files.isEmpty)
      spark.read.parquet(tableDir).filter(lit(false))
    else
      spark.read.parquet(files: _*).filter(pred)
  }
}
