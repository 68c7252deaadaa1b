package graft.pipeline

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture surface: MERGE upsert, SCD type-2 history, and
  * snapshot diff (change data feed).
  *
  * The reference's lakehouse brief delegates mutation to Iceberg's
  * `MERGE INTO` / changelog views (reference: README.md:85-88 — upserts,
  * time travel); without the Iceberg runtime the same semantics are
  * reproduced here on plain parquet + [[VersionedTable]], exactly as the
  * repo's M1-M4 maintenance family does.
  *
  * Scale design:
  *  - [[merge]] is copy-on-write MERGE read-side semantics as one
  *    declarative plan: an anti join on the key (both sides shuffle on the
  *    key; AQE broadcasts the change set when it is small — the common
  *    case, a day's changes vs the accumulated table) plus a union. No
  *    row-by-row driver logic, no RDDs.
  *  - [[mergePartitioned]] is the at-scale write path: only partitions that
  *    actually contain changed keys are rewritten (dynamic partition
  *    overwrite), so merge cost is proportional to touched data, not table
  *    size. A 100 TB table with one hot day of changes rewrites one day.
  *  - [[snapshotDiff]] compares 8-byte xxhash64 row digests, not payloads:
  *    the full-outer join shuffles (key, digest) pairs only.
  */
object Cdc {

  private def keyCols(keys: Seq[String]): Seq[Column] = keys.map(col)

  /** MERGE INTO `base` USING `changes` ON keys: rows of `changes` replace
    * base rows with the same key (update), keys absent from base are
    * inserted, and — when `deleteCol` names a boolean column — flagged rows
    * delete their key. Non-key non-flag columns of `changes` must match
    * base's schema (checked). Multiple change rows per key are a MERGE
    * cardinality error in Iceberg/Delta; callers on the write path get the
    * check from [[mergeIntoVersioned]] (lazily composing this plan cannot
    * validate without forcing an action). */
  def merge(base: DataFrame, changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): DataFrame = {
    val payload = deleteCol.map(d => changes.drop(d)).getOrElse(changes)
    require(payload.columns.sorted.sameElements(base.columns.sorted),
      s"merge schema mismatch: base has ${base.columns.sorted.toSeq}, " +
        s"changes carry ${payload.columns.sorted.toSeq}")
    val survivors = base.join(changes.select(keyCols(keys): _*), keys,
      "left_anti")
    val applied = deleteCol
      .map(d => changes.filter(!coalesce(col(d), lit(false))).drop(d))
      .getOrElse(changes)
    // unionByName: the anti join preserves base's column order, the change
    // side keeps its own — positional union would silently mis-zip.
    survivors.unionByName(applied.select(base.columns.map(col).toIndexedSeq: _*))
  }

  /** Transactional upsert on a [[VersionedTable]]: read latest, merge,
    * commit as a new immutable version (readers of the old version are
    * never torn — the Iceberg snapshot-commit shape). Throws if `changes`
    * carries duplicate keys (the MERGE cardinality check, evaluated on the
    * bounded change set, not the table). Returns the new version. */
  def mergeIntoVersioned(spark: SparkSession, table: String,
      changes: DataFrame, keys: Seq[String],
      deleteCol: Option[String] = None): Long = {
    // pin the change set: if `changes` reads a live/non-deterministic
    // source, the rows the cardinality check validated must be the rows
    // the merge writes (also saves recomputing the plan per consumer)
    val ch = changes.ckpt()
    val dups = ch.groupBy(keyCols(keys): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dups == 0,
      s"MERGE cardinality violation: multiple change rows per key in $table")
    val base = VersionedTable.read(spark, table)
    VersionedTable.write(merge(base, ch, keys, deleteCol), table)
  }

  /** Partition-targeted merge on a warehouse table: rewrites ONLY the
    * partitions `changes` touches. `changes` must carry the partition
    * column; the touched-partition list is a distinct over the change set
    * (bounded — one value per touched partition) and is broadcast into a
    * semi join, so the base read prunes to touched partitions before any
    * merge work. Restriction inherent to partition-local rewrite: a
    * change row must carry its key's CURRENT partition value (keys cannot
    * migrate partitions in one merge — same restriction Hive-style
    * `INSERT OVERWRITE` merges have; key-migrating merges need the
    * copy-on-write [[merge]]). With `checkKeyMigration` the restriction
    * is ENFORCED: change keys are semi-joined against base rows OUTSIDE
    * the touched partitions and any hit fails the merge before a byte is
    * written. The check's output is bounded by the change-set size, but
    * it scans the untouched partitions (that is what it inspects) — so
    * it is opt-in: on for correctness-critical merges, off when merge
    * cost ∝ touched data is the point. Like [[mergeIntoVersioned]], a
    * change set with duplicate keys is a MERGE cardinality error. */
  def mergePartitioned(spark: SparkSession, wh: Warehouse, zone: String,
      name: String, partitionCol: String, changes: DataFrame,
      keys: Seq[String], deleteCol: Option[String] = None,
      checkKeyMigration: Boolean = false): Unit = {
    require(changes.columns.contains(partitionCol),
      s"changes must carry partition column $partitionCol")
    // pin the change set BEFORE any validation: if `changes` reads a
    // live/non-deterministic source, the snapshot the cardinality and
    // migration checks validated must be the snapshot the merge writes —
    // otherwise duplicates can slip through while the checks pass. Also
    // saves re-evaluating the change plan for each of its four consumers.
    val ch = changes.ckpt()
    val dups = ch.groupBy(keyCols(keys): _*)
      .count().filter(col("count") > 1).limit(1).count()
    require(dups == 0,
      s"MERGE cardinality violation: multiple change rows per key in $name")
    if (checkKeyMigration) {
      val outside = Medallion.readTable(spark, wh, zone, name)
        .join(broadcast(ch.select(col(partitionCol)).distinct()),
          Seq(partitionCol), "left_anti")
      val migrated = outside
        .join(broadcast(ch.select(keyCols(keys): _*).distinct()),
          keys, "left_semi")
        .limit(1).count()
      require(migrated == 0,
        s"key migration detected in $name: a change row carries a " +
          s"different $partitionCol than its key's current partition; " +
          "use the copy-on-write merge for key-migrating changes")
    }
    val touched = ch.select(col(partitionCol)).distinct()
    val base = Medallion.readTable(spark, wh, zone, name)
      .join(broadcast(touched), Seq(partitionCol), "left_semi")
    // checkpoint: the merge result feeds BOTH the write and the
    // emptied-partition check below; recomputing it per consumer would
    // double the merge work.
    val merged = merge(base, ch, keys, deleteCol).ckpt()
    Medallion.overwritePartitions(merged, wh, zone, name, Seq(partitionCol))
    // Dynamic overwrite only replaces partitions PRESENT in the written
    // frame: a touched partition whose rows were all deleted has no rows
    // in `merged`, so its old directory would silently survive. Both
    // sides of the diff are bounded (one value per touched partition).
    // Compare CANONICAL STRINGS: partition-column type inference reads a
    // date-shaped string partition back as DATE, so raw values from the
    // base and change sides would never compare equal.
    val touchedVals = touched.select(col(partitionCol).cast("string"))
      .collect().map(_.getString(0)).toSet
    val remaining = merged.select(col(partitionCol).cast("string")).distinct()
      .collect().map(_.getString(0)).toSet
    (touchedVals -- remaining).foreach { v =>
      val (fs, dir) =
        graft.util.Fs.fsFor(s"${wh.table(zone, name)}/$partitionCol=$v")
      if (fs.exists(dir) && fs.getFileStatus(dir).isDirectory) {
        fs.delete(dir, true)
      }
    }
  }

  /** SCD type-2 history from a change log: one row per state interval.
    * Rows are ordered per key by (`orderCol`, `tieBreak`); consecutive rows
    * whose `attrCols` are all unchanged are collapsed (no-op updates do not
    * open a new interval); each surviving row becomes an interval
    * [valid_from = its order value, valid_to = next change's order value),
    * open-ended (null valid_to, is_current = true) for the latest state.
    *
    * One shuffle: both window passes partition by the key, and the filter
    * between them preserves that distribution, so the collapse and the
    * interval build share a single exchange. */
  def scd2(changeLog: DataFrame, keys: Seq[String], orderCol: String,
      tieBreak: String, attrCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols(keys): _*)
      .orderBy(col(orderCol), col(tieBreak))
    val changed = attrCols
      .map(a => !(col(a) <=> lag(col(a), 1).over(w)))
      .reduce(_ || _)
    val collapsed = changeLog
      .withColumn("__first", row_number().over(w) === 1)
      .withColumn("__changed", col("__first") || changed)
      .filter(col("__changed"))
    val w2 = Window.partitionBy(keyCols(keys): _*)
      .orderBy(col(orderCol), col(tieBreak))
    collapsed
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__first", "__changed")
  }

  /** Change data feed between two snapshots of a keyed table: one row per
    * changed key with change_type ∈ {insert, update, delete}; unchanged
    * keys are omitted. Comparison shuffles (key, xxhash64 row digest)
    * pairs — never the attribute payload (at 100 TB the digests are the
    * only thing that moves; re-reading changed rows afterwards is a
    * key-pruned join the caller composes if needed). */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
      keys: Seq[String]): DataFrame = {
    require(oldSnap.columns.sorted.sameElements(newSnap.columns.sorted),
      "snapshotDiff expects identical schemas")
    val attrs = oldSnap.columns.filterNot(keys.contains).sorted
    def digested(df: DataFrame, name: String): DataFrame =
      df.select(keyCols(keys) :+
        xxhash64(attrs.map(col).toIndexedSeq: _*).as(name) :+
        lit(true).as(s"__in$name"): _*)
    digested(oldSnap, "__ho")
      .join(digested(newSnap, "__hn"), keys, "full_outer")
      .select(keyCols(keys) :+
        when(col("__in__ho").isNull, lit("insert"))
          .when(col("__in__hn").isNull, lit("delete"))
          .when(col("__ho") =!= col("__hn"), lit("update"))
          .as("change_type"): _*)
      .filter(col("change_type").isNotNull)
  }

  /** [[snapshotDiff]] between two retained versions of a
    * [[VersionedTable]] — the Iceberg changelog-view shape
    * (`table$changes` between snapshot ids). */
  def versionDiff(spark: SparkSession, table: String, fromVersion: Long,
      toVersion: Long, keys: Seq[String]): DataFrame =
    snapshotDiff(
      VersionedTable.read(spark, table, Some(fromVersion)),
      VersionedTable.read(spark, table, Some(toVersion)), keys)
}
