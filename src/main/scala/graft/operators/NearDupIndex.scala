package graft.operators

import graft.util.Ckpt.CkptOps
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Materialized MinHash near-dup index — the at-scale serving path for
  * CONTINUOUS dedup. [[NearDup.minhashPairs]] pairs a corpus against
  * itself; a 100 TB crawl pipeline instead dedups each incoming batch
  * against everything already ingested, and must do so without
  * re-reading (let alone re-tokenizing) the corpus: daily batch ≪
  * corpus. The index holds everything candidate generation and Jaccard
  * verification need, all as fixed-width longs — corpus text is read
  * exactly once, at build time (same discipline as the ANN index forms
  * [[Ivf.writeIndex]] / `Similarity.writeLshIndex`).
  *
  * Layout under the index root:
  *  - `bands/`     (doc id, band, band_hash), partitioned by band
  *  - `cells/`     (band, band_hash, n, min id) — per-cell stats, so the
  *                 oversized-cell guard needs no corpus-wide aggregate at
  *                 probe time (the build pays it once)
  *  - `shingles/`  distinct (doc id, sh) shingle hashes — the inverted
  *                 index the verify step joins through
  *  - `docs/`      (doc id, n shingles) — set sizes for the Jaccard
  *                 denominator
  *  - `_graft_meta.json` — shingle/band parameters. Probes read their
  *                 parameters FROM the meta rather than accepting them,
  *                 so a probe banded differently from the index (which
  *                 would silently find nothing) cannot be expressed.
  *
  * Probe cost: the batch is tokenized once; every join against the index
  * keys on longs. Cells whose stored population exceeds `maxBucketSize`
  * contribute a (stored min id, new id) star instead of one candidate
  * per stored member — the duplicate-heavy-crawl guard, same as
  * [[NearDup.bandedCandidates]].
  */
object NearDupIndex {

  final case class Params(shingleSize: Int, bands: Int, rowsPerBand: Int)

  private def metaPathFs(root: String) = {
    val (fs, r) = graft.util.Fs.fsFor(root)
    (fs, new org.apache.hadoop.fs.Path(r, "_graft_meta.json"))
  }

  // temp + atomic rename (Fs.writeFileAtomicFs): a crash mid-write must
  // not leave a truncated meta that poisons every later probe/compact/
  // discovery pass — the same crash-safety discipline as the sketch
  // state metas (values here are ints, so the regex reader is safe;
  // only the WRITE needed hardening). All index I/O resolves through
  // the root's Hadoop FileSystem (r12): hdfs:/NFS run unchanged.
  private def writeMeta(root: String, p: Params): Unit = {
    val (fs, mp) = metaPathFs(root)
    graft.util.Fs.writeFileAtomicFs(fs, mp,
      s"""{"shingleSize":${p.shingleSize},"bands":${p.bands},"rowsPerBand":${p.rowsPerBand}}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  private def readMeta(root: String): Params = {
    val (fs, mp) = metaPathFs(root)
    val s = graft.util.Fs.readSmallFileFs(fs, mp)
    def f(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"corrupt index meta: $s")).group(1).toInt
    Params(f("shingleSize"), f("bands"), f("rowsPerBand"))
  }

  private def swapIn(root: String, table: String): Unit = {
    val (fs, r) = graft.util.Fs.fsFor(root)
    graft.util.Fs.swapInNewFs(fs, new org.apache.hadoop.fs.Path(r, table))
  }

  private def recoverAt(path: String): Unit = {
    val (fs, r) = graft.util.Fs.fsFor(path)
    graft.util.Fs.recoverSwapFs(fs, r)
  }

  /** Build the index: ONE pass over the corpus text for signatures/bands,
    * one for the shingle sets (both scan-side explodes feeding hash
    * aggregates; nothing here ever joins). */
  def write(df: DataFrame, idCol: String, textCol: String, root: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2): Unit = {
    val banded = NearDup.minhashBands(df, idCol, textCol, shingleSize,
      bands, rowsPerBand)
    banded.write.mode("overwrite").partitionBy("band")
      .parquet(s"$root/bands")
    // derive cells/docs from the WRITTEN tables: cheaper columns, and the
    // stats provably describe exactly what the probe will join against
    val spark = df.sparkSession
    spark.read.parquet(s"$root/bands")
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"))
      .write.mode("overwrite").parquet(s"$root/cells")
    NearDup.explodedShingles(df, idCol, textCol, shingleSize)
      .write.mode("overwrite").parquet(s"$root/shingles")
    spark.read.parquet(s"$root/shingles")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/docs")
    writeMeta(root, Params(shingleSize, bands, rowsPerBand))
  }

  /** Near-dup pairs between a NEW batch and the indexed corpus: banded
    * candidates against the stored cells, exact-Jaccard verify through
    * the stored inverted index. Corpus text is never touched. Output:
    * (new_id, old_id, jaccard) with jaccard >= threshold. Within-batch
    * duplicates are the caller's composition ([[NearDup.minhashPairs]]
    * on the batch) — this operator is strictly batch × corpus. */
  /** Read an index table, tolerating BOTH layouts: the one-shot
    * [[write]] layout (no batch column) and the [[streamIngest]] layout
    * (rows partitioned by batch_id). `excludeBatchId >= 0` drops that
    * batch's rows — a retried streaming batch must not see its own
    * partially-landed index rows, or its docs would collide with
    * themselves and be dropped as duplicates. */
  private def readIdxTable(spark: SparkSession, path: String,
      excludeBatchId: Long): DataFrame = {
    // recovery preamble on the SERVING read too: a crash inside a
    // compaction's swap window must not break probes until the next
    // compaction runs (two existence checks when no repair is needed)
    recoverAt(path)
    val df = spark.read.parquet(path)
    if (df.columns.contains("batch_id") && excludeBatchId >= 0)
      df.filter(col("batch_id") =!= excludeBatchId)
    else df
  }

  def probe(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      maxBucketSize: Int = 1000, excludeBatchId: Long = -1L): DataFrame = {
    val p = readMeta(root)
    val banded = NearDup.minhashBands(batch, idCol, textCol, p.shingleSize,
        p.bands, p.rowsPerBand)
      .select(col(idCol).as("new_id"), col("band"), col("band_hash"))
      .ckpt() // batch is small; bands feed two join branches
    // per-batch cell stats roll up to the global stats at probe time —
    // an O(|cells|·|batches|) agg, never O(corpus)
    val cellsRaw = readIdxTable(spark, s"$root/cells", excludeBatchId)
    val cells =
      if (cellsRaw.columns.contains("batch_id"))
        cellsRaw.groupBy(col("band"), col("band_hash"))
          .agg(sum(col("n")).as("n"), min(col("min_id")).as("min_id"))
      else cellsRaw
    val idxBands = readIdxTable(spark, s"$root/bands", excludeBatchId)
    // small cells: one candidate per stored member sharing the cell;
    // oversized cells: a single star to the stored min id — the cell's
    // members are mutual near-dups, the min id represents them all
    val withStats = banded.join(cells, Seq("band", "band_hash"))
    val smallPairs = withStats.filter(col("n") <= maxBucketSize)
      .join(idxBands, Seq("band", "band_hash"))
      .select(col("new_id"), col(idCol).as("old_id"))
    val stars = withStats.filter(col("n") > maxBucketSize)
      .select(col("new_id"), col("min_id").as("old_id"))
    val cands = smallPairs.unionAll(stars)
      .filter(col("new_id") =!= col("old_id"))
      .distinct()
    // verify: meet the batch's shingle sets with the STORED inverted
    // index, restricted to candidate old ids
    val newEx = NearDup.explodedShingles(batch, idCol, textCol,
      p.shingleSize).ckpt()
    val newSizes = newEx.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_new"))
      .select(col(idCol).as("new_id"), col("n_new"))
    val oldSizes = readIdxTable(spark, s"$root/docs", excludeBatchId)
      .select(col(idCol).as("old_id"), col("n").as("n_old"))
    val idxSh = readIdxTable(spark, s"$root/shingles", excludeBatchId)
      .select(col(idCol).as("old_id"), col("sh"))
    val common = cands
      .join(newEx.select(col(idCol).as("new_id"), col("sh")), Seq("new_id"))
      .join(idxSh, Seq("old_id", "sh"))
      .groupBy(col("new_id"), col("old_id"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(newSizes, Seq("new_id"))
      .join(oldSizes, Seq("old_id"))
      .select(col("new_id"), col("old_id"),
        (col("n_common").cast("double") /
          (col("n_new") + col("n_old") - col("n_common"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Fold a verified batch into the index (the daily-ingest step):
    * append the batch's rows to all four tables and rewrite the cell
    * stats. Callers dedup the batch (within itself and vs the corpus)
    * BEFORE appending. */
  def append(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String): Unit = {
    val p = readMeta(root)
    NearDup.minhashBands(batch, idCol, textCol, p.shingleSize, p.bands,
        p.rowsPerBand)
      .write.mode("append").partitionBy("band").parquet(s"$root/bands")
    NearDup.explodedShingles(batch, idCol, textCol, p.shingleSize)
      .write.mode("append").parquet(s"$root/shingles")
    spark.read.parquet(s"$root/shingles")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n"))
      .write.mode("overwrite").parquet(s"$root/docs.new")
    spark.read.parquet(s"$root/bands")
      .groupBy(col("band"), col("band_hash"))
      .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id"))
      .write.mode("overwrite").parquet(s"$root/cells.new")
    // swap via rename so a concurrent probe sees old or new, not half
    // (crash inside the two-rename window → recoverSwap repairs it)
    swapIn(root, "docs")
    swapIn(root, "cells")
  }

  /** EXACTLY-ONCE streamed crawl dedup — the continuous-ingest
    * composition of this index: drain `srcDir` (checkpoint = bookmark,
    * AvailableNow), and for each microbatch (1) dedup the batch within
    * itself (exact + near-dup, min-id keeper), (2) [[probe]] the
    * survivors against everything already indexed and drop the hits,
    * (3) land the novel docs' index rows (bands/cells/shingles/docs)
    * and their ids (`accepted/`) under `batch_id=N/` partitions via
    * dynamic partition overwrite. A retried batch rewrites its OWN
    * partitions in every table instead of appending duplicates — the
    * [[graft.streaming.BatchPartitionIngest]] idempotence-by-layout
    * discipline applied to a multi-table state — and the retry's probe
    * EXCLUDES its own batch id, so partially-landed rows from the
    * failed attempt can never make the batch collide with itself.
    *
    * Cost shape per batch: the batch is tokenized once; the probe joins
    * key on longs against the stored tables; cell stats roll up from
    * per-batch rows (O(|cells|·|batches|), compactable). Nothing ever
    * re-reads accepted corpus TEXT — daily batch ≪ corpus is the whole
    * point at crawl scale. */
  def streamIngest(spark: SparkSession, srcDir: String,
      schema: org.apache.spark.sql.types.StructType, root: String,
      checkpointDir: String, idCol: String, textCol: String,
      shingleSize: Int = 3, bands: Int = 8, rowsPerBand: Int = 2,
      threshold: Double = 0.5, maxBucketSize: Int = 1000): Unit = {
    val (mfs, mp) = metaPathFs(root)
    if (!mfs.exists(mp)) {
      mfs.mkdirs(mp.getParent)
      writeMeta(root, Params(shingleSize, bands, rowsPerBand))
    } else {
      val p = readMeta(root)
      require(p == Params(shingleSize, bands, rowsPerBand),
        s"streamIngest params $shingleSize/$bands/$rowsPerBand do not " +
          s"match the existing index meta $p")
    }
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val b = batch.ckpt()
        val exact = Dedup.exactKeepFirst(b, textCol, idCol)
          .ckpt()
        val pairs = NearDup.minhashPairs(exact, idCol, textCol,
          shingleSize, bands, rowsPerBand, threshold, maxBucketSize)
        val batchClean =
          Components.keepClusterRepresentatives(exact, idCol, pairs)
        // docs/ is written LAST of the index tables, so its existence
        // proves at least one batch fully landed; a first-batch retry
        // after a partial crash sees no docs/ and correctly probes
        // nothing
        val novel =
          if (!mfs.exists(new org.apache.hadoop.fs.Path(mp.getParent, "docs")))
            batchClean
          else {
            val hits = probe(spark, root, batchClean, idCol, textCol,
                threshold, maxBucketSize, excludeBatchId = batchId)
              .select(col("new_id").as(idCol)).distinct()
            batchClean.join(hits, Seq(idCol), "left_anti")
          }
        val nv = novel.ckpt() // feeds five writes
        def land(df: DataFrame, table: String,
            partCols: Seq[String] = Nil): Unit =
          df.withColumn("batch_id", lit(batchId))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id" +: partCols: _*)
            .parquet(s"$root/$table")
        val bandedNv = NearDup.minhashBands(nv, idCol, textCol,
          shingleSize, bands, rowsPerBand).ckpt()
        land(bandedNv, "bands", Seq("band"))
        land(bandedNv.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("n"), min(col(idCol)).as("min_id")),
          "cells")
        val exNv = NearDup.explodedShingles(nv, idCol, textCol,
          shingleSize).ckpt()
        land(exNv, "shingles")
        land(nv.select(col(idCol)), "accepted")
        land(exNv.groupBy(col(idCol)).agg(count(lit(1)).as("n")), "docs")
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Ids accepted by [[streamIngest]] across all drained batches. */
  def accepted(spark: SparkSession, root: String, idCol: String): DataFrame = {
    recoverAt(s"$root/accepted")
    spark.read.parquet(s"$root/accepted").select(col(idCol))
  }

  /** Fold a [[streamIngest]] index's batch partitions into ONE — the
    * [[graft.streaming.BatchPartitionIngest.CompactedBatchId]] sentinel
    * partition `batch_id=-1/` — the maintenance step that keeps the
    * probe-time cell-stats rollup O(|cells|) after many drains, and the
    * per-table file counts bounded. Pure LAYOUT change: every rollup the
    * probe performs is value-equal regardless of how rows are split
    * across batch partitions, so probes before and after compaction
    * return identical results; a crash INSIDE one table's two-rename
    * swap window leaves that table briefly missing, and the
    * [[graft.util.Fs.recoverSwap]] preamble (run here for every table
    * before folding) repairs it on the next compaction — readers racing
    * that window must retry.
    *
    * The sentinel matters: real streaming batch ids are non-negative and
    * [[readIdxTable]] only excludes ids >= 0, so folded rows can never
    * be mistaken for a live batch's own partial rows — even if the
    * streaming checkpoint is lost (or a different checkpointDir is
    * passed) and batch ids restart at 0, batch 0's retry-exclusion probe
    * filter cannot exclude the folded corpus, and its dynamic partition
    * overwrite cannot wipe it. (Folding to the min real id, the previous
    * behavior, had exactly that failure: a restarted batch 0 probed an
    * index that silently excluded EVERYTHING folded, re-accepting every
    * duplicate.) Run compaction in a maintenance window, not
    * concurrently with an active drain: folding a failed-but-unretried
    * batch's partial rows into the sentinel would put them outside the
    * retry's own-batch exclusion. */
  def compactStream(spark: SparkSession, root: String): Unit = {
    val (fs, rootP) = graft.util.Fs.fsFor(root)
    graft.util.Fs.requireRenameCapable(fs, s"compactStream($root)")
    val sentinel = graft.streaming.BatchPartitionIngest.CompactedBatchId
    def hp(name: String) = new org.apache.hadoop.fs.Path(rootP, name)
    def fold(table: String, partCols: Seq[String] = Nil): Unit = {
      val cur = hp(table)
      graft.util.Fs.recoverSwapFs(fs, cur)
      val nw = hp(s"$table.new")
      fs.delete(nw, true)
      spark.read.parquet(cur.toString)
        .withColumn("batch_id", lit(sentinel))
        .write.mode("overwrite")
        .partitionBy("batch_id" +: partCols: _*)
        .parquet(nw.toString)
      graft.util.Fs.swapInNewFs(fs, cur)
    }
    fold("bands", Seq("band"))
    // per-batch cell stats merge into true global stats (sum/min)
    graft.util.Fs.recoverSwapFs(fs, hp("cells"))
    val cells = spark.read.parquet(s"$root/cells")
      .groupBy(col("band"), col("band_hash"))
      .agg(sum(col("n")).as("n"), min(col("min_id")).as("min_id"))
      .ckpt() // sever from the dir being swapped
    fs.delete(hp("cells.new"), true)
    cells.withColumn("batch_id", lit(sentinel))
      .write.mode("overwrite").partitionBy("batch_id")
      .parquet(hp("cells.new").toString)
    graft.util.Fs.swapInNewFs(fs, hp("cells"))
    fold("shingles")
    fold("docs")
    fold("accepted")
  }
}
