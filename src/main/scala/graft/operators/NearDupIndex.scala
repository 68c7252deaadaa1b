package graft.operators

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

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

  private def metaPath(root: String) = Paths.get(root, "_graft_meta.json")

  private def writeMeta(root: String, p: Params): Unit =
    Files.write(metaPath(root),
      s"""{"shingleSize":${p.shingleSize},"bands":${p.bands},"rowsPerBand":${p.rowsPerBand}}"""
        .getBytes(StandardCharsets.UTF_8))

  private def readMeta(root: String): Params = {
    val s = new String(Files.readAllBytes(metaPath(root)),
      StandardCharsets.UTF_8)
    def f(k: String): Int =
      s""""$k":(\\d+)""".r.findFirstMatchIn(s)
        .getOrElse(sys.error(s"corrupt index meta: $s")).group(1).toInt
    Params(f("shingleSize"), f("bands"), f("rowsPerBand"))
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
  def probe(spark: SparkSession, root: String, batch: DataFrame,
      idCol: String, textCol: String, threshold: Double = 0.5,
      maxBucketSize: Int = 1000): DataFrame = {
    val p = readMeta(root)
    val banded = NearDup.minhashBands(batch, idCol, textCol, p.shingleSize,
        p.bands, p.rowsPerBand)
      .select(col(idCol).as("new_id"), col("band"), col("band_hash"))
      .localCheckpoint() // batch is small; bands feed two join branches
    val cells = spark.read.parquet(s"$root/cells")
    val idxBands = spark.read.parquet(s"$root/bands")
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
      p.shingleSize).localCheckpoint()
    val newSizes = newEx.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_new"))
      .select(col(idCol).as("new_id"), col("n_new"))
    val oldSizes = spark.read.parquet(s"$root/docs")
      .select(col(idCol).as("old_id"), col("n").as("n_old"))
    val idxSh = spark.read.parquet(s"$root/shingles")
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
    def swap(name: String): Unit = {
      val cur = Paths.get(root, name)
      val nw = Paths.get(root, s"$name.new")
      val old = Paths.get(root, s"$name.old")
      graft.util.Fs.deleteRecursively(old.toFile)
      if (Files.exists(cur)) Files.move(cur, old)
      Files.move(nw, cur)
      graft.util.Fs.deleteRecursively(old.toFile)
    }
    swap("docs")
    swap("cells")
  }
}
