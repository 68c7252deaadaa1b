package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: flag (or drop) training documents that
  * share at least one word n-gram with an evaluation corpus — the
  * standard exact-containment contamination rule applied before
  * training runs.
  *
  * Scale shape: both sides reduce to DISTINCT 8-byte shingle hashes
  * built scan-side (codegen'd WordShingles + xxhash64 — the shuffle
  * carries (hash, id), never text), and the eval side is tiny by
  * definition (benchmarks, not corpora), so the meet is a broadcast
  * hash join against the training corpus' hashed shingle stream. */
object Decontaminate {

  /** (idCol, n_shared): per training doc, how many DISTINCT word
    * n-grams it shares with `eval`; docs sharing none are absent. */
  def overlapCounts(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val tr = NearDup.shingleRows(train, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("shingle")).as("sh")).distinct()
    val ev = NearDup.shingleRows(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
    tr.join(ev, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** The cleaned training corpus: rows of `train` sharing NO word
    * n-gram with `eval` (left anti join on the flagged ids). */
  def removeContaminated(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame =
    train.join(
      overlapCounts(train, eval, idCol, textCol, n).select(idCol),
      Seq(idCol), "left_anti")

  /** Graded contamination instead of [[overlapCounts]]' boolean-ish
    * count: per training doc, its distinct-shingle total AND the shared
    * count, plus the ratio in exact ppm (integer division — engine
    * portable, no float in compared columns). The score curricula and
    * threshold sweeps need: "drop at >1% contaminated, downweight at
    * >0.1%" is a filter on this output, where [[overlapCounts]] only
    * supports drop-on-any-overlap.
    *
    * Scale shape: identical to [[overlapCounts]] except the eval meet is
    * a broadcast LEFT join (the corpus side still reduced to distinct
    * 8-byte hashes scan-side), so per-doc totals come from the same
    * single aggregation — no second pass over the corpus. */
  def overlapRatio(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val tr = NearDup.shingleRows(train, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("shingle")).as("sh")).distinct()
    val ev = NearDup.shingleRows(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
      .withColumn("__hit", lit(1L))
    tr.join(broadcast(ev), Seq("sh"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shingles"),
        count(col("__hit")).as("n_shared"))
      .withColumn("contamination_ppm",
        expr("CAST(n_shared * 1000000 DIV n_shingles AS BIGINT)"))
  }

  /** Bloom-prefiltered decontamination for when the eval side stops
    * being tiny (multi-benchmark suites, held-out corpora): a Bloom
    * filter over the eval shingle hashes is broadcast as one compact
    * bitset, the training shingle stream drops every non-hit AT THE SCAN
    * (`might_contain` is a projection — no join, no shuffle for the
    * overwhelmingly-clean majority), and only the surviving sliver meets
    * the exact eval set to discharge the Bloom's false positives. Result
    * is EXACTLY [[overlapCounts]] — the filter is a prefilter, never the
    * verdict — at a fraction of the join traffic: shuffle volume is
    * O(candidate shingles), not O(corpus shingles).
    * `fpp`/`expectedEvalShingles` size the bitset (1% fpp ≈ 9.6
    * bits/shingle). */
  def overlapCountsBloom(train: DataFrame, eval: DataFrame, idCol: String,
      textCol: String, n: Int = 8, expectedEvalShingles: Long = 1000000L,
      fpp: Double = 0.01): DataFrame = {
    val ev = NearDup.shingleRows(eval, idCol, textCol, n)
      .select(xxhash64(col("shingle")).as("sh")).distinct()
      .ckpt() // two consumers: the filter build + exact verify
    val bloom = ev.stat.bloomFilter("sh", expectedEvalShingles, fpp)
    val bytes = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bytes)
    // codegen'd membership probe (Spark's own runtime-filter expression),
    // NOT a UDF — the prefilter runs inside WholeStageCodegen at the scan
    val candidates = NearDup.shingleRows(train, idCol, textCol, n)
      .select(col(idCol), xxhash64(col("shingle")).as("sh"))
      .filter(graft.expressions.GraftFunctions.mightContain(
        bytes.toByteArray, col("sh")))
      .distinct()
    candidates.join(ev, Seq("sh"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_shared"))
  }
}
