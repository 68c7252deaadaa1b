package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling / split assignment / group capping —
  * the subsetting operations a training-data pipeline runs constantly
  * (held-out splits, ablation subsamples, per-domain caps).
  *
  * Everything here keys on `substr(md5(key), 1, 4)`: a stable 16-bit
  * bucket expressed as a lowercase hex STRING, compared
  * lexicographically (= numerically for fixed-width hex). Three
  * properties matter at 100 TB:
  *  - deterministic and engine-portable: the same row lands in the same
  *    split on Spark, DuckDB, or anything with md5 — reruns and
  *    cross-engine audits agree bit-for-bit (no RNG, no seed state,
  *    no sampleBy approximation);
  *  - scan-side: sampling and split assignment are pure projections /
  *    filters — they push into the file scan, shuffle nothing, and
  *    compose with partition pruning;
  *  - decoupled from the data: the hash keys on the row's ID, so
  *    re-partitioning, compaction, or re-ingestion never reassigns
  *    splits (position-based sampling would).
  */
object Sampling {

  /** Ceiling on distinct group values for the per-group operators
    * ([[stratifiedSample]]'s when-chain, [[temperatureFractions]] /
    * [[mixtureFactors]]' driver-side count collect). Group columns here
    * are language/domain-cardinality by design; this guard turns a
    * mistaken high-cardinality column (doc_id, url) into an immediate
    * error instead of a silent driver OOM at corpus scale — and caps the
    * generated when-chain size, which Catalyst degrades on long before
    * the driver does. */
  val MaxGroups = 10000

  /** Collect one (group, count) row per non-null group value, failing
    * fast if the column has more than [[MaxGroups]] distinct values.
    * The limit(MaxGroups+1) bounds what ever reaches the driver, so the
    * check itself is safe on a billion-key column. */
  private def groupCounts(df: DataFrame, groupCol: String): Map[String, Long] = {
    val rows = df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"))
      .limit(MaxGroups + 1)
      .collect()
    require(rows.length <= MaxGroups,
      s"group column '$groupCol' has more than $MaxGroups distinct values; " +
        "per-group sampling needs a language/domain-cardinality column, " +
        "not an id-like one")
    rows.map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** 4-hex-char (16-bit) bucket of a key column: '0000'..'ffff'.
    * A NULL key hashes to NULL: [[deterministicSample]] then drops the
    * row (filter is null-rejecting) and [[splitColumn]] assigns it the
    * LAST split (every `<` comparison is null → otherwise-chain) —
    * key your sampling on a non-null id column. */
  def hexBucket(key: Column): Column =
    substring(md5(key.cast("string").cast("binary")), 1, 4)

  private[graft] def hexThreshold(fraction: Double): String = {
    require(fraction >= 0 && fraction <= 1, s"fraction $fraction not in [0,1]")
    val v = math.round(fraction * 0x10000).min(0x10000).toInt
    // comparison is lexicographic on fixed-width hex; a 5-char "10000"
    // would sort BELOW "8xxx", so saturate to 'g' (> 'f' > any bucket)
    if (v >= 0x10000) "g" else f"$v%04x"
  }

  /** Keep ~`fraction` of rows, deterministically by `key`. Exact
    * fraction granularity is 1/65536; fraction=1.0 keeps everything. */
  def deterministicSample(df: DataFrame, key: String,
      fraction: Double): DataFrame =
    df.filter(hexBucket(col(key)) < lit(hexThreshold(fraction)))

  /** Assign every row a split label by cumulative weight ranges over the
    * hash bucket — e.g. Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1).
    * Weights must sum to ~1; the last split absorbs rounding. Splits are
    * disjoint, exhaustive, and stable under any re-partitioning. */
  def splitColumn(key: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "need at least one split")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split weights must sum to 1, got ${splits.map(_._2).sum}")
    val bucket = hexBucket(key)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail
    splits.init.zip(cum).foldRight(lit(splits.last._1)) {
      case (((name, _), c), elseCol) =>
        when(bucket < lit(hexThreshold(c)), name).otherwise(elseCol)
    }
  }

  def assignSplits(df: DataFrame, key: String,
      splits: Seq[(String, Double)]): DataFrame =
    df.withColumn("split", splitColumn(col(key), splits))

  /** Integer twin of [[hexBucket]]: the key's bucket as a long in
    * 0..65535, for thresholds that must be computed per ROW rather than
    * folded into a literal (weight-proportional sampling). `conv` parses
    * the fixed-width hex exactly; same md5, same bucket. */
  def intBucket(key: Column): Column =
    conv(hexBucket(key), 16, 10).cast("long")

  /** Weight-proportional deterministic sampling: keep each row with
    * probability min(1, weight / unitWeight), keyed on `key` — the
    * corpus-reweighting primitive (keep documents ∝ token count so a
    * downsample preserves long documents; keep ∝ quality score so a
    * budget cut drops the worst first). A row with weight >= `unitWeight`
    * is always kept; weight NULL or <= 0 is always dropped.
    *
    * The decision `bucket * unitWeight < weight * 65536` is pure long
    * arithmetic — no doubles, no rounding mode, so the DuckDB oracle
    * replays it bit-for-bit and the granularity is exactly 1/65536
    * (rounded up: a tiny positive weight still has one bucket's chance).
    * Same three scale properties as [[deterministicSample]]: scan-side
    * (no shuffle, composes with pruning), engine-portable, and stable
    * under re-partitioning or re-ingestion. Weights are read as longs;
    * the 2^47 bound applies to BOTH sides of the comparison: a weight
    * above 2^47 overflows the 65536 scaling, and a unitWeight near 2^47
    * overflows `bucket * unitWeight` (bucket ≤ 65535) identically (ANSI
    * mode throws rather than wrapping) — divide both down first. The
    * unitWeight side is enforced here; oversize weights are the
    * caller's data contract. */
  def weightedSample(df: DataFrame, key: String, weightCol: String,
      unitWeight: Long): DataFrame = {
    require(unitWeight > 0, s"unitWeight must be positive, got $unitWeight")
    require(unitWeight <= (1L << 47),
      s"unitWeight $unitWeight exceeds 2^47; bucket*unitWeight would " +
        "overflow long arithmetic — scale weights down first")
    df.filter(intBucket(col(key)) * lit(unitWeight) <
      col(weightCol).cast("long") * lit(65536L))
  }

  /** Per-stratum deterministic sampling — language/domain rebalancing
    * with a different keep-fraction per group value (e.g. downsample
    * English hard, keep low-resource languages whole). Same hash-bucket
    * discipline as [[deterministicSample]]: the per-group threshold is a
    * scan-side when-chain over the (small, literal) fractions map, so
    * the whole thing stays a pushed filter — no shuffle, no sampleBy
    * approximation, stable under repartitioning. Groups absent from the
    * map keep `defaultFraction` (0 = drop unlisted groups). At most
    * [[MaxGroups]] entries — the when-chain is a literal plan. */
  def stratifiedSample(df: DataFrame, groupCol: String, key: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    require(fractions.size <= MaxGroups,
      s"fractions map has ${fractions.size} entries (max $MaxGroups); " +
        "a when-chain that long degrades Catalyst planning")
    val thr = fractions.toSeq.sortBy(_._1)
      .foldLeft(lit(hexThreshold(defaultFraction))) {
        case (acc, (g, f)) =>
          when(col(groupCol) === g, lit(hexThreshold(f))).otherwise(acc)
      }
    df.filter(hexBucket(col(key)) < thr)
  }

  /** Per-group keep fractions for temperature-α rebalancing over the
    * OBSERVED group shares: f_g ∝ p_g^(α−1), normalized so the group
    * with the largest upweight (the smallest group when α < 1) keeps
    * fraction exactly 1 — the multilingual-corpus schedule (sampled
    * distribution ∝ p^α: α=1 keeps the natural distribution, α=0
    * equalizes expected counts across groups, α∈(0,1) is the usual
    * downsample-English-keep-low-resource compromise).
    *
    * One aggregate row per group is collected to the driver, guarded by
    * [[MaxGroups]] (via a bounded limit — a high-cardinality column
    * fails fast, never OOMs the driver). NULL group values are excluded
    * (they then fall to [[stratifiedSample]]'s defaultFraction = drop). */
  def temperatureFractions(df: DataFrame, groupCol: String,
      alpha: Double): Map[String, Double] = {
    require(alpha >= 0 && alpha <= 1, s"alpha $alpha not in [0,1]")
    val counts = groupCounts(df, groupCol)
    require(counts.nonEmpty, "no non-null groups to rebalance")
    val total = counts.values.sum.toDouble
    val w = counts.map { case (g, n) =>
      g -> math.pow(n / total, alpha - 1.0)
    }
    val c = 1.0 / w.values.max
    w.map { case (g, x) => g -> (c * x).min(1.0) }
  }

  /** Temperature-α group rebalancing: [[temperatureFractions]] composed
    * with [[stratifiedSample]] — a tiny driver-side fraction computation,
    * then one scan-side literal when-chain filter (no shuffle, no join;
    * the corpus is read once). The keep decision inherits the whole hash
    * discipline: deterministic, engine-portable, stable under
    * re-partitioning, and monotone in α (lowering α only removes rows of
    * over-represented groups). */
  def temperatureSample(df: DataFrame, groupCol: String, key: String,
      alpha: Double): DataFrame =
    stratifiedSample(df, groupCol, key,
      temperatureFractions(df, groupCol, alpha))

  /** Deterministic upsampling with fractional repeats: emit each row
    * `floor(factor)` times, plus one more for the hash-chosen `frac`
    * share of keys — so a 2.3× domain weight really repeats 30% of its
    * rows a third time and the expected multiplier is exactly `factor`
    * (the low-resource-domain mixing trick, down to factor < 1 where it
    * degrades to sampling). Output rows carry a `copy` index (0-based)
    * so downstream sample ids stay unique. Same discipline as the rest
    * of the family: no RNG, stable under re-partitioning, and the
    * fractional choice hashes a salted key so it is independent of
    * [[deterministicSample]] decisions on the same ids. */
  def upsample(df: DataFrame, key: String, factor: Double): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    val base = math.floor(factor).toLong
    val frac = factor - base
    val n = lit(base) +
      when(hexBucket(concat(col(key).cast("string"), lit("#u"))) <
        lit(hexThreshold(frac)), 1L).otherwise(0L)
    df.withColumn("__n", n)
      .filter(col("__n") >= 1)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Per-group resampling factors that hit explicit target proportions
    * at a total row budget: factor_g = budget·w_g / n_g over the
    * OBSERVED group counts (targets are normalized; groups missing from
    * the corpus are an error, groups missing from `targets` get factor
    * 0 = dropped). Factors above 1 mean repetition, below 1 mean
    * sampling — [[resampleToMixture]] applies both in one pass. Same
    * driver-side bound as [[temperatureFractions]]: one count row per
    * group, guarded by [[MaxGroups]]. */
  def mixtureFactors(df: DataFrame, groupCol: String,
      targets: Map[String, Double], budgetRows: Long): Map[String, Double] = {
    require(targets.nonEmpty && targets.values.forall(_ >= 0) &&
      targets.values.sum > 0, "targets must be non-negative, not all zero")
    require(budgetRows > 0, s"budgetRows must be positive, got $budgetRows")
    require(targets.size <= MaxGroups,
      s"targets map has ${targets.size} entries (max $MaxGroups)")
    val counts = groupCounts(df, groupCol)
    val missing = targets.keys.filterNot(counts.contains)
    require(missing.isEmpty,
      s"target groups absent from corpus: ${missing.mkString(", ")}")
    val wsum = targets.values.sum
    targets.map { case (g, w) =>
      g -> budgetRows * (w / wsum) / counts(g)
    }
  }

  /** Resample the corpus to an explicit group mixture ("40/30/20/10 at
    * 600 rows"): per-row copy count floor(factor_g) plus one more for
    * the hash-chosen fractional share — the [[upsample]] rule with a
    * per-group factor, so over- and under-represented groups are
    * repeated and thinned IN THE SAME single scan-side pass (literal
    * when-chains over the factors; no join, no shuffle before the
    * explode). Expected group sizes are exactly budget·w_g. Output
    * carries the dense `copy` index. */
  def resampleToMixture(df: DataFrame, groupCol: String, key: String,
      targets: Map[String, Double], budgetRows: Long): DataFrame = {
    val factors = mixtureFactors(df, groupCol, targets, budgetRows)
    val ordered = factors.toSeq.sortBy(_._1)
    val floorCol = ordered.foldLeft(lit(0L)) { case (acc, (g, f)) =>
      when(col(groupCol) === g, math.floor(f).toLong).otherwise(acc)
    }
    val thrCol = ordered.foldLeft(lit(hexThreshold(0.0))) {
      case (acc, (g, f)) =>
        when(col(groupCol) === g,
          lit(hexThreshold(f - math.floor(f)))).otherwise(acc)
    }
    val n = floorCol +
      when(hexBucket(concat(col(key).cast("string"), lit("#m"))) < thrCol,
        1L).otherwise(0L)
    df.withColumn("__n", n)
      .filter(col("__n") >= 1)
      .withColumn("copy", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Deterministic per-epoch shuffle key: md5 of (epoch, key) — a
    * different but fully reproducible global order for every training
    * epoch (the standard per-epoch reshuffle without RNG state: any
    * engine, any run, any partitioning produces the same order). Sort
    * by it for a total order; feed [[writeEpochShuffled]] to
    * materialize one without a single-reducer sort. */
  def epochOrderKey(key: Column, epoch: Int): Column =
    md5(concat_ws("-", lit(epoch.toString), key.cast("string"))
      .cast("binary"))

  /** Materialize an epoch-shuffled corpus: range-partition on the epoch
    * order key (sampled bounds — the Spark-native global sort, no
    * single reducer) and sort within partitions, so file i's keys all
    * precede file i+1's and a sequential reader sees the exact global
    * shuffle order. One shuffle, `numFiles` output files. */
  def writeEpochShuffled(df: DataFrame, key: String, epoch: Int,
      path: String, numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive, got $numFiles")
    df.withColumn("__ok", epochOrderKey(col(key), epoch))
      .repartitionByRange(numFiles, col("__ok"))
      .sortWithinPartitions(col("__ok"))
      .drop("__ok")
      .write.mode("overwrite").parquet(path)
  }

  /** Keep at most `cap` rows per group, chosen deterministically (hash
    * order with the key as tie-break) — class/domain balancing. One
    * shuffle on the group columns; the per-group sort is bounded by the
    * window, not a global ordering. For heavily skewed groups at corpus
    * scale, the filter drops everything past `cap` per reducer stream,
    * so output per reducer is bounded by cap. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], key: String,
      cap: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(hexBucket(col(key)), col(key))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= cap)
      .drop("__rn")
  }
}
