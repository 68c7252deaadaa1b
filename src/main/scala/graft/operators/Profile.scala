package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling: per-column summary statistics in ONE pass —
  * the ingest-time health check a lakehouse runs on every new partition
  * (row counts, null rates, cardinalities, ranges) before promoting it.
  *
  * Scale shape: all measures for all columns fold into a single
  * aggregation over one scan (5·k agg expressions, partial+final), then
  * the one result row unpivots driver-side into (column, stats) rows —
  * k rows, not k passes. Exact COUNT(DISTINCT) over several columns
  * plans one Expand (k× the scan rows into the partial agg, combined
  * map-side); for quick-look profiling at extreme widths, callers can
  * profile column subsets. */
object Profile {

  /** One row per profiled numeric column: n, n_null, n_distinct (exact),
    * min, max. Column values must be castable to double. */
  def summary(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, 1)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*)
    // stack the single wide row into per-column rows (k is tiny; the
    // stack is a projection, not another scan)
    val stacked = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n"),
        col(s"__nn_$c").as("n_null"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("mn"), col(s"__mx_$c").as("mx"))
    }
    row.select(explode(array(stacked: _*)).as("s")).select(col("s.*"))
  }

  /** Per-group z-score outlier flags: |x − mean| > z·stddev within the
    * row's group. Mean and population stddev are derived from EXACT
    * decimal sums (Σx, Σx²) cast to double only at the end — the
    * engine's built-in stddev (Welford / pairwise updates) is
    * parallelism-dependent in the last bits, which would make the flag
    * nondeterministic at the boundary; decimal moments + IEEE
    * (÷, ×, −, sqrt) make every engine produce the identical flag.
    * One partial-aggregated pass for the group moments (rows per group
    * ≥ any corpus, output one row per group), broadcast back over the
    * scan — the same two-pass shape as [[histogram]]. */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
      z: Double): DataFrame = {
    val stats = df.groupBy(col(groupCol))
      .agg(
        count(col(valueCol)).as("__n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("__s1"),
        sum(col(valueCol).cast("decimal(18,2)") *
          col(valueCol).cast("decimal(18,2)")).as("__s2"))
      .select(col(groupCol),
        (col("__s1").cast("double") / col("__n")).as("__mean"),
        sqrt(col("__s2").cast("double") / col("__n") -
          (col("__s1").cast("double") / col("__n")) *
          (col("__s1").cast("double") / col("__n"))).as("__std"))
    // no broadcast hint: one row per group means AQE broadcasts this
    // whenever the group column is low-cardinality, and a
    // high-cardinality group degrades to a shuffle join instead of
    // OOMing a forced broadcast
    df.join(stats, Seq(groupCol))
      .select(df.columns.map(col).toIndexedSeq :+
        (abs(col(valueCol) - col("__mean")) > lit(z) * col("__std"))
          .as("is_outlier"): _*)
  }

  /** Population-stability drift between a reference slice and a current
    * slice of the same column: per-bin PSI terms
    * (p_ref − p_cur)·ln(p_ref/p_cur) over equi-width bins fixed by the
    * REFERENCE bounds (current values outside them clamp into the edge
    * bins — at drift-detection time the reference grid must not move).
    * Zero-count bins take probability `pFloor` on both sides (the
    * standard dodge for ln 0 — identical on every engine because it's a
    * comparison, not arithmetic). Σ of the terms is the headline PSI
    * (>0.2 ≈ action threshold); the per-bin rows say WHERE the drift
    * is. Counts and probabilities are exact; ln rides only in the
    * exported 6dp term. Same two-pass scan shape as [[histogram]],
    * once per slice. */
  def psi(ref: DataFrame, cur: DataFrame, c: String, buckets: Int,
      pFloor: Double = 1e-6): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = ref.agg(min(col(c).cast("double")).as("mn"),
      max(col(c).cast("double")).as("mx")).head()
    require(!b.isNullAt(0), s"reference column $c has no non-null values")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    def binned(df: DataFrame, n: String): DataFrame = {
      val raw =
        if (mx == mn) lit(0L)
        else floor((col(c).cast("double") - lit(mn)) * buckets / lit(mx - mn))
          .cast("long")
      df.filter(col(c).isNotNull)
        .groupBy(least(greatest(raw, lit(0L)), lit(buckets - 1L)).as("bin"))
        .agg(count(lit(1)).as(n))
    }
    val spark = ref.sparkSession
    import spark.implicits._
    val bins = Seq(0).toDF("__x")
      .select(explode(sequence(lit(0L), lit(buckets - 1L))).as("bin"))
    val joined = bins
      .join(binned(ref, "n_ref"), Seq("bin"), "left_outer")
      .join(binned(cur, "n_cur"), Seq("bin"), "left_outer")
      .select(col("bin"), coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val tr = sum(col("n_ref")).over()
    val tc = sum(col("n_cur")).over()
    // an EMPTY side (total 0) floors every probability instead of
    // dividing by zero — PSI then reports maximal drift per bin, the
    // right answer for "the current corpus has no rows here" and the
    // reason a tiny SF can't crash the drift check (r14)
    def safeP(n: org.apache.spark.sql.Column,
        tot: org.apache.spark.sql.Column) =
      greatest(when(tot === 0L, lit(0.0d))
        .otherwise(n.cast("double") / tot), lit(pFloor))
    joined
      .select(col("bin"), col("n_ref"), col("n_cur"),
        safeP(col("n_ref"), tr).as("__pr"),
        safeP(col("n_cur"), tc).as("__pc"))
      .select(col("bin"), col("n_ref"), col("n_cur"),
        round((col("__pr") - col("__pc")) * log(col("__pr") / col("__pc")), 6)
          .as("psi_term"))
  }

  /** Equi-width histogram of a numeric column: `buckets` bins over the
    * observed [min, max], plus the bin edges. Two passes (bounds, then
    * counts) — the bounds pass reads one column and reduces to one row;
    * the counts pass is a scan-side projection + partial-aggregated
    * groupBy on the bin index, so the shuffle carries at most `buckets`
    * rows per map partition. Bin assignment `floor((x−min)·b/(max−min))`
    * is computed in double with the clamp at the top edge (max lands in
    * the last bin) — division and floor are exactly-rounded IEEE ops, so
    * any engine reproduces the same bins bit-for-bit. Empty bins are
    * emitted with n=0 (the scaffold is a `sequence` explode of the bin
    * range, not a join), so the output always has exactly `buckets`
    * rows. NULLs are excluded; a constant column collapses to one bin
    * holding everything. */
  def histogram(df: DataFrame, c: String, buckets: Int): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    val b = df.agg(min(col(c).cast("double")).as("mn"),
      max(col(c).cast("double")).as("mx")).head()
    require(!b.isNullAt(0), s"column $c has no non-null values")
    val (mn, mx) = (b.getDouble(0), b.getDouble(1))
    val spark = df.sparkSession
    val binCol =
      if (mx == mn) lit(0L)
      else least(
        floor((col(c).cast("double") - lit(mn)) * buckets / lit(mx - mn))
          .cast("long"),
        lit(buckets - 1L))
    val counts = df.filter(col(c).isNotNull)
      .groupBy(binCol.as("bin")).agg(count(lit(1)).as("n"))
    // dense scaffold: every bin present even when empty
    import spark.implicits._
    val bins = Seq(0).toDF("__x")
      .select(explode(sequence(lit(0L), lit(buckets - 1L))).as("bin"))
    val w = if (mx == mn) 0.0 else (mx - mn) / buckets
    bins.join(counts, Seq("bin"), "left_outer")
      .select(col("bin"),
        (lit(mn) + col("bin") * lit(w)).as("lo"),
        when(col("bin") === (buckets - 1L), lit(mx))
          .otherwise(lit(mn) + (col("bin") + 1L) * lit(w)).as("hi"),
        coalesce(col("n"), lit(0L)).as("n"))
  }

  /** Approximate quantiles read off the equi-width [[histogram]] — the
    * mergeable-quantile member of the sketch family ([[Sketches]] HLL =
    * distinct, Bloom = membership, [[Cms]] = frequency): histograms
    * over partitions/days union by summing bin counts, and quantiles of
    * the union come from the merged counts — no re-scan, unlike exact
    * percentile_disc. Error is bounded by one bin width (range/buckets).
    *
    * For each requested percent q, the answer is the UPPER EDGE of the
    * first bin whose cumulative count reaches q% of non-null rows —
    * `100·cum >= q·N` in pure integer arithmetic (no ceil, no float
    * rank), and the edges are the histogram's exactly-rounded IEEE
    * doubles, so any engine reproduces the result bit-for-bit.
    *
    * Scale shape: everything after the histogram's partial-agg scan
    * operates on `buckets` rows — the cumulative window is a
    * single-partition sort of `buckets` rows by construction, and the
    * percents table is a literal local relation. */
  def histogramQuantiles(df: DataFrame, c: String, buckets: Int,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty, "need at least one percent")
    require(percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in [1, 100], got $percents")
    val spark = df.sparkSession
    import spark.implicits._
    val h = histogram(df, c, buckets).ckpt()
    val cum = h.withColumn("cum",
      sum(col("n")).over(org.apache.spark.sql.expressions.Window
        .orderBy(col("bin"))
        .rowsBetween(Long.MinValue, 0)))
    val tot = h.agg(sum(col("n")).as("total"))
    val pcts = percents.toDF("pct")
    cum.crossJoin(broadcast(tot)).crossJoin(broadcast(pcts))
      .filter(col("cum") * 100 >= col("pct") * col("total"))
      .groupBy(col("pct")).agg(min(col("bin")).as("bin"))
      .join(h.select(col("bin"), col("hi")), "bin")
      .select(col("pct").cast("long").as("pct"), col("bin"),
        col("hi").as("q_value"))
  }
}
