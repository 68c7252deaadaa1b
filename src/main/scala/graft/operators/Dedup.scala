package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators.
  *
  * W1 (window dedup over a composite key) is the reference's declared dedup
  * (reference: README.md:85,95,307); `exact*` generalizes it to
  * content-hash dedup for document pipelines.
  *
  * Scale notes: both shapes are a single hash-partition shuffle on the dedup
  * key. For wide rows `exactKeepFirst` shuffles a 32-byte digest + key
  * columns only, then semi-joins winners back — at 100 TB that is the
  * difference between shuffling 100 TB and shuffling ~1% of it.
  */
object Dedup {

  /** W1: keep exactly one row per composite key. `tieBreak` must order rows
    * totally within a key group (include a unique id) or results are
    * nondeterministic run-to-run — the reference's declared design omits
    * this; we require it. */
  def byKey(df: DataFrame, keys: Seq[String], tieBreak: Seq[Column]): DataFrame = {
    require(keys.nonEmpty && tieBreak.nonEmpty)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact content dedup summary: one row per distinct content digest with
    * the surviving (minimum) id and the duplicate count. Groups on a 256-bit
    * digest, never the payload, so the shuffle carries 32 bytes per row. */
  def exactSummary(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(contentCol), 256).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact content dedup: return the surviving full rows (min-id winner per
    * digest), via winners semi-joined back to the input so only digests and
    * ids shuffle. */
  def exactKeepFirst(df: DataFrame, contentCol: String, idCol: String): DataFrame = {
    val winners = exactSummary(df, contentCol, idCol)
      .select(col("keep_id").as(idCol))
    df.join(winners, Seq(idCol), "left_semi")
  }

  /** Span-level corpus dedup (the C4-style boilerplate stage, on fixed
    * token windows instead of sentence triples): every document is cut
    * into consecutive `spanTokens`-token spans, every repeated span is
    * dropped CORPUS-WIDE except its first occurrence (ordered by
    * (id, span position)), and the surviving spans are reassembled into
    * cleaned documents. Documents whose every span was seen elsewhere
    * first disappear — whole-doc duplicates degenerate to this.
    *
    * Scale shape: span construction is the scan-side codegen'd
    * TokenChunks explode (no exchange); the first-occurrence winner per
    * span is `min(struct(id, pos, span))` grouped by the span's md5 —
    * a PARTIAL aggregate, so a boilerplate span repeated a billion times
    * collapses map-side instead of flooding one reducer (the window-rank
    * formulation would hot-key exactly there); reassembly is one more
    * partial-friendly group by id. Two shuffles total, each carrying
    * surviving spans only, and no join anywhere. The struct min plans as
    * a SortAggregate (struct buffers aren't hash-aggregable) — the
    * map-side sort is the accepted price: the join-back and window-rank
    * alternatives both put the hot digest's full span stream on one
    * reducer, which is the failure mode this shape exists to avoid.
    *
    * Output: (idCol, clean_text, n_spans) for documents with at least
    * one surviving span. */
  def spanDedup(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    val spans = df.select(col(idCol), posexplode(
        graft.expressions.GraftFunctions.tokenChunks(
          graft.functions.TextFunctions.tokens(col(textCol)),
          spanTokens, spanTokens))
      .as(Seq("span_idx", "span")))
    val kept = spans
      .groupBy(md5(col("span").cast("binary")).as("__d"))
      .agg(min(struct(col(idCol), col("span_idx"), col("span"))).as("__w"))
      .select(col(s"__w.$idCol").as(idCol),
        col("__w.span_idx").as("span_idx"), col("__w.span").as("span"))
    kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"))
  }

  /** Maximal-run exact-substring dedup (the Lee-et-al. shape, approximated
    * on [[spanDedup]]'s stride grid): duplicated spans are dropped only
    * when they form a run of at least `minRunSpans` CONSECUTIVE
    * duplicated spans in the document. Fixed windows over-remove at
    * boundaries — a lone duplicated 3-token span is usually a common
    * phrase, not boilerplate; what the dedup literature strips is long
    * duplicated RUNS, and requiring `minRunSpans` consecutive hits
    * approximates "duplicated substring of ≥ minRunSpans·spanTokens
    * tokens". `minRunSpans = 1` degenerates to [[spanDedup]] exactly
    * (property-pinned). "Duplicated" keeps first-occurrence semantics:
    * the corpus-wide first instance of a span (ordered by (id, position))
    * is never dup-marked.
    *
    * Scale shape: winner-per-digest is the same partial `min(struct)`
    * aggregate as [[spanDedup]] (boilerplate collapses map-side); the
    * per-instance flag is a join on the digest — the winner side is ONE
    * row per distinct digest, so a hot boilerplate digest is a clean AQE
    * skew split (the replicated side is a single row), never a hot
    * reducer. Run grouping is gaps-and-islands: a boundary-count window
    * partitioned by id, a run-length window partitioned by (id, run) that
    * reuses the id exchange (subset partitioning satisfies the clustered
    * distribution), and the reassembly group-by rides the same exchange.
    * One digest shuffle + one join shuffle + one id shuffle total.
    *
    * Output: (idCol, clean_text, n_spans) for documents with at least one
    * surviving span. */
  def runDedup(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minRunSpans: Int): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    require(minRunSpans >= 1, s"minRunSpans must be >= 1, got $minRunSpans")
    val spans = df.select(col(idCol), posexplode(
        graft.expressions.GraftFunctions.tokenChunks(
          graft.functions.TextFunctions.tokens(col(textCol)),
          spanTokens, spanTokens))
      .as(Seq("span_idx", "span")))
      .withColumn("__d", md5(col("span").cast("binary")))
    val winners = spans
      .groupBy(col("__d"))
      .agg(min(struct(col(idCol), col("span_idx"))).as("__w"))
    val flagged = spans.join(winners, Seq("__d"))
      .select(col(idCol), col("span_idx"), col("span"),
        (col(s"__w.$idCol") =!= col(idCol) ||
          col("__w.span_idx") =!= col("span_idx")).as("__dup"))
    // gaps-and-islands: run id increments where the dup flag changes;
    // both windows and the reassembly cluster by id (one exchange)
    val byPos = Window.partitionBy(col(idCol)).orderBy(col("span_idx"))
    val runKeyed = flagged
      .withColumn("__bnd",
        when(col("__dup") =!=
          coalesce(lag(col("__dup"), 1).over(byPos), !col("__dup")), 1L)
          .otherwise(0L))
      .withColumn("__rk", sum(col("__bnd")).over(byPos))
    val runLen = Window.partitionBy(col(idCol), col("__rk"))
    val kept = runKeyed
      .withColumn("__rl", count(lit(1)).over(runLen))
      .filter(!col("__dup") || col("__rl") < minRunSpans)
    kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"))
  }

  /** Corpus-boilerplate strip (the MassiveText/RefinedWeb "remove lines
    * appearing in many documents" rule, on [[spanDedup]]'s stride grid):
    * a span whose DISTINCT-document frequency reaches `minDocFreq` is
    * boilerplate — navigation chrome, license banners, cookie notices —
    * and EVERY occurrence is removed, first included. Complementary
    * semantics to [[spanDedup]] (which keeps the first copy of anything):
    * dedup shrinks repeated content to one copy; boilerplate strip
    * declares ubiquitous content worthless and keeps zero copies.
    *
    * Scale shape: distinct (digest, id) collapses a document's internal
    * repeats map-side, the doc-frequency count is a partial-aggregated
    * count per digest, and the boilerplate verdict rejoins on the digest
    * — the frequency side is ONE row per distinct span, so a ubiquitous
    * span is a broadcast/AQE-skew-split row, never a hot reducer.
    * Reassembly clusters by id. Shuffles carry 16-byte digests and
    * surviving spans only, never full documents.
    *
    * Output: (idCol, clean_text, n_spans) for documents with at least
    * one surviving span. */
  def boilerplateStrip(df: DataFrame, idCol: String, textCol: String,
      spanTokens: Int, minDocFreq: Long): DataFrame = {
    require(spanTokens > 0, s"spanTokens must be positive, got $spanTokens")
    require(minDocFreq >= 2, s"minDocFreq must be >= 2, got $minDocFreq")
    val spans = df.select(col(idCol), posexplode(
        graft.expressions.GraftFunctions.tokenChunks(
          graft.functions.TextFunctions.tokens(col(textCol)),
          spanTokens, spanTokens))
      .as(Seq("span_idx", "span")))
      .withColumn("__d", md5(col("span").cast("binary")))
    val docFreq = spans.select(col("__d"), col(idCol)).distinct()
      .groupBy(col("__d")).agg(count(lit(1)).as("__df"))
    val kept = spans.join(docFreq, Seq("__d"))
      .filter(col("__df") < minDocFreq)
    kept.groupBy(col(idCol))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"),
        count(lit(1)).as("n_spans"))
  }
}
