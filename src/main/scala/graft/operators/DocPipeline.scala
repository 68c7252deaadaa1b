package graft.operators

import graft.util.Ckpt.CkptOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Composed document-cleaning pipeline — the end-to-end training-data
  * use case: language filter → quality filter → exact dedup → near-dup
  * cluster dedup, with per-stage retention counts.
  *
  * Each stage is one of the engine's operators; the composition stays a
  * single lazy DataFrame lineage except for the near-dup stage (LSH
  * candidate generation + connected components, which needs its own
  * actions). At corpus scale the early stages are pure scan-side filters
  * — they cut the data before anything shuffles. */
object DocPipeline {

  final case class Config(
      allowedLangs: Seq[String] = Seq("en"),
      stopwords: Seq[String] = Seq("the", "a"),
      minQuality: Double = 0.3,
      shingleSize: Int = 2,
      bands: Int = 8,
      rowsPerBand: Int = 2,
      jaccardThreshold: Double = 0.5,
      // duplicate-heavy-crawl guard, passed through to the near-dup
      // stage: hot LSH cells degrade to a representative star, never
      // B² pairs (NearDup.capBucketSide)
      maxBucketSize: Int = 1000,
      // keeper policy for near-dup clusters: false = lowest id (cheapest),
      // true = highest quality score (C4/RefinedWeb policy — min-id throws
      // away the good copy half the time when duplicates differ)
      keepBestQuality: Boolean = false,
      // Gopher repetition gate (Rae et al. 2021 Table A1) between the
      // language and quality stages — off by default: the published
      // thresholds target web crawl; enable for crawl-shaped corpora
      repetitionFilter: Boolean = false)

  final case class Report(stages: Seq[(String, Long)], cleaned: DataFrame)

  /** `collectStats = false` skips the intermediate stage counts (each is a
    * separate action recomputing the lineage so far) — use it when only the
    * cleaned corpus matters. The exact-dedup result is locally checkpointed
    * either way: the near-dup stage consumes it from several plan branches. */
  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config(), collectStats: Boolean = true): Report = {
    val stages = Seq.newBuilder[(String, Long)]
    def stat(name: String, df: DataFrame): Unit =
      if (collectStats) stages += name -> df.count()
    stat("input", docs)

    val langOk = docs.filter(
      TextFunctions.languageId(col(textCol)).isInCollection(cfg.allowedLangs))
    stat("lang_filter", langOk)

    val repOk =
      if (!cfg.repetitionFilter) langOk
      else langOk.filter(TextFunctions.gopherRepetitionOk(col(textCol)))
    if (cfg.repetitionFilter) stat("repetition_filter", repOk)

    val qualityOk = repOk.filter(
      TextFunctions.qualityScore(col(textCol), cfg.stopwords) >= cfg.minQuality)
    stat("quality_filter", qualityOk)

    val exactDeduped = Dedup.exactKeepFirst(qualityOk, textCol, idCol)
      .ckpt()
    stat("exact_dedup", exactDeduped)

    val pairs = NearDup.minhashPairs(exactDeduped, idCol, textCol,
      cfg.shingleSize, cfg.bands, cfg.rowsPerBand, cfg.jaccardThreshold,
      cfg.maxBucketSize)
    val cleaned =
      if (cfg.keepBestQuality) {
        // score once, keep the best copy per cluster, drop the helper —
        // one extra scan-side projection over the checkpointed stage
        val scored = exactDeduped.withColumn("__q",
          TextFunctions.qualityScore(col(textCol), cfg.stopwords))
        Components.keepClusterBest(scored, idCol, "__q", pairs).drop("__q")
      } else Components.keepClusterRepresentatives(exactDeduped, idCol, pairs)
    stat("neardup_dedup", cleaned)

    Report(stages.result(), cleaned)
  }
}
