package graft.operators

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
      jaccardThreshold: Double = 0.5)

  final case class Report(stages: Seq[(String, Long)], cleaned: DataFrame)

  def clean(docs: DataFrame, idCol: String, textCol: String,
      cfg: Config = Config()): Report = {
    val stages = Seq.newBuilder[(String, Long)]
    stages += "input" -> docs.count()

    val langOk = docs.filter(
      TextFunctions.languageId(col(textCol)).isInCollection(cfg.allowedLangs))
    stages += "lang_filter" -> langOk.count()

    val qualityOk = langOk.filter(
      TextFunctions.qualityScore(col(textCol), cfg.stopwords) >= cfg.minQuality)
    stages += "quality_filter" -> qualityOk.count()

    val exactDeduped = Dedup.exactKeepFirst(qualityOk, textCol, idCol)
    stages += "exact_dedup" -> exactDeduped.count()

    val pairs = NearDup.minhashPairs(exactDeduped, idCol, textCol,
      cfg.shingleSize, cfg.bands, cfg.rowsPerBand, cfg.jaccardThreshold)
    val cleaned = Components.keepClusterRepresentatives(
      exactDeduped, idCol, pairs)
    stages += "neardup_dedup" -> cleaned.count()

    Report(stages.result(), cleaned)
  }
}
