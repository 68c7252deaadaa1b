package graft.operators

import graft.SparkSpec

class DocPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("stages filter, dedup exactly, and collapse near-dup chains") {
    val en = "the cat sat on the mat and the dog ran around the yard again"
    val docs = Seq(
      (1L, en),                                      // keeper
      (2L, en),                                      // exact dup of 1
      (3L, en.replace("dog", "fox")),                // near-dup of 1
      (4L, en.replace("cat", "bird").replace("dog", "fox")), // near-dup chain via 3
      (5L, "el perro es un animal que vive en la casa grande"), // wrong lang
      (6L, "the the the the the the the the the the the the")  // low quality
    ).toDF("doc_id", "text")
    val report = DocPipeline.clean(docs, "doc_id", "text",
      DocPipeline.Config(minQuality = 0.5, jaccardThreshold = 0.4))
    val counts = report.stages.toMap
    assert(counts("input") == 6)
    assert(counts("lang_filter") == 5)      // drops the Spanish doc
    assert(counts("quality_filter") == 4)   // drops the stuffed doc
    assert(counts("exact_dedup") == 3)      // 2 collapses into 1
    assert(counts("neardup_dedup") == 1)    // 3,4 collapse into 1's cluster
    assert(report.cleaned.collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("keepBestQuality keeper retains the highest-quality cluster member") {
    val base = "the cat sat on the mat and the dog ran around the yard again"
    val docs = Seq(
      // near-dups; doc 2 repeats a word (lower lexical diversity =
      // lower quality score), so the best-quality keeper picks doc 3
      // over min-id doc 2
      (2L, base.replace("fox", "dog") + " yard yard yard"),
      (3L, base)
    ).toDF("doc_id", "text")
    val minId = DocPipeline.clean(docs, "doc_id", "text",
      DocPipeline.Config(minQuality = 0.1, jaccardThreshold = 0.4),
      collectStats = false).cleaned.collect().map(_.getLong(0)).toSeq
    assert(minId == Seq(2L)) // default policy: lowest id
    val best = DocPipeline.clean(docs, "doc_id", "text",
      DocPipeline.Config(minQuality = 0.1, jaccardThreshold = 0.4,
        keepBestQuality = true),
      collectStats = false).cleaned
    assert(best.columns.toSeq == docs.columns.toSeq) // helper col dropped
    assert(best.collect().map(_.getLong(0)).toSeq == Seq(3L))
  }
}
