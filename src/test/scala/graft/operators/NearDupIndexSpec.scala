package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class NearDupIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft_ndidx_").toString

  private val corpusRows = Seq(
    (10L, "the quick brown fox jumps over the lazy dog again and again"),
    (11L, "pack my box with five dozen liquor jugs right now please"),
    (12L, "how vexingly quick daft zebras jump over and over and over"))

  test("probe finds batch-vs-corpus near-dups without touching corpus text") {
    val root = tmpDir() + "/ndidx"
    val corpusPath = tmpDir() + "/corpus_src"
    corpusRows.toDF("doc_id", "text").write.parquet(corpusPath)
    val corpus = spark.read.parquet(corpusPath)
    NearDupIndex.write(corpus, "doc_id", "text", root, shingleSize = 2)

    val batch = Seq(
      // near-dup of doc 10 (one word changed)
      (100L, "the quick brown cat jumps over the lazy dog again and again"),
      // nothing like the corpus
      (101L, "completely unrelated text about streaming window semantics")
    ).toDF("doc_id", "text")
    val out = NearDupIndex.probe(spark, root, batch, "doc_id", "text",
      threshold = 0.5)
    val pairs = out.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((100L, 10L)))
    val j = out.collect().head.getDouble(2)
    assert(j > 0.5 && j < 1.0, s"jaccard $j")
    // the probe's jaccard equals the full recompute's jaccard
    val full = NearDup.minhashPairs(
      corpus.unionAll(batch), "doc_id", "text", shingleSize = 2,
      threshold = 0.5)
      .filter(col("id_a") === 10L && col("id_b") === 100L)
      .collect()
    assert(full.nonEmpty && math.abs(full.head.getDouble(2) - j) < 1e-12)
    // the probe plan reads the INDEX, never the corpus source files
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains(root), s"index path missing from probe plan")
    assert(!plan.contains(corpusPath),
      s"probe re-read corpus text:\n$plan")
  }

  test("oversized stored cells star to the stored min id") {
    val root = tmpDir() + "/ndidx_big"
    val dupText = "all work and no play makes jack a dull boy forever more"
    val corpus = ((200L until 500L).map(i => (i, dupText)) ++ corpusRows)
      .toDF("doc_id", "text")
    NearDupIndex.write(corpus, "doc_id", "text", root, shingleSize = 2)
    val batch = Seq((900L, dupText)).toDF("doc_id", "text")
    val out = NearDupIndex.probe(spark, root, batch, "doc_id", "text",
        threshold = 0.9, maxBucketSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // one star to the cell's min id (200), not 300 pairwise candidates
    assert(out.toSeq == Seq((900L, 200L, 1.0)))
  }

  test("append folds a batch in; later probes see it") {
    val root = tmpDir() + "/ndidx_app"
    NearDupIndex.write(corpusRows.toDF("doc_id", "text"), "doc_id", "text",
      root, shingleSize = 2)
    val batch = Seq(
      (300L, "a wholly novel document with its own words entirely")
    ).toDF("doc_id", "text")
    NearDupIndex.append(spark, root, batch, "doc_id", "text")
    // a later batch near-dup of the appended doc is found via the index
    val later = Seq(
      (400L, "a wholly novel document with its own words mostly")
    ).toDF("doc_id", "text")
    val pairs = NearDupIndex.probe(spark, root, later, "doc_id", "text",
        threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((400L, 300L)))
    // stats tables reflect the append exactly
    assert(spark.read.parquet(s"$root/docs").count() == 4)
    // probe parameters come from the stored meta: a too-high threshold
    // still verifies through the same banding and just filters out
    assert(NearDupIndex.probe(spark, root, later, "doc_id", "text",
      threshold = 0.99).collect().isEmpty)
  }
}
