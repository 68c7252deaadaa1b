package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4 docs, hand-countable: "rare" appears only in doc 3; "cat" in all.
  private def corpus = Seq(
    (0L, "cat dog cat"),
    (1L, "cat fish"),
    (2L, "dog dog dog cat"),
    (3L, "rare cat")
  ).toDF("doc_id", "text")

  /** Independent BigInt replay of Bm25's documented score formula. */
  private def refScore(n: Long, l: Long, df: Long, tf: Long, dl: Long): Long =
    ((BigInt(2 * n - 2 * df + 1) * 22 * tf * l * 1000000) /
      (BigInt(2 * df + 1) * (BigInt(10) * l * tf + 3 * l + 9 * dl * n)))
      .toLong

  test("postings: tf and dl are exact") {
    val p = Bm25.postings(corpus, "doc_id", "text")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("term")) ->
        (r.getAs[Long]("tf"), r.getAs[Int]("dl"))).toMap
    assert(p((0L, "cat")) == ((2L, 3)))
    assert(p((2L, "dog")) == ((3L, 4)))
    assert(p((3L, "rare")) == ((1L, 2)))
    assert(p.size == 8) // (0:cat,dog)(1:cat,fish)(2:dog,cat)(3:rare,cat)
  }

  test("topK scores match the documented exact-integer formula") {
    // corpus: N=4 docs, L=3+2+4+2=11 tokens; df(cat)=4, df(rare)=1
    val out = Bm25.topK(corpus, "doc_id", "text", Seq("cat", "rare"), k = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("matched"), r.getAs[Long]("score_ppm"))).toMap
    val catScore = Map( // (tf, dl) per doc for "cat"
      0L -> refScore(4, 11, 4, 2, 3), 1L -> refScore(4, 11, 4, 1, 2),
      2L -> refScore(4, 11, 4, 1, 4), 3L -> refScore(4, 11, 4, 1, 2))
    assert(out(0L) == ((1L, catScore(0L))))
    assert(out(3L) == ((2L, catScore(3L) + refScore(4, 11, 1, 1, 2))))
    // the rare term dominates: doc 3 outranks everything
    assert(out(3L)._2 > out.values.map(_._2).filterNot(_ == out(3L)._2).max)
  }

  test("rank order: higher tf wins at equal dl; rarer term outweighs common") {
    val ranked = Bm25.topK(corpus, "doc_id", "text", Seq("cat", "rare"), 4)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    assert(ranked.head == 3L) // has the only "rare" posting
  }

  test("topKIndexed == topK (bucket pruning changes cost, not results)") {
    val path = java.nio.file.Files.createTempDirectory("bm25-idx").toString
    try {
      Bm25.writeIndex(corpus, "doc_id", "text", path, buckets = 8)
      val direct = Bm25.topK(corpus, "doc_id", "text", Seq("cat", "rare"), 4)
        .collect().toSeq
      val probed = Bm25.topKIndexed(spark, path, "doc_id",
        Seq("cat", "rare"), 4, buckets = 8).collect().toSeq
      assert(direct == probed)
    } finally graft.util.Fs.deleteRecursively(new java.io.File(path))
  }

  test("indexed probe scans only the query terms' bucket partitions") {
    val path = java.nio.file.Files.createTempDirectory("bm25-idx2").toString
    try {
      Bm25.writeIndex(corpus, "doc_id", "text", path, buckets = 64)
      val plan = Bm25.topKIndexed(spark, path, "doc_id", Seq("rare"), 4,
        buckets = 64).queryExecution.executedPlan.toString
      // partition pruning: the scan reports a pushed bucket filter and the
      // postings read touches 1 of 64 bucket dirs (visible as one
      // partition value in the FileScan's partition filters)
      assert(plan.contains("bucket"), s"no bucket pruning in plan:\n$plan")
    } finally graft.util.Fs.deleteRecursively(new java.io.File(path))
  }

  test("topKBatch: each query's slice equals its standalone topK") {
    val q = Seq((0, "cat"), (0, "rare"), (1, "dog")).toDF("query_id", "term")
    val batch = Bm25.topKBatch(corpus, "doc_id", "text", q, k = 4)
      .collect().groupBy(_.getAs[Int]("query_id"))
    for ((qid, terms) <- Seq(0 -> Seq("cat", "rare"), 1 -> Seq("dog"))) {
      val solo = Bm25.topK(corpus, "doc_id", "text", terms, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      val slice = batch(qid).map(r => (r.getAs[Long]("doc_id"),
        r.getAs[Long]("matched"), r.getAs[Long]("score_ppm"))).toSeq
      assert(slice == solo, s"query $qid")
    }
  }

  test("empty / degenerate inputs are rejected") {
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", Nil, 4)
    }
    intercept[IllegalArgumentException] {
      Bm25.topK(corpus, "doc_id", "text", Seq("cat"), 0)
    }
  }

  test("query terms absent from the corpus yield an empty result, not error") {
    assert(Bm25.topK(corpus, "doc_id", "text", Seq("zzz"), 3).count() == 0)
  }

  test("postingsStateless == postings (the stream-safe per-row form)") {
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "dl", "term", "tf")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getLong(3))).sortBy(t => (t._1, t._3)).toSeq
    assert(norm(Bm25.postingsStateless(corpus, "doc_id", "text")) ==
      norm(Bm25.postings(corpus, "doc_id", "text")))
  }

  test("streamed index: drains are exactly-once and probe == direct topK") {
    val src = java.nio.file.Files.createTempDirectory("bm25-src").toString
    val idx = java.nio.file.Files.createTempDirectory("bm25-sidx").toString
    val ckp = java.nio.file.Files.createTempDirectory("bm25-ckp").toString
    try {
      val half1 = corpus.filter($"doc_id" < 2L)
      val half2 = corpus.filter($"doc_id" >= 2L)
      half1.write.mode("append").parquet(src)
      val schema = corpus.schema
      Bm25.indexIngestOnce(spark, src, schema, idx, ckp, "doc_id", "text",
        buckets = 8)
      val probe1 = Bm25.topKStreamed(spark, idx, "doc_id",
        Seq("cat", "rare"), 4, buckets = 8).collect().toSeq
      assert(probe1 == Bm25.topK(half1, "doc_id", "text",
        Seq("cat", "rare"), 4).collect().toSeq)
      // re-drain with nothing new: index unchanged (exactly-once)
      Bm25.indexIngestOnce(spark, src, schema, idx, ckp, "doc_id", "text",
        buckets = 8)
      assert(Bm25.topKStreamed(spark, idx, "doc_id", Seq("cat", "rare"), 4,
        buckets = 8).collect().toSeq == probe1)
      // new documents arrive: incremental drain == batch recompute
      half2.write.mode("append").parquet(src)
      Bm25.indexIngestOnce(spark, src, schema, idx, ckp, "doc_id", "text",
        buckets = 8)
      assert(Bm25.topKStreamed(spark, idx, "doc_id", Seq("cat", "rare"), 4,
        buckets = 8).collect().toSeq ==
        Bm25.topK(corpus, "doc_id", "text", Seq("cat", "rare"), 4)
          .collect().toSeq)
    } finally Seq(src, idx, ckp).foreach(p =>
      graft.util.Fs.deleteRecursively(new java.io.File(p)))
  }
}

class FusionSpec extends SparkSpec {
  import spark.implicits._

  test("reciprocalRank: hand-computed two-system fusion") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rank")
    val r2 = Seq((20L, 1), (10L, 2), (40L, 3)).toDF("id", "rank")
    val out = Fusion.reciprocalRank(Seq(r1, r2), "id", k = 4)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_systems"),
        r.getAs[Long]("rrf_ppb"))).toSeq
    def c(rank: Int) = 1000000000L / (60 + rank)
    // 10: 1/61+1/62, 20: 1/62+1/61 (tie, id breaks), 30: 1/63, 40: 1/63
    assert(out == Seq(
      (10L, 2L, c(1) + c(2)), (20L, 2L, c(1) + c(2)),
      (30L, 1L, c(3)), (40L, 1L, c(3))))
  }

  test("fusion is corpus-independent: no scan wider than the candidates") {
    val r1 = Seq((1L, 1)).toDF("id", "rank")
    val out = Fusion.reciprocalRank(Seq(r1), "id", k = 1)
    assert(out.collect().head.getAs[Long]("rrf_ppb") == 1000000000L / 61)
  }
}
