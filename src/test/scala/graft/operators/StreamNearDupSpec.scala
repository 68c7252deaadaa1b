package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gates for the exactly-once streamed crawl dedup
  * ([[NearDupIndex.streamIngest]]): drains are exactly-once (a
  * nothing-new drain lands nothing), cross-batch duplicates are dropped
  * against the index while novel docs are kept, and the streamed index
  * layout (batch_id-partitioned tables, rolled-up cell stats) probes
  * identically to a one-shot [[NearDupIndex.write]] over the same
  * accepted corpus. */
class StreamNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def doc(base: Long): String =
    (0 until 12).map(j => s"t${base}_$j").mkString(" ")

  test("two drains: batch dedup + cross-batch dedup, exactly-once layout") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_").toString
    // arrival 1: docs 0,2,4 distinct, plus 6 an exact twin of 4
    // (within-batch dup); arrival 2: 1 = twin of 0 (cross-batch dup),
    // 3 = twin of 2 (cross-batch dup), 9 novel
    val b1 = Seq((0L, doc(0)), (2L, doc(2)), (4L, doc(4)), (6L, doc(4)))
      .toDF("doc_id", "text")
    val b2 = Seq((1L, doc(0)), (3L, doc(2)), (9L, doc(9)))
      .toDF("doc_id", "text")
    b1.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b1.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    val after1 = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(0L, 2L, 4L), s"after drain 1: $after1")
    b2.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b2.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    val after2 = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after2 == Set(0L, 2L, 4L, 9L), s"after drain 2: $after2")
    // nothing-new drain: no state change (exactly-once bookmark)
    NearDupIndex.streamIngest(spark, s"$root/src", b2.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    val after3 = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(after3 == after2, s"no-op drain changed state: $after3")
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }

  test("streamed index probes identically to a one-shot index on the " +
      "accepted corpus") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_eq_").toString
    val corpus = (0L until 30L by 2L).map(i => (i, doc(i)))
      .toDF("doc_id", "text")
    // two arrivals of disjoint novel docs
    corpus.filter(col("doc_id") < 14).write.mode("append")
      .parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", corpus.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    corpus.filter(col("doc_id") >= 14).write.mode("append")
      .parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", corpus.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    NearDupIndex.write(corpus, "doc_id", "text", s"$root/oneshot")
    // a probe batch with one twin per indexed half + one novel doc
    val batch = Seq((100L, doc(4)), (101L, doc(20)), (102L, doc(777)))
      .toDF("doc_id", "text")
    def pairs(idx: String) =
      NearDupIndex.probe(spark, idx, batch, "doc_id", "text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(p => (p._1, p._2)).toSeq
    val streamed = pairs(s"$root/index")
    val oneshot = pairs(s"$root/oneshot")
    assert(streamed == oneshot && streamed.nonEmpty,
      s"streamed=$streamed oneshot=$oneshot")
    assert(streamed.map(t => (t._1, t._2, t._3)).toSet ==
      Set((100L, 4L, 1.0), (101L, 20L, 1.0)))
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }

  test("compaction folds batch partitions without changing probes, " +
      "and ingest continues after it") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_cmp_").toString
    val b1 = Seq((0L, doc(0)), (2L, doc(2))).toDF("doc_id", "text")
    val b2 = Seq((4L, doc(4)), (6L, doc(6))).toDF("doc_id", "text")
    b1.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b1.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    b2.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b2.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    val batch = Seq((100L, doc(2)), (101L, doc(6))).toDF("doc_id", "text")
    def pairs() = NearDupIndex.probe(spark, s"$root/index", batch,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val before = pairs()
    assert(before == Seq((100L, 2L), (101L, 6L)))
    NearDupIndex.compactStream(spark, s"$root/index")
    assert(pairs() == before, "compaction changed probe results")
    assert(NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 2L, 4L, 6L))
    // everything now lives in ONE batch partition per table
    assert(spark.read.parquet(s"$root/index/accepted")
      .select("batch_id").distinct().count() == 1L)
    // ingest keeps working after compaction: a dup drops, a novel lands
    val b3 = Seq((8L, doc(8)), (9L, doc(0))).toDF("doc_id", "text")
    b3.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b3.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    assert(NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet == Set(0L, 2L, 4L, 6L, 8L))
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }

  test("compacted index survives a lost checkpoint: a restarted batch 0 " +
      "still dedups against the folded corpus") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_lost_").toString
    val b1 = Seq((0L, doc(0)), (2L, doc(2))).toDF("doc_id", "text")
    b1.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b1.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    NearDupIndex.compactStream(spark, s"$root/index")
    // folded rows carry the SENTINEL id, not a real batch id — that is
    // the whole defense below
    assert(spark.read.parquet(s"$root/index/accepted")
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq ==
      Seq(graft.streaming.BatchPartitionIngest.CompactedBatchId))
    // checkpoint lost (or a different dir passed): batch ids restart at
    // 0. Under the old fold-to-min-id behavior, batch 0's own-batch
    // exclusion (batch_id =!= 0) silently excluded the ENTIRE folded
    // corpus and re-accepted every duplicate.
    val b2 = Seq((10L, doc(0)), (12L, doc(12))).toDF("doc_id", "text")
    b2.write.mode("append").parquet(s"$root/src2")
    NearDupIndex.streamIngest(spark, s"$root/src2", b2.schema,
      s"$root/index", s"$root/ckpt2", "doc_id", "text")
    val got = NearDupIndex.accepted(spark, s"$root/index", "doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(got == Set(0L, 2L, 12L),
      s"restarted batch 0 must still see the folded corpus: $got")
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }

  test("a crash inside one table's swap window is repaired by the next " +
      "compaction") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_crash_").toString
    val b1 = Seq((0L, doc(0)), (2L, doc(2))).toDF("doc_id", "text")
    val b2 = Seq((4L, doc(4))).toDF("doc_id", "text")
    b1.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b1.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    b2.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b2.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    val batch = Seq((100L, doc(2)), (101L, doc(4))).toDF("doc_id", "text")
    def pairs() = NearDupIndex.probe(spark, s"$root/index", batch,
        "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val before = pairs()
    assert(before == Seq((100L, 2L), (101L, 4L)))
    // simulate a crash between move(cur, old) and move(new, cur): the
    // docs table is briefly missing, only docs.old holds the state
    java.nio.file.Files.move(
      java.nio.file.Paths.get(s"$root/index/docs"),
      java.nio.file.Paths.get(s"$root/index/docs.old"))
    NearDupIndex.compactStream(spark, s"$root/index")
    assert(pairs() == before,
      "recovery preamble must restore the half-swapped table")
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }

  test("mismatched params against an existing index refuse") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_snd_meta_").toString
    val b = Seq((0L, doc(0))).toDF("doc_id", "text")
    b.write.mode("append").parquet(s"$root/src")
    NearDupIndex.streamIngest(spark, s"$root/src", b.schema,
      s"$root/index", s"$root/ckpt", "doc_id", "text")
    intercept[IllegalArgumentException] {
      NearDupIndex.streamIngest(spark, s"$root/src", b.schema,
        s"$root/index", s"$root/ckpt2", "doc_id", "text", shingleSize = 5)
    }
    graft.util.Fs.deleteRecursively(new java.io.File(root))
  }
}
