package graft.operators

import graft.SparkSpec

/** The oversized-bucket guard on the banded LSH self-joins: a planted
  * degenerate corpus (thousands of identical documents — the
  * duplicate-heavy-crawl case) must yield a linear representative STAR
  * per hot cell, never the B²/2 clique that funnels into one reducer.
  * Small cells keep exact clique semantics. */
class BucketGuardSpec extends SparkSpec {
  import spark.implicits._

  private val B = 5000 // one hot LSH cell of this size per band

  // ids 1..B are byte-identical docs; 9001/9002 are a small near-dup pair
  // living in their own (small) buckets.
  private lazy val degenerate = (
    (1L to B.toLong).map(i =>
      (i, "the quick brown fox jumps over the lazy dog again and again")) ++
    Seq(
      (9001L, "graft builds spark native analytics with catalyst expressions and structured streaming today"),
      (9002L, "graft builds spark native analytics with catalyst expressions and structured streaming tomorrow"))
  ).toDF("doc_id", "text")

  test("minhashPairs stars an oversized cell and keeps small cells exact") {
    val out = NearDup.minhashPairs(degenerate, "doc_id", "text",
        shingleSize = 2, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxBucketSize = 100)
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (big, small) = out.partition(_._2 <= B)
    // hot cell: exactly B-1 pairs, every one anchored at the minimum id
    assert(big.size == B - 1, s"expected star of ${B - 1}, got ${big.size}")
    assert(big.forall(p => p._1 == 1L && p._3 == 1.0))
    assert(big.map(_._2).sorted == (2L to B.toLong))
    // the unrelated small-bucket pair is still found exactly
    assert(small.map(p => (p._1, p._2)) == Seq((9001L, 9002L)))
  }

  test("simhashPairs stars an oversized cell") {
    val out = NearDup.simhashPairs(degenerate, "doc_id", "text",
        bands = 4, maxHamming = 8, maxBucketSize = 100)
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val big = out.filter(_._2 <= B)
    assert(big.size == B - 1)
    assert(big.forall(p => p._1 == 1L && p._3 == 0))
  }

  test("cosineNearDupPairs stars an oversized cell") {
    val vec = Seq(0.6, 0.8, 0.0, 0.0, 0.1, -0.2, 0.3, 0.05)
    val vecs = ((1L to B.toLong).map(i => (i, vec)) ++
        Seq((9001L, Seq(-0.9, 0.1, 0.2, -0.3, 0.0, 0.4, -0.1, 0.2))))
      .toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairs(vecs, "vec_id", "embedding",
        threshold = 0.9, bands = 4, planesPerBand = 4, dim = 8,
        maxBucketSize = 100)
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.size == B - 1)
    assert(out.forall(p => p._1 == 1L && math.abs(p._3 - 1.0) < 1e-9))
  }

  test("a sub-threshold interloper with the minimum id cannot lose the cluster") {
    // ids 100.. are identical; id 1 is SIMILAR enough to share LSH cells
    // (two words changed) but fails the 0.9 verify threshold. If the
    // guard starred only on the cell minimum (= the interloper) and the
    // earlier-band filter then suppressed the true duplicates' own
    // cells, the whole 5000-doc cluster would vanish — the exact flaw
    // bandedCandidates' adjusted-key construction exists to prevent.
    val dupText = "the quick brown fox jumps over the lazy dog again and again"
    val docs = ((100L until (100L + B)).map(i => (i, dupText)) :+
      (1L, "the quick brown cat jumps over the lazy dog again and never"))
      .toDF("doc_id", "text")
    val out = NearDup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 2, bands = 8, rowsPerBand = 2, threshold = 0.9,
        maxBucketSize = 100)
      .rows.map(r => (r.getLong(0), r.getLong(1)))
    // every true duplicate is connected to the dup-cluster minimum
    val clusterPairs = out.filter(p => p._1 >= 100L)
    assert(clusterPairs.size == B - 1,
      s"cluster fragmented: ${clusterPairs.size} of ${B - 1} pairs")
    assert(clusterPairs.forall(_._1 == 100L))
    // and the interloper itself was (rightly) verified away
    assert(!out.exists(p => p._1 == 1L))
  }

  test("guard leaves sub-threshold cells byte-identical to the unguarded form") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox leaps over the lazy dog again and again"),
      (3L, "completely different content about spark catalyst optimizer")
    ).toDF("doc_id", "text")
    def run(cap: Int) = NearDup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 2, bands = 8, rowsPerBand = 2, threshold = 0.5,
        maxBucketSize = cap)
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(run(2) == run(Int.MaxValue))
  }
}
