package graft.operators

import graft.SparkSpec

/** Empirical recall gate for the TEXT near-dup serving path (q27):
  * minhashPairs candidates vs the exact n-gram Jaccard join's ground
  * truth on the sf0.01 documents corpus — the text twin of
  * AnnRecallSpec. Banding theory (b=8, r=2) puts candidate probability
  * at 1-(1-j²)⁸: ≈0.90 at j=0.5 and ≥0.995 at j≥0.7, so the gate
  * asserts near-perfect recall on comfortably-above-threshold pairs and
  * exact agreement of the reported similarity values. */
class MinhashRecallSpec extends SparkSpec {

  test("minhash candidates recover the exact join's pairs at j >= 0.7") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val exact = NearDup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleSize = 3, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    val found = NearDup.minhashPairs(docs, "doc_id", "text",
        shingleSize = 3, bands = 8, rowsPerBand = 2, threshold = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
      .toMap
    // precision is structural: the verify stage computes EXACT jaccard
    // over the same shingle space, so every found pair must appear in
    // the exact join's result with the identical value
    found.foreach { case (pair, j) =>
      assert(exact.get(pair).contains(j),
        s"found pair $pair j=$j disagrees with exact ${exact.get(pair)}")
    }
    // recall on comfortably-above-threshold truth
    val strong = exact.filter(_._2 >= 0.7)
    val hit = strong.keys.count(found.contains)
    info(s"strong pairs ${strong.size}, hit $hit; " +
      s"all-truth ${exact.size}, found ${found.size}")
    assert(strong.nonEmpty, "corpus lost its planted near-dups?")
    assert(hit.toDouble / strong.size >= 0.9,
      s"recall ${hit.toDouble / strong.size} on j>=0.7 pairs")
  }
}
