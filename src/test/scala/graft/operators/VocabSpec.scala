package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabSpec extends SparkSpec {
  import spark.implicits._

  test("truncateToTopK: OOV rewritten, order kept, tie-break on token") {
    // counts: aa=3, bb=2, cc=1, dd=1 — k=2 vocab is {aa, bb};
    // cc/dd fall out
    val docs = Seq(
      (1L, "aa bb cc aa"),
      (2L, "dd aa bb")).toDF("doc_id", "text")
    val out = Vocab.truncateToTopK(docs, "doc_id", "text", k = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2))))
      .toMap
    assert(out(1L) == (("aa bb <unk> aa", 1L)))
    assert(out(2L) == (("<unk> aa bb", 1L)))
  }

  test("truncateToTopK: k-th-place frequency tie breaks on token string") {
    // all four tokens have count 1; k=2 must pick the lexicographically
    // first two (a, b) at ANY parallelism
    val docs = Seq((1L, "d c b a")).toDF("doc_id", "text")
    val out = Vocab
      .truncateToTopK(docs.repartition(8), "doc_id", "text", k = 2)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(out == (("<unk> <unk> b a", 2L)))
  }

  test("truncateToTopK: k covering the vocabulary is the identity") {
    val docs = Seq((1L, "x y z")).toDF("doc_id", "text")
    val out = Vocab.truncateToTopK(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getString(1), r.getLong(2))).head
    assert(out == (("x y z", 0L)))
  }
}
