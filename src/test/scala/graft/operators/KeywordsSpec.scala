package graft.operators

import graft.SparkSpec

class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  test("topTerms: rare terms outrank ubiquitous ones; exact integer scores") {
    // "common" appears in all 4 docs (df=4); each doc also has a unique
    // term (df=1). With equal tf, score = tf*N*1e6/df makes the unique
    // term worth 4x the common one.
    val docs = Seq(
      (1L, "common unique1 common filler1"),
      (2L, "common unique2 unique2"),
      (3L, "common unique3"),
      (4L, "common unique4")).toDF("doc_id", "text")
    val out = Keywords.topTerms(docs, "doc_id", "text", k = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.sortBy(-_._4)).toMap
    // doc 2: unique2 tf=2 df=1 -> 2*4*1e6/1 = 8e6; common tf=1 df=4 -> 1e6
    assert(byDoc(2L).map(t => (t._2, t._3, t._4)).toSeq ==
      Seq(("unique2", 2L, 8000000L), ("common", 1L, 1000000L)))
    // doc 1 has 3 eligible terms; k=2 keeps the two 4e6-scoring unique
    // ones (filler1/unique1 both df=1 tf=1), common (1e6) is cut
    assert(byDoc(1L).map(_._2).toSet == Set("unique1", "filler1"))
    // every doc got at most k rows
    assert(out.groupBy(_._1).forall(_._2.length <= 2))
  }

  test("topTerms: tie-break on term is deterministic; short tokens ignored") {
    val docs = Seq((1L, "bb aa a x")).toDF("doc_id", "text")
    val out = Keywords.topTerms(docs, "doc_id", "text", k = 5,
      minTokenLen = 2)
      .collect().map(r => r.getString(1))
    // aa and bb tie (tf=1, df=1): term order breaks the tie; "a" and "x"
    // fall under minTokenLen
    assert(out.toSeq == Seq("aa", "bb"))
  }
}
