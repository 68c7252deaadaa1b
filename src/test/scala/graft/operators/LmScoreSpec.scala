package graft.operators

import graft.SparkSpec

class LmScoreSpec extends SparkSpec {
  import spark.implicits._

  test("bigramLogProb: exact count model, mean ln prob, short docs absent") {
    val docs = Seq(
      (1L, "a b a c"), // bigrams: "a b", "b a", "a c"
      (2L, "a b"),     // bigram:  "a b"
      (3L, "solo")     // < 2 tokens -> absent
    ).toDF("doc_id", "text")
    // corpus counts: c12("a b")=2, c12("b a")=1, c12("a c")=1; c1(a)=3, c1(b)=1
    val out = LmScore.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    def r6(x: Double) = BigDecimal(x).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val d1 = (math.log(2.0 / 3) + math.log(1.0) + math.log(1.0 / 3)) / 3
    assert(out(1L) == ((3L, r6(d1))), s"got ${out(1L)}")
    assert(out(2L) == ((1L, r6(math.log(2.0 / 3)))), s"got ${out(2L)}")
    assert(!out.contains(3L))
  }

  test("collocations: sticky pair outranks frequent-but-independent pair") {
    // "p q" always co-occur (3 times, each token only in that pair);
    // "a b" co-occurs 3 times but a and b also appear apart — its PMI
    // must be lower; pairs under minCount don't appear
    val docs = Seq(
      (1L, "p q a b a x b y"),
      (2L, "p q a b a x b y"),
      (3L, "p q a b a x b y")).toDF("doc_id", "text")
    val out = LmScore
      .collocations(docs, "doc_id", "text", minCount = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.nonEmpty && out.head._1 == "p q", s"got ${out.toSeq}")
    val byBg = out.map(o => o._1 -> o._3).toMap
    assert(byBg("p q") > byBg("a b"), s"got $byBg")
    // count columns are the exact corpus counts
    assert(out.find(_._1 == "p q").get._2 == 3L)
  }

  test("bigramLogProb: uniform corpus scores zero everywhere") {
    // every w1 has exactly one continuation -> all probabilities 1
    val docs = Seq((1L, "x y z"), (2L, "x y")).toDF("doc_id", "text")
    val out = LmScore.bigramLogProb(docs, "doc_id", "text")
      .collect().map(r => r.getDouble(2)).toSeq
    assert(out.forall(_ == 0.0), s"got $out")
  }
}
