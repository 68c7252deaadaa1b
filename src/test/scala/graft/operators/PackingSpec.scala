package graft.operators

import graft.SparkSpec

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("packBins: budget-aligned bins, per shard, deterministic") {
    val docs = Seq(
      // shard A: 60+60 fill bin 0 (budget 100 exceeded at 120 -> doc 3
      // starts at offset 120 -> bin 1), then 90 -> offset 210 -> bin 2
      (1L, "A", 60), (2L, "A", 60), (3L, "A", 90),
      // shard B independent: big doc spills but still gets its own start
      (10L, "B", 250), (11L, "B", 10)
    ).toDF("id", "shard", "n")
    val out = Packing.packBins(docs, "id", "n", Seq("shard"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 10L -> 0L, 11L -> 2L))
    // pure function of (shard, order, counts): identical on rerun
    assert(out == Packing.packBins(docs, "id", "n", Seq("shard"), 100)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap)
  }

  test("packBins refuses a global (unsharded) ordering") {
    intercept[IllegalArgumentException] {
      Packing.packBins(Seq((1L, 5)).toDF("id", "n"), "id", "n", Nil, 100)
    }
  }

  test("bpeTokenCount segments like the GPT-2 pretokenizer (sans lookahead)") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val df = Seq((1L, "It's 2026, graft-v4 works!")).toDF("id", "text")
    val n = df.select(TextFunctions.bpeTokenCount(col("text")))
      .collect().head.getInt(0)
    // It | 's | ' 2026' | , | ' graft' | - | v | 4 | ' works' | !
    assert(n == 10, s"got $n segments")
  }

  test("redact scrubs URLs and emails, counts spans, leaves clean text alone") {
    import org.apache.spark.sql.functions.col
    import graft.functions.TextFunctions
    val df = Seq(
      (1L, "contact bob@example.com or see https://x.co/a?b=1 today"),
      (2L, "no pii here at all"),
      (3L, "mail a.b-c_d@sub.domain.org and x@y.io")
    ).toDF("id", "text")
    val out = df.select(col("id"),
        TextFunctions.redact(col("text")).as("t"),
        TextFunctions.redactionCount(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(out(1L) == ("contact <EMAIL> or see <URL> today", 2))
    assert(out(2L) == ("no pii here at all", 0))
    assert(out(3L) == ("mail <EMAIL> and <EMAIL>", 2))
  }

  test("packSequences: member order, separator, tallies, bin alignment") {
    val docs = Seq(
      (1L, "s", "a a a", 3), (2L, "s", "b b", 2), (3L, "s", "c c c", 3),
      (4L, "t", "x", 1)
    ).toDF("doc_id", "shard", "text", "n_tokens")
    // target 5 in shard s: cum-starts 0,3,5 -> bins 0,0,1
    val out = Packing
      .packSequences(docs, "doc_id", "text", "n_tokens", Seq("shard"), 5)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(out(("s", 0L)) == ((2L, 5L, "a a a <eod> b b")))
    assert(out(("s", 1L)) == ((1L, 3L, "c c c")))
    assert(out(("t", 0L)) == ((1L, 1L, "x")))
  }
}
