package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, 10L, "click", "2024-01-01 00:00:01"),
    (2L, 10L, "click", "2024-01-01 00:00:01"), // same key+ts: id tiebreak
    (3L, 10L, "click", "2024-01-01 00:00:05"),
    (4L, 10L, "view", "2024-01-01 00:00:02"),
    (5L, 11L, "click", "2024-01-01 00:00:03")
  ).toDF("event_id", "user_id", "event_type", "ts")
    .withColumn("ts", to_timestamp(col("ts")))

  test("byKey keeps exactly one deterministic row per composite key") {
    val out = Dedup.byKey(events, Seq("user_id", "event_type"),
      Seq(col("ts"), col("event_id")))
    assert(out.select("event_id").rows.map(_.getLong(0)).sorted ==
      Seq(1L, 4L, 5L))
  }

  test("byKey output keys are unique and a subset of input keys") {
    val out = Dedup.byKey(events, Seq("user_id", "event_type"),
      Seq(col("event_id")))
    val keys = out.select("user_id", "event_type").rows
    assert(keys.distinct.size == keys.size)
    assert(keys.size == 3)
  }

  test("exactSummary groups by content digest with min-id winner") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactSummary(docs, "text", "doc_id")
      .orderBy("keep_id").rows
    assert(out.map(r => (r.getLong(1), r.getLong(2))) == Seq((1L, 2L), (3L, 1L)))
  }

  test("exactKeepFirst returns full surviving rows") {
    val docs = Seq((1L, "same text"), (2L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val out = Dedup.exactKeepFirst(docs, "text", "doc_id")
    assert(out.select("doc_id").rows.map(_.getLong(0)).sorted == Seq(1L, 3L))
    assert(out.columns.toSeq == Seq("doc_id", "text"))
  }

  test("spanDedup: first occurrence wins corpus-wide; docs reassemble in order") {
    val docs = Seq(
      (1L, "a b c d e f"),   // spans: "a b", "c d", "e f"
      (2L, "c d x y a b"),   // "c d" and "a b" already seen in doc 1
      (3L, "a b c d")        // fully duplicated -> disappears
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 2)
      .rows.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c d e f", 3L)))
    assert(out(2L) == (("x y", 1L))) // survivors keep their relative order
    assert(!out.contains(3L))
  }

  test("boilerplateStrip removes every occurrence of ubiquitous spans") {
    val docs = Seq(
      (1L, "a b c d"),   // "a b" appears in docs 1,2,3 -> boilerplate
      (2L, "a b x y"),
      (3L, "a b"),       // only boilerplate -> document disappears
      (4L, "x y p q")    // "x y" df=2 < 3 -> survives everywhere
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text",
        spanTokens = 2, minDocFreq = 3)
      .rows.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("c d", 1L)))   // first occurrence removed too
    assert(out(2L) == (("x y", 1L)))
    assert(!out.contains(3L))
    assert(out(4L) == (("x y p q", 2L)))
  }

  test("boilerplateStrip keeps within-doc repeats below the doc-frequency bar") {
    val docs = Seq(
      (1L, "m n m n m n"), // df("m n") = 1 — internal repetition is
      (2L, "p q r s")      // dedup's business, not boilerplate's
    ).toDF("doc_id", "text")
    val out = Dedup.boilerplateStrip(docs, "doc_id", "text",
        spanTokens = 2, minDocFreq = 2)
      .rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "m n m n m n")
    assert(out(2L) == "p q r s")
  }

  test("runDedup: only runs of >= minRunSpans consecutive dup spans drop") {
    val docs = Seq(
      // doc 1 defines everything
      (1L, "a b c d e f g h"),            // spans: "a b","c d","e f","g h"
      // doc 2: "c d","e f" form a 2-span dup run (dropped); the lone
      // dup span "a b" is isolated between fresh spans and survives
      (2L, "a b x y c d e f z w"),
      // doc 3: alternating dup/fresh — every dup run has length 1, so
      // nothing drops at minRunSpans = 2
      (3L, "a b m n c d o p")
    ).toDF("doc_id", "text")
    val out = Dedup.runDedup(docs, "doc_id", "text",
        spanTokens = 2, minRunSpans = 2)
      .rows.map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(1L) == (("a b c d e f g h", 4L)))
    assert(out(2L) == (("a b x y z w", 3L)))
    assert(out(3L) == (("a b m n c d o p", 4L)))
  }

  test("runDedup at minRunSpans=1 equals spanDedup exactly") {
    val docs = Seq(
      (1L, "a b c d e f"), (2L, "c d x y a b"), (3L, "a b c d"),
      (4L, "q r s"), (5L, "s q r")
    ).toDF("doc_id", "text")
    val viaRun = Dedup.runDedup(docs, "doc_id", "text", 2, 1)
      .rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val viaSpan = Dedup.spanDedup(docs, "doc_id", "text", 2)
      .rows.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaRun == viaSpan)
  }

  test("spanDedup: partial tail spans dedup like any other span") {
    val docs = Seq(
      (1L, "p q r"),  // spans "p q", "r" (tail)
      (2L, "r")       // span "r" equals doc 1's tail -> dropped
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedup(docs, "doc_id", "text", spanTokens = 2)
      .rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "p q r"))
  }
}
