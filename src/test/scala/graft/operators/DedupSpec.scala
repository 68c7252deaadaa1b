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
}
