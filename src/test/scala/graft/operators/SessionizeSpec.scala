package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private def events = Seq(
    (1L, 10L, "2024-01-01 00:00:00"),
    (2L, 10L, "2024-01-01 00:30:00"), // same session (30 min gap)
    (3L, 10L, "2024-01-01 02:00:00"), // new session (90 min gap)
    (4L, 11L, "2024-01-01 05:00:00")
  ).toDF("event_id", "user_id", "ts")
    .withColumn("ts", to_timestamp(col("ts")))

  test("batch: gap > timeout starts a new session") {
    val out = Sessionize.batch(events, gapSeconds = 3600)
      .orderBy("user_id", "session_start").rows
    assert(out.size == 3)
    assert(out.head.getLong(3) == 2)   // user 10, session 1: 2 events
    assert(out(1).getLong(3) == 1)     // user 10, session 2: 1 event
    assert(out(2).getLong(0) == 11L)
  }

  test("stateful (flatMapGroupsWithState) matches the declarative batch path") {
    val a = Sessionize.batch(events, 3600)
      .select("user_id", "session_start", "session_end", "n_events")
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    val b = Sessionize.stateful(events, 3600)
      .collect().toSeq
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events))
      .sortBy(t => (t._1, t._2))
    assert(a == b)
  }

  test("both paths agree on real event data (sf0.001)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val a = Sessionize.batch(ev, 3600)
      .rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val b = Sessionize.stateful(ev, 3600).collect().toSeq
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).sorted
    assert(a == b && a.nonEmpty)
  }
}
