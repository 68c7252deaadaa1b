package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Sessionization: split each user's event sequence into sessions separated
  * by inactivity gaps > `gapSeconds`.
  *
  * Two implementations with identical semantics:
  *  - [[batch]]: declarative gaps-and-islands (lag + running sum windows) —
  *    the scale path for batch backfills: two window passes over one
  *    hash-partition shuffle on the user key, all codegen'd.
  *  - [[stateful]]: `flatMapGroupsWithState` — the Structured Streaming
  *    path (custom keyed state); also runs on batch Datasets, which is how
  *    the spec cross-checks it against [[batch]].
  */
object Sessionize {

  /** Output: one row per session. */
  final case class Session(user_id: Long, session_start: Long,
      session_end: Long, n_events: Long)

  /** Internal row shape for the stateful path (public: Spark's generated
    * deserializer must be able to instantiate it). */
  final case class Ev(user_id: Long, ts: Timestamp, event_id: Long)

  /** Gaps-and-islands: brk = 1 where the gap from the previous event
    * exceeds the timeout; session id = running sum of brk. */
  def batch(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val withBrk = events
      .withColumn("__prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("__brk",
        when(col("__prev_ts").isNull, 0)
          .when(unix_timestamp(col("ts")) - unix_timestamp(col("__prev_ts"))
            > gapSeconds, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__brk"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBrk.groupBy(col("user_id"), col("__sid"))
      .agg(
        min(unix_timestamp(col("ts"))).as("session_start"),
        max(unix_timestamp(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Keyed-state formulation. On a stream, emits completed sessions as
    * state times out; on a batch Dataset each group arrives complete and
    * all sessions are emitted at once. */
  def stateful(events: DataFrame, gapSeconds: Long): Dataset[Session] = {
    implicit val evEnc = Encoders.product[Ev]
    implicit val longEnc = Encoders.scalaLong
    implicit val sessEnc = Encoders.product[Session]

    val ds = events
      .select(col("user_id").cast("long"), col("ts"), col("event_id").cast("long"))
      .as[Ev]

    def fn(userId: Long, it: Iterator[Ev],
        state: GroupState[Long]): Iterator[Session] = {
      val sorted = it.toVector.sortBy(e => (e.ts.getTime, e.event_id))
      val sessions = Vector.newBuilder[Session]
      var start = 0L
      var end = 0L
      var n = 0L
      sorted.foreach { e =>
        val sec = e.ts.getTime / 1000
        if (n == 0) { start = sec; end = sec; n = 1 }
        else if (sec - end > gapSeconds) {
          sessions += Session(userId, start, end, n)
          start = sec; end = sec; n = 1
        } else { end = sec; n += 1 }
      }
      if (n > 0) sessions += Session(userId, start, end, n)
      sessions.result().iterator
    }

    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, Session](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())(fn)
  }
}
