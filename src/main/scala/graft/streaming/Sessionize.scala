package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with custom state
  * (`flatMapGroupsWithState`) — the stateful-operator rung of the
  * extension ladder (SURVEY §2.9: the reference has no stateful ops;
  * a real engine needs them). Batch twin: queries/Advanced.q32.
  *
  * State per user: open session (start, last-seen, count, sum). An
  * event beyond the gap closes the session (emitted) and opens a new
  * one; event-time timeout flushes idle sessions. State is O(1) per
  * key — the shape that survives unbounded streams.
  */
object Sessionize {

  case class Event(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(start_us: Long, last_us: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_us: Long, end_us: Long,
      n_events: Long, sum_value: Double)

  val DefaultGapUs: Long = 30L * 60 * 1000000L

  def sessionFn(gapUs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    var closed = List.empty[Session]
    var st = state.getOption.orNull
    // process in event-time order within the batch
    for (e <- events.toSeq.sortBy(_.ts_us)) {
      st match {
        case null =>
          st = SessionState(e.ts_us, e.ts_us, 1L, e.value)
        case s if e.ts_us - s.last_us > gapUs =>
          closed ::= Session(userId, s.start_us, s.last_us, s.n, s.sum)
          st = SessionState(e.ts_us, e.ts_us, 1L, e.value)
        case s =>
          st = SessionState(s.start_us, math.max(s.last_us, e.ts_us),
            s.n + 1, s.sum + e.value)
      }
    }
    if (state.hasTimedOut) {
      val s = state.get
      closed ::= Session(userId, s.start_us, s.last_us, s.n, s.sum)
      state.remove()
    } else if (st != null) {
      state.update(st)
      state.setTimeoutTimestamp(st.last_us / 1000 + gapUs / 1000)
    }
    closed.reverseIterator
  }

  /** events frame (user_id, ts_us, value) + watermarked event time →
    * closed sessions stream. */
  def sessions(events: DataFrame, gapUs: Long = DefaultGapUs,
      watermark: String = "1 hour"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withColumn("event_time", timestamp_micros(col("ts_us")))
      .withWatermark("event_time", watermark)
      .as[Event](Encoders.product[Event]) // by-name; extra cols ignored
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(sessionFn(gapUs))
  }
}
