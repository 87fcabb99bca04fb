package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** BOUNDED-STATE live variant of [[QuantileStream]] — the third
  * member of the exact-twin / TTL-twin pattern ([[AnomalyStream]] /
  * [[AnomalyStreamTtl]]): same exact rank selection, but windows
  * FINALIZE on the event-time watermark instead of living forever.
  * Where the anomaly TTL is processing-time (a key's span has no
  * natural end), a time-window's lifecycle IS event time — so this
  * variant uses `EventTimeTimeout`: when the watermark passes
  * `window end + allowedLateness`, the window's value map collapses
  * to an O(1) CLOSED tombstone.
  *
  * THE CONTRACT — under-report only, never fabricate:
  *  1. While open, emissions are EXACTLY the exact twin's (shared
  *     selection arithmetic, max-`seen` consumer contract).
  *  2. A late event inside `allowedLateness` re-ranks its window
  *     exactly (same as the exact twin).
  *  3. An event arriving after its window CLOSED is DROPPED — it
  *     re-opens NOTHING. The tombstone (not `state.remove()`) is what
  *     makes this safe: removal would let late stragglers re-create
  *     the window from scratch and, once their count exceeded the
  *     pre-close `seen`, OVERWRITE the final answer with a partial
  *     one under the max-`seen` rule. The tombstone pins `seen` and
  *     drops arrivals, so the pre-close emission stays the winner.
  *
  * State: O(distinct quantized values) per OPEN window (the same
  * loud `maxDistinct` bound as the twins), O(1) per closed window.
  * Closed tombstones persist (the [[AnomalyStreamTtl]] stance: they
  * are 2 fields, and removing them re-opens the door they close).
  *
  * Input needs (key, w, qv) like the exact twin PLUS `ts` (the event
  * timestamp the watermark runs on — pass the ORIGINAL event time,
  * not the window start, so lateness means what the pipeline's
  * watermark means). */
object QuantileStreamTtl {
  import QuantileStream.{QEvent, QRow}

  case class TsQEvent(key: String, w: Long, qv: Long,
    ts: java.sql.Timestamp)
  case class QTtlState(counts: Map[Long, Long], seen: Long,
    closed: Boolean)

  private[graft] def fn(pcts: Seq[Int], maxDistinct: Long,
      windowSeconds: Long, latenessMillis: Long)(
      group: (String, Long), it: Iterator[TsQEvent],
      state: GroupState[QTtlState]): Iterator[QRow] = {
    if (state.hasTimedOut) {
      // watermark passed window end + lateness: finalize to the
      // closed tombstone; no further timeout (it is permanent, O(1))
      val s = state.get
      state.update(QTtlState(Map.empty, s.seen, closed = true))
      Iterator.empty
    } else {
      val prev = state.getOption
        .getOrElse(QTtlState(Map.empty, 0L, closed = false))
      val closeMs = (group._2 + windowSeconds) * 1000L + latenessMillis
      if (prev.closed) {
        // post-close straggler: dropped, re-opens nothing (contract 3)
        Iterator.empty
      } else if (state.getCurrentWatermarkMs() >= closeMs) {
        // a window already past its close time with NO open state: a
        // fresh-timestamp event carrying a stale window id (a corrupt
        // w/ts pairing — the event-time filter only vets ts). Arming
        // the timeout would hand Spark a timestamp before the
        // watermark, an IllegalArgumentException that kills the query
        // and crash-loops on checkpoint replay. Treat it exactly like
        // the tombstone path — the window is closed whether or not it
        // ever opened — and pin the tombstone so later twins drop too.
        state.update(QTtlState(Map.empty, prev.seen, closed = true))
        Iterator.empty
      } else {
        val add = it.foldLeft(Map.empty[Long, Long]) { (acc, e) =>
          acc.updated(e.qv, acc.getOrElse(e.qv, 0L) + 1L) }
        if (add.isEmpty) Iterator.empty
        else {
          val merged = add.foldLeft(prev.counts) { case (acc, (qv, c)) =>
            acc.updated(qv, acc.getOrElse(qv, 0L) + c) }
          require(merged.size <= maxDistinct,
            s"QuantileStreamTtl: (${group._1}, ${group._2}) holds " +
              s"${merged.size} distinct quantized values — beyond " +
              s"maxDistinct=$maxDistinct; use a sketch for this domain")
          val seen = prev.seen + add.valuesIterator.sum
          state.update(QTtlState(merged, seen, closed = false))
          state.setTimeoutTimestamp(closeMs)
          val n = merged.valuesIterator.sum
          val sorted = merged.toArray.sortBy(_._1)
          pcts.iterator.map { p =>
            val rank = (n * p + 99) / 100
            var cum = 0L
            var i = 0
            while (cum < rank) { cum += sorted(i)._2; i += 1 }
            QRow(group._1, group._2, p, n,
              sorted(i - 1)._1.toDouble / 10000.0, seen)
          }
        }
      }
    }
  }

  /** `events` needs (key: string, w: long window-start epoch-seconds,
    * qv: long quantized value, ts: timestamp). The caller's watermark
    * delay should be ≥ `allowedLateness` (the watermark is what fires
    * the close; a shorter delay just closes windows earlier). */
  def quantiles(events: DataFrame, pcts: Seq[Int] = Seq(50, 95),
      maxDistinct: Long = 100000L, windowSeconds: Long = 3600L,
      allowedLateness: java.time.Duration =
        java.time.Duration.ofMinutes(10),
      watermarkDelay: String = "10 minutes"): Dataset[QRow] = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    require(maxDistinct >= 1L, s"maxDistinct=$maxDistinct")
    require(windowSeconds >= 1L, s"windowSeconds=$windowSeconds")
    require(!allowedLateness.isNegative,
      s"allowedLateness=$allowedLateness must be non-negative — a " +
        "negative lateness would arm timeouts behind the watermark")
    val spark = events.sparkSession
    import spark.implicits._
    val sortedPcts = pcts.sorted
    events
      .filter(org.apache.spark.sql.functions.col("key").isNotNull &&
        org.apache.spark.sql.functions.col("w").isNotNull &&
        org.apache.spark.sql.functions.col("qv").isNotNull &&
        org.apache.spark.sql.functions.col("ts").isNotNull)
      .withWatermark("ts", watermarkDelay)
      .as[TsQEvent](Encoders.product[TsQEvent])
      .groupByKey(e => (e.key, e.w))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        fn(sortedPcts, maxDistinct, windowSeconds,
          allowedLateness.toMillis))
  }
}
