package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** BOUNDED-STATE live variant of [[FunnelStream]] — the last member
  * of the exact-twin / TTL-twin pattern ([[AnomalyStreamTtl]],
  * [[QuantileStreamTtl]], [[NearDup]]'s eviction): same greedy
  * ordered-step matching (the SHARED [[FunnelStream.matchSteps]] —
  * one code path, not a copy), but each user's funnel lives inside an
  * event-time OBSERVATION WINDOW anchored at their earliest observed
  * event, and closes on the watermark. The exact twin's per-user
  * buffer is cap-bounded but its KEY cardinality is not — an
  * unbounded-lifetime feed accretes one state row per user forever;
  * here a user whose window has passed collapses to an O(1) CLOSED
  * tombstone.
  *
  * A funnel window's lifecycle is EVENT time (the
  * [[QuantileStreamTtl]] stance, not the anomaly monitor's
  * processing-time idleness): the close instant is
  * `first event + window + allowedLateness`, fired by the watermark
  * via `EventTimeTimeout`.
  *
  * THE CONTRACT — under-report only, never fabricate:
  *  1. While open, snapshots are EXACTLY the exact twin's over the
  *     in-window buffered events (shared matcher, max-`n_seen`
  *     consumer rule). With `window` covering the whole feed and no
  *     close before the drain, output ≡ [[FunnelStream]] (spec-gated
  *     against the q93 batch oracle).
  *  2. An event past `window` of the user's first event is outside
  *     the observation window: dropped (a windowed funnel completion
  *     cannot depend on it) — under-reported depth, never phantom.
  *  3. A late event arriving inside `allowedLateness` re-matches its
  *     funnel exactly — including one that REWRITES the window's
  *     origin earlier (the buffer re-sorts and re-filters per batch,
  *     so the anchor is the true min ts among pre-close arrivals,
  *     not the first PROCESSED event). If the rewritten window is
  *     already past the watermark, the user finalizes immediately.
  *  4. An event arriving after its user CLOSED is dropped — it
  *     re-opens nothing. The tombstone (never `state.remove()`) pins
  *     `n_seen`, so the pre-close snapshot stays the max-`n_seen`
  *     winner; removal would let stragglers re-create the user and,
  *     once their count passed the pre-close `n_seen`, OVERWRITE the
  *     final funnel with a partial one.
  *  5. A fresh-watermark event carrying a timestamp whose window is
  *     already closed (`first + window + lateness <= watermark`)
  *     pins the tombstone and drops — arming a timeout behind the
  *     watermark would throw and crash-loop on checkpoint replay
  *     (the [[QuantileStreamTtl]] poison-pill discipline).
  *
  * State: O(min(cap, in-window events)) per OPEN user, O(1) per
  * closed user. Closed tombstones persist — removing them re-opens
  * the miss class they exist to close. */
object FunnelStreamTtl {
  import FunnelStream.Snap

  case class TsStepEvent(user_id: Long, ts_us: Long, step: Int,
    ts: java.sql.Timestamp)
  /** `evs` = in-window (ts_us, step) buffer (`cap` earliest);
    * `nSeen` = ACCEPTED (in-window) event count — strictly increasing
    * across emitted snapshots; dropped out-of-window events are not
    * "seen". Under cap pressure this diverges from the exact twin's
    * tag (which is its post-cap buffer size and stalls at `cap`): both
    * remain monotone — the consumer's max-`n_seen` rule holds — and
    * depth never fabricates either way. */
  case class FTtlState(evs: List[(Long, Int)], nSeen: Long,
    closed: Boolean)

  private[graft] def fn(nSteps: Int, cap: Int, windowMicros: Long,
      latenessMillis: Long)(
      uid: Long, it: Iterator[TsStepEvent],
      state: GroupState[FTtlState]): Iterator[Snap] = {
    if (state.hasTimedOut) {
      // watermark passed first + window + lateness: finalize to the
      // closed tombstone; no further timeout (permanent, O(1))
      val s = state.get
      state.update(FTtlState(Nil, s.nSeen, closed = true))
      Iterator.empty
    } else {
      val prev = state.getOption
        .getOrElse(FTtlState(Nil, 0L, closed = false))
      if (prev.closed) {
        // post-close straggler: dropped, re-opens nothing (contract 4)
        Iterator.empty
      } else {
        val incoming = it.map(e => (e.ts_us, e.step)).toList
        if (incoming.isEmpty) Iterator.empty
        else {
          val all = (prev.evs ++ incoming).sorted
          val first = all.head._1
          // observation window: events past `first + window` cannot
          // participate (contract 2); the anchor is the min ts over
          // every pre-close arrival, so a late origin-rewriting event
          // re-filters the whole buffer (contract 3)
          val inWindow = all.takeWhile(_._1 <= first + windowMicros)
          // ceil micros to the enclosing millisecond: flooring would
          // fire the close up to 999 µs BEFORE the window's
          // micro-precision end
          val closeMs = Math.addExact(
            Math.floorDiv(first + windowMicros + 999L, 1000L),
            latenessMillis)
          if (state.getCurrentWatermarkMs() >= closeMs) {
            // the (possibly rewritten) window is already past the
            // watermark: finalize now, drop the batch (contract 5) —
            // prior emissions stand as the max-n_seen winners
            state.update(FTtlState(Nil, prev.nSeen, closed = true))
            Iterator.empty
          } else {
            // only in-window events are ACCEPTED into n_seen; an
            // all-out-of-window batch changes nothing (the buffer and
            // anchor are untouched — an earlier event would be
            // in-window by definition), so it emits nothing and only
            // re-arms the close (the engine clears the armed timeout
            // on every invocation)
            val acceptedIncoming =
              incoming.count(_._1 <= first + windowMicros)
            if (acceptedIncoming == 0) {
              state.setTimeoutTimestamp(closeMs)
              Iterator.empty
            } else {
              val merged = inWindow.take(cap)
              val nSeen = prev.nSeen + acceptedIncoming
              state.update(FTtlState(merged, nSeen, closed = false))
              state.setTimeoutTimestamp(closeMs)
              Iterator.single(
                FunnelStream.matchSteps(merged, nSteps, uid, nSeen))
            }
          }
        }
      }
    }
  }

  /** `events` needs (user_id, step) like the exact twin PLUS `ts`
    * (the event timestamp the watermark runs on — pass the ORIGINAL
    * event time so lateness means what the pipeline's watermark
    * means). The buffer-ordering key `ts_us` is DERIVED here as
    * `unix_micros(ts)` — any caller-supplied `ts_us` column is
    * overwritten, so the contract the close/late-filter math depends
    * on (`ts_us` ≡ microseconds of `ts`) holds by construction
    * instead of by documentation. The caller's `watermarkDelay`
    * should be ≥ `allowedLateness` (the watermark fires the close; a
    * shorter delay just closes users earlier). */
  def funnel(events: DataFrame, nSteps: Int, cap: Int = 10000,
      window: java.time.Duration = java.time.Duration.ofDays(7),
      allowedLateness: java.time.Duration =
        java.time.Duration.ofMinutes(10),
      watermarkDelay: String = "10 minutes"): Dataset[Snap] = {
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    require(cap >= nSteps,
      s"cap=$cap cannot hold even one event per step (nSteps=$nSteps)")
    require(!window.isNegative && !window.isZero,
      s"window=$window must be positive")
    require(!allowedLateness.isNegative,
      s"allowedLateness=$allowedLateness must be non-negative — a " +
        "negative lateness would arm timeouts behind the watermark")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(org.apache.spark.sql.functions.col("ts").isNotNull)
      .withColumn("ts_us", org.apache.spark.sql.functions
        .unix_micros(org.apache.spark.sql.functions.col("ts")))
      .withWatermark("ts", watermarkDelay)
      .as[TsStepEvent](Encoders.product[TsStepEvent])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        fn(nSteps, cap, window.toNanos / 1000L,
          allowedLateness.toMillis))
  }
}
