package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** BOUNDED-STATE live variant of [[AnomalyStream]] (the q112 monitor):
  * same per-(key, minute) trailing z-scores, same shared re-scorer
  * ([[AnomalyStream.scoreSeries]] — the arithmetic is one code path,
  * not a copy), but per-key state is capped at `keepMinutes` map
  * entries and idle keys decay to an O(1) tombstone after `stateTtl`
  * — the deployment shape for an unbounded-lifetime feed, where the
  * exact twin's whole-span state would grow forever.
  *
  * THE CONTRACT — under-report only, never fabricate:
  *
  * State carries a `horizon`: the minute from which history is dense
  * and trusted. Three things move it forward, and each only REMOVES
  * emissions/revisions relative to the exact twin:
  *
  *  1. RETENTION PRUNE — when a key's span exceeds `keepMinutes`, the
  *     horizon advances to `hi − keepMinutes + 1` and older counts
  *     drop. Windows reaching below the horizon are never (re)scored.
  *  2. LATE DROP — an event with `m < horizon` is discarded. Its
  *     minute's already-emitted rows are never revised (the exact
  *     twin would re-emit the corrected series; consumers of THIS
  *     variant get the answer over events that arrived within
  *     `keepMinutes` of the key's frontier — "retention-exact").
  *  3. IDLE DECAY — a key silent for `stateTtl` (processing time, the
  *     [[NearDup]] pattern) collapses to `(∅, horizon = hi+1)`: a
  *     late event for the dead span re-opens NOTHING (it is below the
  *     horizon and drops), while a genuinely new event starts a fresh
  *     span that must re-accumulate `trailing` minutes before scoring
  *     — the monitor warms up again rather than scoring against a
  *     half-forgotten baseline. The tombstone is 3 fields, kept
  *     deliberately (removing it would let a late event resurrect the
  *     old span with forgotten minutes silently read as zero — the
  *     one failure mode this variant exists to exclude).
  *
  * Every row this variant DOES emit is computed by the exact twin's
  * scorer over the retained counts with the same known-zero fill; with
  * `keepMinutes` covering the whole span and no idle gap past the TTL,
  * the drained output is IDENTICAL to [[AnomalyStream]]'s (spec-gated).
  * Emission contract is unchanged: re-emit the scoreable series on
  * every batch that lands accepted events, tagged with strictly
  * increasing `seen` (count of ACCEPTED events); consumers keep the
  * max-`seen` row per (key, minute).
  *
  * Scale: state is O(active keys · keepMinutes + tombstoned keys),
  * vs the exact twin's O(keys · span). The scorer itself is the same
  * lazy O(trailing)-memory ring.
  *
  * CHECKPOINT COMPATIBILITY: [[TtlState]] gained the `decayed` field
  * after its first release, which changes the flatMapGroupsWithState
  * state encoding — a query restored from a checkpoint written by the
  * 3-field encoding fails Spark's state-schema compatibility check at
  * restart (loudly, at query start — no silent misread). Upgrading a
  * running deployment across that boundary means restarting from a
  * FRESH checkpoint (and accepting the warm-up: every key re-enters as
  * a new span). Future state-shape changes carry the same cost —
  * prefer deriving new flags from existing fields when possible. */
object AnomalyStreamTtl {
  import AnomalyStream.{MinuteEvent, ZRow}

  /** `horizon` = first trusted minute (counts keys are all ≥ it);
    * `seen` = accepted-event count, strictly increasing; `decayed` =
    * the horizon was set by IDLE DECAY (wall-clock TTL), not by live
    * data — which changes what "far below the horizon" means (see
    * the drop-vs-die rule in [[fn]]). */
  case class TtlState(counts: Map[Long, Long], horizon: Long, seen: Long,
      decayed: Boolean = false)

  private[graft] def fn(trailing: Int, keepMinutes: Long,
      ttl: Option[java.time.Duration],
      dropped: Option[org.apache.spark.util.LongAccumulator] = None)(
      key: String, it: Iterator[MinuteEvent],
      state: GroupState[TtlState]): Iterator[ZRow] = {
    if (state.hasTimedOut) {
      // idle past TTL: decay to the tombstone. No timeout re-armed —
      // the tombstone is permanent and O(1).
      val s = state.get
      val newHorizon =
        if (s.counts.isEmpty) s.horizon
        else s.counts.keysIterator.max + 1L
      state.update(TtlState(Map.empty, newHorizon, s.seen, decayed = true))
      Iterator.empty
    } else {
      val prev = state.getOption
        .getOrElse(TtlState(Map.empty, Long.MinValue, 0L))
      // late drop: below-horizon events are discarded, counted only
      // in the `dropped` accumulator (the under-report contract).
      // The LOUD exception — an event below the horizon by MORE than
      // keepMinutes — applies ONLY when the horizon was set by LIVE
      // data: there it is epochally misaligned (this event's
      // timestamp is corrupt, or a previous corrupt far-future event
      // dragged the horizon past all real time and would silently
      // blackhole the key FOREVER). A horizon set by IDLE DECAY
      // carries no such bound: a producer offline longer than
      // keepMinutes legitimately flushes a buffer arbitrarily far
      // below the tombstone's horizon — that is lateness, not
      // corruption, and it drops silently (counted), never kills the
      // query (the crash-loop-on-checkpoint-replay class
      // QuantileStreamTtl.fn deliberately avoids).
      var accepted = 0L
      val add = it.foldLeft(Map.empty[Long, Long]) { (acc, e) =>
        if (e.m < prev.horizon) {
          require(prev.decayed || prev.horizon - e.m <= keepMinutes,
            s"AnomalyStreamTtl: key $key event at minute ${e.m} is " +
              s"${prev.horizon - e.m} minutes below the live-data " +
              s"retention horizon ${prev.horizon} — beyond keepMinutes=" +
              s"$keepMinutes, so this is a corrupt timestamp (either " +
              "this event's, or an earlier one that dragged the " +
              "horizon into the far future), not lateness")
          dropped.foreach(_.add(1L))
          acc
        }
        else { accepted += 1L; acc.updated(e.m, acc.getOrElse(e.m, 0L) + 1L) }
      }
      if (add.isEmpty) {
        // nothing accepted: state untouched, but the engine clears the
        // armed timeout on every invocation — re-arm it
        ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
        Iterator.empty
      } else {
        val merged0 = add.foldLeft(prev.counts) { case (acc, (m, c)) =>
          acc.updated(m, acc.getOrElse(m, 0L) + c) }
        val hi = merged0.keysIterator.max
        // a fresh (or tombstoned-empty) span starts at its first
        // observed minute, exactly like the exact twin's `lo`
        val spanStart =
          if (prev.counts.isEmpty) add.keysIterator.min
          else prev.horizon
        // retention prune: cap the dense span at keepMinutes
        val horizon = math.max(spanStart, hi - keepMinutes + 1L)
        val merged =
          if (horizon > spanStart) merged0.filter(_._1 >= horizon)
          else merged0
        val seen = prev.seen + accepted
        // accepted events make this a LIVE-set horizon again
        state.update(TtlState(merged, horizon, seen, decayed = false))
        ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
        AnomalyStream.scoreSeries(key, merged, horizon, hi, trailing, seen)
      }
    }
  }

  /** `events` needs (key: string, m: long epoch-minute); null keys and
    * minutes excluded like the exact twin. `keepMinutes` must exceed
    * `trailing` (a window must fit inside the retained span) and also
    * serves as the corrupt-timestamp guard — a year-9999 minute just
    * prunes everything before it instead of exploding state (the
    * guard applies to LIVE-set horizons only; see [[fn]]).
    * `droppedEvents`: optional accumulator counting silently-dropped
    * below-horizon events — the observable side of the under-report
    * contract (poll it per batch alongside `lastProgress`). Standard
    * Spark accumulator caveat applies: the count is AT-LEAST-ONCE —
    * task retries, speculative execution, and checkpoint replay can
    * each re-add the same drops, so treat it as an approximate
    * monitoring signal ("drops are happening, roughly this many"),
    * never as an exact ledger to reconcile row counts against. */
  def zScores(events: DataFrame, trailing: Int = 30,
      keepMinutes: Long = 10080L,
      stateTtl: Option[java.time.Duration] = None,
      droppedEvents: Option[org.apache.spark.util.LongAccumulator] = None)
      : Dataset[ZRow] = {
    require(trailing >= 2, s"trailing=$trailing needs >= 2 minutes")
    require(keepMinutes > trailing,
      s"keepMinutes=$keepMinutes must exceed trailing=$trailing — " +
        "otherwise no window ever fits inside the retained span")
    val spark = events.sparkSession
    import spark.implicits._
    val timeoutConf = if (stateTtl.isDefined)
      GroupStateTimeout.ProcessingTimeTimeout
    else GroupStateTimeout.NoTimeout
    events
      .filter(org.apache.spark.sql.functions.col("key").isNotNull &&
        org.apache.spark.sql.functions.col("m").isNotNull)
      .as[MinuteEvent](Encoders.product[MinuteEvent])
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(
        fn(trailing, keepMinutes, stateTtl, droppedEvents))
  }
}
