package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-step funnel — the live twin of
  * [[graft.operators.Funnel.funnelTimes]] (q93): per-user earliest
  * completion times through a fixed step sequence, maintained as
  * events arrive.
  *
  * EXACTNESS UNDER DISORDER: greedy subsequence matching is
  * order-sensitive, and a late-arriving EARLY event can lower t₁ and
  * thereby re-time every later step — so bounded O(steps) state cannot
  * be exact. The state is therefore the user's buffered step events
  * (the ClickHouse-windowFunnel contract), capped at `cap` EARLIEST
  * events per user: the greedy match prefers early events, so the only
  * miss class is a user whose funnel completion depends on events
  * beyond their `cap` earliest — under-reported depth, never a phantom
  * completion. Each batch merges, re-sorts, and re-runs the DP, so a
  * drained run is EXACTLY the batch answer (q93's oracle gates it).
  *
  * EMISSION CONTRACT: a progress stream — each user emits a snapshot
  * whenever a batch delivers new events for them, tagged with
  * `n_seen` (strictly increasing per user); consumers take the
  * max-`n_seen` row per user for the current funnel state. State is
  * never dropped here (`NoTimeout`) — the EXACT twin of the pair
  * pattern ([[AnomalyStream]]/[[AnomalyStreamTtl]]): bound live
  * deployments with [[FunnelStreamTtl]], whose event-time tombstone
  * close caps KEY cardinality too — for a funnel whose window has
  * passed, open state is dead weight, not wrong answers. */
object FunnelStream {

  case class StepEvent(user_id: Long, ts_us: Long, step: Int)
  /** Buffered (ts_us, step) pairs — the `cap` earliest per user. */
  case class Buf(evs: List[(Long, Int)])
  /** `ts(i)` = earliest completion of step i+1, −1 if unreached. */
  case class Snap(user_id: Long, n_seen: Long, ts: Seq[Long], depth: Long)

  /** The greedy ordered-subsequence match over a ts-sorted buffer —
    * ONE code path shared with [[FunnelStreamTtl]] (the
    * [[AnomalyStream.scoreSeries]] discipline: the twins cannot drift
    * apart arithmetically). */
  private[streaming] def matchSteps(merged: List[(Long, Int)],
      nSteps: Int, uid: Long, nSeen: Long): Snap = {
    val t = Array.fill(nSteps)(-1L)
    for ((ts, s) <- merged) {
      if (s == 0 && t(0) == -1L) t(0) = ts
      else if (s > 0 && s < nSteps && t(s - 1) != -1L &&
        ts > t(s - 1) && t(s) == -1L) t(s) = ts
    }
    Snap(uid, nSeen, t.toSeq, t.takeWhile(_ != -1L).length.toLong)
  }

  private[streaming] def fn(nSteps: Int, cap: Int)(
      uid: Long, it: Iterator[StepEvent],
      state: GroupState[Buf]): Iterator[Snap] = {
    val incoming = it.map(e => (e.ts_us, e.step)).toList
    if (incoming.isEmpty) Iterator.empty
    else {
      val merged = (state.getOption.map(_.evs).getOrElse(Nil) ++ incoming)
        .sorted.take(cap)
      state.update(Buf(merged))
      Iterator.single(matchSteps(merged, nSteps, uid, merged.size.toLong))
    }
  }

  /** `events` needs (user_id, ts_us, step) with step in 0..nSteps−1
    * (filter foreign steps upstream — they would waste buffer slots). */
  def funnel(events: DataFrame, nSteps: Int,
      cap: Int = 10000): Dataset[Snap] = {
    require(nSteps >= 1, s"nSteps must be >= 1, got $nSteps")
    require(cap >= nSteps,
      s"cap=$cap cannot hold even one event per step (nSteps=$nSteps)")
    val spark = events.sparkSession
    import spark.implicits._
    events.as[StepEvent](Encoders.product[StepEvent])
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn(nSteps, cap))
  }
}
