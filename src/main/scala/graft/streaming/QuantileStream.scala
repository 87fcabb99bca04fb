package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming windowed value quantiles — the live twin of
  * [[graft.operators.WindowedQuantiles]]: exact p50/p95 per
  * (key, window) maintained as events arrive, the sixth real
  * `flatMapGroupsWithState` family (funnel q97, anomaly q112, KMV
  * q89, sessionize, near-dup).
  *
  * EXACTNESS UNDER DISORDER ([[AnomalyStream]]'s argument): a late
  * event changes every rank in its window, so bounded per-emission
  * state cannot be exact; the state is the window's quantized
  * value→count map — bounded by the window's DISTINCT quantized
  * values, the same data-bound the batch twin guards, enforced here
  * with the same loud `maxDistinct` — and each batch re-selects the
  * window's ranks, so a drained run is EXACTLY the batch answer
  * (q118's oracle replays the batch SQL).
  *
  * EMISSION CONTRACT (the progress-stream pattern): a (key, window)
  * group re-emits its full pct set whenever a batch lands events for
  * it, tagged with strictly increasing `seen`; consumers keep the
  * max-`seen` row per (key, window, pct). State is never dropped
  * (`NoTimeout`) — this is the exact twin; live deployments over
  * unbounded window lifetimes use [[QuantileStreamTtl]], the
  * event-time-finalizing bounded variant (the watermark closes each
  * window to an O(1) tombstone; post-close stragglers drop).
  *
  * Selection arithmetic is the batch formula token for token: rank
  * `⌈n·p/100⌉`, smallest qv with cum ≥ rank, ONE double division by
  * 10⁴ at emission. */
object QuantileStream {

  /** (key, window-start epoch unit, floor(v·10⁴)) — quantize upstream
    * with the same `Trend.quantize4` expression the batch twin uses. */
  case class QEvent(key: String, w: Long, qv: Long)
  case class QState(counts: Map[Long, Long], seen: Long)
  case class QRow(key: String, w: Long, pct: Int, n: Long, est: Double,
    seen: Long)

  private[streaming] def fn(pcts: Seq[Int], maxDistinct: Long)(
      group: (String, Long), it: Iterator[QEvent],
      state: GroupState[QState]): Iterator[QRow] = {
    val add = it.foldLeft(Map.empty[Long, Long]) { (acc, e) =>
      acc.updated(e.qv, acc.getOrElse(e.qv, 0L) + 1L) }
    if (add.isEmpty) Iterator.empty
    else {
      val prev = state.getOption.getOrElse(QState(Map.empty, 0L))
      val merged = add.foldLeft(prev.counts) { case (acc, (qv, c)) =>
        acc.updated(qv, acc.getOrElse(qv, 0L) + c) }
      require(merged.size <= maxDistinct,
        s"QuantileStream: (${group._1}, ${group._2}) holds " +
          s"${merged.size} distinct quantized values — beyond " +
          s"maxDistinct=$maxDistinct; use a sketch for this value domain")
      val seen = prev.seen + add.valuesIterator.sum
      state.update(QState(merged, seen))
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

  /** `events` needs (key: string, w: long window-start, qv: long
    * quantized value); null keys/windows/values excluded upstream
    * like the batch twin. */
  def quantiles(events: DataFrame, pcts: Seq[Int] = Seq(50, 95),
      maxDistinct: Long = 100000L): Dataset[QRow] = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    require(maxDistinct >= 1L, s"maxDistinct=$maxDistinct")
    val spark = events.sparkSession
    import spark.implicits._
    val sortedPcts = pcts.sorted
    events
      .filter(org.apache.spark.sql.functions.col("key").isNotNull &&
        org.apache.spark.sql.functions.col("w").isNotNull &&
        org.apache.spark.sql.functions.col("qv").isNotNull)
      .as[QEvent](Encoders.product[QEvent])
      .groupByKey(e => (e.key, e.w))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn(sortedPcts, maxDistinct))
  }
}
