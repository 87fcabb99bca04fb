package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

/** Streaming event-rate anomaly monitor — the live twin of
  * [[graft.operators.Anomaly.rateZScores]] (q100): per-(key, minute)
  * trailing z-scores over the ZERO-FILLED minute spine, maintained as
  * events arrive. A feed outage shows up as strongly negative z rows
  * the moment a later minute for that key proves the silent minutes
  * really were silent.
  *
  * EXACTNESS UNDER DISORDER: a late event changes an already-scored
  * minute's count, which changes the mean/variance of every window
  * containing it — so bounded per-emission state cannot be exact.
  * The state is therefore the key's full minute→count map (bounded by
  * the key's active span — calendar-class, the same bound the batch
  * spine enforces; `maxSpanMinutes` fails loudly on a corrupt
  * timestamp) and each batch re-scores the key's whole dense series,
  * so a drained run is EXACTLY the batch answer — q100's oracle gates
  * it.
  *
  * EMISSION CONTRACT ([[FunnelStream]]'s progress-stream pattern): a
  * key re-emits its full scored series whenever a batch delivers new
  * events for it, tagged with `seen` (the key's total event count —
  * strictly increasing), and consumers keep the max-`seen` emission
  * per key. Gap minutes INSIDE the observed span are known-zero and
  * scored; minutes after the key's last event are unknown (silence
  * vs. not-yet-arrived) and never scored until a later event closes
  * them — identical to the batch spine's [first, last] contract.
  * State is never dropped (`NoTimeout`) — this is the EXACT twin,
  * gated drained-≡-batch. For live deployments whose keys outlive any
  * retention you can afford, use [[AnomalyStreamTtl]]: the bounded
  * variant sharing this scorer, with a retention horizon and idle-TTL
  * decay and an under-report-only miss class.
  *
  * Arithmetic mirrors the batch/oracle formula token for token:
  * exact integer window sums, `mean = s/c`,
  * `var = (ss − s·s/c)/(c−1)`, `z = round((n − mean)/√var, 4)`
  * (HALF_UP — the library-wide round contract), null z on zero
  * variance. */
object AnomalyStream {

  /** (key, epoch-minute) — pre-truncate upstream. */
  case class MinuteEvent(key: String, m: Long)
  case class CountsState(counts: Map[Long, Long])
  case class ZRow(key: String, m: Long, n: Long, z: Option[Double],
    seen: Long)

  private def round4(v: Double): Double =
    BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** The ONE dense re-scorer both the exact monitor and the
    * TTL-bounded [[AnomalyStreamTtl]] share: z over [lo+trailing, hi]
    * with known-zero fill, LAZILY — flatMapGroupsWithState drains the
    * returned iterator on demand, so a sporadically active key with a
    * years-long span costs O(trailing) memory here, not an O(span)
    * materialized buffer. s/ss in BigInt — Σn² passes 2⁶³ on a ~10⁹
    * events/minute key (the batch twin's decimal(38,0) moments). */
  private[streaming] def scoreSeries(key: String, counts: Map[Long, Long],
      lo: Long, hi: Long, trailing: Int, seen: Long): Iterator[ZRow] = {
    if (hi - lo < trailing) Iterator.empty
    else {
      val ring = new Array[Long](trailing)
      var s = BigInt(0)
      var ss = BigInt(0)
      var m = lo
      while (m < lo + trailing) { // pre-roll the first window
        val n = counts.getOrElse(m, 0L)
        ring(((m - lo) % trailing).toInt) = n
        s += n
        ss += BigInt(n) * n
        m += 1L
      }
      new Iterator[ZRow] {
        private var cur = lo + trailing
        override def hasNext: Boolean = cur <= hi
        override def next(): ZRow = {
          val n = counts.getOrElse(cur, 0L)
          val c = trailing.toDouble
          val mean = s.toDouble / c
          val varr = (ss.toDouble - s.toDouble * s.toDouble / c) /
            (c - 1.0)
          val z = if (varr > 0) Some(round4((n.toDouble - mean) /
            math.sqrt(varr))) else None
          val row = ZRow(key, cur, n, z, seen)
          val slot = ((cur - lo) % trailing).toInt
          s -= ring(slot)
          ss -= BigInt(ring(slot)) * ring(slot)
          ring(slot) = n
          s += n
          ss += BigInt(n) * n
          cur += 1L
          row
        }
      }
    }
  }

  private[streaming] def fn(trailing: Int, maxSpanMinutes: Long)(
      key: String, it: Iterator[MinuteEvent],
      state: GroupState[CountsState]): Iterator[ZRow] = {
    val add = it.foldLeft(Map.empty[Long, Long]) { (acc, e) =>
      acc.updated(e.m, acc.getOrElse(e.m, 0L) + 1L) }
    if (add.isEmpty) Iterator.empty
    else {
      val prev = state.getOption.map(_.counts).getOrElse(Map.empty)
      val merged = add.foldLeft(prev) { case (acc, (m, c)) =>
        acc.updated(m, acc.getOrElse(m, 0L) + c) }
      val lo = merged.keysIterator.min
      val hi = merged.keysIterator.max
      require(hi - lo <= maxSpanMinutes,
        s"AnomalyStream: key $key spans ${hi - lo} minutes — beyond " +
          s"maxSpanMinutes=$maxSpanMinutes; a corrupt timestamp would " +
          "explode the state")
      state.update(CountsState(merged))
      val seen = merged.valuesIterator.sum
      scoreSeries(key, merged, lo, hi, trailing, seen)
    }
  }

  /** `events` needs (key: string, m: long epoch-minute). Null keys
    * and minutes are EXCLUDED here (matching the batch twin's
    * filter) — one malformed production event must not kill the
    * monitor that exists to detect feed problems. */
  def zScores(events: DataFrame, trailing: Int = 30,
      maxSpanMinutes: Long = 10512000L): Dataset[ZRow] = {
    require(trailing >= 2, s"trailing=$trailing needs >= 2 minutes")
    require(maxSpanMinutes >= 1, s"maxSpanMinutes=$maxSpanMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(org.apache.spark.sql.functions.col("key").isNotNull &&
        org.apache.spark.sql.functions.col("m").isNotNull)
      .as[MinuteEvent](Encoders.product[MinuteEvent])
      .groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(fn(trailing, maxSpanMinutes))
  }
}
