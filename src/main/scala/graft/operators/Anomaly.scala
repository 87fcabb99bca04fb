package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Event-rate anomaly scoring: z-scores of per-minute event counts
  * against a trailing window — the monitoring layer over the keyed
  * event stream (a feed outage, a poller stuck in a retry loop, or a
  * bot flood all surface as rate anomalies long before they corrupt
  * downstream aggregates).
  *
  * DENSE-SPINE CONTRACT: a zero-rate minute produces no row after the
  * count aggregate, so a naive rows-based window would (a) never
  * score the outage minutes at all — the headline use case — and
  * (b) silently stretch its "trailing 30 minutes" across the gap,
  * scoring the resume minute against a stale baseline. So each key's
  * minute series is ZERO-FILLED over its observed span (first to last
  * active minute) before the window: outage minutes emit strongly
  * negative z, and a trailing window of N rows IS N calendar minutes.
  * The spine is generated in two bounded levels (days, then ≤ 1440
  * minutes per day) — no single row ever materializes a
  * calendar-sized array — and its total size per key is the key's
  * active span in minutes, which a loud guard caps (`maxSpanMinutes`,
  * default ~20 years) so one corrupt year-9999 timestamp cannot
  * explode a 100 TB job into a calendar cross join.
  *
  * Scale shape: the raw stream collapses to the per-(key, minute)
  * count FIRST (a hash aggregate with map-side combine — the only
  * event-scale work, computed at most twice: once under the per-key
  * span bounds, once under the spine join — column pruning makes the
  * two subtrees canonically distinct, so plan-level reuse is not
  * guaranteed); the spine join and trailing-window
  * statistics run over the AGGREGATED minute series, whose size is
  * keys × spanned minutes regardless of event volume. The window is
  * partitioned by key (plan-safe); a key's series is bounded by the
  * calendar, never by traffic.
  *
  * Determinism: window sums of integer counts are exact; mean /
  * variance / z use ONE fixed parenthesization of IEEE double ops
  * (mirrored textually by the oracle), variance via the
  * sum-of-squares identity `(ss − (s·s)/cnt) / (cnt−1)`, and the
  * z-score is rounded to 4 dp — the same cross-engine contract as
  * the ANN scores. Null keys and null timestamps are excluded (an
  * engine-dependent NULL sort position inside the window would
  * silently diverge otherwise). */
object Anomaly {

  /** Per-(key, minute) trailing z-scores over the zero-filled minute
    * spine. Only minutes with a FULL `trailing`-minute history emit
    * (a partial baseline is not a baseline); zero-variance baselines
    * emit null z. Output: (key, minute_start, n, z). */
  def rateZScores(events: DataFrame, keyCol: String, tsCol: String,
      trailing: Int = 30, maxSpanMinutes: Long = 10512000L): DataFrame = {
    require(trailing >= 2, s"trailing=$trailing needs >= 2 minutes")
    require(maxSpanMinutes >= 1, s"maxSpanMinutes=$maxSpanMinutes")
    val counts = events
      .select(col(keyCol).as("key"),
        date_trunc("minute", col(tsCol)).as("minute_start"))
      .filter(col("key").isNotNull && col("minute_start").isNotNull)
      .groupBy(col("key"), col("minute_start"))
      .agg(count(lit(1)).as("n"))
    // zero-filled spine over each key's active span (shared two-level
    // day/minute generator — see Timeseries.minuteSpine)
    val bounds = counts.groupBy(col("key")).agg(
      min(col("minute_start")).as("lo"), max(col("minute_start")).as("hi"))
    val series = Timeseries.minuteSpine(bounds, maxSpanMinutes)
      .join(counts, Seq("key", "minute_start"), "left")
      .select(col("key"), col("minute_start"),
        coalesce(col("n"), lit(0L)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("minute_start"))
      .rowsBetween(-trailing, -1)
    // decimal(38,0) window moments: a hot key at 100 TB scale can see
    // ~10⁹ events/minute, where Σn² passes 2⁶³ — a LongType sum wraps
    // SILENTLY in non-ANSI sessions (the oracle's HUGEINT is exact)
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    val s = sum(col("n").cast(D)).over(w)
    val ss = sum(col("n").cast(D) * col("n").cast(D)).over(w)
    val cnt = count(lit(1)).over(w)
    series
      .withColumn("__s", s).withColumn("__ss", ss).withColumn("__c", cnt)
      .filter(col("__c") === trailing)
      .withColumn("__mean",
        col("__s").cast(DoubleType) / col("__c").cast(DoubleType))
      .withColumn("__var",
        (col("__ss").cast(DoubleType) -
          col("__s").cast(DoubleType) * col("__s").cast(DoubleType) /
            col("__c").cast(DoubleType)) /
          (col("__c").cast(DoubleType) - lit(1.0)))
      .withColumn("z",
        when(col("__var") > 0,
          round((col("n").cast(DoubleType) - col("__mean")) /
            sqrt(col("__var")), 4)))
      .select(col("key"), col("minute_start"), col("n"), col("z"))
  }
}
