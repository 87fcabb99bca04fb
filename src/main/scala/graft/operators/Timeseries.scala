package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Regular-grid time-series analytics over irregular keyed samples:
  * the dense minute spine (shared with [[Anomaly]]), exact
  * time-weighted averaging, and as-of linear interpolation — the
  * numeric layer a sensor/telemetry feed (the reference's electric
  * scrape is one) needs between raw samples and dashboards.
  */
object Timeseries {

  /** Dense per-key minute spine over each key's [lo, hi] span,
    * generated in two bounded levels (1440-minute chunks, then ≤ 1440
    * minutes per chunk) so no row materializes a calendar-sized
    * array. A key spanning more than `maxSpanMinutes` fails loudly —
    * one corrupt year-9999 timestamp must not explode a 100 TB job
    * into a calendar cross join.
    *
    * The whole computation runs in EPOCH-MINUTE INTEGER space (the
    * same representation [[graft.streaming.AnomalyStream]] uses):
    * no `to_date`, no "day start + 86340 s". A calendar-day
    * formulation is session-timezone-dependent — under a DST zone
    * the 23- and 25-hour days make per-day minute ranges overlap or
    * gap at transitions, duplicating/dropping spine rows that a
    * downstream zero-fill left join would then double-count. Integer
    * minutes have no timezone, so the spine is identical under ANY
    * `spark.sql.session.timeZone`.
    *
    * Input: (key, lo, hi) minute-truncated timestamps; output:
    * (key, minute_start) with minute_start the UTC instant of each
    * minute in [lo, hi]. */
  private[operators] def minuteSpine(bounds: DataFrame,
      maxSpanMinutes: Long): DataFrame = {
    require(maxSpanMinutes >= 1, s"maxSpanMinutes=$maxSpanMinutes")
    // minute-truncated inputs make unix_micros an exact multiple of
    // 6e7, so the `div` below is exact for pre-1970 instants too
    val guarded = bounds
      .select(col("key"),
        expr("unix_micros(lo) div 60000000").as("__lo"),
        expr("unix_micros(hi) div 60000000").as("__hi"))
      .withColumn("__lo",
        when(col("__hi") - col("__lo") > maxSpanMinutes,
          raise_error(concat(lit("minute spine: key "),
            col("key").cast("string"), lit(" spans "),
            (col("__hi") - col("__lo")).cast("string"),
            lit(s" minutes — beyond maxSpanMinutes=$maxSpanMinutes; " +
              "a corrupt timestamp would explode the spine")))
            .cast(LongType))
          .otherwise(col("__lo")))
    guarded
      // floor division (not `div`, which truncates toward zero and
      // would misalign chunks for negative epoch minutes); exact in
      // doubles out to 2^52 minutes — eight billion years
      .select(col("key"), col("__lo"), col("__hi"),
        explode(sequence(
          floor(col("__lo").cast(DoubleType) / lit(1440.0)).cast(LongType),
          floor(col("__hi").cast(DoubleType) / lit(1440.0)).cast(LongType)))
          .as("__chunk"))
      .select(col("key"),
        greatest(col("__chunk") * lit(1440L), col("__lo")).as("__mlo"),
        least(col("__chunk") * lit(1440L) + lit(1439L), col("__hi"))
          .as("__mhi"))
      .filter(col("__mlo") <= col("__mhi"))
      .select(col("key"),
        explode(sequence(col("__mlo"), col("__mhi"))).as("__m"))
      .select(col("key"),
        timestamp_micros(col("__m") * lit(60000000L)).as("minute_start"))
  }

  /** Exact time-weighted average per key: each sample's value is
    * weighted by its holding duration (next sample's timestamp minus
    * its own — step-function/last-observation-carried-forward
    * semantics; the final sample has no duration and drops out).
    * The plain mean answers "what was the average REPORTED value";
    * this answers "what was the average value OVER TIME" — the right
    * statistic whenever sampling is irregular (a sensor that reports
    * on change would otherwise over-weight volatile periods).
    *
    * EXACT-MOMENT CONTRACT ([[Trend]]'s discipline): values are
    * floor-quantized once at the row level (`floor(v·10⁴)`, ±9e14
    * bound enforced loudly), durations are exact int64 nanoseconds,
    * the weighted sum is an exact decimal(38,0) integer sum, and ONE
    * double division + round(·,6) happens last — bit-replayable in
    * any engine with 128-bit integer arithmetic.
    *
    * Scale shape: one `lead(1)` window partitioned by key (the same
    * per-entity bound as [[Transitions]] — a pathological key
    * serializes its own sort; cap upstream), then one five-column
    * hash aggregate with map-side combine. Null keys/timestamps/
    * values and NaN values are excluded BEFORE pairing, so a null
    * sample does not zero out its predecessor's duration. Duplicate
    * sample timestamps collapse to their MIN value first — a tied
    * timestamp would otherwise make the lead() order, and therefore
    * the weighted sum, partition-order-dependent.
    *
    * Output: (key, n, span_ns, twap): `n` = deduped sample count
    * (incl. the final sample), `span_ns` = Σ durations = last−first,
    * `twap`/`span_ns` null when the key has a single sample (no
    * duration). */
  def timeWeightedAvg(df: DataFrame, keyCol: String, tsNsCol: String,
      valueCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df
      .select(col(keyCol).as("key"), col(tsNsCol).cast(LongType).as("t"),
        col(valueCol).cast(DoubleType).as("v"))
      .filter(col("key").isNotNull && col("t").isNotNull &&
        col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("key"), col("t")).agg(min(col("v")).as("v"))
      .select(col("key"), col("t"),
        Trend.quantize4(col("v"), "timeWeightedAvg", "v").as("vq"))
    val w = Window.partitionBy(col("key")).orderBy(col("t"))
    val paired = rows
      .withColumn("dur", lead(col("t"), 1).over(w) - col("t"))
    paired.groupBy(col("key")).agg(
        count(lit(1)).as("n"),
        sum(col("dur")).as("span_ns"),
        sum(col("vq") * col("dur").cast(DecimalType(19, 0))).cast(D)
          .as("__num"))
      .select(col("key"), col("n"), col("span_ns"),
        // overflow guard (Trend's discipline): with ≥2 samples the
        // span is non-null and vq/dur are non-null by construction, so
        // a null weighted sum can only be a decimal(38,0) overflow —
        // in non-ANSI sessions that would otherwise read as a silent
        // single-sample-style null twap. Within the CURRENT bounds it
        // is provably unreachable (|vq| ≤ 9·10¹⁸ and Σdur ≤ 2⁶³ ns ⇒
        // |num| ≤ 8.3·10³⁷ < 10³⁸) — kept as defense against a future
        // bound or scale change
        when(col("span_ns").isNotNull && col("__num").isNull,
          raise_error(lit("timeWeightedAvg: weighted sum overflowed " +
            "10^38 — the exactness bound is exceeded; rescale v or " +
            "shard the series")).cast(DoubleType))
          .otherwise(when(col("span_ns") > 0L,
            round(col("__num").cast(DoubleType) /
              (col("span_ns").cast(D) * lit(10000L).cast(D))
                .cast(DoubleType), 6))).as("twap"))
  }

  /** Rolling Pearson correlation between TWO keys' minute series —
    * "do error rates move with purchase rates, and when did that
    * change" as a per-minute trailing statistic; the pairwise
    * companion to [[Anomaly.rateZScores]]' univariate monitoring.
    *
    * Determinism: per-minute values are exact decimal sums quantized
    * to integer 10⁻⁴ units at the ROW level (the proven dsum-cast
    * contract; |v| beyond the decimal(18,4) domain raises loudly
    * rather than summing as silent nulls), every trailing sum runs in
    * decimal(38,0), and the Pearson numerator/denominators are exact
    * integers; the final expression is ONE fixed parenthesization
    * (`num / (sqrt(dx) · sqrt(dy))` — the dx·dy product would pass
    * 10³⁸, so each factor converts to double BEFORE the multiply) +
    * round(·,4).
    *
    * Scale shape: event-scale data collapses to per-period sums in
    * ONE conditional aggregate (both series from a single scan and a
    * single shuffle — no per-key join; `grain` = "minute" or "hour" —
    * pick the grain at which the joint series is actually dense);
    * the window runs on the period series. The trailing
    * window partitions BY DAY (≤ 1440 rows per partition by
    * construction — never a global window), so windows reset at
    * midnight and each day's first `trailing−1` periods do not emit.
    * The joint series contains periods where BOTH keys are active;
    * feed pre-densified series if gap-skipping semantics are wrong
    * for your data.
    *
    * Output: (period_start, r), r over the trailing-inclusive window
    * of exactly `trailing` joint periods; null when either side has
    * zero variance. */
  def rollingCorrelation(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, keyA: String, keyB: String,
      trailing: Int = 30, grain: String = "minute"): DataFrame = {
    require(trailing >= 2, s"trailing=$trailing needs >= 2 periods")
    require(keyA != keyB, "rollingCorrelation needs two distinct keys")
    require(grain == "minute" || grain == "hour",
      s"grain '$grain' must be minute or hour")
    // a day-partitioned window can never fill past the day's period
    // capacity — a too-large trailing would silently emit NOTHING
    val capacity = if (grain == "hour") 24 else 1440
    require(trailing <= capacity,
      s"trailing=$trailing exceeds the $capacity $grain periods a day " +
        "partition holds — the window could never fill")
    val D = DecimalType(38, 0)
    def units(v: org.apache.spark.sql.Column) =
      when(v.between(-9.0e13, 9.0e13),
        (v.cast(DecimalType(18, 4)) * lit(10000)).cast(D))
        .otherwise(raise_error(concat(
          lit("rollingCorrelation: v="), v.cast("string"),
          lit(" beyond the ±9e13 quantization domain — rescale v")))
          .cast(D))
    // per-period magnitude cap so every downstream moment stays exact:
    // c·Σa² ≤ trailing²·cap² and (Σa)² ≤ trailing²·cap² must stay
    // < 10³⁸ ⇒ cap = 10¹⁹/trailing. This guard is load-bearing, not
    // defensive: an au past it makes au·au overflow decimal(38,0) to
    // NULL, and window SUM SKIPS nulls — the moments would come back
    // plausible-but-wrong with no signal (the oracle's HUGEINT errors
    // loudly on the same data, so it is also a divergence)
    val unitCap = (BigDecimal(10).pow(19) / trailing).toBigInt
    def capped(c: org.apache.spark.sql.Column, name: String) =
      when(abs(c) < lit(unitCap.toString).cast(D), c)
        .otherwise(raise_error(concat(
          lit(s"rollingCorrelation: |$name| ≥ 10^19/trailing "),
          lit(s"($unitCap) — per-period sum too large for exact " +
            "decimal moments; rescale v or use a finer grain")))
          .cast(D))
    // ONE scan + ONE shuffle: both series come from a single
    // conditional aggregate (a per-key filter+join would scan the
    // event-scale input twice and add a shuffle join)
    val joint = df
      .filter(col(keyCol).isin(keyA, keyB) && col(tsCol).isNotNull &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .groupBy(date_trunc(grain, col(tsCol)).as("m"))
      .agg(
        sum(when(col(keyCol) === keyA,
          units(col(valueCol).cast(DoubleType)))).as("au0"),
        sum(when(col(keyCol) === keyB,
          units(col(valueCol).cast(DoubleType)))).as("bu0"))
      .filter(col("au0").isNotNull && col("bu0").isNotNull)
      .select(col("m"), capped(col("au0"), "au").as("au"),
        capped(col("bu0"), "bu").as("bu"))
      .withColumn("d", to_date(col("m")))
    val w = Window.partitionBy(col("d")).orderBy(col("m"))
      .rowsBetween(-(trailing - 1), 0)
    val stats = joint
      .withColumn("c", count(lit(1)).over(w).cast(D))
      .withColumn("sa", sum(col("au")).over(w))
      .withColumn("sb", sum(col("bu")).over(w))
      .withColumn("sab", sum(col("au") * col("bu")).over(w))
      .withColumn("saa", sum(col("au") * col("au")).over(w))
      .withColumn("sbb", sum(col("bu") * col("bu")).over(w))
      .filter(col("c") === lit(trailing.toLong).cast(D))
      .withColumn("dx", col("c") * col("saa") - col("sa") * col("sa"))
      .withColumn("dy", col("c") * col("sbb") - col("sb") * col("sb"))
    stats.select(col("m").as("period_start"),
      when(col("dx") > 0 && col("dy") > 0,
        round((col("c") * col("sab") - col("sa") * col("sb"))
            .cast(DoubleType) /
          (sqrt(col("dx").cast(DoubleType)) *
            sqrt(col("dy").cast(DoubleType))), 4)).as("r"))
  }

  /** Linear interpolation of each key's irregular series onto its
    * dense minute grid: for each grid minute, the bracketing samples
    * come from one BACKWARD and one FORWARD as-of join (the library's
    * own custom as-of operator — shuffle on key, per-partition merge,
    * no row-wise time join), and the estimate is the fixed-IEEE lerp
    * `v0 + (v1 − v0) · ((t − t0) / (t1 − t0))`, rounded to 4 dp. A
    * grid point landing exactly on a sample returns that sample's
    * value (both brackets resolve to it). Duplicate sample
    * timestamps collapse to their MIN value first (deterministic;
    * pre-aggregate yourself for other semantics). The grid spans each
    * key's own [first, last] sample minute; a leading grid minute
    * before the first sample has no backward bracket and drops out —
    * nothing ever extrapolates.
    *
    * Cost note: the deduped sample projection feeds THREE consumers
    * (the span bounds and both as-of sides) whose column pruning
    * makes the subtrees canonically distinct — the raw input is
    * scanned up to three times. If the input scan dominates (it
    * usually does not: as-of sides shuffle on key anyway), persist
    * the sample projection upstream and pass it in pre-deduped.
    *
    * Output: (key, minute_start, est). */
  def interpolateMinutes(df: DataFrame, keyCol: String, tsNsCol: String,
      valueCol: String, maxSpanMinutes: Long = 10512000L): DataFrame = {
    val samples = df
      .select(col(keyCol).as("key"), col(tsNsCol).cast(LongType).as("t"),
        col(valueCol).cast(DoubleType).as("v"))
      .filter(col("key").isNotNull && col("t").isNotNull &&
        col("v").isNotNull && !isnan(col("v")))
      .groupBy(col("key"), col("t")).agg(min(col("v")).as("v"))
    val bounds = samples.groupBy(col("key")).agg(
      date_trunc("minute", timestamp_micros(expr("min(t) div 1000")))
        .as("lo"),
      date_trunc("minute", timestamp_micros(expr("max(t) div 1000")))
        .as("hi"))
    val grid = minuteSpine(bounds, maxSpanMinutes)
      .select(col("key"),
        col("minute_start"),
        expr("unix_micros(minute_start) * 1000").as("gt"))
    val sBack = samples.select(col("key").as("bk"), col("t").as("t0"),
      col("v").as("v0"))
    val back = graft.plans.AsOf.join(grid, sBack,
      grid("key"), sBack("bk"), grid("gt"), sBack("t0"))
    val sFwd = samples.select(col("key").as("fk"), col("t").as("t1"),
      col("v").as("v1"))
    val both = graft.plans.AsOf.join(back, sFwd,
      back("key"), sFwd("fk"), back("gt"), sFwd("t1"),
      direction = "forward")
    both
      .filter(col("v0").isNotNull && col("v1").isNotNull)
      .select(col("key"), col("minute_start"),
        when(col("t1") === col("t0"), round(col("v0"), 4))
          .otherwise(round(col("v0") + (col("v1") - col("v0")) *
            ((col("gt") - col("t0")).cast(DoubleType) /
              (col("t1") - col("t0")).cast(DoubleType)), 4))
          .as("est"))
  }
}
