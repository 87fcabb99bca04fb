package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** EXACT per-(key, time-window) value quantiles — the p50/p95-latency-
  * per-hour readout an operations/quality dashboard is actually built
  * from. Values are floor-quantized once at the row level
  * ([[Trend]]'s exact-moment discipline: `floor(v·10⁴)`, ±9e14 bound
  * enforced loudly), and the quantile is EXACT RANK SELECTION over
  * the quantized domain — `est(p) = (smallest qv with cum ≥
  * ⌈n·p/100⌉) / 10⁴` — so the result replays bit-for-bit in any
  * engine: integer ranks, integer cum sums, ONE exact double
  * division at the end. No sketch, no probabilistic bound, unlike
  * [[Histogram.groupQuantileEstimates]] whose estimates carry a
  * bin-width error (use that when the value domain is too rich to
  * aggregate exactly; use THIS when exactness is the contract).
  * Windows are truncated in epoch-integer space, so the grouping is
  * identical under ANY `spark.sql.session.timeZone` — the minute
  * spine's discipline ([[Timeseries]]); `window_start` labels the
  * UTC instant of each window's start.
  *
  * Scale shape: one hash aggregate to (key, window, qv) counts with
  * map-side combine — a billion-row hot window collapses to its
  * distinct quantized values per map partition before the shuffle —
  * then per-(key, window) cum/rank selection over the AGGREGATED
  * table. That cum window partition is sized by the window's DISTINCT
  * quantized values: data-bounded, not construction-bounded, which is
  * why the operator carries a LOUD `maxDistinct` guard fused into the
  * output (a window with more distinct centi-values than the cap
  * fails with instructions to use the histogram estimator — the
  * guard is late-loud: the sort below it spills rather than OOMs,
  * and the query dies instead of silently serializing a mega-sort
  * every run). For domains where that late price is itself too high
  * — at 100 TB a mis-called domain pays the FULL spilling sort
  * before the error fires — pass `preflight = true`: an extra
  * hash-aggregate pass (two-level, sort-free) counts each (key,
  * window)'s exact distinct values and fails AT PLAN-BUILD TIME,
  * before any window sort is planned. The dial costs one eager
  * action (the builder is no longer lazy) plus one scan+aggregate of
  * the input; the fused late guard stays in the output either way —
  * preflight is a cost optimization on the failure path, never the
  * exactness authority.
  *
  * Null keys/timestamps/values and NaN are excluded before counting.
  * Output: (key, window_start, pct, n, est) — one row per present
  * (key, window) × pct. */
object WindowedQuantiles {

  /** The row-level quantization BOTH twins use (`floor(v·10⁴)` with
    * the loud ±9e14 bound) — public so the streaming twin quantizes
    * with the IDENTICAL expression instead of a re-implementation. */
  def quantizedValue(v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Trend.quantize4(v, "windowedQuantiles", "v").cast(LongType)

  def quantiles(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, grain: String = "hour", pcts: Seq[Int] = Seq(50, 95),
      maxDistinct: Long = 100000L, preflight: Boolean = false): DataFrame = {
    require(grain == "minute" || grain == "hour" || grain == "day",
      s"grain '$grain' must be minute, hour or day")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    require(maxDistinct >= 1L, s"maxDistinct=$maxDistinct")
    // window truncation in EPOCH-INTEGER space, NOT date_trunc:
    // Spark's HOUR/DAY truncation is session-timezone-aware (an
    // Asia/Kolkata session puts hour boundaries at :30 UTC), which
    // would silently re-group the windows and break the bit-replay
    // contract — the same class the minute spine's epoch rewrite
    // killed. Integer division of unix micros has no timezone.
    val unitMicros = grain match {
      case "minute" => 60000000L
      case "hour"   => 3600000000L
      case "day"    => 86400000000L
    }
    // floor-to-unit via x − pmod(x, unit): exact 64-bit integer
    // arithmetic (a double-floor path loses precision past 2⁵² µs ≈
    // 1971), correct for pre-1970 instants too (pmod is non-negative
    // where `div` truncates toward zero)
    val um = unix_micros(col(tsCol))
    val rows = df
      .select(col(keyCol).as("key"),
        timestamp_micros(um - pmod(um, lit(unitMicros))).as("window_start"),
        col(valueCol).cast(DoubleType).as("v"))
      .filter(col("key").isNotNull && col("window_start").isNotNull &&
        col("v").isNotNull && !isnan(col("v")))
      .select(col("key"), col("window_start"),
        Trend.quantize4(col("v"), "windowedQuantiles", "v")
          .cast(LongType).as("qv"))
    if (preflight) {
      // fail-early gate: EXACT per-(key, window) distinct counts via a
      // two-level hash aggregate — no window function, no sort, so an
      // over-cap domain dies here at scan+aggregate cost instead of
      // after the full spilling mega-sort below. limit(1) stops the
      // scan at the first offender.
      val over = rows
        .select(col("key"), col("window_start"), col("qv")).distinct()
        .groupBy(col("key"), col("window_start"))
        .agg(count(lit(1)).as("n_distinct"))
        .filter(col("n_distinct") > lit(maxDistinct))
        .limit(1).collect()
      if (over.nonEmpty) {
        val r = over.head
        throw new IllegalArgumentException(
          s"windowedQuantiles preflight: (key=${r.get(0)}, window=" +
            s"${r.get(1)}) holds ${r.getLong(2)} distinct quantized " +
            s"values — beyond maxDistinct=$maxDistinct; use " +
            "Histogram.groupQuantileEstimates for this value domain")
      }
    }
    val counts = rows.groupBy(col("key"), col("window_start"), col("qv"))
      .agg(count(lit(1)).as("cnt"))
    val wall = Window.partitionBy(col("key"), col("window_start"))
    val wcum = wall.orderBy(col("qv")).rowsBetween(Long.MinValue, 0)
    // n and the distinct-value guard ride window aggregates over the
    // SAME partitioning the cum selection uses — one shuffle, no join
    counts
      .select(col("key"), col("window_start"), col("qv"),
        sum(col("cnt")).over(wcum).as("cum"),
        sum(col("cnt")).over(wall).as("n"),
        count(lit(1)).over(wall).as("n_distinct"))
      .select(col("key"), col("window_start"), col("qv"), col("cum"),
        col("n"), col("n_distinct"),
        explode(typedlit(pcts.sorted.map(_.toLong))).as("pct"))
      .withColumn("rank", expr("(n * pct + 99) div 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("key"), col("window_start"), col("pct"), col("n"),
        col("n_distinct"))
      .agg(min(col("qv")).as("__qv"))
      .select(col("key"), col("window_start"), col("pct"),
        col("n").cast(LongType).as("n"),
        when(col("n_distinct") > lit(maxDistinct),
          raise_error(concat(
            lit("windowedQuantiles: a (key, window) holds "),
            col("n_distinct").cast("string"),
            lit(s" distinct quantized values — beyond maxDistinct=" +
              s"$maxDistinct; use Histogram.groupQuantileEstimates " +
              "for this value domain"))).cast(DoubleType))
          .otherwise(col("__qv").cast(DoubleType) / lit(10000.0))
          .as("est"))
  }
}
