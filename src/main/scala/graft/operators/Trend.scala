package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-key least-squares trend estimation (OLS slope + intercept of
  * y over an integer time axis) — "is this metric drifting, and how
  * fast, per key" as one aggregation pass. The monitoring companion
  * to [[Anomaly.rateZScores]]: the z-score flags a minute, the trend
  * flags a month.
  *
  * EXACT-MOMENT CONTRACT: textbook OLS accumulates Σx, Σy, Σxy, Σx²
  * in floating point — order-dependent, so slopes drift across
  * engines and partitionings. Here the y axis is quantized ONCE at
  * the row level (`floor(y·10⁴)`, an IEEE-exact op both engines
  * share), every moment is then an exact integer sum in decimal(38,0)
  * (order-independent in any engine with 128-bit-class integer
  * arithmetic), the slope/intercept numerators and denominators are
  * exact integer expressions of those moments, and ONE double
  * division + round(·,6) happens last. The quantization, not the
  * arithmetic, is the approximation — and it is explicit: slopes are
  * exact OLS of the quantized series.
  *
  * Exactness bound: all intermediates must stay < 10³⁸ — safe past
  * 10¹² rows per key at |x| ≤ 10⁸, |y| ≤ 10⁹ (a 100 TB event stream
  * with epoch-minute x is orders of magnitude inside it). The bound
  * is ENFORCED: a decimal overflow in a non-ANSI session surfaces as
  * a null moment with n ≥ 2, which raises a loud error instead of
  * emitting a null slope that reads as "flat" ([[CorpusStats]]'
  * discipline).
  *
  * Scale shape: ONE hash aggregate with map-side combine over the raw
  * data (five longs of state per key) — no window, no sort, no second
  * pass; the slope algebra runs on the keys-sized aggregate.
  *
  * Output: (key, n, slope, intercept); slope/intercept are null when
  * the x variance is zero (n = 1, or all x equal). Null keys, null
  * x/y, and NaN y are excluded.
  */
object Trend {

  /** The library-wide 4-dp quantization step, guarded: `floor(v·10⁴)`
    * as decimal(19,0), with the ±9e14 bound enforced per row —
    * floor() returns a LONG and double→long conversion CLAMPS at
    * ±2⁶³, so an out-of-range (or ±Inf, which a NaN-only filter
    * passes) value would silently produce a wrong moment instead of
    * tripping the aggregate-stage overflow guard. Shared by
    * [[groupTrend]] and [[Timeseries.timeWeightedAvg]] — one bound,
    * one message shape. */
  private[operators] def quantize4(v: Column, op: String,
      name: String): Column =
    when(v.between(-9.0e14, 9.0e14),
      floor(v * lit(10000.0)).cast(DecimalType(19, 0)))
      .otherwise(raise_error(concat(
        lit(s"$op: $name="), v.cast("string"),
        lit(s" beyond the ±9e14 quantization bound — floor($name*10^4) " +
          s"would silently clamp; rescale $name")))
        .cast(DecimalType(19, 0)))

  def groupTrend(df: DataFrame, keyCol: String, xCol: Column,
      yCol: Column): DataFrame = {
    val D = DecimalType(38, 0)
    val rows = df
      .select(col(keyCol).as("key"), xCol.cast(LongType).as("x"),
        yCol.cast(DoubleType).as("y"))
      .filter(col("key").isNotNull && col("x").isNotNull &&
        col("y").isNotNull && !isnan(col("y")))
      .select(col("key"), col("x").cast(DecimalType(19, 0)).as("xd"),
        Trend.quantize4(col("y"), "groupTrend", "y").as("yd"))
    val m = rows.groupBy(col("key")).agg(
      count(lit(1)).cast(D).as("n"),
      sum(col("xd")).cast(D).as("sx"),
      sum(col("yd")).cast(D).as("sy"),
      sum(col("xd") * col("yd")).cast(D).as("sxy"),
      sum(col("xd") * col("xd")).cast(D).as("sxx"))
    val den = col("n") * col("sxx") - col("sx") * col("sx")
    val slopeNum = col("n") * col("sxy") - col("sx") * col("sy")
    val interNum = col("sy") * col("sxx") - col("sx") * col("sxy")
    // y was scaled by 10⁴, so both estimates divide it back out; the
    // denominator is shared
    val denScaled = (col("den") * lit(10000L).cast(D)).cast(DoubleType)
    // exactness guard, fused into the CONSUMED output expressions so
    // the optimizer cannot prune it (CorpusStats' discipline): with
    // n ≥ 2 and non-null inputs, a null numerator/denominator can only
    // mean a decimal(38,0) overflow — under non-ANSI configs that
    // would otherwise read as a silent "no trend"
    def guarded(out: Column): Column =
      when(col("n") >= 2 &&
          (col("den").isNull || col("snum").isNull || col("inum").isNull),
        raise_error(lit("groupTrend: decimal moment overflowed 10^38 " +
          "— the exactness bound is exceeded; rescale x or y"))
          .cast(DoubleType))
        .otherwise(when(col("den") > 0, out))
    m.withColumn("den", den)
      .withColumn("snum", slopeNum)
      .withColumn("inum", interNum)
      .select(col("key"), col("n").cast(LongType).as("n"),
        guarded(round(col("snum").cast(DoubleType) / denScaled, 6))
          .as("slope"),
        guarded(round(col("inum").cast(DoubleType) / denScaled, 6))
          .as("intercept"))
  }
}
