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
  * Scale shape: the raw stream collapses to the per-(key, minute)
  * count FIRST (one hash aggregate with map-side combine — the only
  * pass over event-scale data); the trailing-window statistics run
  * over the AGGREGATED minute series, whose size is keys × active
  * minutes regardless of event volume. The window is partitioned by
  * key (plan-safe); a key's series is bounded by the calendar, never
  * by traffic.
  *
  * Determinism: window sums of integer counts are exact; mean /
  * variance / z use ONE fixed parenthesization of IEEE double ops
  * (mirrored textually by the oracle), variance via the
  * sum-of-squares identity `(ss − (s·s)/cnt) / (cnt−1)`, and the
  * z-score is rounded to 4 dp — the same cross-engine contract as
  * the ANN scores. */
object Anomaly {

  /** Per-(key, minute) trailing z-scores. Only minutes with a FULL
    * `trailing`-minute history emit (a partial baseline is not a
    * baseline); zero-variance baselines emit null z. Output:
    * (key, minute_start, n, z). */
  def rateZScores(events: DataFrame, keyCol: String, tsCol: String,
      trailing: Int = 30): DataFrame = {
    require(trailing >= 2, s"trailing=$trailing needs >= 2 minutes")
    val counts = events
      .select(col(keyCol).as("key"),
        date_trunc("minute", col(tsCol)).as("minute_start"))
      .groupBy(col("key"), col("minute_start"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("key")).orderBy(col("minute_start"))
      .rowsBetween(-trailing, -1)
    val s = sum(col("n")).over(w)
    val ss = sum(col("n") * col("n")).over(w)
    val cnt = count(lit(1)).over(w)
    counts
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
