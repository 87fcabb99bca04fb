package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Earthquake ⟷ electric-field correlation (SURVEY §2.6 / §7 step 5).
  *
  * The reference *promises* this analysis (README.md:17,27) but ships
  * no code for it. Three engine forms:
  *
  *  - `window`: batch interval join — per event, aggregate the field
  *    samples in `[t−w, t+w]` vs the same-width window a day earlier
  *    (the anomaly-baseline shape). Equi-free range join on time is
  *    made scalable by bucketing both sides to coarse time bins first
  *    (bin equi-join + residual range filter — never a cross join).
  *  - `nearest`: as-of join to the closest preceding sample (native
  *    [[graft.plans.AsOf]] operator).
  *  - `stream`: watermarked stream-stream join with a time-range
  *    condition.
  *
  * Events carry `event_ts`; samples carry `time, data`.
  */
object Correlate {

  /** Bucketed batch interval join: both sides get a time-bin key of
    * width `windowSec` so the range predicate rides on a bin equi-join
    * (each event joins its bin and the two neighbors — constant
    * fan-out, shuffle-partitioned by bin at any scale). */
  def window(events: DataFrame, samples: DataFrame,
      windowSec: Long): DataFrame = {
    val binExpr = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c).cast("double") / windowSec.toDouble).cast("long")
    val ev = events
      .withColumn("__t", unix_timestamp(col("event_ts")))
      .withColumn("__bin", explode(array(
        binExpr(col("event_ts")) - 1,
        binExpr(col("event_ts")),
        binExpr(col("event_ts")) + 1)))
    val sm = samples
      .withColumn("__st", unix_timestamp(col("time")))
      .withColumn("__bin", binExpr(col("time")))
    ev.join(sm, Seq("__bin"))
      .filter(col("__st") >= col("__t") - windowSec &&
        col("__st") <= col("__t") + windowSec)
      .groupBy(col("eventID"), col("event_ts"), col("magnitude"))
      .agg(count(lit(1)).as("n_samples"),
        avg(col("data")).as("mean_field"),
        min(col("data")).as("min_field"),
        max(col("data")).as("max_field"))
  }

  /** Nearest preceding sample per event via the native as-of join.
    * `keyCol` joins per sensor when the series is multi-sensor; the
    * reference's feed is one global series (sensor-less), which
    * degenerates to a single sorted stream — correct, but partitioned
    * by the constant key (document: shard the series per sensor/day
    * before calling this at scale). */
  def nearest(events: DataFrame, samples: DataFrame,
      toleranceSec: Option[Long] = None,
      keyCol: Option[String] = None): DataFrame = {
    val ev = events.withColumn("__t_us", unix_micros(col("event_ts")))
      .withColumn("__k", keyCol.map(col).getOrElse(lit(0)))
    val sm = samples.select(unix_micros(col("time")).as("__s_us"),
      col("data").as("field_at_event"),
      keyCol.map(col).getOrElse(lit(0)).as("__sk"))
    graft.plans.AsOf.join(ev, sm,
      ev("__k"), sm("__sk"), ev("__t_us"), sm("__s_us"),
      toleranceSec.map(_ * 1000000L))
      .drop("__t_us", "__s_us", "__k", "__sk")
  }

  /** Streaming correlation: watermarked stream-stream inner join.
    * Spark requires an equality predicate on stream-stream joins, so
    * both sides carry a coarse time-bin key (events exploded to the
    * neighbor bins); the exact ±window condition filters the residue.
    * State is bounded by watermark + window. */
  def stream(events: DataFrame, samples: DataFrame, windowSec: Long,
      watermark: String = "1 hour"): DataFrame = {
    val bin = (c: org.apache.spark.sql.Column) =>
      floor(unix_timestamp(c).cast("double") / windowSec.toDouble).cast("long")
    val ev = events.withWatermark("event_ts", watermark)
      .withColumn("__bin", explode(array(
        bin(col("event_ts")) - 1, bin(col("event_ts")), bin(col("event_ts")) + 1)))
    val sm = samples.withWatermark("time", watermark)
      .withColumn("__sbin", bin(col("time")))
    ev.join(sm,
      col("__bin") === col("__sbin") &&
      col("time") >= col("event_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
      col("time") <= col("event_ts") + expr(s"INTERVAL $windowSec SECONDS"))
      .drop("__bin", "__sbin")
  }
}
