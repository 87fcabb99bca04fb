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
    * `keyCol` joins per sensor when the series is multi-sensor. The
    * reference's feed is one global series (sensor-less) — a constant
    * key would degenerate the merge to ONE partition, so when `keyCol`
    * is absent the series is auto-sharded into time-contiguous bins:
    * both sides get `bin = clamp((t - lo) / width)` as the join key,
    * and each bin additionally receives a CARRY row — the latest
    * sample from any earlier bin (a ≤`shards`-row driver fold, same
    * O(small) collect as `packSequences`' shard offsets) — so an event
    * whose nearest preceding sample lives in an earlier bin still
    * finds it. Results are identical to the unsharded merge; the merge
    * itself runs one partition per bin. */
  def nearest(events: DataFrame, samples: DataFrame,
      toleranceSec: Option[Long] = None,
      keyCol: Option[String] = None,
      shards: Int = 0): DataFrame = {
    val tolUs = toleranceSec.map(_ * 1000000L)
    keyCol match {
      case Some(k) =>
        val ev = events.withColumn("__t_us", unix_micros(col("event_ts")))
          .withColumn("__k", col(k))
        val sm = samples.select(unix_micros(col("time")).as("__s_us"),
          col("data").as("field_at_event"), col(k).as("__sk"))
        graft.plans.AsOf.join(ev, sm,
          ev("__k"), sm("__sk"), ev("__t_us"), sm("__s_us"), tolUs)
          .drop("__t_us", "__s_us", "__k", "__sk")
      case None =>
        val spark = events.sparkSession
        val n = if (shards > 0) shards
          else spark.conf.get("spark.sql.shuffle.partitions").toInt
        val ev0 = events.withColumn("__t_us", unix_micros(col("event_ts")))
        // null sample times can never match (SQL semantics, same
        // discipline as AsOfJoinExec) — drop them HERE so the per-bin
        // aggregate below never forms a null group that would NPE the
        // driver fold. Null event times flow through as a null bin key,
        // which the as-of join emits unmatched.
        val sm0 = samples.select(unix_micros(col("time")).as("__s_us"),
          col("data").as("field_at_event"))
          .filter(col("__s_us").isNotNull)
        // sample time bounds: one tiny agg (2 values to the driver)
        val bounds = sm0.agg(min(col("__s_us")), max(col("__s_us"))).head()
        if (bounds.isNullAt(0)) {
          // no samples at all: every event is unmatched
          return ev0.drop("__t_us").withColumn("field_at_event",
            lit(null).cast(sm0.schema("field_at_event").dataType))
        }
        val lo = bounds.getLong(0)
        val width = math.max((bounds.getLong(1) - lo) / n + 1, 1L)
        val maxBin = (bounds.getLong(1) - lo) / width
        def binOf(t: org.apache.spark.sql.Column) =
          least(greatest(floor((t - lo) / width.toDouble).cast("long"),
            lit(0L)), lit(maxBin))
        val sm1 = sm0.withColumn("__bin", binOf(col("__s_us")))
        // per-bin latest sample (≤ n rows) → driver prefix-fold → one
        // carry row per later bin
        val lastPerBin = sm1.groupBy(col("__bin"))
          .agg(max(struct(col("__s_us"), col("field_at_event"))).as("m"))
          .select(col("__bin"), col("m.__s_us"), col("m.field_at_event"))
          .collect().map(r => (r.getLong(0), r.getLong(1), r.get(2)))
          .sortBy(_._1)
        val carries = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long, Any)]
        var prev: Option[(Long, Any)] = None
        var pi = 0
        for (b <- 0L to maxBin) {
          while (pi < lastPerBin.length && lastPerBin(pi)._1 < b) {
            prev = Some((lastPerBin(pi)._2, lastPerBin(pi)._3)); pi += 1
          }
          prev.foreach { case (ts, v) => carries += ((b, ts, v)) }
        }
        import spark.implicits._
        val carryDf = spark.createDataFrame(
          spark.sparkContext.parallelize(carries.toSeq.map {
            case (b, ts, v) => org.apache.spark.sql.Row(ts, v, b)
          }), sm1.schema)
        val smAll = sm1.union(carryDf)
        val ev1 = ev0.withColumn("__bin", binOf(col("__t_us")))
        graft.plans.AsOf.join(ev1, smAll,
          ev1("__bin"), smAll("__bin"), ev1("__t_us"), smAll("__s_us"), tolUs)
          .drop("__t_us", "__s_us", "__bin")
    }
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
