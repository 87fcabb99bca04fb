package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Largest-remainder (Hamilton) apportionment: split an integer
  * budget across keys EXACTLY proportionally to integer weights, with
  * the leftover units going to the largest fractional remainders —
  * the standard way a training-data mixture plan turns "40% web, 35%
  * code, 25% books" plus a token budget into per-domain document
  * quotas that sum to the budget EXACTLY (floor alone under-shoots by
  * up to #keys−1; naive rounding over- or under-shoots
  * unpredictably). The output feeds [[Sampling.quotaPerKey]]-class
  * selection.
  *
  * EXACT-INTEGER CONTRACT: ideal shares are the rationals B·wᵢ/W;
  * base quotas are their exact floors via decimal(38,0) integral
  * division, remainders are exact modulos, and the top-(B − Σbase)
  * remainders (ties broken by key — total order) each get one extra
  * unit. Every step replays bit-for-bit in any engine; Σ quota = B
  * always.
  *
  * Scale shape: the weights frame is keys-scale (one row per key
  * after duplicate keys are SUMMED). The remainder ranking — a
  * global order statistic — uses the library's two-level sharded
  * pattern ([[Sampling.packSequences]]' discipline), NOT a global
  * window: rows shard by a monotonic bucketing of the remainder,
  * each shard ranks locally under a partitioned window, and the
  * per-shard (count, Σbase) stats — ≤ numShards rows, serving both
  * the rank offsets and the leftover count in ONE action — fold on
  * the driver. One 1-row bounds aggregate (W + every guard count) is
  * the only other driver touch — the same bounded class as AQE
  * statistics.
  *
  * Output: (key, w, quota), Σ quota = budget. Guards: null keys or
  * weights, negative weights, W = 0, any per-key summed weight ≥ 2⁶³
  * (duplicate-key sums run in decimal, so near-2⁶³ weights cannot
  * silently wrap first), or W ≥ 2⁶³ — all fail loudly. */
object Mixture {

  def apportion(weights: DataFrame, keyCol: String, weightCol: String,
      budget: Long, numShards: Int = 0): DataFrame = {
    require(budget >= 0L, s"budget=$budget must be >= 0")
    val spark = weights.sparkSession
    import spark.implicits._
    val D = DecimalType(38, 0)
    // per-key sums in decimal(38,0): a LongType sum would silently
    // WRAP on duplicate-key weights near 2⁶³ (possibly to a plausible
    // positive value), defeating every downstream guard — the guards
    // below then run on the exact decimal values
    val perKey = weights
      .select(col(keyCol).as("key"),
        col(weightCol).cast(LongType).cast(D).as("w"))
      .groupBy(col("key")).agg(sum(col("w")).as("w"))
    // one bounds pass: total weight + every guard count (a separate
    // require-scan per guard would re-read the frame)
    val b = perKey.agg(
      sum(col("w")),
      count(when(col("key").isNull || col("w").isNull, 1)),
      count(when(col("w") < lit(0L).cast(D), 1)),
      count(when(col("w") >= lit(Long.MaxValue).cast(D), 1)),
      count(lit(1))).head()
    require(b.getLong(1) == 0L,
      s"apportion: ${b.getLong(1)} null key/weight rows — filter or " +
        "impute them first")
    require(b.getLong(2) == 0L,
      s"apportion: ${b.getLong(2)} negative weights")
    require(b.getLong(3) == 0L,
      s"apportion: ${b.getLong(3)} keys whose summed weight reaches " +
        "2^63 — rescale weights")
    val wTotal = Option(b.getDecimal(0)).map(BigDecimal(_))
      .getOrElse(BigDecimal(0))
    require(wTotal > 0, "apportion: total weight is zero")
    require(wTotal < BigDecimal(Long.MaxValue),
      s"apportion: total weight $wTotal overflows the int64 " +
        "remainder domain — rescale weights")
    val w = wTotal.toLongExact
    val nKeys = b.getLong(4)
    val based = perKey
      .withColumn("__bw", col("w") * lit(budget).cast(D))
      .withColumn("base", expr(s"__bw div ${w}L"))
      .withColumn("rem", expr(s"__bw % ${w}L").cast(LongType))
    // rank remainders globally via monotone shards + local windows;
    // shard sizes are keys/shards-scale, offsets fold on the driver
    val shards = math.max(1L, math.min(nKeys,
      if (numShards > 0) numShards.toLong
      else spark.conf.get("spark.sql.shuffle.partitions", "200").toLong))
    // rem ∈ [0, W): descending-rem rank order ⇒ shard 0 holds the
    // LARGEST remainders (monotone decreasing bucketing)
    val sharded = based.withColumn("__shard",
      least(floor(((lit(w - 1).cast(D) - col("rem").cast(D)) *
          lit(shards).cast(D)) / lit(w).cast(D)).cast(LongType),
        lit(shards - 1)))
    // ONE action serves both the rank offsets (per-shard counts) and
    // the leftover count (budget − Σ base, folded from the same rows)
    // — a separate leftover aggregate would recompute the whole
    // lineage a job earlier
    val shardStats = sharded.groupBy(col("__shard"))
      .agg(count(lit(1)).as("__cnt"), sum(col("base")).as("__bsum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val leftover = budget - shardStats.map(_._3).sum
    val offsets = shardStats.map(t => (t._1, t._2)).sortBy(_._1)
      .scanLeft((-1L, 0L)) { case ((_, acc), (s, c)) => (s, acc + c) }
    val exclusive = offsets.sliding(2).collect {
      case Array((_, prevAcc), (s, _)) => (s, prevAcc)
    }.toSeq
    val offDf = exclusive.toDF("__shard", "__off")
    val lw = Window.partitionBy(col("__shard"))
      .orderBy(col("rem").desc, col("key"))
    sharded
      .withColumn("__rnk", row_number().over(lw))
      .join(broadcast(offDf), "__shard")
      .select(col("key"),
        col("w").cast(LongType).as("w"), // exact: guarded < 2^63 above
        (col("base") +
          when(col("__off") + col("__rnk") <= leftover, 1L).otherwise(0L))
          .cast(LongType).as("quota"))
  }
}
