package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-splitting and sampling operators for training pipelines.
  *
  * The load-bearing property is determinism under repartitioning:
  * `rand()`-based sampling changes with partition layout and retries,
  * so every operator here derives its randomness from a stable hash of
  * row identity — the same row lands in the same split on any cluster
  * layout, any retry, any engine.
  */
object Sampling {

  /** Deterministic percentage split: bucket = xxhash64(id, salt) mod
    * 100. `train` = buckets [0, trainPct). Stable across partitioning,
    * retries, and runs. */
  def hashSplit(df: DataFrame, idCol: String, trainPct: Int,
      salt: Int = 0): (DataFrame, DataFrame) = {
    val bucket = pmod(xxhash64(col(idCol), lit(salt)), lit(100))
    (df.filter(bucket < trainPct), df.filter(bucket >= trainPct))
  }

  /** Deterministic per-class downsampling to ~`fraction` of each
    * stratum (hash-gated, not rand-gated). */
  def stratifiedSample(df: DataFrame, idCol: String, classCol: String,
      fraction: Double, salt: Int = 1): DataFrame = {
    val gate = pmod(xxhash64(col(idCol), col(classCol), lit(salt)), lit(10000))
    df.filter(gate < (fraction * 10000).toInt)
  }

  /** Sequence packing for context-window training: documents (in
    * deterministic `orderCol` order) are packed greedily into bins of
    * `budget` tokens — pack_id = floor(running-total-before / budget).
    * One window pass; at scale, partition the window by a shard column
    * first (pack within shards) to avoid the single-partition global
    * window. */
  def packSequences(df: DataFrame, tokenCol: String, orderCol: String,
      budget: Long, shardCol: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = shardCol.map(s => Window.partitionBy(col(s)))
      .getOrElse(Window.partitionBy())
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(col(tokenCol)).over(w))
      .withColumn("pack_id",
        floor((col("__cum") - col(tokenCol)).cast("double") / budget).cast("long"))
      .drop("__cum")
  }
}
