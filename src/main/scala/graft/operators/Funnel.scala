package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event stream: for each user,
  * the earliest time each step of a fixed sequence completes, where a
  * step only counts if it happens STRICTLY AFTER the previous step's
  * completion (subsequence matching, not set membership).
  *
  * The reference's event model (earthquake rows keyed and bucketed by
  * region — SURVEY §2.2 O8/O12) never sequences events per key; this
  * is the standard product-analytics extension over the same keyed
  * stream shape (ClickHouse `windowFunnel`, Amplitude funnels).
  *
  * EXACTNESS: greedy earliest-first matching is exact for subsequence
  * existence — taking the earliest occurrence of step k can never
  * prevent a later step from matching (any completion using a later
  * step-k occurrence also completes from the earlier one). So the
  * chain `t₁ = min ts(step₁)`, `tₖ = min ts(stepₖ) with ts > tₖ₋₁`
  * computes the canonical earliest completion per prefix, and every
  * engine replays it identically (timestamp comparisons only, no
  * floats).
  *
  * Scale shape (100 TB): NO window functions and NO per-user event
  * buffering. Step k is one filtered pass over only that step's events
  * (the type predicate pushes to the scan), aggregated to one row per
  * user still in the funnel — per-user state is O(1) per step. Every
  * join and aggregate in the chain is keyed on the same user column,
  * so Catalyst reuses the hash partitioning down the chain instead of
  * re-shuffling the accumulator; total shuffle volume is
  * O(Σ step-event counts), not O(events) per step. A hot user (bot
  * with millions of events) costs one min() per step — aggregation,
  * not buffering, so no skew hazard.
  */
object Funnel {

  /** Earliest per-user completion times for `steps`.
    *
    * @return one row per user that performed step 1, with columns
    *         `t1..tK` (tₖ null if the funnel stalled before step k)
    *         and `depth` = number of completed steps. Users who never
    *         performed step 1 do not enter the funnel and are absent.
    */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnelTimes: empty step sequence")
    require(steps.distinct.size == steps.size,
      s"funnelTimes: duplicate step names in $steps — a repeated step " +
        "would match the same event class twice; disambiguate upstream")
    val ev = events.select(col(userCol).as("user_id"),
      col(tsCol).as("__ts"), col(typeCol).as("__tp"))
    var acc = ev.filter(col("__tp") === steps.head)
      .groupBy("user_id").agg(min(col("__ts")).as("t1"))
    for (k <- 2 to steps.size) {
      val nxt = ev.filter(col("__tp") === steps(k - 1))
        .join(acc.filter(col(s"t${k - 1}").isNotNull)
          .select(col("user_id"), col(s"t${k - 1}")), "user_id")
        .filter(col("__ts") > col(s"t${k - 1}"))
        .groupBy("user_id").agg(min(col("__ts")).as(s"t$k"))
      acc = acc.join(nxt, Seq("user_id"), "left")
    }
    val depth = (1 to steps.size).map(k => when(col(s"t$k").isNotNull, 1)
      .otherwise(0)).reduce(_ + _)
    acc.withColumn("depth", depth.cast("long"))
  }
}
