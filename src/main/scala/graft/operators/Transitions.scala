package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** First-order behavioral transition matrix: for each entity's
  * time-ordered event sequence, count adjacent (from_state → to_state)
  * pairs and normalize per source state — the empirical Markov chain
  * of the event stream (which step users actually take after a page
  * view; which alert state follows which; the input to next-event
  * prediction and to funnel-design decisions).
  *
  * Scale shape: the only per-event work is a `lag(1)` window
  * partitioned by entity — per-partition state is one row, and the
  * sort is bounded by a SINGLE entity's event count, never global.
  * A pathological entity (a bot with a billion events) serializes its
  * own partition's sort; if the stream has such entities, cap or
  * pre-split them upstream (the hot-bucket guard family) — the
  * matrix itself is states², calendar-class small, and the per-source
  * totals ride a broadcast of that aggregate (states², not data,
  * crosses the cluster).
  *
  * Determinism: adjacency is defined by a TOTAL order — the caller's
  * tie-break column makes (ts, tieBreak) unique — so the transition
  * multiset is engine-independent; counts are exact integers and the
  * probability is ONE double division rounded to 4 dp.
  *
  * Output: (from_state, to_state, n, total, prob), where `total` is
  * the source state's outgoing transition count. Null entities and
  * null states are excluded BEFORE pairing, so a null-state event
  * does not break an otherwise-adjacent pair (document order skips
  * over it) — filter upstream if a null state should be a wall.
  */
object Transitions {

  def transitionMatrix(df: DataFrame, entityCol: String, stateCol: String,
      orderCol: Column, tieBreak: Column): DataFrame = {
    val w = Window.partitionBy(col("entity")).orderBy(orderCol, tieBreak)
    val pairs = df
      .select(col(entityCol).as("entity"), col(stateCol).as("to_state"),
        orderCol, tieBreak)
      .filter(col("entity").isNotNull && col("to_state").isNotNull)
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
      .filter(col("from_state").isNotNull)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("total"))
    counts.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"), col("total"),
        round(col("n").cast(DoubleType) / col("total").cast(DoubleType), 4)
          .as("prob"))
  }
}
