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
  * the source state's outgoing transition count. Null entities, null
  * states AND null order values are excluded BEFORE pairing, so a
  * null-state (or unknown-time) event does not break an
  * otherwise-adjacent pair (document order skips over it) — filter
  * upstream if a null state should be a wall. Excluding null orders
  * is part of the engine-independence contract: Spark sorts them
  * NULLS FIRST, other engines NULLS LAST, so any rule that keeps
  * them makes the adjacency multiset engine-specific.
  */
object Transitions {

  /** The ONE copy of the adjacency-pair contract both operators
    * share: rename, null-skip, lag over the (order, tieBreak) total
    * order. Rows with a NULL order value are EXCLUDED in BOTH paths —
    * an event whose position in time is unknown defines no adjacency
    * (and would otherwise sort engine-dependently: Spark windows put
    * ASC NULLS FIRST where DuckDB's ORDER BY defaults NULLS LAST, so
    * keeping them would make the pair multiset silently
    * engine-specific). `withDwell` additionally casts the order
    * column to long ns and emits the `__dwell` gap; with the shared
    * exclusion the two operators now agree on per-pair `n` even on
    * null-order data. */
  private def adjacentPairs(df: DataFrame, entityCol: String,
      stateCol: String, orderCol: Column, tieBreak: Column,
      withDwell: Boolean): DataFrame = {
    val base = df
      .select(col(entityCol).as("entity"), col(stateCol).as("to_state"),
        (if (withDwell)
          orderCol.cast(org.apache.spark.sql.types.LongType)
        else orderCol).as("__o"),
        tieBreak)
      .filter(col("entity").isNotNull && col("to_state").isNotNull &&
        col("__o").isNotNull)
    val w = Window.partitionBy(col("entity")).orderBy(col("__o"), tieBreak)
    val withFrom = base
      .withColumn("from_state", lag(col("to_state"), 1).over(w))
    (if (withDwell)
      withFrom.withColumn("__dwell",
        col("__o") - lag(col("__o"), 1).over(w))
    else withFrom)
      .filter(col("from_state").isNotNull)
  }

  def transitionMatrix(df: DataFrame, entityCol: String, stateCol: String,
      orderCol: Column, tieBreak: Column): DataFrame = {
    val pairs = adjacentPairs(df, entityCol, stateCol, orderCol,
      tieBreak, withDwell = false)
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("total"))
    counts.join(broadcast(totals), Seq("from_state"))
      .select(col("from_state"), col("to_state"), col("n"), col("total"),
        round(col("n").cast(DoubleType) / col("total").cast(DoubleType), 4)
          .as("prob"))
  }

  /** Dwell-time statistics per transition: how LONG entities sit in
    * `from_state` before moving to `to_state` — the timing layer over
    * [[transitionMatrix]]'s counts (a funnel team reads "view→buy
    * averages an hour, worst case a week" here before deciding where
    * to intervene; for a median/quantile view feed the dwell gaps to
    * the histogram-quantile family).
    *
    * The dwell of a transition is the exact integer-ns gap between
    * the two adjacent events under the same total (ts, tieBreak)
    * order the matrix uses; per-pair mean/min/max are exact decimal
    * sums with ONE double division + round(·,4) in SECONDS. Same
    * scale shape as the matrix (one lag window per entity, one
    * states² aggregate). Null-state and null-timestamp rows are
    * skipped over exactly like the matrix (one shared contract —
    * see [[adjacentPairs]]), so the per-pair `n` here always equals
    * the matrix's.
    *
    * Output: (from_state, to_state, n, mean_sec, min_sec, max_sec). */
  def dwellTimes(df: DataFrame, entityCol: String, stateCol: String,
      tsNsCol: Column, tieBreak: Column): DataFrame = {
    val D = org.apache.spark.sql.types.DecimalType(38, 0)
    dwellGaps(df, entityCol, stateCol, tsNsCol, tieBreak)
      .groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"),
        sum(col("dwell_ns").cast(D)).as("__sum"),
        min(col("dwell_ns")).as("__min"),
        max(col("dwell_ns")).as("__max"))
      .select(col("from_state"), col("to_state"), col("n"),
        round(col("__sum").cast(DoubleType) /
          (col("n").cast(D) * lit(1000000000L).cast(D)).cast(DoubleType),
          4).as("mean_sec"),
        round(col("__min").cast(DoubleType) / lit(1.0e9), 4).as("min_sec"),
        round(col("__max").cast(DoubleType) / lit(1.0e9), 4).as("max_sec"))
  }

  /** The raw per-transition dwell gaps [[dwellTimes]] aggregates —
    * THE composition point for distributional readouts: feed these
    * exact integer-ns gaps to
    * [[Histogram.groupQuantileEstimates]] keyed by (from_state,
    * to_state) for the p50/p95 time-in-state view a funnel team
    * actually reads (mean/min/max hide the bimodal "most convert in
    * minutes, a tail stalls for days" shape). Same adjacency
    * contract, same scale shape (one per-entity lag window), one row
    * per transition instance: (from_state, to_state, dwell_ns). */
  def dwellGaps(df: DataFrame, entityCol: String, stateCol: String,
      tsNsCol: Column, tieBreak: Column): DataFrame =
    adjacentPairs(df, entityCol, stateCol, tsNsCol, tieBreak,
      withDwell = true)
      .select(col("from_state"), col("to_state"),
        col("__dwell").as("dwell_ns"))

  /** The promised composition, as ONE named computation (the q114
    * query, its ScaleBench row and its spec all call THIS, so the
    * three surfaces are provably the same plan): [[dwellGaps]]' exact
    * integer-ns gaps fed to [[Histogram.groupQuantileEstimates]]
    * keyed by the `from>to` pair string — the p50/p95 time-in-state
    * readout whose bimodal shape [[dwellTimes]]' mean/min/max hide.
    * The single-string pair key keeps the histogram's
    * one-row-per-key broadcast contract (states², calendar-class).
    * Output: the histogram estimator's (key, pct, rank, bin, est). */
  def dwellQuantiles(df: DataFrame, entityCol: String, stateCol: String,
      tsNsCol: Column, tieBreak: Column, nBins: Int = 128,
      pcts: Seq[Int] = Seq(50, 95)): DataFrame =
    Histogram.groupQuantileEstimates(
      dwellGaps(df, entityCol, stateCol, tsNsCol, tieBreak)
        .select(concat(col("from_state"), lit(">"), col("to_state"))
          .as("key"), col("dwell_ns")),
      "key", "dwell_ns", nBins, pcts)

}
