package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Cohort retention analysis: entities bucketed by their first-seen
  * period, activity counted per (cohort, period offset) — the classic
  * "of the users who arrived in month M, how many were still active
  * k months later" matrix (the reference's event stream stops at
  * per-city counts; this is the longitudinal analysis layer a product
  * team runs on the same feed).
  *
  * Scale shape: the raw stream collapses to DISTINCT (entity, period)
  * FIRST (one shuffle with map-side partial dedup — an entity firing
  * a million events in one period contributes ONE row past the map
  * side), first-seen is a re-aggregate of that entity-period table,
  * and the join back is entity-keyed sort-merge — never broadcast
  * (entities are data-scale). The final matrix is cohorts × offsets,
  * bounded by the CALENDAR squared, not by traffic. Because each
  * entity appears exactly once per (cohort, offset) after the
  * distinct, the matrix needs `count(*)`, never `count(distinct)` —
  * no Expand, no second shuffle.
  *
  * Determinism: periods are calendar truncations, offsets are exact
  * integer period differences, retention is ONE double division
  * rounded to 4 dp (the library-wide cross-engine contract).
  *
  * Output: (cohort_period date, offset long, n_active, cohort_size,
  * retention) — `offset` 0 is the cohort itself (retention 1.0).
  * Null entities/timestamps are excluded.
  */
object Cohort {

  /** Supported truncation units (Spark `date_trunc` names). */
  private val Units = Map(
    "day" -> "DD", "week" -> "WEEK", "month" -> "MONTH")

  /** Retention matrix of `df` at `unit` granularity. `entityCol` is
    * the cohorted id, `tsCol` a timestamp. */
  def retention(df: DataFrame, entityCol: String, tsCol: String,
      unit: String): DataFrame = {
    require(Units.contains(unit),
      s"unit '$unit' not one of ${Units.keys.toSeq.sorted.mkString(", ")}")
    val act = df
      .select(col(entityCol).as("entity"),
        to_date(date_trunc(Units(unit), col(tsCol))).as("period"))
      .filter(col("entity").isNotNull && col("period").isNotNull)
      .distinct()
    val first = act.groupBy(col("entity"))
      .agg(min(col("period")).as("cohort_period"))
    val offsets = act.join(first, Seq("entity"))
      .select(col("cohort_period"),
        (unit match {
          // exact integer period differences: both ends are truncated
          // to the unit, so the difference is a whole number of units
          // in every engine
          case "month" =>
            months_between(col("period"), col("cohort_period"))
              .cast(LongType)
          case "week" =>
            (datediff(col("period"), col("cohort_period")) / 7)
              .cast(LongType)
          case _ =>
            datediff(col("period"), col("cohort_period")).cast(LongType)
        }).as("offset"))
    val counts = offsets.groupBy(col("cohort_period"), col("offset"))
      .agg(count(lit(1)).as("n_active"))
    val sizes = counts.filter(col("offset") === 0L)
      .select(col("cohort_period"), col("n_active").as("cohort_size"))
    counts.join(sizes, Seq("cohort_period"))
      .select(col("cohort_period"), col("offset"), col("n_active"),
        col("cohort_size"),
        round(col("n_active").cast(DoubleType) /
          col("cohort_size").cast(DoubleType), 4).as("retention"))
  }
}
