package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Error-bounded quantile estimation from a fixed equi-width
  * histogram — the 100 TB quantile path beside q51's exact
  * `percentile` (exact percentiles need a sort or a full
  * value-multiset per group; a histogram needs ONE narrow aggregation
  * pass and `nBins` longs of state, mergeable across any partitioning
  * because bin counts are plain sums).
  *
  * Estimates are the LOWER BOUND of the bin containing the target
  * rank, so the error is at most one bin width ((hi−lo)/nBins) — an
  * explicit, caller-visible bound, unlike `percentile_approx`'s
  * opaque (and non-portable) sketch internals. Every step is either
  * exact integer arithmetic (ranks, cumulative counts) or a FIXED
  * parenthesization of IEEE double ops (binning, bin lower bounds),
  * so another engine replays the estimates bit-for-bit — which is the
  * whole reason this exists instead of `percentile_approx`: that
  * sketch is not cross-engine reproducible, this is.
  *
  * Driver bound: the `nBins`-row histogram is collected to compute
  * the cumulative ranks (same O(small) class as k-means centroids);
  * `nBins` ≤ 1e6 enforced.
  */
object Histogram {

  /** Quantile estimates for `pcts` (integer percents, 1..100) of
    * `valueCol`. Returns (pct, rank, bin, est): `rank` = ⌈n·pct/100⌉,
    * `bin` = the bin containing that rank, `est` = the bin's lower
    * bound. Nulls in `valueCol` are excluded from ranks. */
  def quantileEstimates(df: DataFrame, valueCol: String, nBins: Int,
      pcts: Seq[Int]): DataFrame = {
    require(nBins >= 1 && nBins <= 1000000,
      s"nBins=$nBins outside [1, 1e6] (the histogram is driver-collected)")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    val spark = df.sparkSession
    val v = df.select(col(valueCol).cast(DoubleType).as("x"))
      .filter(col("x").isNotNull && !isnan(col("x")))
    val mm = v.agg(min(col("x")), max(col("x"))).head()
    require(!mm.isNullAt(0),
      s"quantileEstimates: no non-null values in $valueCol")
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    val span = hi - lo
    // degenerate single-value column: everything lands in bin 0
    val binExpr =
      if (span == 0d) lit(0L)
      else least(lit(nBins.toLong - 1L),
        // FIXED parenthesization — the oracle mirrors it textually:
        // floor(((x - lo) * nBins) / span)
        floor((col("x") - lit(lo)) * lit(nBins.toDouble) / lit(span))
          .cast(LongType))
    val hist = v.select(binExpr.as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("bin"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = hist.map(_._2).sum
    val width = span / nBins.toDouble
    val out = pcts.sorted.map { p =>
      val rank = (n * p + 99L) / 100L // ceil(n·p/100), exact
      var cum = 0L
      var binOf = hist.last._1
      var found = false
      for ((b, c) <- hist if !found) {
        cum += c
        if (cum >= rank) { binOf = b; found = true }
      }
      Row(p.toLong, rank, binOf, lo + binOf.toDouble * width)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("pct", LongType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("bin", LongType, nullable = false),
        StructField("est", DoubleType, nullable = false))))
  }
}
