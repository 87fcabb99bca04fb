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
    val spark = df.sparkSession
    val out = estimateQuantiles(df, valueCol, nBins, pcts)
      .map { case (p, rank, bin, est) => Row(p, rank, bin, est) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1),
      StructType(Seq(
        StructField("pct", LongType, nullable = false),
        StructField("rank", LongType, nullable = false),
        StructField("bin", LongType, nullable = false),
        StructField("est", DoubleType, nullable = false))))
  }

  /** Driver-side core of [[quantileEstimates]], shared with
    * [[discretize]] (which needs the raw edge doubles, not a 1-row
    * DataFrame round-trip): (pct, rank, bin, est) per requested
    * percentile, sorted by pct. */
  private def estimateQuantiles(df: DataFrame, valueCol: String,
      nBins: Int, pcts: Seq[Int]): Seq[(Long, Long, Long, Double)] = {
    require(nBins >= 1 && nBins <= 1000000,
      s"nBins=$nBins outside [1, 1e6] (the histogram is driver-collected)")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    // non-finite values are excluded (NaN bins to garbage; one ±Inf
    // makes the span infinite and silently collapses every bin to 0);
    // `between(±MaxValue)` is false for NaN and both infinities —
    // the oracle mirrors it as isfinite()
    val v = df.select(col(valueCol).cast(DoubleType).as("x"))
      .filter(col("x").isNotNull &&
        col("x").between(-Double.MaxValue, Double.MaxValue))
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
    pcts.sorted.map { p =>
      val rank = (n * p + 99L) / 100L // ceil(n·p/100), exact
      var cum = 0L
      var binOf = hist.last._1
      var found = false
      for ((b, c) <- hist if !found) {
        cum += c
        if (cum >= rank) { binOf = b; found = true }
      }
      (p.toLong, rank, binOf, lo + binOf.toDouble * width)
    }
  }

  /** Equi-depth discretization: add an integer `bucket` column
    * (0..nBuckets−1) splitting `valueCol` at its histogram-estimated
    * quantile edges — the standard feature-binning step (model inputs,
    * stratified sampling strata, heavy-tail flattening) where
    * equi-WIDTH bins would put 99% of a skewed column in one bin.
    *
    * Edges are [[quantileEstimates]] outputs (nBuckets−1 interior
    * percentiles), so the depth balance carries their ≤ one-bin-width
    * error — explicit and engine-portable where `ntile` (a global
    * window — single task at scale) and `percentile_approx` (opaque
    * sketch) are not. The bucket assignment is a codegen'd comparison
    * chain against the broadcast edge literals: one narrow map, no
    * shuffle, no join. `nBuckets` must divide 100 (edges are integer
    * percentiles); non-finite values get bucket NULL (they are
    * excluded from the edges too).
    *
    * Driver bound: the nBuckets−1 edge doubles (via the
    * nBins-bounded histogram collect documented on
    * [[quantileEstimates]]). */
  def discretize(df: DataFrame, valueCol: String, nBuckets: Int,
      nBins: Int = 4096): DataFrame = {
    require(nBuckets >= 2 && 100 % nBuckets == 0,
      s"nBuckets=$nBuckets must be >= 2 and divide 100 (integer " +
        "percentile edges)")
    val step = 100 / nBuckets
    val pcts = (1 until nBuckets).map(_ * step)
    val edges = estimateQuantiles(df, valueCol, nBins, pcts).map(_._4)
    val x = col(valueCol).cast(DoubleType)
    val finite = x.isNotNull && x.between(-Double.MaxValue, Double.MaxValue)
    // bucket = number of edges <= x (ties go up, matching the oracle's
    // identical comparison on identical doubles)
    val bucket = edges.foldLeft(lit(0L)) { (acc, e) =>
      acc + when(x >= lit(e), 1L).otherwise(0L) }
    df.withColumn("bucket", when(finite, bucket))
  }

  /** PER-KEY quantile estimates — the fully distributed twin of
    * [[quantileEstimates]] (which drives a single global histogram
    * through a driver-side cumulative pass). Nothing here touches the
    * driver: per-key ranges are ONE hash aggregate, binning is a
    * narrow map over a broadcast of that (one row per key), the
    * histogram is a second hash aggregate with map-side combine —
    * a billion-row hot key collapses to ≤ `nBins` rows per map
    * partition before the shuffle, so key skew cannot concentrate —
    * and the cumulative/rank selection runs over the AGGREGATED
    * (key, bin) table, whose size is keys × nBins regardless of data
    * volume. The per-key window partition is bounded by `nBins` rows
    * BY CONSTRUCTION (never by traffic), which is the only kind of
    * keyed window this library allows itself.
    *
    * Broadcast contract: the ranges frame is one row per distinct
    * key. Per-key quantiles over an unbounded key domain (e.g. a
    * user id) are the wrong tool — use the global estimator or
    * pre-bucket; the broadcast fails loudly, not wrongly, if the key
    * domain outgrows the executor budget.
    *
    * Same determinism contract as the global estimator: exact integer
    * ranks `⌈n·pct/100⌉`, one fixed parenthesization of IEEE double
    * ops for binning (`floor(((x − lo) · nBins) / span)`) and bin
    * lower bounds (`lo + bin · (span / nBins)`), so the estimates
    * replay bit-for-bit in any engine. Keys and values that are
    * null (or NaN values) are excluded; a key whose every value is
    * null does not appear.
    *
    * Output: (key, pct, rank, bin, est), one row per present key ×
    * pct. */
  def groupQuantileEstimates(df: DataFrame, keyCol: String,
      valueCol: String, nBins: Int, pcts: Seq[Int]): DataFrame = {
    require(nBins >= 1 && nBins <= 1000000,
      s"nBins=$nBins outside [1, 1e6]")
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      s"pcts must be integer percents in 1..100, got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate pcts in $pcts")
    val v = df
      .select(col(keyCol).as("key"), col(valueCol).cast(DoubleType).as("x"))
      .filter(col("key").isNotNull && col("x").isNotNull &&
        col("x").between(-Double.MaxValue, Double.MaxValue))
    val ranges = v.groupBy(col("key")).agg(
      min(col("x")).as("lo"),
      (max(col("x")) - min(col("x"))).as("span"),
      count(lit(1)).as("n"))
    // the broadcast join carries lo/span/n through to the histogram
    // aggregate (min over per-key-constant values — exact), so the
    // per-key ranges are computed from raw data exactly ONCE: two raw
    // scans total (ranges + binning), everything after runs on the
    // keys × nBins aggregate
    val binned = v
      .join(broadcast(ranges), Seq("key"))
      .select(col("key"), col("lo"), col("span"), col("n"),
        when(col("span") === 0d, lit(0L)).otherwise(
          least(lit(nBins.toLong - 1L),
            floor((col("x") - col("lo")) * lit(nBins.toDouble) / col("span"))
              .cast(LongType))).as("bin"))
    val hist = binned.groupBy(col("key"), col("bin"))
      .agg(count(lit(1)).as("cnt"), min(col("lo")).as("lo"),
        min(col("span")).as("span"), min(col("n")).as("n"))
    val wcum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Long.MinValue, 0)
    // rank selection runs directly on the cumulated histogram (pcts
    // exploded in place, ≤ nBins × |pcts| rows per key) — a join of
    // two separately-pruned re-reads of `hist` would defeat exchange
    // reuse and scan the raw data twice more
    hist
      .select(col("key"), col("bin"), col("lo"), col("span"), col("n"),
        sum(col("cnt")).over(wcum).as("cum"))
      .select(col("key"), col("bin"), col("lo"), col("span"), col("n"),
        col("cum"), explode(typedlit(pcts.sorted.map(_.toLong))).as("pct"))
      .withColumn("rank", expr("(n * pct + 99) div 100"))
      .filter(col("cum") >= col("rank"))
      .groupBy(col("key"), col("pct"), col("rank"), col("lo"), col("span"))
      .agg(min(col("bin")).as("bin"))
      .select(col("key"), col("pct"), col("rank"), col("bin"),
        (col("lo") +
          col("bin").cast(DoubleType) * (col("span") / lit(nBins.toDouble)))
          .as("est"))
  }
}
