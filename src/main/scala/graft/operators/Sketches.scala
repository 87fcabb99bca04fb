package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.KmvMinHashes.kmvMinHashes

/** KMV (k-minimum-values) distinct sketches and the sketched
  * cross-slice overlap matrix — the ESTIMATION twin of
  * [[CorpusStats.duplicationMatrix]]'s exact provenance audit.
  *
  * Why KMV and not HLL: the sketch state is the k smallest distinct
  * hash values — a plain sorted `LIMIT k`, so any engine reproduces it
  * bit-identically (full DuckDB hash-exact oracle, where HLL register
  * layouts are engine-private and q34 can only gate a within-bound
  * boolean). And unlike HLL, KMV sketches support SET OPERATIONS: the
  * k minima of A ∪ B are computable from the two sketches alone, which
  * yields Jaccard/overlap estimates between slices without ever
  * rescanning the corpus (Beyer et al., "On Synopses for Distinct-Value
  * Estimation Under Multiset Operations", SIGMOD'07).
  *
  * Scale shape at 100 TB: the corpus collapses to ≤ k longs per slice
  * per map partition before the one shuffle ([[graft.functions.KmvMinHashes]]
  * is partial-aggregatable); the pairwise stage then runs on
  * slice-count² rows of k-long arrays — bounded by the number of
  * slices, NEVER by corpus size or duplication depth. An exact
  * cross-slice distinct-overlap would need a corpus-wide
  * distinct-shuffle per slice pair; this is one corpus scan total.
  *
  * Estimator: with hashes uniform on [0, 2^48) (the portable md5-48
  * domain, or `xxhash64 & (2^48−1)`), distinct-count ≈ (k−1)·2^48 /
  * h₍ₖ₎ — computed in INTEGER floor division (exact on both engines;
  * a double quotient at 2^56 magnitudes would round engine-dependently).
  * Sketches smaller than k are exhaustive and estimate exactly.
  * Standard error ≈ 1/√(k−2): k = 256 → ~6%.
  */
object Sketches {

  /** The hash domain size the estimator assumes: [0, 2^48). */
  val Domain: Long = 1L << 48

  /** Per-slice KMV sketch: `(slice, sketch Array[Long] ascending)`.
    * `hash` must be non-negative (see [[graft.functions.KmvMinHashes]]'s
    * domain contract) — pass the portable 48-bit hash for oracle
    * replay, or `pmod(xxhash64(...), lit(1L << 48))` for speed. */
  def kmvSketch(df: DataFrame, sliceCol: String, hash: Column,
      k: Int): DataFrame =
    df.filter(col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"), hash.as("__h"))
      .groupBy(col("slice"))
      .agg(kmvMinHashes(col("__h"), k).as("sketch"))

  /** Distinct-count estimate off a KMV sketch column (by NAME — the
    * integer `div` is built via `expr`): exact when the sketch is
    * exhaustive (|sketch| < k), else (k−1)·2^48 div h₍ₖ₎. */
  def kmvEstimate(sketchCol: String, k: Int): Column =
    estOf(sketchCol, k, (k - 1).toLong * Domain)

  /** Sketched cross-slice overlap matrix: for every slice pair a < b,
    * distinct-gram estimates of a, b, and a ∪ b, the shared-minima
    * count, and the Jaccard estimate |a∩b|/|a∪b| ≈ n_shared/k_eff
    * (the fraction of the union sketch's k minima present in BOTH
    * sketches — an unbiased Jaccard estimator because the k union
    * minima are a uniform sample of a ∪ b).
    *
    * The pair stage self-joins the SKETCH table (one row per slice):
    * slice-count² rows of k-long arrays, broadcast-joined — a corpus
    * duplicated 10⁹× deep changes nothing past the aggregate. All
    * outputs are integers except `jaccard_est`, one int/int division
    * (deterministic on both engines). */
  def kmvOverlapMatrix(df: DataFrame, sliceCol: String, hash: Column,
      k: Int): DataFrame = {
    val sk = kmvSketch(df, sliceCol, hash, k)
    val a = sk.select(col("slice").as("slice_a"), col("sketch").as("ska"))
    val b = sk.select(col("slice").as("slice_b"), col("sketch").as("skb"))
    val numer = (k - 1).toLong * Domain
    a.join(broadcast(b), col("slice_a") < col("slice_b"))
      .withColumn("union_all", array_sort(array_union(col("ska"), col("skb"))))
      .withColumn("union_k", slice(col("union_all"), 1, k))
      .withColumn("k_eff", size(col("union_k")).cast("long"))
      .withColumn("n_shared",
        size(array_intersect(col("union_k"),
          array_intersect(col("ska"), col("skb")))).cast("long"))
      .withColumn("est_a", estOf("ska", k, numer))
      .withColumn("est_b", estOf("skb", k, numer))
      .withColumn("union_est",
        when(size(col("union_all")) < k, size(col("union_all")).cast("long"))
          .otherwise(expr(s"${numer}L div element_at(union_k, $k)")))
      .withColumn("jaccard_est",
        col("n_shared").cast("double") / col("k_eff").cast("double"))
      .select("slice_a", "slice_b", "est_a", "est_b", "union_est",
        "n_shared", "k_eff", "jaccard_est")
  }

  private def estOf(name: String, k: Int, numer: Long): Column =
    when(size(col(name)) < k, size(col(name)).cast("long"))
      .otherwise(expr(s"${numer}L div element_at($name, $k)"))
}
