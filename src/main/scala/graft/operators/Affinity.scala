package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Label-centroid affinity matrix: pairwise cosine similarity between
  * the MEAN embedding of each label/slice — "which sources/clusters
  * are semantically close" — the corpus-curation readout behind
  * mixture re-weighting (two sources whose centroids cosine at 0.98
  * should not get independent weights) and cluster-merge decisions.
  *
  * EXACT by construction: elements are floor-quantized once at the
  * row level ([[Trend]]'s `floor(v·10⁴)` discipline, loud ±9e14
  * bound), per-(label, dim) sums are exact decimal(38,0) integers,
  * and the count terms CANCEL in the cosine of means —
  * `cos(mean_a, mean_b) = Σ sa·sb / (√Σ sa² · √Σ sb²)` over the raw
  * integer sum vectors — so the whole statistic is integer
  * arithmetic up to two IEEE sqrt's (correctly rounded, hence
  * engine-portable) and one final division, with ONE pinned
  * parenthesization. Replays bit-for-bit (the q120 oracle).
  *
  * Scale shape: one narrow posexplode → (label, dim) hash aggregate
  * with map-side combine (a billion vectors collapse to labels × dims
  * rows per partition before the shuffle); the pair join runs on the
  * AGGREGATED table — labels² × dims, calendar-class, never data-
  * sized. Rows with a null label/vector, or a vector containing
  * null/NaN elements, are excluded WHOLE (a single poisoned element
  * must not skew one dimension of a centroid). Every vector of a
  * label must share ONE non-zero length — ragged lengths break the
  * count-cancellation identity, so they fail LOUDLY; and every PAIR
  * of labels must agree on that length (checked at the pair join —
  * all pairs share dim 0, so the check is complete), because a
  * cosine across different-dimensional spaces silently computed over
  * the overlapping dims is the same silent-wrong class. Decimal
  * overflows of the Σs²/Σsa·sb moments fail loudly too (a non-ANSI
  * session would otherwise fold them into a silently-wrong cosine).
  *
  * Output: (label_a, label_b, n_dims, cos) for label_a < label_b;
  * `cos` is NULL when either centroid is the zero vector. */
object Affinity {

  def centroidAffinity(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame = {
    val D = DecimalType(38, 0)
    val clean = df
      .filter(col(labelCol).isNotNull && col(vecCol).isNotNull &&
        !exists(col(vecCol),
          e => e.isNull || isnan(e.cast(DoubleType))))
    // the count-cancellation identity requires every vector of a label
    // to have the SAME length (and at least one dim): ragged lengths
    // make the raw-sum formula stop being the cosine of means — the
    // silent-wrong class, so it dies loudly here (broadcast-sized
    // check, fused into the output below)
    val lens = clean.groupBy(col(labelCol).as("label"))
      .agg(min(size(col(vecCol))).as("__lmin"),
        max(size(col(vecCol))).as("__lmax"))
    val sums = clean
      .select(col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "v")))
      .select(col("label"), col("dim"),
        Trend.quantize4(col("v").cast(DoubleType),
          "centroidAffinity", "v").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).cast(D).as("s"))
    val norms = sums.groupBy(col("label"))
      .agg(sum(col("s") * col("s")).cast(D).as("nq"),
        count(lit(1)).as("n_dims"))
      .join(broadcast(lens), Seq("label"))
      .select(col("label"),
        when(col("__lmin") =!= col("__lmax") || col("__lmin") === 0,
          raise_error(concat(
            lit("centroidAffinity: label "), col("label").cast("string"),
            lit(" has vector lengths in ["), col("__lmin").cast("string"),
            lit(", "), col("__lmax").cast("string"),
            lit("] — the count-cancellation identity needs ONE uniform " +
              "non-zero length per label; pad or split upstream")))
            .cast(D))
          // exactness guard (Trend's discipline): nq aggregates
          // non-null products of non-null sums, so a null here can
          // ONLY be decimal(38,0) overflow — which a non-ANSI session
          // would otherwise fold into a silently-wrong cosine
          .otherwise(when(col("nq").isNull,
            raise_error(lit("centroidAffinity: Σs² overflowed 10^38 — " +
              "the exact-decimal bound is exceeded; rescale the " +
              "embeddings or shard the labels")).cast(D))
            .otherwise(col("nq"))).as("nq"),
        col("n_dims"))
    val a = sums.select(col("label").as("label_a"), col("dim"),
      col("s").as("sa"))
    val b = sums.select(col("label").as("label_b"), col("dim"),
      col("s").as("sb"))
    a.join(b, Seq("dim"))
      .filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum(col("sa") * col("sb")).cast(D).as("dot"))
      .join(broadcast(norms.select(col("label").as("label_a"),
        col("nq").as("nqa"), col("n_dims"))), Seq("label_a"))
      .join(broadcast(norms.select(col("label").as("label_b"),
        col("nq").as("nqb"), col("n_dims").as("__ndb"))), Seq("label_b"))
      .select(col("label_a"), col("label_b"),
        // CROSS-label uniformity: two labels each internally uniform
        // but at DIFFERENT lengths (128 vs 256 dims) would otherwise
        // cosine over the overlapping dims only (the pair join is on
        // `dim` — every label pair shares dim 0, so this check is
        // complete) and report label_a's n_dims — a misleading
        // affinity with no loud failure
        when(col("n_dims") =!= col("__ndb"),
          raise_error(concat(
            lit("centroidAffinity: labels "), col("label_a").cast("string"),
            lit(" ("), col("n_dims").cast("string"),
            lit(" dims) and "), col("label_b").cast("string"),
            lit(" ("), col("__ndb").cast("string"),
            lit(" dims) disagree on vector length — cosines across " +
              "different-dimensional spaces are undefined; pad or " +
              "split upstream"))).cast("bigint"))
          .otherwise(col("n_dims")).as("n_dims"),
        // dot's inputs are non-null sums, so null ⇒ overflow — loud,
        // not a silent null cosine masquerading as a zero centroid
        when(col("dot").isNull,
          raise_error(lit("centroidAffinity: Σ sa·sb overflowed 10^38 " +
            "— the exact-decimal bound is exceeded; rescale the " +
            "embeddings or shard the labels")).cast(DoubleType))
          .otherwise(when(col("nqa") > 0 && col("nqb") > 0,
            col("dot").cast(DoubleType) /
              (sqrt(col("nqa").cast(DoubleType)) *
                sqrt(col("nqb").cast(DoubleType)))))
          .as("cos"))
  }
}
