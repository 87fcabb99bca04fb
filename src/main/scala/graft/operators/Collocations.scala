package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** PMI collocation mining: adjacent token pairs whose co-occurrence
  * beats the independence expectation — the classic phrase detector
  * ("new york", "machine learning") a pre-training pipeline runs
  * before vocabulary/tokenizer decisions, and the bigram twin of the
  * TF-IDF keyword surface (q91).
  *
  * QUANTIZED-LOG CONTRACT: real PMI is `log₂(n_ab·N / (n_a·n_b))` —
  * and a libm `log` is not IEEE-determined, so raw PMI scores drift
  * across engines. Here the ratio is computed EXACTLY (integer
  * products in decimal(38,0), one integral divide) and the score is
  * its floor-log₂, recovered as `bitlength(ratio) − 1` — pure integer
  * arithmetic any engine reproduces bit-for-bit. Only POSITIVE-PMI
  * pairs (ratio ≥ 1) are scored: the negative band would need
  * fractional ratios, and collocation mining only wants the positive
  * tail anyway. Within a score band, ties rank by raw count then
  * lexicographic pair — fully deterministic.
  *
  * Scale shape: bigram generation is NARROW (an in-row zip of the
  * token array with its own tail — no posexplode self-join); unigram
  * and bigram counts are hash aggregates with map-side combine (a
  * boilerplate bigram repeated 10⁹ times is one row after the
  * partial); the count-table joins are vocabulary-keyed equi-joins —
  * corpus-scale data never joins row-wise. The 1-row corpus total
  * rides the one allowlisted broadcast-NLJ shape (linear, not
  * quadratic — q79's pattern). `minCount` prunes the long tail
  * BEFORE the joins. Top-k is a TakeOrdered over the surviving
  * band-scored pairs, never a window.
  *
  * Ratio bound: `n_a ≥ n_ab` and `n_b ≥ n_ab`, so
  * `ratio ≤ N/n_ab ≤ N/minCount` — the integral quotient fits a long
  * far past 100 TB corpora; the decimal(38,0) products are exact past
  * 10¹⁹ total tokens.
  *
  * Output: (a, b, n_ab, n_a, n_b, qpmi), the top `k` by
  * (qpmi desc, n_ab desc, a, b).
  */
object Collocations {

  def pmiTopBigrams(docs: DataFrame, textCol: String, minCount: Long,
      k: Int): DataFrame = {
    require(minCount >= 1, s"minCount=$minCount must be >= 1")
    require(k >= 1 && k <= 100000, s"k=$k outside [1, 1e5]")
    val D = DecimalType(38, 0)
    val toks = docs
      .select(TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
    val uni = toks.select(explode(col("toks")).as("t"))
      .groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val total = uni.agg(sum(col("n_t")).as("n_total"))
    val pairLen = greatest(size(col("toks")) - 1, lit(0))
    val bigrams = toks
      .select(explode(zip_with(
        slice(col("toks"), lit(1), pairLen),
        slice(col("toks"), lit(2), pairLen),
        (l, r) => struct(l.as("a"), r.as("b")))).as("bg"))
      .select(col("bg.a").as("a"), col("bg.b").as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    bigrams
      .join(uni.select(col("t").as("a"), col("n_t").as("n_a")), Seq("a"))
      .join(uni.select(col("t").as("b"), col("n_t").as("n_b")), Seq("b"))
      .crossJoin(broadcast(total))
      .withColumn("__num", col("n_ab").cast(D) * col("n_total").cast(D))
      .withColumn("__den", col("n_a").cast(D) * col("n_b").cast(D))
      .withColumn("__ratio", expr("__num div __den"))
      .filter(col("__ratio") >= 1L)
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (length(bin(col("__ratio"))) - 1).cast(LongType).as("qpmi"))
      .orderBy(col("qpmi").desc, col("n_ab").desc, col("a"), col("b"))
      .limit(k)
  }
}
