package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-level distribution analytics for training-data QA.
  *
  * The headline operator is [[tokenDivergence]]: per-slice
  * total-variation distance between a slice's token distribution and
  * the whole corpus — the "did this source/batch drift from the mix"
  * check a pipeline runs before committing an ingestion batch or
  * re-weighting a source. TV is chosen over KL/JS deliberately:
  * KL needs `ln`, which is not correctly-rounded and differs across
  * libm implementations, while TV is one subtraction and one division
  * — with the inner sum kept in EXACT integer (decimal) arithmetic the
  * whole statistic replays bit-identically in any engine (the q79
  * oracle). KL's ∞-on-disjoint-support pathology also disappears: TV
  * is always in [0, 1].
  */
object CorpusStats {

  private val D = DecimalType(38, 0)

  /** Per-slice token-distribution drift vs the global corpus.
    *
    * For slice s with token counts c_s(t), slice total N_s, global
    * counts c_g(t), and corpus total N:
    *
    *   TV(s) = ½ · Σ_t | c_s(t)/N_s − c_g(t)/N |
    *         = ( Σ_{t ∈ s} | c_s(t)·N − c_g(t)·N_s |
    *             + (N − Σ_{t ∈ s} c_g(t)) · N_s ) / (2·N·N_s)
    *
    * The second form is what runs: the numerator is computed entirely
    * in decimal(38,0) — exact integer arithmetic, so the SUM is
    * order-independent and engine-portable (a `sum(double)` here
    * would hash-mismatch any oracle on partition-order alone). The
    * one double division happens last. Exactness bound: every
    * intermediate must stay < 10³⁸ (decimal(38,0)'s ceiling). The
    * binding term is NOT the per-token product (≤ N²) but the final
    * denominator 2·N·N_s and the summed numerator, both ≤ 2·N² — so
    * the enforced bound is N < √(10³⁸/2) ≈ 7.07·10¹⁸, pinned at
    * 7·10¹⁸ (a 100 TB corpus is ~10¹³ tokens; five orders of margin).
    * The bound is ENFORCED, not just documented: N ≥ 7·10¹⁸ fails the
    * query loudly. The guard matters most in
    * non-ANSI sessions (`spark.sql.ansi.enabled=false`), where a
    * decimal overflow would otherwise become NULL, SUM would silently
    * drop the overflowed terms, and the statistic would come out
    * plausible-looking but wrong with no signal; under ANSI the
    * overflow itself errors and the guard just makes the failure mode
    * uniform and self-describing.
    *
    * Scale shape: one shuffle to (slice, token) counts — REUSED by
    * the global/total/grand re-aggregates via Spark's ReuseExchange
    * (the corpus is scanned and shuffled ONCE, plan-gated) — then a
    * shuffled equi-join on token (vocabulary-sized, NOT corpus-sized),
    * a broadcast join of per-slice totals, and a final slice-sized
    * aggregate. No window, no collect; the 1-row grand total rides a
    * broadcast nested-loop cross join whose broadcast side is EXACTLY
    * ONE ROW — the only NLJ shape that is linear rather than
    * quadratic, allowlisted in the plan gates the way the
    * bounded-query-set ANN joins are.
    *
    * Output: (slice, n_tokens, vocab, tv_dist) sorted by the caller.
    * Contract: rows with a NULL slice are excluded (enforced by
    * filter — a null slice is almost always an upstream bug; tag it
    * explicitly to include it). Empty-string texts contribute their
    * one empty token, matching the tokenizer's behavior everywhere
    * else (q19/q20).
    */
  def tokenDivergence(docs: DataFrame, sliceCol: String,
      textCol: String = "text"): DataFrame =
    tokenDivergenceBounded(docs, sliceCol, textCol, MaxExactTokens)

  /** Largest corpus size (total tokens) the exact-decimal kernel
    * accepts: 2·N² < 10³⁸ ⟹ N < √(5·10³⁷) ≈ 7.07·10¹⁸; pinned one
    * digit under. Both the numerator sum and the 2·N·N_s denominator
    * are bounded by 2·N², so this single check covers every
    * decimal(38,0) intermediate in the plan.
    */
  private val MaxExactTokens = "7000000000000000000"

  /** [[tokenDivergence]] with an injectable exactness bound — test
    * seam only (the planted-overflow spec lowers the bound to watch
    * the guard fire without needing 10¹⁸ real tokens). Production
    * callers go through the public method and the real constant.
    */
  private[graft] def tokenDivergenceBounded(docs: DataFrame,
      sliceCol: String, textCol: String,
      maxExactTokens: String): DataFrame = {
    val per = docs
      .filter(col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy("slice", "token")
      .agg(count(lit(1)).as("c_s"))
    val global = per.groupBy("token").agg(sum("c_s").as("c_g"))
    val totals = per.groupBy("slice").agg(sum("c_s").as("n_s"))
    val grand = per.agg(sum("c_s").cast(D).as("n_tot"))
    val term = abs(col("c_s").cast(D) * col("n_tot") -
      col("c_g").cast(D) * col("n_s").cast(D))
    per.join(global, "token")
      .join(broadcast(totals), "slice")
      .crossJoin(broadcast(grand))
      .groupBy("slice")
      .agg(
        max(col("n_s")).as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(term).as("__present"),
        sum(col("c_g").cast(D)).as("__cg_present"),
        max(col("n_tot")).as("__n_tot"))
      .select(col("slice"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("vocab").cast("long").as("vocab"),
        // exactness guard: the per-token products are ≤ n_tot², and the
        // summed numerator / 2·n_tot·n_s denominator are ≤ 2·n_tot², so
        // n_tot ≤ 7·10¹⁸ keeps every decimal(38,0) intermediate under
        // 10³⁸. The check runs once per OUTPUT slice row (not per
        // token) and turns the non-ANSI overflow→NULL→silently-
        // dropped-terms failure into a loud error carrying the actual
        // corpus size.
        when(col("__n_tot") >= lit(maxExactTokens).cast(D),
          raise_error(concat(
            lit("tokenDivergence: corpus has "), col("__n_tot").cast("string"),
            lit(" tokens — beyond the exact-decimal bound (" +
              maxExactTokens + "); shard " +
              "the corpus (per-slice calls compose) or widen the kernel"))))
          .otherwise(
            (col("__present") +
              (col("__n_tot") - col("__cg_present")) * col("n_tokens").cast(D))
              .cast("double")
              ./(
                (lit(2).cast(D) * col("__n_tot") * col("n_tokens").cast(D))
                  .cast("double")))
          .as("tv_dist"))
  }

  /** Cross-slice duplication matrix: for every ordered pair of slices
    * (a, b), how many of a's documents also appear VERBATIM in b
    * (exact fingerprint match), and what fraction of a that is — the
    * "how much of source A is recycled in source B" provenance audit
    * run before trusting per-source mixture weights (a source that is
    * 80% mirror of another should not get independent weight).
    *
    * Scale shape: one corpus shuffle to (fingerprint, slice) counts;
    * the pair join is a self-join of that AGGREGATED table (distinct
    * fingerprints × the ≤ #slices sources holding each — never
    * corpus-sized rows), sharing one exchange via AQE reuse; the
    * blow-up per fingerprint is bounded by #slices², not by how many
    * times the text is duplicated. Per-slice totals broadcast. A
    * fingerprint duplicated a billion times inside ONE slice is one
    * aggregated row here.
    *
    * Output: (slice_a, slice_b, n_dup_docs, dup_frac) for ordered
    * pairs with ≥1 shared fingerprint; `dup_frac` = n_dup_docs /
    * total docs of slice_a (one int/int double division — exact on
    * any engine). Null slices are excluded as in [[tokenDivergence]].
    */
  def duplicationMatrix(docs: DataFrame, sliceCol: String,
      textCol: String = "text"): DataFrame = {
    val per = docs
      .filter(col(sliceCol).isNotNull)
      .select(col(sliceCol).as("slice"),
        TextFunctions.fingerprint(col(textCol)).as("fp"))
      .groupBy("fp", "slice")
      .agg(count(lit(1)).as("n_docs"))
    val totals = per.groupBy("slice")
      .agg(sum("n_docs").cast("long").as("n_total"))
      .withColumnRenamed("slice", "slice_a")
    val a = per.select(col("fp"), col("slice").as("slice_a"),
      col("n_docs").as("n_a"))
    val b = per.select(col("fp"), col("slice").as("slice_b"))
    a.join(b, "fp")
      .filter(col("slice_a") =!= col("slice_b"))
      .groupBy("slice_a", "slice_b")
      .agg(sum("n_a").cast("long").as("n_dup_docs"))
      .join(broadcast(totals), "slice_a")
      .select(col("slice_a"), col("slice_b"), col("n_dup_docs"),
        (col("n_dup_docs").cast("double") / col("n_total").cast("double"))
          .as("dup_frac"))
  }

  /** Per-doc n-gram NOVELTY vs a reference corpus — the memorization /
    * freshness metric (Lee et al. arXiv:2107.06499 §6 measure novel
    * text in model OUTPUT the same way; here it grades candidate
    * TRAINING docs): for each candidate doc, the fraction of its
    * DISTINCT n-token windows that appear nowhere in `reference`.
    * Novelty 0 = every window already known (a verbatim copy or a
    * stitched collage of reference text — near-zero marginal training
    * value); novelty 1 = fully fresh.
    *
    * Distinct windows, deliberately: repetition INSIDE the candidate
    * is [[Dedup.exactSubstringStats]]' business; novelty asks how much
    * of the doc's distinct n-gram vocabulary is new.
    *
    * Docs with fewer than n tokens carry no windows and are EXCLUDED
    * (novelty of nothing is undefined, not 0 or 1 — emitting either
    * would bias a downstream mean). NULL text is likewise excluded.
    *
    * Scale shape (the [[Dedup.decontaminate]] discipline): windows
    * never leave their row as strings — the native
    * [[graft.functions.WindowHashes]] kernel emits 8-byte xxhash64
    * values; both sides then hash-aggregate to DISTINCT (doc, hash) /
    * (hash) rows (map-side combining — a window repeated 10⁶ times in
    * the reference is ONE row before the shuffle) and meet in a
    * LEFT join on the hash (vocabulary-sized, not corpus-sized). The
    * 64-bit collision contract is decontaminate's: hash equality
    * stands in for window equality, so a collision can only mark a
    * genuinely-novel window as known (novelty under-count with
    * probability ≈ pairs/2⁶⁴ — never a false "novel").
    *
    * Output: (idCol, n_windows, novel_windows, novel_frac), the one
    * double division last from exact integer counts. */
  def ngramNovelty(candidates: DataFrame, reference: DataFrame,
      n: Int = 8, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 2, s"novelty window must be >= 2 tokens, got $n")
    import graft.functions.WindowHashes.windowHashesNative
    // Sub-n-token docs are excluded by the KERNEL's contract, not a
    // visible filter: WindowHashes emits an empty array when the doc
    // has < n tokens, so explode() drops the row. A kernel swap that
    // pads or errors instead would silently change the "EXCLUDED"
    // semantics above — keep that contract in mind (spec'd at both SFs).
    def windows(df: DataFrame, cols: Column*) = df
      .filter(col(textCol).isNotNull)
      .select(cols :+
        explode(windowHashesNative(col(textCol), n)).as("h"): _*)
    val cand = windows(candidates, col(idCol).as("__id")).distinct()
    // reference side needs ONLY textCol — an id-less reference corpus
    // (a raw benchmark dump, a held-out shard) is a legal input
    val known = windows(reference).distinct()
      .withColumn("__known", lit(1))
    cand.join(known, Seq("h"), "left")
      .groupBy(col("__id"))
      .agg(count(lit(1)).as("n_windows"),
        count(lit(1)).minus(count(col("__known")))
          .as("novel_windows"))
      .select(col("__id").as(idCol), col("n_windows"),
        col("novel_windows"),
        (col("novel_windows").cast("double") /
          col("n_windows").cast("double")).as("novel_frac"))
  }
}
