package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2004 —
  * the MOSS algorithm): per-doc k-token shingle hashes, then from
  * every window of `w` consecutive hashes keep the RIGHTMOST
  * minimum. The selection guarantee is what the rolling fingerprint
  * (q30) and full shingle sets (q27) each lack half of: any token run
  * of length ≥ w + k − 1 shared by two documents contributes at least
  * one IDENTICAL selected fingerprint to both (detection guarantee),
  * while only ~2/(w+1) of positions are kept (density bound) — a
  * corpus-scale copy detector whose index is a small fraction of the
  * shingle count, tunable by `w`.
  *
  * Tie rule: within a window, equal-hash ties select the rightmost
  * position — standard winnowing's tie rule (the paper's "robust"
  * refinement additionally prefers re-selecting the PREVIOUS window's
  * pick on ties, stateful across windows, which a per-window frame
  * aggregate cannot express; the detection guarantee and density
  * bound are the same either way, robustness only lowers density on
  * tie-heavy hash streams). Only FULL windows select (docs with fewer
  * than w + k − 1 tokens emit nothing — below the guarantee length
  * there is nothing to detect).
  *
  * Hashes are [[Sampling.portableHash48]] over the space-joined
  * shingle, so the whole selection replays exactly in the oracle's
  * SQL engine (md5-derived — NOT adversarial-proof; a copy detector
  * facing hostile inputs should swap in a keyed hash, same plan).
  *
  * Scale shape: shingle/hash generation is the narrow in-row
  * transform (no posexplode self-join); selection is ONE window pass
  * riding a single per-doc shuffle+sort (the min-of-struct frame
  * aggregate keeps hash and position in one comparison — no
  * min-then-join-back second pass); dedup to distinct fingerprints
  * rides the same doc partitioning. Document length bounds the
  * per-group sort, not corpus size. */
object Winnowing {

  /** `(doc_id, pos, fp)` — selected fingerprints, one row per distinct
    * (window-min hash, rightmost position) pair; `pos` is the 1-based
    * shingle position. */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"winnowing: shingle size k=$k must be >= 1")
    require(w >= 1, s"winnowing: window w=$w must be >= 1")
    val toks = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull &&
        size(col("toks")) >= lit(k + w - 1))
    // shingle count bound ONCE, then referenced — not re-derived
    // inside the posexplode input (clearer, and no reliance on CSE)
    val sh = toks
      .select(col("doc_id"), col("toks"),
        (size(col("toks")) - lit(k - 1)).as("nsh"))
      .select(col("doc_id"), col("nsh"),
        posexplode(transform(sequence(lit(1), col("nsh")), i =>
          Sampling.portableHash48(
            concat_ws(" ", slice(col("toks"), i, lit(k)))))))
      .select(col("doc_id"), col("nsh"),
        (col("pos") + 1).as("pos"), col("col").as("h"))
    // rightmost-min per window in ONE frame aggregate: struct ordering
    // is (h asc, -pos asc) = smallest hash, ties to the largest pos
    val frame = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    sh
      .withColumn("m", min(struct(col("h"), (-col("pos")).as("np")))
        .over(frame))
      // full windows only: starts past nsh-w+1 see a short frame
      .filter(col("pos") <= col("nsh") - lit(w - 1))
      .select(col("doc_id"), (-col("m.np")).as("pos"),
        col("m.h").as("fp"))
      .distinct()
  }

  /** Eval-set contamination by winnowing overlap: per TRAINING doc,
    * the count of DISTINCT selected fingerprints that also appear
    * anywhere in the eval/benchmark set — the MOSS guarantee pointed
    * at decontamination: any w+k−1-token run copied from an eval doc
    * contributes ≥ 1 shared fingerprint, so REORDERED and partial
    * copies are caught where exact-gram decontamination
    * ([[Dedup]]'s q68/q86 family) needs the grams verbatim at the
    * same stride. Rows with `n_shared ≥ minShared` are the flagged
    * docs; anti-join them to decontaminate.
    *
    * Scale shape: both fingerprint passes are the one-per-doc-window
    * selection above; the eval side collapses to a DISTINCT
    * fingerprint SET, so the overlap equi-join has multiplicity ≤ 1
    * per training fingerprint — no pair blowup, no hot-bucket guard
    * needed, and Catalyst broadcasts the eval set when it is small
    * (the common case: benchmarks ≪ corpus). */
  def evalOverlap(train: DataFrame, evalDocs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, w: Int = 4, minShared: Int = 1): DataFrame = {
    require(minShared >= 1,
      s"winnowing: minShared=$minShared must be >= 1")
    val tf = fingerprints(train, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    val ef = fingerprints(evalDocs, idCol, textCol, k, w)
      .select(col("fp")).distinct()
    tf.join(ef, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= lit(minShared))
  }

  /** Copy-suspect pairs: `(doc_a, doc_b, n_shared)` where `n_shared`
    * counts DISTINCT fingerprint values the two docs both selected,
    * kept when ≥ `minShared`. The fingerprint equi-join is
    * [[HotBuckets.starSelfJoinCandidates]]-guarded: a degenerate
    * fingerprint shared by more than `maxBucket` docs degrades to its
    * star pairs instead of exploding quadratically (oversized mass
    * observed, never silent). */
  def sharedPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4,
      minShared: Int = 2,
      maxBucket: Int = HotBuckets.DefaultCap): DataFrame = {
    require(minShared >= 1,
      s"winnowing: minShared=$minShared must be >= 1")
    val fps = fingerprints(docs, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    HotBuckets.starSelfJoinCandidates(fps, Seq("fp"), "doc_id",
        Seq.empty, maxBucket, "winnowing pairs")
      .groupBy(col("id_a").as("doc_a"), col("id_b").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= lit(minShared))
  }
}
