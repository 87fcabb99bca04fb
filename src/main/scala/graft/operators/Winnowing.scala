package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
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
    * shingle position.
    *
    * The selection is the native ONE-PASS kernel
    * ([[graft.functions.WinnowSelect]]): per-row tokenize → md5-48
    * shingle hashes → rightmost-min deque → distinct (pos, fp), so
    * this whole operator is a narrow projection + explode with NO
    * shuffle. The previous composable form paid three passes for the
    * same rows — an interpreted posexplode(transform(sequence…slice…))
    * HOF projection, a per-doc window shuffle+sort for the frame
    * minimum, and a distinct shuffle (the WordShingles/WindowHashes
    * lesson a third time; outputs verified byte-identical at both SFs
    * and by the q132/q136/q140 oracles — the kernel's
    * [[graft.operators.Sampling.portableHash48Jvm]] values are the
    * PropertySpec-pinned twins of the Column form's). */
  def fingerprints(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 3, w: Int = 4): DataFrame = {
    require(k >= 1, s"winnowing: shingle size k=$k must be >= 1")
    require(w >= 1, s"winnowing: window w=$w must be >= 1")
    docs
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.WinnowSelect
          .winnowSelectNative(col(textCol), k, w)).as("s"))
      .select(col("doc_id"), col("s.pos").as("pos"), col("s.fp").as("fp"))
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
      k: Int = 3, w: Int = 4, minShared: Int = 1): DataFrame =
    overlapAgainst(train,
      fingerprints(evalDocs, idCol, textCol, k, w)
        .select(col("fp")).distinct(),
      idCol, textCol, k, w, minShared)

  /** The overlap tail shared by [[evalOverlap]] and
    * [[evalOverlapFromIndex]] — ONE join/threshold contract, so the
    * recompute-every-run and persisted-artifact paths cannot drift. */
  private def overlapAgainst(train: DataFrame, evalFps: DataFrame,
      idCol: String, textCol: String, k: Int, w: Int,
      minShared: Int): DataFrame = {
    require(minShared >= 1,
      s"winnowing: minShared=$minShared must be >= 1")
    val tf = fingerprints(train, idCol, textCol, k, w)
      .select(col("doc_id"), col("fp")).distinct()
    tf.join(evalFps, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= lit(minShared))
  }

  // ---- persisted fingerprint index ----------------------------------
  // Benchmarks change rarely; ingestion batches arrive constantly. The
  // production shape is therefore build-ONCE: winnow the eval set once,
  // persist the distinct fingerprint set, and let every batch job read
  // the artifact instead of re-tokenizing the benchmarks per run (the
  // SketchStore build-once stance). Unlike Bloom/CMS the fingerprint
  // set is corpus-sized, not geometry-bounded, so it stays a parquet
  // TABLE (the Dedup.buildCorpusIndex shape), never a driver array.

  private val IndexVersion = 1L
  private val IndexKind = "winnow_fps"

  /** The hash-domain stamp a fingerprint index carries: selection is
    * only meaningful against the EXACT (tokenizer, k, w, hash, tie
    * rule) it was built with — probing k=3 fingerprints with k=4
    * grams returns confident garbage (zero overlap reads as "clean",
    * the one failure decontamination cannot tolerate — silent false
    * negatives, the [[SketchStore]] argument verbatim). */
  def indexDomain(k: Int, w: Int): String =
    s"portableHash48(md5):ws-tokens:k=$k:w=$w:rightmost-min"

  /** Winnow `evalDocs` and persist the DISTINCT fingerprint set under
    * `path` (`fps/` + a 1-row `meta/` stamp). Single-writer overwrite
    * (an artifact is derived state — the SketchStore stance). The
    * WHOLE artifact is staged and atomically swapped into place
    * ([[graft.sources.Lake.swapInto]] — the one swap discipline):
    * within the stage, `meta/` is written last, so no crash point
    * leaves a valid stamp over torn fingerprints. Writing in place
    * would: a REBUILD overwrites `fps/` while the previous build's
    * valid stamp still sits in `meta/`, and a crash before the new
    * stamp lands would let readers pass every check against
    * mismatched fingerprints — silent false negatives, the exact
    * failure the stamp exists to stop. */
  def writeFingerprintIndex(evalDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, w: Int = 4): Unit =
    stageAndSwapIndex(
      fingerprints(evalDocs, idCol, textCol, k, w)
        .select(col("fp")).distinct(),
      path, k, w)

  /** The artifact-commit tail shared by [[writeFingerprintIndex]] and
    * [[appendToFingerprintIndex]] — ONE rendering of the crash
    * discipline (stage under `__building`, fps first, the 1-row meta
    * stamp LAST, atomic [[graft.sources.Lake.swapInto]]), so a stamp-
    * schema or ordering change cannot land in one writer and miss the
    * other. */
  private def stageAndSwapIndex(fps: DataFrame, path: String,
      k: Int, w: Int): Unit = {
    val spark = fps.sparkSession
    import spark.implicits._
    val tmp = path.stripSuffix("/") + "__building"
    fps.write.mode(SaveMode.Overwrite).parquet(s"$tmp/fps")
    Seq((IndexVersion, IndexKind, indexDomain(k, w)))
      .toDF("version", "kind", "domain")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$tmp/meta")
    graft.sources.Lake.swapInto(spark, path, tmp)
  }

  /** Append a NEW eval suite's fingerprints to an EXISTING index —
    * the day-2 operation a full rebuild wastes: benchmarks change
    * rarely but they DO change (a new eval suite lands), and
    * re-winnowing the whole accumulated eval corpus to add one suite
    * pays O(all eval docs) where the append pays O(new docs) of
    * winnowing plus ONE parquet scan of the existing fingerprint set
    * (the distinct union). The existing stamp is re-validated against
    * this caller's (k, w) FIRST — appending k=4 fingerprints into a
    * k=3 index would poison it into confident silent false negatives,
    * the exact failure [[readFingerprintIndex]] exists to stop — and
    * the result is staged + atomically swapped with meta written
    * last, exactly the [[writeFingerprintIndex]] crash discipline
    * (the old index serves readers until the swap; a crash leaves it
    * untouched).
    *
    * Equivalence contract (spec-gated): append(new) on index(old) ≡
    * writeFingerprintIndex(old ∪ new) — the fingerprint set is a
    * per-doc selection, so doc-set union commutes with selection. */
  def appendToFingerprintIndex(newEvalDocs: DataFrame, path: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, w: Int = 4): Unit = {
    val existing = readFingerprintIndex(newEvalDocs.sparkSession,
      path, k, w)
    stageAndSwapIndex(
      existing
        .unionByName(fingerprints(newEvalDocs, idCol, textCol, k, w)
          .select(col("fp")))
        .distinct(),
      path, k, w)
  }

  /** Load a fingerprint index, failing fast unless version, kind, and
    * the full (k, w, hash, tie-rule) domain stamp match what the
    * caller is about to probe with. */
  def readFingerprintIndex(spark: SparkSession, path: String,
      k: Int = 3, w: Int = 4): DataFrame = {
    val m = spark.read.parquet(s"$path/meta")
      .select("version", "kind", "domain").collect() match {
      case Array(one) => one
      case rows => throw new IllegalArgumentException(
        s"$path/meta holds ${rows.length} rows — not a winnowing index")
    }
    require(m.getLong(0) == IndexVersion,
      s"$path: index version ${m.getLong(0)}, reader speaks $IndexVersion")
    require(m.getString(1) == IndexKind,
      s"$path: artifact is a '${m.getString(1)}', expected '$IndexKind'")
    require(m.getString(2) == indexDomain(k, w),
      s"$path: fingerprint domain is '${m.getString(2)}' but the " +
        s"reader probes '${indexDomain(k, w)}' — cross-domain overlap " +
        "reads as 'clean' (silent false negatives), so this fails fast")
    spark.read.parquet(s"$path/fps").select(col("fp"))
  }

  /** [[evalOverlap]] against a PERSISTED index: same output, but the
    * eval side costs a parquet scan instead of a winnowing pass —
    * the per-batch serving path. `k`/`w` must match the artifact's
    * stamp AND are used for the train side's own fingerprinting, so
    * the two sides cannot diverge. */
  def evalOverlapFromIndex(train: DataFrame, indexPath: String,
      idCol: String = "doc_id", textCol: String = "text",
      k: Int = 3, w: Int = 4, minShared: Int = 1): DataFrame =
    overlapAgainst(train,
      readFingerprintIndex(train.sparkSession, indexPath, k, w),
      idCol, textCol, k, w, minShared)

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
