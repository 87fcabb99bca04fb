package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Storage policy for the module's HYDRATION caches — the slim
  * projections ([[Dedup.lshCandidates]]' shingles,
  * [[Dedup.dedupIncremental]]'s corpus index and batch projection,
  * [[Similarity.sparseCosineTopK]]'s vector aggregate) that feed more
  * than one plan reference on keys exchange reuse cannot cover.
  *
  * At test SF these are a few MB and `MEMORY_AND_DISK` (Dataset
  * `cache()`'s level) is strictly right. At 100 TB a shingle
  * projection is petabyte-class: LRU-thrashing it through executor
  * storage is slower than recomputing the projection per reference,
  * and the right answers become either `NONE` (recompute — each
  * reference re-runs the upstream scan+shingle, trading CPU for zero
  * storage pressure) or persisting the projection as a REAL table and
  * feeding it back in ([[Dedup.buildCorpusIndex]] +
  * [[Dedup.dedupIncrementalIndexed]] make that a first-class path for
  * the corpus index — the one hydration input that is reused across
  * BATCHES, not just within one query).
  *
  * The dial is a runtime conf, not a parameter, so one setting governs
  * every operator in a session:
  * {{{
  * spark.conf.set("spark.graft.hydration.storageLevel", "NONE")
  * // any StorageLevel name, or NONE = recompute per reference
  * }}}
  * Results are bit-identical under every setting — the level only
  * moves where the recompute/storage cost lands (spec-gated by the
  * recompute-equivalence DedupSpec case). */
object Hydration {

  val StorageLevelConf = "spark.graft.hydration.storageLevel"
  val Default = "MEMORY_AND_DISK"

  /** Persist `df` at the session's hydration level; `NONE` returns the
    * frame unpersisted (downstream `unpersist()` stays a no-op). */
  def persist(df: DataFrame): DataFrame = {
    val name = df.sparkSession.conf.get(StorageLevelConf, Default)
    if (name.equalsIgnoreCase("NONE")) df
    // Locale.ROOT: default-locale uppercasing turns "disk" into "DİSK"
    // under tr-TR and fromString then rejects a perfectly good setting
    else df.persist(StorageLevel.fromString(
      name.toUpperCase(java.util.Locale.ROOT)))
  }
}
