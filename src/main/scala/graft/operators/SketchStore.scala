package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persistable sketch artifacts: [[Bloom.Filter]] and
  * [[CountMin.Sketch]] as STAMPED parquet tables — the corpus-index
  * lifecycle ([[Dedup.buildCorpusIndex]]'s shingle-size stamp
  * discipline) applied to the sketch family.
  *
  * Why: the sketches are cheap to PROBE but not free to BUILD — each
  * build is a full pass over the reference side (the benchmark's
  * grams, the blocklist, yesterday's key traffic). The production
  * shape is "build ONCE, reuse across every ingestion batch": a
  * nightly decontamination filter probed by hundreds of batch jobs
  * should not re-scan the benchmark corpus per job. KMV sketches
  * already persist naturally (they are rows in a DataFrame); Bloom
  * and CMS live as driver-side arrays, so they need an explicit
  * write/load with the same fail-fast stamping the corpus index has.
  *
  * Artifact layout under `path`:
  *  - `meta/`  — ONE row: (version, kind, domain, and the geometry —
  *    numHashes for Bloom, depth×width for CMS)
  *  - `words/` — the non-zero cells as (idx, word) rows; the reader
  *    densifies (zero cells are implicit, so a sparse filter costs
  *    its set bits, not its geometry)
  *
  * THE DOMAIN STAMP: a sketch is only meaningful against the exact
  * hash domain it was built from — probing a 13-gram filter with
  * 8-gram hashes returns confident garbage (for Bloom, silent FALSE
  * NEGATIVES through the prune-then-verify gate — the one failure
  * mode that contract cannot tolerate). The writer records the
  * caller's `domain` string (say, "xxhash64(13-gram(text))"); the
  * reader REQUIRES the expected domain verbatim and fails fast on
  * mismatch — the [[Dedup.ShingleSizeMetaKey]] discipline, applied at
  * the artifact boundary where column metadata cannot travel.
  * Geometry mismatches are unrepresentable by construction: the
  * loaded values re-enter the bundled [[Bloom.Filter]] /
  * [[CountMin.Sketch]] types, whose probe sides derive everything
  * from the bundle.
  *
  * Writes are single-writer overwrites (an artifact is derived state,
  * rebuilt from its source of truth — the corpus-index compaction
  * stance); readers see either the old or the new artifact, never a
  * torn one, only if the underlying FS gives atomic directory swap —
  * on object stores, version the path instead (`.../bloom/v=42`).
  *
  * Scale: both reads collect the words to the driver — bounded by the
  * GEOMETRY (≤ 32 MB, [[Bloom.MaxBits]] / [[CountMin.MaxCells]]),
  * never by the key count, the same bound as the builds. */
object SketchStore {

  private val Version = 1L

  private def writeMeta(spark: SparkSession, path: String, kind: String,
      domain: String, p1: Long, p2: Long): Unit = {
    import spark.implicits._
    require(domain.nonEmpty,
      "domain stamp must be non-empty — it is the contract that stops " +
        "a reader from probing the wrong hash domain")
    Seq((Version, kind, domain, p1, p2))
      .toDF("version", "kind", "domain", "p1", "p2")
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$path/meta")
  }

  /** (p1, p2) — numHashes/numBits for Bloom, depth/width for CMS. */
  private def readMeta(spark: SparkSession, path: String, kind: String,
      expectedDomain: String): (Long, Long) = {
    val m = spark.read.parquet(s"$path/meta")
      .select("version", "kind", "domain", "p1", "p2")
      .collect() match {
      case Array(one) => one
      case rows => throw new IllegalArgumentException(
        s"$path/meta holds ${rows.length} rows — not a sketch artifact")
    }
    require(m.getLong(0) == Version,
      s"$path: artifact version ${m.getLong(0)}, reader speaks $Version")
    require(m.getString(1) == kind,
      s"$path: artifact is a '${m.getString(1)}', expected a '$kind'")
    require(m.getString(2) == expectedDomain,
      s"$path: hash-domain stamp is '${m.getString(2)}' but the reader " +
        s"expects '$expectedDomain' — probing across domains yields " +
        "confident garbage (for Bloom, silent false negatives), so " +
        "this fails fast")
    (m.getLong(3), m.getLong(4))
  }

  private def writeWords(spark: SparkSession, path: String,
      words: Array[Long]): Unit = {
    import spark.implicits._
    words.iterator.zipWithIndex
      .collect { case (w, i) if w != 0L => (i, w) }
      .toSeq.toDF("idx", "word")
      .write.mode(SaveMode.Overwrite).parquet(s"$path/words")
  }

  private def readWords(spark: SparkSession, path: String,
      n: Int): Array[Long] = {
    val words = new Array[Long](n)
    spark.read.parquet(s"$path/words")
      .select(col("idx").cast("int"), col("word").cast("long"))
      .collect() // bounded by the stamped geometry, ≤ 32 MB
      .foreach { r =>
        val i = r.getInt(0)
        require(i >= 0 && i < n,
          s"$path: cell index $i outside the stamped geometry [0, $n)")
        // duplicate in-range rows mean a torn/double-appended words/
        // dir; silently last-write-wins would load a CORRUPTED sketch
        // (for Bloom: silent false negatives — the exact failure the
        // stamps exist to stop), and the writer never emits zero cells,
        // so any second write to a cell is detectable as a non-zero hit
        require(words(i) == 0L,
          s"$path: duplicate cell index $i — the words/ dir is torn or " +
            "double-appended; rebuild the artifact")
        words(i) = r.getLong(1)
      }
    words
  }

  /** Persist a Bloom filter. `domain` names the hash domain the
    * filter was built over — the reader must present it verbatim. */
  def writeBloom(spark: SparkSession, filter: Bloom.Filter,
      path: String, domain: String): Unit = {
    writeMeta(spark, path, "bloom", domain,
      filter.numHashes.toLong, filter.numBits.toLong)
    writeWords(spark, path, filter.words)
  }

  /** Load a Bloom filter, failing fast unless the artifact's kind,
    * version, and `domain` stamp all match. */
  def readBloom(spark: SparkSession, path: String,
      expectedDomain: String): Bloom.Filter = {
    val (numHashes, numBits) = readMeta(spark, path, "bloom",
      expectedDomain)
    // the stamp is data, not trusted: a corrupt meta row with a garbage
    // geometry would otherwise truncate self-consistently through
    // .toInt and load a wrong-shaped filter, so re-run the SAME checks
    // the builder runs before allocating anything
    require(numBits <= Bloom.MaxBits && numHashes <= 8,
      s"$path: stamped Bloom geometry (numBits=$numBits, " +
        s"numHashes=$numHashes) is outside the builder's bounds — " +
        "corrupt meta")
    Bloom.checkGeometry(numBits.toInt, numHashes.toInt)
    Bloom.Filter(readWords(spark, path, (numBits / 64L).toInt),
      numHashes.toInt)
  }

  /** Persist a Count-Min sketch — same contract as [[writeBloom]]. */
  def writeCms(spark: SparkSession, sk: CountMin.Sketch,
      path: String, domain: String): Unit = {
    writeMeta(spark, path, "cms", domain, sk.depth.toLong, sk.width.toLong)
    writeWords(spark, path, sk.words)
  }

  /** Load a Count-Min sketch, failing fast on any stamp mismatch. */
  def readCms(spark: SparkSession, path: String,
      expectedDomain: String): CountMin.Sketch = {
    val (depth, width) = readMeta(spark, path, "cms", expectedDomain)
    // re-validate the stamped geometry with the builder's own checks
    // BEFORE any .toInt truncation can make garbage self-consistent
    require(depth <= 8 && width <= CountMin.MaxCells,
      s"$path: stamped CMS geometry (depth=$depth, width=$width) is " +
        "outside the builder's bounds — corrupt meta")
    CountMin.checkGeometry(depth.toInt, width.toInt)
    CountMin.Sketch(readWords(spark, path, (depth * width).toInt),
      depth.toInt, width.toInt)
  }
}
