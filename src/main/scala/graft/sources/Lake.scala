package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned parquet lake writer/reader.
  *
  * The reference's raw lake is a flat directory per topic
  * (eQRawToParquet.py:23) — every query scans everything. At 100 TB
  * the lake must be partitioned by event date so date predicates prune
  * at the directory level (PartitionFilters in the scan, zero I/O for
  * untouched days), with file sizes controlled to avoid the
  * small-files problem micro-batches create.
  */
object Lake {

  /** Write a frame as a date-partitioned lake. `tsCol` drives the
    * `event_date` partition column; `filesPerPartition` coalesces
    * micro-batch dribble into sane file counts. */
  def write(df: DataFrame, path: String, tsCol: String,
      mode: String = "append", filesPerPartition: Int = 1): Unit =
    df.withColumn("event_date", to_date(col(tsCol)))
      .repartition(filesPerPartition, col("event_date"))
      .write.mode(mode)
      .partitionBy("event_date")
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Read a lake whose files span schema versions (columns added over
    * time, the normal fate of a long-lived archive): union the per-file
    * schemas, old files surface the new columns as null. Costs a footer
    * scan per file — use on evolving lakes, not hot paths. */
  def readEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Write as a BUCKETED table (hash-bucketed + sorted by `key`,
    * registered in the session catalog). Two tables bucketed the same
    * way join WITHOUT a shuffle — at 100 TB, pre-bucketing the fact
    * tables on their join key removes the dominant cost of every
    * recurring join (gated by AnalyticsSpec's q90 plan check: a
    * SortMergeJoin with zero Exchange of any kind).
    *
    * SORT CONTRACT: the files are written key-sorted and single-file-
    * per-bucket, but Spark ≥ 3.0 deliberately does not trust
    * write-time order on read (a bucket that ever gains a second file
    * would silently break the merge) — so the join still plans a LOCAL
    * per-bucket sort: linear in-task work over already-sorted runs, no
    * exchange. Sessions that guarantee single-file buckets can opt
    * into sort-free scans with
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`; the
    * library does not set it for you, because under multi-file buckets
    * that flag produces WRONG JOINS, not slow ones. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      nBuckets: Int, mode: String = "overwrite",
      path: Option[String] = None): Unit = {
    // pre-shuffle into the bucket layout (same Murmur3 hash the bucket
    // spec uses) so every bucket is written by exactly ONE task → ONE
    // file: Spark's scan only trusts the per-bucket sort order when a
    // bucket is a single file, so multi-file buckets would re-Sort on
    // read and the sortBy investment buys nothing
    val w = df.repartition(nBuckets, col(key)).write.mode(mode)
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .format("parquet")
    // an explicit path makes the table EXTERNAL (data outlives / lives
    // outside the session warehouse) — lets ephemeral jobs bucket into
    // scratch space without touching spark-warehouse
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Bit-interleaved z-value over quantized dimensions: result bit
    * `i·n + j` is bit `i` of dimension `j` — points close in EVERY
    * dimension get close z-values, so range-sorting by z clusters a
    * multi-dimensional box predicate into few parquet row groups. */
  private[graft] def zValue(dims: Seq[Column], bits: Int): Column = {
    val n = dims.size
    val parts = for {
      i <- 0 until bits
      (d, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d, i).bitwiseAND(lit(1L)), i * n + j)
    parts.reduce(_ bitwiseOR _)
  }

  /** Write `df` Z-ORDERED on `zCols`: rows clustered by the interleaved
    * bits of the (min-max quantized) dimensions, so parquet row-group
    * min/max statistics become TIGHT on every z column at once and a
    * multi-column range predicate prunes most row groups at scan time
    * (`PushedFilters` + footer stats — no index structure needed). At
    * 100 TB this is the difference between scanning a day of data and
    * scanning the 2% of row groups a (key₁, key₂) box actually
    * touches; the single-column analog (plain sort) only skips for the
    * leading column. Layout-only: query RESULTS are identical under
    * any layout (q95's oracle runs the same filter on the unordered
    * table).
    *
    * Quantization is linear min-max over each column (driver-side: one
    * tiny 1-row stats aggregate) — right for roughly uniform keys;
    * heavily skewed columns cluster poorly at the hot end and want a
    * quantile-based bucketing fed in via a derived column instead.
    * Columns must be integral and non-negative. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 8, nFiles: Int = 16, mode: String = "overwrite"): Unit = {
    require(zCols.size >= 2,
      "writeZOrdered: < 2 dims — use a plain sortWithinPartitions")
    require(zCols.size * bits <= 62,
      s"writeZOrdered: ${zCols.size} dims × $bits bits overflows a long")
    val statCols = zCols.flatMap(c =>
      Seq(min(col(c)).cast("long"), max(col(c)).cast("long")))
    val stats = df.agg(statCols.head, statCols.tail: _*).head()
    val mask = (1L << bits) - 1L
    val dims = zCols.zipWithIndex.map { case (c, j) =>
      require(!stats.isNullAt(2 * j),
        s"writeZOrdered: empty input or all-null column $c — nothing " +
          "to quantize")
      val lo = stats.getLong(2 * j)
      val hi = stats.getLong(2 * j + 1)
      require(lo >= 0, s"writeZOrdered: $c has negative values")
      val span = math.max(hi - lo, 1L)
      // division-form overflow gate (the bm25TopK discipline): the
      // quantization product (c - lo) * mask must fit a long — an
      // epoch-nanos-range key would otherwise die in an opaque ANSI
      // ArithmeticException (or wrap silently in non-ANSI sessions,
      // destroying the clustering with no error to catch it)
      require(span <= Long.MaxValue / mask,
        s"writeZOrdered: $c spans $span — quantization at bits=$bits " +
          "overflows a long; pre-bucket the column or lower bits")
      // quantize to 0..(2^bits - 1): exact integer arithmetic
      expr(s"(($c - ${lo}L) * ${mask}L) div ${span}L")
    }
    val z = zValue(dims, bits)
    df.repartitionByRange(nFiles, z)
      .sortWithinPartitions(z)
      .write.mode(mode).parquet(path)
  }

  /** Latest-wins upsert (MERGE) of keyed updates into a
    * date-partitioned lake: rewrites ONLY the partitions an update
    * touches (dynamic partition overwrite), never the whole lake — at
    * 100 TB an update batch costs O(affected days), not O(lake).
    *
    * Winner per key = highest `versionCol`; a same-version collision
    * prefers the incoming update (deterministic via a source-priority
    * tie-break). The merged slice is staged to a scratch path before
    * the overwrite so the target is never read and clobbered in the
    * same job. This is the principled form of the reference's
    * "updated events resolved by whole-row distinct"
    * (sparktoELKstream.py:94-99): updates REPLACE, not accumulate.
    * Idempotent — replaying the same batch (foreachBatch retry
    * semantics) reaches the same state.
    *
    * `tsCol` must be non-null: a null event date can neither address a
    * partition nor be matched by the affected-dates filter, so such
    * rows are rejected up front rather than silently skipping the
    * merge.
    *
    * CONTRACT — partition-scoped MERGE: a key's `event_date` is
    * assumed stable across updates (the usual case: it derives from
    * the event's own timestamp, and corrections revise payload/version,
    * not the day the event happened). An update that *re-dates* a key
    * to a different event_date merges into the NEW date's partition
    * only; the superseded row in the old partition is not rewritten
    * (that partition isn't in the update's affected set — touching it
    * would make every batch O(lake), not O(affected days)). Readers
    * that must be robust to cross-date corrections take the global
    * latest per key at read time, or run [[dropSupersededVersions]]
    * as a maintenance pass. This behavior is pinned by
    * LakeUpsertSpec's re-dating case.
    *
    * DRIVER BOUND — the affected-dates collect: the update batch's
    * DISTINCT event dates are collected to the driver to scope the
    * read filter and the dynamic overwrite. The bound is O(distinct
    * days in the batch), not O(batch) or O(lake) — a century of daily
    * partitions is ~36k date values (a few hundred KB), fine at any
    * corpus scale. The failure mode past it is a batch whose `tsCol`
    * is corrupt (e.g. millions of distinct microsecond-precision
    * "dates" from a mis-cast column): the collect balloons and the
    * `isin` predicate grows past plan-size limits. Callers ingesting
    * untrusted timestamps should validate/clamp `tsCol` to a sane date
    * range first — this method intentionally does not guess a cutoff. */
  def upsertLatest(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, versionCol: String, tsCol: String): Unit = {
    require(updates.filter(col(tsCol).isNull).isEmpty,
      s"upsertLatest: null $tsCol rows cannot be partition-merged")
    import org.apache.spark.sql.expressions.Window
    val updDated = updates.withColumn("event_date", to_date(col(tsCol)))
    val dates = updDated.select("event_date").distinct().collect()
      .map(_.get(0))
    // SCHEMA EVOLUTION (the day-2 reality: the stream gains a column):
    // the existing slice reads with mergeSchema so files already
    // spanning schema versions surface every column, and the union
    // below null-fills whichever side lacks a column — old rows get
    // NULL in the new column, exactly the readEvolving contract. A
    // type CHANGE on a shared column is NOT mergeable: Spark's union
    // would silently coerce (long ∪ string → string), rewriting
    // history with no signal — fail loudly instead (ship a NEW column
    // for the new type).
    // An empty/missing target (first batch) has no schema to read.
    val existingSlice =
      scala.util.Try(readEvolving(spark, path)).toOption
        .map(_.filter(col("event_date").isin(dates: _*))
          .withColumn("__src", lit(0)))
        .getOrElse(updDated.limit(0).withColumn("__src", lit(0)))
    val updTypes = updDated.schema.map(f => f.name -> f.dataType).toMap
    existingSlice.schema.filter(_.name != "__src").foreach { f =>
      updTypes.get(f.name).foreach { dt =>
        require(dt == f.dataType,
          s"upsertLatest: column '${f.name}' changes type " +
            s"${f.dataType.simpleString} -> ${dt.simpleString} — a type " +
            "CHANGE cannot be merged (the union would silently coerce " +
            "old rows); write the new type as a NEW column instead")
      }
    }
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("__src").desc)
    val merged = existingSlice
      .unionByName(updDated.withColumn("__src", lit(1)),
        allowMissingColumns = true)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__src", "__rn")
    val scratch = path.stripSuffix("/") + "__upsert_stage"
    merged.write.mode("overwrite").parquet(scratch)
    spark.read.parquet(scratch)
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date")
      .parquet(path)
    // resolve the filesystem FROM the scratch path (not the default
    // FS): with an s3a:///hdfs:// lake the default-FS delete would
    // throw 'Wrong FS' or aim at the wrong store
    val scratchPath = new org.apache.hadoop.fs.Path(scratch)
    scratchPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(scratchPath, true)
  }

  /** Maintenance pass for lakes that DO receive cross-date key
    * corrections (see the [[upsertLatest]] contract): keep only the
    * globally-latest version of each key, dropping superseded rows
    * stranded in other date partitions. O(lake) by necessity — run it
    * on a schedule, not per batch. */
  def dropSupersededVersions(spark: SparkSession, path: String,
      keyCol: String, versionCol: String): Unit = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col("event_date").desc)
    // mergeSchema: a maintenance rewrite of an EVOLVING lake must see
    // every column any file carries — a plain read samples one footer
    // and would silently DROP a recently-added column from the whole
    // lake (the rewrite then destroys it)
    val latest = readEvolving(spark, path)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val tmp = path.stripSuffix("/") + "__dedup_stage"
    latest.write.mode("overwrite").partitionBy("event_date").parquet(tmp)
    swapInto(spark, path, tmp)
  }

  /** Replace the dataset at `dst` with the staged one at `tmp` via two
    * RENAMES (old→trash, tmp→dst) instead of delete-then-rename: a
    * crash between the renames leaves BOTH copies on disk (recover by
    * renaming either back), whereas delete-first left a window with
    * the only surviving copy in the stage dir. Renames are metadata
    * ops on HDFS/local; on object stores prefer partition-scoped
    * rewrites ([[upsertLatest]]) over whole-lake swaps. Shared with
    * every maintenance compaction in the library (the corpus index's
    * [[graft.operators.Dedup.compactCorpusIndex]] included) so there
    * is exactly ONE swap discipline to audit. */
  private[graft] def swapInto(spark: SparkSession, dst: String, tmp: String): Unit = {
    val dstPath = new org.apache.hadoop.fs.Path(dst)
    val fs = dstPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val trash = new org.apache.hadoop.fs.Path(dst.stripSuffix("/") + "__old")
    fs.delete(trash, true) // stale trash from a prior crash
    if (fs.exists(dstPath) && !fs.rename(dstPath, trash))
      throw new java.io.IOException(s"swap: cannot move $dst aside")
    if (!fs.rename(new org.apache.hadoop.fs.Path(tmp), dstPath))
      throw new java.io.IOException(s"swap: cannot move $tmp into place")
    fs.delete(trash, true)
  }

  /** Compact a lake partition range into `nFiles` files (the
    * maintenance job that keeps file counts bounded under streaming
    * append). */
  def compact(spark: SparkSession, path: String, nFiles: Int = 1): Unit = {
    val tmp = path.stripSuffix("/") + "__compacting"
    // mergeSchema for the same reason as dropSupersededVersions: a
    // compaction must never silently drop a column newer files carry
    // (side effect: the rewrite homogenizes the lake onto the merged
    // schema, null-filling old rows — the documented evolution shape)
    readEvolving(spark, path)
      .repartition(nFiles, col("event_date"))
      .write.mode("overwrite").partitionBy("event_date").parquet(tmp)
    swapInto(spark, path, tmp)
  }
}
