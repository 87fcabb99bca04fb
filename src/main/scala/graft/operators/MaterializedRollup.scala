package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType}

/** Incremental materialized-rollup maintenance — the warehouse
  * day-2 operation the lake family (upsert q74, compaction, z-order
  * q95) implies but never exercises at the AGGREGATE level: a
  * persisted daily rollup refreshed from each ingestion batch
  * WITHOUT rescanning history. Refresh cost is
  * `O(|delta| + |rollup|)` — the delta aggregation scans only the
  * new batch (at 100 TB: the day's partition, pruned by the lake's
  * date layout), the merge shuffles only rollup-sized rows (groups,
  * not events) — where a recompute pays `O(|history|)` every run.
  *
  * The trick is the STAT ALGEBRA, not the plumbing: every maintained
  * column must be mergeable by an associative, commutative combine
  * with the raw-event partials — count (+), quantized-integer sum
  * (+ — the repo's exact-decimal discipline, so the refreshed sum is
  * bit-identical under ANY batch split), min (least), max
  * (greatest). Non-mergeable readouts (mean) derive from mergeable
  * ones at read time. The same algebra is what Spark's own partial
  * aggregation exploits map-side; this operator persists the partial
  * state across JOBS instead of across tasks (the SketchStore
  * build-once stance, at exact-aggregate granularity).
  *
  * CONTRACT: partials being merged must cover DISJOINT event sets
  * (split by an ingestion boundary — here a ts cutoff; late events
  * for an old day are fine, they land in a new batch and merge into
  * the old day's row additively). Re-merging an already-merged batch
  * double-counts — the caller owns exactly-once batch delivery, the
  * same contract as `Dedup.ingestBatch`. */
object MaterializedRollup {

  private val D = DecimalType(38, 0)

  /** Raw events → partial rollup rows, one per (event_type, UTC
    * epoch-day): `(event_type, day, n, sum_qv, min_qv, max_qv)` with
    * `qv = floor(value·10⁴)` (the shared guarded quantizer —
    * [[Trend.quantize4]]'s ±9e14 loud bound) and `sum_qv` an exact
    * decimal(38,0). Null type/ts/value and NaN rows are excluded
    * (the q117 filter contract). Day is timezone-free epoch-integer
    * arithmetic (`µs div 86 400 000 000`), never session-tz
    * `date_trunc`. */
  def aggregate(events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value"): DataFrame =
    events
      .filter(col(typeCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull && !isnan(col(valueCol)))
      .select(col(typeCol).as("event_type"),
        unix_micros(col(tsCol)).as("__us"),
        Trend.quantize4(col(valueCol).cast("double"),
          "materializedRollup", valueCol).as("__qv"))
      // integer floor-division (Column./ is IEEE true division) —
      // the q118 timezone-free truncation idiom
      .withColumn("day",
        expr("(__us - pmod(__us, 86400000000)) div 86400000000")
          .cast(LongType))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n"),
        sum(col("__qv")).cast(D).as("sum_qv"),
        min(col("__qv")).cast(LongType).as("min_qv"),
        max(col("__qv")).cast(LongType).as("max_qv"))

  /** Merge partial rollups covering disjoint event sets (see the
    * class contract) into one refreshed rollup — a rollup-sized
    * shuffle, map-side combinable, history never touched. */
  def merge(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "merge needs at least one partial rollup")
    parts.reduce(_.unionByName(_))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("n")).cast(LongType).as("n"),
        sum(col("sum_qv")).cast(D).as("sum_qv"),
        min(col("min_qv")).as("min_qv"),
        max(col("max_qv")).as("max_qv"))
  }

  // ---- persisted rollup through the lake ----------------------------
  // merge() keeps the algebra honest per job; a REAL rollup must also
  // survive restarts, retries, and lake maintenance. refreshLake folds
  // a delta batch into a rollup persisted via Lake.upsertLatest (keyed
  // on (event_type, day), date-partitioned by the day itself), with a
  // per-row batch stamp making replays IDEMPOTENT — the property the
  // additive merge alone cannot give, because re-merging an applied
  // batch double-counts.

  /** The lake's row layout adds to the partial-rollup columns:
    * `rk` = "event_type:day" (the upsert key), `batch_id` (the stamp),
    * `rts` = the day's own midnight timestamp (drives `event_date`
    * partitioning, so a refresh touches only the days its delta
    * carries — O(affected days), never O(rollup)). */
  private def stamp(rollup: DataFrame, batchId: Long): DataFrame =
    rollup
      .withColumn("rk", concat(col("event_type"), lit(":"),
        col("day").cast("string")))
      .withColumn("batch_id", lit(batchId))
      .withColumn("rts", timestamp_micros(col("day") * 86400000000L))

  /** Fold one ingestion batch's events into the rollup lake at `path`.
    *
    * CONTRACT: `batchId` is strictly increasing across DISTINCT
    * batches (a replayed/retried batch reuses ITS id — foreachBatch
    * semantics). Idempotence is per (key, batch): a key whose stored
    * stamp already equals `batchId` is skipped (this batch is folded
    * in), so replaying after a crash — including a crash MID-upsert
    * that overwrote some day-partitions and not others — never
    * double-counts: stamped days skip, unstamped days still hold
    * their pre-batch rows and re-merge to the identical value. A
    * stored stamp GREATER than `batchId` means the caller broke
    * monotonicity (replaying batch 3 after 4 landed on the same key
    * would merge against a base that already contains 4) — that
    * fails loudly rather than corrupting history.
    *
    * COMMIT GRANULARITY — CLOSED (the r14 residual): the replay
    * argument needs each day-partition to hold EITHER its pre-batch
    * rows OR the stamped new rows; Spark's dynamic partition
    * overwrite could crash inside one day's delete-then-swap window
    * and leave that day EMPTY, so this fold commits through
    * [[graft.sources.Lake.upsertLatest]]'s `atomicDays` mode instead:
    * the merged slice stages fully partitioned, each day swaps in via
    * two renames (the `swapInto` discipline at day granularity), and
    * [[graft.sources.Lake.recoverUpsertDays]] — run here BEFORE the
    * existing-slice read — heals the one rename-window state a crash
    * can leave. A replay after ANY crash point therefore merges
    * against an intact base (crash-injection-spec'd at every commit
    * point). The rename-based commit assumes HDFS/local rename
    * semantics; an object-store deployment puts the rollup lake on a
    * rename-atomic layer or a transactional table format — the stamps
    * and contracts carry over unchanged.
    *
    * Scale shape: delta aggregation scans only the batch; the
    * existing-slice read prunes to the delta's event_date partitions;
    * the merge shuffles rollup-sized rows; the upsert rewrites only
    * affected days. Nothing ever rescans event history. */
  def refreshLake(spark: SparkSession, path: String,
      deltaEvents: DataFrame, batchId: Long,
      typeCol: String = "event_type", tsCol: String = "ts",
      valueCol: String = "value"): Unit =
    refreshLakeSeamed(spark, path, deltaEvents, batchId, typeCol, tsCol,
      valueCol, graft.sources.Lake.NoUpsertSeam)

  /** [[refreshLake]] with the upsert's crash-injection seam threaded
    * through (test hook — the `compactCorpusIndexStaged` pattern). */
  private[graft] def refreshLakeSeamed(spark: SparkSession, path: String,
      deltaEvents: DataFrame, batchId: Long,
      typeCol: String, tsCol: String, valueCol: String,
      seam: (String, String) => Unit): Unit = {
    // heal a prior crashed atomic-day commit FIRST (even for an empty
    // delta): a day sitting in the rename-window trash would read as
    // missing — to this batch's base read AND to any readLake between
    // batches. upsertLatest heals again at commit time; that second
    // pass is two existence probes and can never find work under the
    // single-writer contract (nothing commits between the two calls)
    // — kept deliberately, because correctness there must not depend
    // on every caller remembering this pre-read heal
    graft.sources.Lake.recoverUpsertDays(spark, path)
    val delta = aggregate(deltaEvents, typeCol, tsCol, valueCol)
      .localCheckpoint() // one computation feeds key-join + merge
    if (delta.isEmpty) return
    // the ONE shared probe ([[graft.sources.Lake.probeHasData]]): its
    // eventually-consistent-listing residual applies to this fold too
    // — a false-empty listing routes to the fresh-lake branch and the
    // upsert then prefers the newly-stamped delta partials over the
    // accumulated rollup for the touched keys (see the helper's doc)
    val exists = graft.sources.Lake.probeHasData(spark, path)
    val toApply =
      if (!exists) delta
      else {
        val days = delta.select(col("day")).distinct()
        // event_date prune first (partition-level), then the exact
        // key semi-join — the affected slice is O(delta days)
        val affected = spark.read.parquet(path)
          .join(broadcast(days.select(
            to_date(timestamp_micros(col("day") * 86400000000L))
              .as("event_date"))), Seq("event_date"), "left_semi")
          .join(broadcast(delta.select(col("event_type"), col("day"))),
            Seq("event_type", "day"), "left_semi")
          .localCheckpoint()
        // ONE bounded probe, not a full count: any single ahead row
        // proves the monotonicity violation
        val ahead = affected.filter(col("batch_id") > batchId)
          .select(col("rk"), col("batch_id")).limit(1).collect()
        if (ahead.nonEmpty) {
          throw new IllegalStateException(
            s"refreshLake: key ${ahead(0).getString(0)} already carries " +
              s"batch ${ahead(0).getLong(1)} > $batchId — batch ids must " +
              "be applied in increasing order (replaying an OLD batch " +
              "over a newer stamp would merge against a base that " +
              "already contains later data)")
        }
        val appliedKeys = affected.filter(col("batch_id") === batchId)
          .select(col("event_type"), col("day"))
        // checkpointed: the anti-join otherwise re-evaluates for the
        // isEmpty probe, base's semi-join build side, AND the merge —
        // three evaluations per micro-batch on the q142 hot path
        val deltaToApply = delta.join(broadcast(appliedKeys),
          Seq("event_type", "day"), "left_anti")
          .localCheckpoint()
        if (deltaToApply.isEmpty) return // fully-replayed batch: no-op
        val base = affected.filter(col("batch_id") < batchId)
          .select(col("event_type"), col("day"), col("n"),
            col("sum_qv"), col("min_qv"), col("max_qv"))
          .join(broadcast(deltaToApply.select(col("event_type"),
            col("day"))), Seq("event_type", "day"), "left_semi")
        merge(Seq(base, deltaToApply))
      }
    graft.sources.Lake.upsertLatestStaged(spark, path,
      stamp(toApply, batchId), keyCol = "rk", versionCol = "batch_id",
      tsCol = "rts", atomicDays = true, seam = seam)
  }

  /** Read the persisted rollup back as partial-rollup rows (the
    * [[merge]]/[[readout]] input shape) — stamps and lake plumbing
    * columns dropped. */
  def readLake(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .select(col("event_type"), col("day"), col("n"),
        col("sum_qv").cast(D), col("min_qv"), col("max_qv"))

  /** Read-time finalization: integer columns for the hash-exact
    * surface plus the derived mean — `sum/(n·10⁴)` as ONE raw IEEE
    * double division, deliberately UN-rounded (the q116 stance:
    * `round(·,4)` at a representable half boundary is rounding-mode-
    * dependent across engines — HALF_UP here, half-even in DuckDB —
    * and a daily mean lands on one in practice). The BIGINT cast of
    * `sum_qv` is guarded: a rollup whose exact sum outgrew int64
    * must die loudly, not wrap or null. */
  def readout(rollup: DataFrame): DataFrame = {
    val inRange = col("sum_qv").between(
      BigDecimal(Long.MinValue), BigDecimal(Long.MaxValue))
    rollup.select(col("event_type"), col("day"), col("n"),
      when(inRange, col("sum_qv").cast(LongType))
        .otherwise(raise_error(concat(
          lit("materializedRollup: sum_qv="), col("sum_qv").cast("string"),
          lit(" overflows BIGINT — widen the readout")))
          .cast(LongType)).as("sum_qv"),
      col("min_qv"), col("max_qv"),
      (col("sum_qv").cast("double") /
        (col("n").cast("double") * lit(10000.0))).as("mean_v"))
  }
}
