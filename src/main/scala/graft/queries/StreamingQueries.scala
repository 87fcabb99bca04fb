package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming queries under the DRIVER contract (not just specs): each
  * runs a real Structured Streaming job — file stream source →
  * watermarked stateful operators → memory sink — to completion, then
  * returns the sink table so the driver can hash-compare it against a
  * batch-equivalent DuckDB oracle. Deterministic because the file
  * source delivers the whole (static) table and `processAllAvailable`
  * drains it; the streaming plan itself is the same one a live Kafka
  * feed would run.
  */
object StreamingQueries {

  // memory-sink names must be unique per invocation (Bench runs each
  // query several times in one session); the PREVIOUS invocation's
  // sink table is dropped so repeated runs don't accumulate results
  // in driver memory
  private val runSeq = new java.util.concurrent.atomic.AtomicInteger(0)
  private val lastSink = new java.util.concurrent.atomic.AtomicReference[String](null)
  private val lastSink67 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** The shared memory-sink drain protocol: unique sink name, start →
    * processAllAvailable → stop, then swap-and-drop the PREVIOUS
    * invocation's sink table (Bench runs each query several times in
    * one session — without the drop, results accumulate in driver
    * memory). Returns the drained sink table. q67 keeps its own copy
    * because its drain also toggles/restores the noDataMicroBatches
    * conf inside the same try/finally. */
  private def drain(s: SparkSession, out: DataFrame, prefix: String,
      ref: java.util.concurrent.atomic.AtomicReference[String],
      mode: String): DataFrame = {
    val name = s"${prefix}_${runSeq.incrementAndGet()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    val prev = ref.getAndSet(name)
    if (prev != null) s.catalog.dropTempView(prev)
    s.table(name)
  }

  /** events.parquet has shipped `ts` both as TIMESTAMP(NANOS) and as
    * a plain µs timestamp (TESTDATA generations differ): same
    * nanosAsLong + schema-adaptive normalization as Tables.events,
    * but through readStream, with the flag restored afterwards
    * (session hygiene — a later query must see the conf it would
    * have seen had this one never run). */
  private def withNanosFlag[T](s: SparkSession)(body: => T): T = {
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = s.conf.getOption(nanosKey)
    s.conf.set(nanosKey, "true")
    try body finally nanosPrev match {
      case Some(v) => s.conf.set(nanosKey, v)
      case None    => s.conf.unset(nanosKey)
    }
  }

  /** File-stream over the events table (either ts encoding → µs `ts`
    * + exact-ns `ts_ns`, same contract as Tables.events). */
  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    val schema = s.read.parquet(s"$dir/events.parquet").schema
    graft.Tables.normalizeEventTs(
      s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir))
  }

  /** q62: streaming watermarked keyed dedup → tumbling 1-hour windowed
    * counts per event type, complete output mode. The dedup is a
    * real stateful `dropDuplicates` over the stream (event_id is the
    * reference's update-collapse key); the oracle is the equivalent
    * batch aggregation. */
  def q62StreamWindowCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n")
      drain(s, agg, "q62_stream_out", lastSink, "complete")
        .orderBy($"window_start", $"event_type")
    }
  }

  /** Batch equivalent. COUNT(DISTINCT event_id) — not COUNT(*) — so the
    * oracle genuinely gates the stream's keyed dropDuplicates: a corpus
    * with re-stamped duplicate event_ids would flip COUNT(*) but not
    * the deduped stream count. (Equivalence requires each event_id to
    * map to one (window, type) — true for exact-duplicate replays, the
    * case keyed dedup exists for.) */
  val q62Sql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** q67: STREAM-STREAM correlate under the driver contract — the
    * join side of §2.9, previously spec-only. Purchases × errors
    * within ±60 s via [[graft.streaming.Correlate.stream]] (two
    * watermarked file streams, bin equi-join + residual time-range
    * condition — the state-bounded shape a live feed runs), drained
    * deterministically (single micro-batch over the static table) and
    * hash-compared against the identical BATCH range join — q59's
    * oracle, so the stream plan is gated by exactly the semantics its
    * batch twin already proves. */
  def q67StreamCorrelate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val purchases = eventsStream(s, dir)
        .filter($"event_type" === "purchase")
        .select($"event_id".as("p_event"), $"ts".as("event_ts"))
      val errors = eventsStream(s, dir)
        .filter($"event_type" === "error")
        .select($"event_id".as("e_event"), $"ts".as("time"),
          $"value".as("data"))
      val joined = graft.streaming.Correlate
        .stream(purchases, errors, windowSec = 60)
        .select($"p_event", $"e_event")
      val name = s"q67_stream_out_${runSeq.incrementAndGet()}"
      // the drain needs no no-data micro-batch: an inner join emits on
      // the data batch; the extra batch only advances the watermark to
      // EVICT state — a full scan of both join state stores (~800k
      // rows here) that the about-to-stop query never benefits from
      val noDataKey = "spark.sql.streaming.noDataMicroBatches.enabled"
      val noDataPrev = s.conf.getOption(noDataKey)
      s.conf.set(noDataKey, "false")
      val q = joined.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try q.processAllAvailable() finally {
        q.stop()
        noDataPrev match {
          case Some(v) => s.conf.set(noDataKey, v)
          case None    => s.conf.unset(noDataKey)
        }
      }
      val prev = lastSink67.getAndSet(name)
      if (prev != null) s.catalog.dropTempView(prev)
      s.table(name).orderBy($"p_event", $"e_event")
    }
  }

  /** Batch oracle: the stream must produce exactly the pairs the
    * batch range join (q59) produces. */
  val q67Sql: String = Completeness.q59Sql

  /** q72: STREAMING NEAR-DUP detection — similarity-level dedup over a
    * stream, not just exact-key `dropDuplicates`: the documents table
    * streamed through [[graft.streaming.NearDup.pairs]]
    * (portable SimHash-96 sign → 13-14-bit band buckets →
    * flatMapGroupsWithState compare-against-bucket-state), drained,
    * cross-band duplicates collapsed on the sink. A fully drained run
    * emits exactly the batch banding's candidate pairs, so the oracle
    * is q28's end-to-end DuckDB replay of the same spec. This drained
    * run leaves `stateTtl` DISARMED: `processAllAvailable` cannot
    * coexist with a processing-time timeout (the engine then
    * intentionally never reports "no new data" —
    * `FlatMapGroupsWithStateExec.shouldRunAnotherBatch` is always true
    * — so the drain would never return); production long-running
    * streams arm the TTL + a trigger interval, covered by the
    * StreamingSpec TTL-eviction case.
    *
    * Production dials (both defaulted OFF/loose here so the drained
    * run stays batch-equivalent): `stateTtl` — the dedup horizon;
    * state untouched that long evicts, a later dup is a documented
    * miss (set it to the ingestion re-poll window, e.g. 7 days);
    * `maxBucket` (default [[graft.operators.HotBuckets.DefaultCap]],
    * 10k) — per-bucket state bound; past it arrivals still COMPARE but
    * stop being RETAINED, so the drained set narrows to a subset of
    * the batch candidates (post-cap × post-cap pairs are the miss —
    * the planted over-cap StreamingSpec case pins the exact class). */
  def q72StreamNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
    val pairs = graft.streaming.NearDup.pairs(stream, maxHamming = 6)
    graft.streaming.NearDup
      .distinctPairs(drain(s, pairs, "q72_stream_out", lastSink72,
        "append"))
      .orderBy($"id_a", $"id_b")
  }

  private val lastSink72 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** Batch oracle: the drained stream ≡ the batch portable-SimHash
    * pipeline (q28's replay). */
  val q72Sql: String = TrainingData.q28Sql

  private val lastSink89 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q89: STREAMING CARDINALITY MONITOR — per-hour per-type distinct
    * user estimates from a KMV sketch aggregated IN the stream
    * ([[graft.functions.KmvMinHashes]] runs inside the streaming
    * ObjectHashAggregate, its ≤ k-long buffer living in the state
    * store): the live-dashboard twin of q85's batch sketch. The state
    * per (window, type) group is BOUNDED at k hashes no matter how
    * many events a window sees — the streaming analog of the sketch's
    * batch scale contract — where a streaming COUNT(DISTINCT) would
    * grow state with true cardinality. k = 16 keeps sf0.1 windows in
    * the genuine estimation regime (12-51 distinct users/window);
    * sf0.01 windows are exhaustive-exact. The oracle replays the
    * sketch bit-identically batch-side in DuckDB. */
  def q89StreamKmv(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val agg = eventsStream(s, dir)
        .withWatermark("ts", "1 hour")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(graft.functions.KmvMinHashes.kmvMinHashes(
          graft.operators.Sampling.portableHash48($"user_id".cast("string")),
          16).as("sketch"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss")
            .as("window_start"),
          $"event_type",
          graft.operators.Sketches.kmvEstimate("sketch", 16).as("est_users"))
      drain(s, agg, "q89_stream_out", lastSink89, "complete").orderBy($"window_start", $"event_type")
    }
  }

  private val lastSink97 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q97: STREAMING FUNNEL — q93's ordered-step matching maintained
    * live per user ([[graft.streaming.FunnelStream]]: buffered-events
    * state, per-batch greedy re-match, progress-stream emissions).
    * Consumers take the max-`n_seen` snapshot per user — done here
    * with `max_by`, robust to multi-batch delivery; the drained
    * single-batch run reproduces the batch funnel EXACTLY, so q93's
    * oracle gates the streaming plan (the q72 ↔ q28 convention).
    * Same step sequence and observation window as q93 — shared
    * constants, so the two cannot drift apart silently. */
  def q97StreamFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val steps = Analytics.FunnelSteps
      val stepIdx = coalesce(steps.zipWithIndex.map { case (st, i) =>
        when($"event_type" === st, lit(i)) }: _*)
      val ev = eventsStream(s, dir)
        .filter($"ts" < lit(Analytics.FunnelEnd).cast("timestamp"))
        .filter($"event_type".isin(steps: _*))
        .select($"user_id", expr("unix_micros(ts)").as("ts_us"),
          stepIdx.as("step"))
      val snaps = graft.streaming.FunnelStream.funnel(ev, steps.size)
      val latest = drain(s, snaps.toDF(), "q97_stream_out", lastSink97,
          "append")
        .groupBy($"user_id")
        .agg(max_by(struct($"ts", $"depth"), $"n_seen").as("f"))
        .filter($"f.depth" >= 1) // funnel entrants only, as in batch
      val tCols = steps.indices.map(i =>
        when(element_at($"f.ts", i + 1) =!= -1L,
          element_at($"f.ts", i + 1)).as(s"t${i + 1}_us"))
      latest
        .select(($"user_id" +: tCols) :+ $"f.depth".as("depth"): _*)
        .orderBy($"user_id")
    }
  }

  /** The drained stream ≡ the batch funnel — q93's oracle. */
  val q97Sql: String = Analytics.q93Sql

  private val lastSink112 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q112: streaming rate-anomaly monitor — the live twin of q100's
    * dense-spine z-scores ([[graft.streaming.AnomalyStream]]). Each
    * key re-emits its full scored series per batch tagged `seen`;
    * the consumer keeps the max-`seen` emission per key, so the
    * drained run is EXACTLY the batch answer — q100's oracle. */
  def q112StreamAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val ev = eventsStream(s, dir)
        .filter($"event_type".isNotNull && $"ts".isNotNull)
        .select($"event_type".as("key"),
          expr("unix_micros(date_trunc('MINUTE', ts)) div 60000000")
            .as("m"))
      val out = graft.streaming.AnomalyStream.zScores(ev, trailing = 30)
      drain(s, out.toDF(), "q112_stream_out", lastSink112, "append")
        .groupBy($"key", $"m")
        .agg(max_by(struct($"n", $"z"), $"seen").as("f"))
        .select($"key",
          date_format(timestamp_micros($"m" * 60000000L),
            "yyyy-MM-dd HH:mm:ss").as("minute_str"),
          $"f.n".as("n"), $"f.z".as("z"))
        .orderBy($"key", $"minute_str")
    }
  }

  /** The drained stream ≡ the batch dense-spine z-scores — q100's
    * oracle. */
  val q112Sql: String = Analytics.q100Sql

  private val lastSink118 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q118: streaming windowed value quantiles — the live twin of
    * q117's exact rank selection ([[graft.streaming.QuantileStream]]).
    * Each (key, hour) group re-emits its pct set per batch tagged
    * `seen`; the consumer keeps the max-`seen` rows, so the drained
    * run is EXACTLY the batch answer — q117's oracle verbatim. */
  def q118StreamQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val ev = eventsStream(s, dir)
        .filter($"event_type".isNotNull && $"ts".isNotNull &&
          $"value".isNotNull && !isnan($"value"))
        .select($"event_type".as("key"),
          // epoch-integer hour truncation — the batch twin's
          // timezone-free contract (date_trunc HOUR is session-tz-
          // aware; x − pmod(x, unit) is not)
          expr("(unix_micros(ts) - pmod(unix_micros(ts), 3600000000))" +
            " div 1000000").as("w"),
          graft.operators.WindowedQuantiles.quantizedValue($"value")
            .as("qv"))
      val out = graft.streaming.QuantileStream.quantiles(ev,
        pcts = Seq(50, 95))
      drain(s, out.toDF(), "q118_stream_out", lastSink118, "append")
        .groupBy($"key", $"w", $"pct")
        .agg(max_by(struct($"n", $"est"), $"seen").as("f"))
        .select($"key",
          date_format(timestamp_seconds($"w"), "yyyy-MM-dd HH:mm:ss")
            .as("hour_str"),
          $"pct".cast("long").as("pct"),
          $"f.n".as("n"), $"f.est".as("est"))
        .orderBy($"key", $"hour_str", $"pct")
    }
  }

  /** The drained stream ≡ the batch exact rank selection — q117's
    * oracle. */
  val q118Sql: String = Behavior.q117Sql

  private val lastSink125 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q125: streaming heavy hitters — SpaceSaving summaries per hash
    * shard ([[graft.streaming.HeavyHitterStream]]), the live twin of
    * the batch Count-Min prune-then-verify (q115/q122) and the first
    * family whose exact deployment variant is bounded BY CONSTRUCTION
    * (state = nShards × capacity rows, forever). Dials put the run in
    * the exact regime (8 shards × capacity 512 ≥ sf0.1's ~1500
    * distinct users ⇒ zero evictions ⇒ every count exact, every err
    * 0), so the oracle is the EXACT heavy-hitter SQL at threshold 60
    * — deliberately between q115's 70 and q122's 50, so the three
    * frequency gates are independent. The consumer is the SNAPSHOT
    * read the emission contract requires (each shard's max-`seen`
    * rows), not per-key max-seen — see the operator doc for why. */
  def q125StreamHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val ev = eventsStream(s, dir)
        .filter($"user_id".isNotNull)
        .select(
          pmod(xxhash64($"user_id"), lit(8)).cast("int").as("shard"),
          $"user_id".as("key"))
      val out = graft.streaming.HeavyHitterStream.topKeys(ev,
        capacity = 512)
      val emitted =
        drain(s, out.toDF(), "q125_stream_out", lastSink125, "append")
      graft.streaming.HeavyHitterStream.latestSnapshot(emitted)
        .filter($"n" >= 60)
        .select($"key".as("user_id"), $"n")
        .orderBy($"user_id")
    }
  }

  private val lastSink139 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q139: GLOBAL top-k readout over the streaming SpaceSaving shards
    * ([[graft.streaming.HeavyHitterStream.globalTopK]]) — q125 gates
    * the per-shard snapshots; this gates their cross-shard COMPOSITION
    * (the union-of-partitions error contract + the (n desc, key) rank)
    * in the same exact regime, where the readout must equal the exact
    * global top-20 including rank positions that interleave keys from
    * different shards. */
  def q139StreamGlobalTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      val ev = eventsStream(s, dir)
        .filter($"user_id".isNotNull)
        .select(
          pmod(xxhash64($"user_id"), lit(8)).cast("int").as("shard"),
          $"user_id".as("key"))
      val out = graft.streaming.HeavyHitterStream.topKeys(ev,
        capacity = 512)
      val emitted =
        drain(s, out.toDF(), "q139_stream_out", lastSink139, "append")
      graft.streaming.HeavyHitterStream.globalTopK(emitted, k = 20)
        .select($"key".as("user_id"), $"n", $"err", $"rank")
        .orderBy($"rank")
    }
  }

  /** Exact regime ⇒ every err 0 and the readout ≡ the exact global
    * top-20 by (count desc, user_id). */
  val q139Sql: String =
    """SELECT user_id, n, CAST(0 AS BIGINT) AS err, rank FROM (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS n,
      |    CAST(row_number() OVER (ORDER BY count(*) DESC, user_id)
      |      AS BIGINT) AS rank
      |  FROM events WHERE user_id IS NOT NULL GROUP BY 1)
      |WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** q142: STREAMING rollup maintenance — the live twin of q127's
    * batch fold (the q118 stance: the streaming plan is the one a
    * live feed runs). The events file stream drives `foreachBatch`,
    * whose body is EXACTLY the production wiring:
    * [[graft.operators.MaterializedRollup.refreshLake]] with the
    * engine's own epoch id as the batch stamp — so the idempotent-
    * replay contract lines up 1:1 with foreachBatch's at-least-once
    * retry semantics (a retried epoch re-presents the same id and
    * the fold skips). After the drain the rollup is read back from
    * the lake; the oracle is q127's full recompute verbatim. */
  def q142StreamRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    withNanosFlag(s) {
      graft.Scratch.withTempDir(s, "graft_q142_rollup") { base =>
        val ev = eventsStream(s, dir)
          .select($"event_type", $"ts", $"value")
        val q = ev.writeStream
          .foreachBatch { (batch: DataFrame, id: Long) =>
            graft.operators.MaterializedRollup.refreshLake(
              s, s"$base/rollup", batch, batchId = id)
          }
          .option("checkpointLocation", s"$base/ckpt")
          .start()
        try q.processAllAvailable() finally q.stop()
        graft.operators.MaterializedRollup.readout(
            graft.operators.MaterializedRollup
              .readLake(s, s"$base/rollup"))
          .orderBy($"event_type", $"day")
          .localCheckpoint()
      }
    }
  }

  /** The drained stream-maintained rollup ≡ the batch full recompute
    * — q127's oracle verbatim. */
  val q142Sql: String = Analytics.q127Sql

  private val lastSink144 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q144: STREAMING decontamination monitor — a STREAM-STATIC join,
    * the one streaming join class §2.9 had not yet exercised (q67 is
    * stream-stream): incoming docs' hashed 8-grams
    * ([[graft.operators.Dedup.gramHashArray]] — the SAME kernel the
    * batch decontaminate uses, so the two sides cannot drift on gram
    * width/tokenization) inner-join the STATIC benchmark gram table,
    * then a per-doc streaming count of leaked grams (complete mode —
    * the q62 unwatermarked-agg shape). This is the live form of the
    * q68/q116 family: the ingestion-time dashboard that flags a
    * contaminated feed BEFORE the nightly batch decon runs. Static
    * side is benchmark-sized and broadcast; stream state is one count
    * per flagged doc. Split mirrors q68 (doc_id % 20 picks the
    * benchmark) so the oracle reuses its proven gram fragments.
    *
    * HASH-COLLISION CONTRACT (the q116 discipline,
    * [[graft.operators.Dedup.gramHashArray]]): the Spark side joins
    * 64-bit gram hashes while the oracle joins exact gram strings, so
    * a cross-gram xxhash64 collision would inflate `n_leaked` and
    * diff the oracle. The direction is OVER-flagging — safe for
    * decontamination (a monitor that over-counts leaks never lets one
    * through) — and the expected collision count at tested scales,
    * |corpus grams| × |bench grams| / 2^64 (~10^5 × ~10^4 at sf0.1 ≈
    * 10^-10 expected extra hits), is why the exact-string oracle gate
    * stays green; a deployment at 10^12 grams carries q116's stated
    * bound instead of exactness. */
  def q144StreamDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter($"doc_id" % 20 =!= 0)
      .select($"doc_id",
        explode(graft.operators.Dedup.gramHashArray($"text", 8))
          .as("gram_h"))
    val bench = graft.operators.Dedup.benchmarkGrams(
      graft.Tables.documents(s, dir).filter($"doc_id" % 20 === 0),
      n = 8)
    val hits = stream
      .join(bench, Seq("gram_h")) // stream-static inner join
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_leaked"))
    drain(s, hits, "q144_stream_out", lastSink144, "complete")
      .orderBy($"doc_id")
  }

  private val lastSink149 = new java.util.concurrent.atomic.AtomicReference[String](null)

  /** q149: the BOUNDED-STATE twin of q144 (the TTL-twin discipline,
    * q97/q112/q118, pointed at the decon monitor): q144's complete-
    * mode leak counter holds one state row per flagged doc FOREVER —
    * fine over a benchmark, unbounded on a live feed. This twin gives
    * each doc an ingestion timestamp, counts leaks per (1-day window,
    * doc) under a watermark in APPEND mode, and lets the ENGINE evict
    * each day's groups when the watermark passes — state is O(docs in
    * open windows), not O(flagged docs ever).
    *
    * SHAPE CHOICE, stated: the fMGWS tombstone contract
    * ([[graft.streaming.AnomalyStreamTtl]]) exists for entities a
    * stream REVISITS across batches (a funnel user, a rate key) —
    * a document is one-shot (its grams explode from one row), so the
    * idiomatic bounded form is the built-in watermarked window
    * aggregation: closed windows EMIT exactly once then EVICT (engine
    * removal, gated through `numRowsRemoved` in TtlStateMetricsSpec),
    * and a straggler gram below the watermark DROPS — the documented
    * under-report direction, never a double-emit. Same ONE
    * gram kernel as q144/batch ([[graft.operators.Dedup
    * .gramHashArray]]); q144's hash-collision contract applies
    * verbatim.
    *
    * HORIZON ≡ ORACLE: event time is synthetic-deterministic (one
    * hour per doc_id), the watermark delay is 0, so after the drain
    * the watermark sits at the max streamed timestamp and EXACTLY the
    * day-windows ending at or before it have emitted — the oracle is
    * q144's per-doc counts restricted by that same integer window
    * arithmetic (docs of the final, still-open day are excluded on
    * both sides). */
  def q149StreamDeconTtl(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val schema = s.read.parquet(s"$dir/documents.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet").parquet(dir)
      .filter($"doc_id" % 20 =!= 0)
      .withColumn("ts", timestamp_micros($"doc_id" * 3600000000L))
      .withWatermark("ts", "0 seconds")
      .select($"doc_id", $"ts",
        explode(graft.operators.Dedup.gramHashArray($"text", 8))
          .as("gram_h"))
    val bench = graft.operators.Dedup.benchmarkGrams(
      graft.Tables.documents(s, dir).filter($"doc_id" % 20 === 0),
      n = 8)
    val hits = stream
      .join(bench, Seq("gram_h")) // stream-static inner join
      .groupBy(window($"ts", "1 day"), $"doc_id")
      .agg(count(lit(1)).as("n_leaked"))
      .select($"doc_id", $"n_leaked")
    drain(s, hits, "q149_stream_out", lastSink149, "append")
      .orderBy($"doc_id")
  }

  /** q144's counts restricted to CLOSED day-windows: doc d lives in
    * the day `(d·3600) div 86400`; that window closed iff its end is
    * ≤ the final watermark (= the max streamed doc's hour, delay 0). */
  val q149Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 7, 1)),
      |    i -> array_to_string(toks[i:i+7], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 20 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 20 <> 0),
      |counts AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_leaked
      |           FROM corp c JOIN bench b ON c.gram = b.gram
      |           GROUP BY 1),
      |horizon AS (SELECT max(doc_id) AS m FROM documents
      |            WHERE doc_id % 20 <> 0)
      |SELECT doc_id, n_leaked FROM counts, horizon
      |WHERE ((doc_id * 3600) // 86400 + 1) * 86400 <= m * 3600
      |ORDER BY doc_id""".stripMargin

  /** Batch replay: per-doc count of distinct grams shared with the
    * benchmark slice — q68's gram CTEs, aggregated instead of
    * NOT-EXISTS-collapsed (per-doc grams are DISTINCT by the shingle
    * contract, so count(*) counts distinct leaked grams). */
  val q144Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 7, 1)),
      |    i -> array_to_string(toks[i:i+7], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 20 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 20 <> 0)
      |SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_leaked
      |FROM corp c JOIN bench b ON c.gram = b.gram
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** The drained snapshot ≡ the exact per-key counts (exact regime:
    * capacity ≥ per-shard distinct keys ⇒ no evictions). */
  val q125Sql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 HAVING count(*) >= 60
      |ORDER BY user_id""".stripMargin

  /** Batch replay of the same sketch + estimator (q85's integer math
    * at k = 16 over the portable user-id hash). */
  val q89Sql: String =
    """WITH h AS (
      |  SELECT DISTINCT
      |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
      |      AS window_start,
      |    event_type,
      |    CAST(md5_number_upper(CAST(user_id AS VARCHAR))
      |         & 281474976710655 AS BIGINT) AS h
      |  FROM events
      |  WHERE user_id IS NOT NULL),
      |rk AS (SELECT *, row_number() OVER
      |         (PARTITION BY window_start, event_type ORDER BY h) AS rn
      |       FROM h),
      |per AS (SELECT window_start, event_type, count(*) AS n, max(h) AS hk
      |        FROM rk WHERE rn <= 16 GROUP BY 1, 2)
      |SELECT window_start, event_type,
      |  CAST(CASE WHEN n < 16 THEN n
      |            ELSE 4222124650659840 // hk END AS BIGINT) AS est_users
      |FROM per ORDER BY window_start, event_type""".stripMargin
}
