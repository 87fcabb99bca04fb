package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming throughput micro-bench: drives the full parse → enrich →
  * watermarked-dedup pipeline (streaming/Jobs.eventsPipeline +
  * dedupStream) from a MemoryStream and reports events/sec, plus the
  * raw archiver path. Substantiates the BASELINE.md ingest targets
  * (the reference envelope is ≤ a few msgs/s — SURVEY §6).
  *
  * Usage: runMain graft.StreamBench [nBatches] [eventsPerBatch]
  *    or: runMain graft.StreamBench table
  *
  * `table` (r17 verdict stretch) sweeps the two dials a deployment
  * actually tunes — micro-batch size (the trigger dial: bigger
  * batches amortize per-batch planning/commit overhead at the cost of
  * latency) and dedup-state cardinality (the id pool: the 8-day
  * watermark means state = distinct ids seen, so the pool size IS the
  * steady-state state-store row count) — under BOTH state backends
  * (on-heap default and RocksDB), at a fixed total event count so
  * ev/s is comparable across cells. One JSON line per cell, with BOTH
  * axes of the trade a deployment actually makes — throughput AND
  * per-batch event→sink latency (p50/p95 of the per-chunk wall-clock):
  *   {"metric":"stream_dial","provider":…,"per_batch":…,
  *    "state_keys":…,"events_per_sec":…,"lat_p50_ms":…,
  *    "lat_p95_ms":…,"sunk_rows":…}
  */
object StreamBench {

  /** One measured cell: drives `total` events in `perBatch`-sized
    * micro-batches through the parse→enrich→watermarked-dedup
    * pipeline, ids drawn round-robin from a pool of `idPool` (pool <
    * total → re-sends that the dedup drops; state caps at the pool).
    * Returns (seconds, sunk rows, per-batch event→sink latencies ms).
    * Fresh checkpoint per call — state never leaks across cells.
    *
    * One micro-batch per chunk, enforced (r18 ADVICE): the query is
    * drained with processAllAvailable() after EVERY addData, otherwise
    * a trigger consumes however many chunks the producer has raced
    * ahead by and the per_batch dial is a label, not a control. The
    * same sync point is what makes the latency column honest: each
    * sample is the wall-clock from "events handed to the source" to
    * "sink commit observed" for exactly one perBatch-sized batch —
    * the event→sink latency a deployment trades against throughput.
    * (processAllAvailable polls on a ~10 ms tick, so samples carry
    * up to ~10 ms of quantization — noted, and far below any cell's
    * p50 at these batch sizes.) */
  private def measure(spark: SparkSession, total: Int, perBatch: Int,
      idPool: Long): (Double, Long, Array[Double]) = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val raw = input.toDF().selectExpr("cast(value as binary) as value")
    @volatile var rows = 0L
    val q = graft.streaming.Jobs.eventsToSink(raw,
      java.nio.file.Files.createTempDirectory("sb-cp").toString,
      (df, _) => rows += df.count()).start()
    val nBatches = total / perBatch
    val latMs = new Array[Double](nBatches)
    val t0 = System.nanoTime()
    var id = 0L
    for (b <- 0 until nBatches) {
      val tb = System.nanoTime()
      val msg = (0 until perBatch).map { i =>
        id += 1
        event(id % idPool, (b * 7 + i / 100) % 1200)
      }.mkString("[", ",", "]")
      input.addData(msg)
      q.processAllAvailable()
      latMs(b) = (System.nanoTime() - tb) / 1e6
    }
    val secs = (System.nanoTime() - t0) / 1e9
    q.stop()
    (secs, rows, latMs)
  }

  /** Nearest-rank percentile over a latency sample set. */
  private def pct(samples: Array[Double], p: Double): Double = {
    val s = samples.sorted
    s(math.min(s.length - 1, math.max(0, (p * s.length).toInt)))
  }

  private def event(id: Long, minute: Int): String =
    f"""{"date":"2023-02-06T${4 + minute / 60}%02d:${minute % 60}%02d:00","rms":"0.5","eventID":"$id","location":"X","latitude":"37.0","longitude":"36.0","depth":"7.0","type":"Ke","magnitude":"5.1","country":"T","province":"Hatay","district":"D","neighborhood":"N","isEventUpdate":"false","lastUpdateDate":""}"""

  def main(args: Array[String]): Unit = {
    val nBatches = args.headOption.filter(_ != "table")
      .map(_.toInt).getOrElse(50)
    val perBatch = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Deep composed plans + AQE stall the DRIVER without this: every
      // AQE stage completion posts a SQL-UI plan update whose string
      // the driver renders AND regex-redacts in full — measured at the
      // 64x octave: 30+ min at ~1 core in generateTreeString/redact
      // before the first row printed (same lesson on a 1000-executor
      // cluster: the driver, not the executors, was the bottleneck).
      // 32 KB keeps plan strings debuggable and bounds the per-update
      // rendering cost.
      .config("spark.sql.maxPlanStringLength", "32768")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // optional state-store provider override (set
    // SPARK_GRAFT_STATE_PROVIDER to the RocksDBStateStoreProvider
    // class name) so the ev/s row can be measured under the 100 TB
    // deployment's state backend, not just the on-heap default —
    // RocksDbStateStoreSpec gates correctness under the same dial
    sys.env.get("SPARK_GRAFT_STATE_PROVIDER").foreach(p =>
      spark.conf.set("spark.sql.streaming.stateStore.providerClass", p))
    import spark.implicits._

    if (args.headOption.contains("table")) {
      // dial sweep: fixed 80k events per cell. A warm-up cell runs
      // first (untimed) so the first measured cell isn't charged
      // codegen/JIT for the pipeline shape — the same discipline as
      // Bench's warm-up pass.
      val total = 80000
      measure(spark, total = 16000, perBatch = 2000, idPool = 1L << 60)
      val rocksdb = "org.apache.spark.sql.execution.streaming.state" +
        ".RocksDBStateStoreProvider"
      for (provider <- Seq("onheap", "rocksdb")) {
        if (provider == "rocksdb")
          spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass", rocksdb)
        else spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
        for (perB <- Seq(500, 2000, 8000);
             pool <- Seq(2000L, 200000L)) {
          val (secs, rows, lat) = measure(spark, total, perB, pool)
          println(f"""{"metric":"stream_dial","provider":"$provider","per_batch":$perB,"state_keys":$pool,"events":$total,"events_per_sec":${total / secs}%.0f,"sec":$secs%.2f,"lat_p50_ms":${pct(lat, 0.50)}%.0f,"lat_p95_ms":${pct(lat, 0.95)}%.0f,"sunk_rows":$rows}""")
        }
      }
      spark.stop()
      return
    }

    val (secs, rows, lat) =
      measure(spark, nBatches * perBatch, perBatch, 1L << 60)
    val total = nBatches.toLong * perBatch
    println(f"""{"metric":"stream_events_per_sec","value":${total / secs}%.0f,"events":$total,"sec":$secs%.2f,"lat_p50_ms":${pct(lat, 0.50)}%.0f,"lat_p95_ms":${pct(lat, 0.95)}%.0f,"sunk_rows":$rows}""")
    spark.stop()
  }
}
