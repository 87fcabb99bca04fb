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

  /** q62: streaming watermarked keyed dedup → tumbling 1-hour windowed
    * counts per event type, complete output mode. The dedup is a
    * real stateful `dropDuplicates` over the stream (event_id is the
    * reference's update-collapse key); the oracle is the equivalent
    * batch aggregation. */
  def q62StreamWindowCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // events.parquet carries TIMESTAMP(NANOS): same nanosAsLong +
    // µs-derive dance as Tables.events, but through readStream.
    // Session hygiene: the flag is restored to its prior state once the
    // stream has drained — a later query in the same session must see
    // the conf it would have seen had q62 never run.
    val nanosKey = "spark.sql.legacy.parquet.nanosAsLong"
    val nanosPrev = s.conf.getOption(nanosKey)
    s.conf.set(nanosKey, "true")
    try {
      val schema = s.read.parquet(s"$dir/events.parquet").schema
      // the file stream source wants a DIRECTORY; select just the events
      // table out of the scale-factor dir with a glob filter
      val stream = s.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(dir)
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      val agg = stream
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy(window($"ts", "1 hour"), $"event_type")
        .agg(count(lit(1)).as("n"))
        .select(
          date_format($"window.start", "yyyy-MM-dd HH:mm:ss").as("window_start"),
          $"event_type", $"n")
      val name = s"q62_stream_out_${runSeq.incrementAndGet()}"
      val q = agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      val prev = lastSink.getAndSet(name)
      if (prev != null) s.catalog.dropTempView(prev)
      s.table(name).orderBy($"window_start", $"event_type")
    } finally {
      nanosPrev match {
        case Some(v) => s.conf.set(nanosKey, v)
        case None    => s.conf.unset(nanosKey)
      }
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
}
