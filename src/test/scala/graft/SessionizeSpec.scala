package graft

import graft.streaming.Sessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val M = 60L * 1000000L // one minute in µs
  private val B = 1000000L * M   // base offset: epoch-0 events are "late" vs the initial watermark

  test("streaming sessions close on gap and on watermark timeout") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Double)]
    val events = input.toDF().toDF("user_id", "ts_us", "value")
    val q = Sessionize.sessions(events, gapUs = 30 * M, watermark = "10 minutes")
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      // user 1: two events 5 min apart (one session), then 60 min later
      // another event → first session closes on the gap
      input.addData((1L, B, 1.0), (1L, B + 5 * M, 2.0))
      q.processAllAvailable()
      input.addData((1L, B + 65 * M, 3.0))
      q.processAllAvailable()
      val afterGap = spark.table("sessions_out").as[Sessionize.Session].collect()
      assert(afterGap.length === 1)
      assert(afterGap(0) === Sessionize.Session(1L, B, B + 5 * M, 2L, 3.0))
      // advance the watermark far past the open session → timeout flush
      input.addData((99L, B + 500 * M, 0.0))
      q.processAllAvailable()
      input.addData((98L, B + 900 * M, 0.0))
      q.processAllAvailable()
      val flushed = spark.table("sessions_out").as[Sessionize.Session].collect()
      assert(flushed.exists(s => s.user_id == 1L && s.start_us == B + 65 * M
        && s.n_events == 1L))
    } finally q.stop()
  }

  test("streaming sessionization agrees with the batch query shape") {
    // batch reference on a small deterministic set
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      (1L, B, 1.0), (1L, B + 10 * M, 1.0), (1L, B + 100 * M, 1.0),
      (2L, B, 5.0))
    val input = MemoryStream[(Long, Long, Double)]
    val q = Sessionize.sessions(input.toDF().toDF("user_id", "ts_us", "value"),
        gapUs = 30 * M, watermark = "0 seconds")
      .writeStream.format("memory").queryName("sessions_batch_cmp")
      .outputMode("append").start()
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((50L, B + 100000 * M, 0.0)) // watermark push
      q.processAllAvailable()
      val got = spark.table("sessions_batch_cmp").as[Sessionize.Session]
        .collect().filter(_.user_id < 50).sortBy(s => (s.user_id, s.start_us))
      assert(got.toSeq === Seq(
        Sessionize.Session(1L, B, B + 10 * M, 2L, 2.0),
        Sessionize.Session(1L, B + 100 * M, B + 100 * M, 1L, 1.0),
        Sessionize.Session(2L, B, B, 1L, 5.0)))
    } finally q.stop()
  }

  test("checkpoint recovery: restarted query resumes without reprocessing") {
    implicit val sqlCtx = spark.sqlContext
    val cp = java.nio.file.Files.createTempDirectory("sess-cp").toString
    val outDir = java.nio.file.Files.createTempDirectory("sess-out").toString
    val input = MemoryStream[(Long, Long, Double)]
    def start() = Sessionize.sessions(
        input.toDF().toDF("user_id", "ts_us", "value"),
        gapUs = 30 * M, watermark = "0 seconds")
      .writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cp)
      .outputMode("append").start()
    val q1 = start()
    input.addData((7L, B, 1.0), (7L, B + 5 * M, 1.0))
    input.addData((60L, B + 1000 * M, 0.0)) // push watermark → close session
    q1.processAllAvailable()
    q1.stop()
    val firstCount = spark.read.parquet(outDir).count()
    assert(firstCount >= 1)
    // restart from the same checkpoint; add one more closed session
    val q2 = start()
    input.addData((8L, B + 2000 * M, 2.0))
    input.addData((61L, B + 9000 * M, 0.0))
    q2.processAllAvailable()
    q2.stop()
    val all = spark.read.parquet(outDir)
    // no duplicates of the first session after restart
    assert(all.filter($"user_id" === 7L).count() === 1)
    assert(all.filter($"user_id" === 8L).count() === 1)
  }
}
