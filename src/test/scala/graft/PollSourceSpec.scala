package graft

import java.time.Instant
import graft.sources.PollFetchers
import graft.streaming.Jobs
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class PollSourceSpec extends SparkSpec {
  import spark.implicits._

  test("DSv2 poll source: windows advance with the clock, payload parses downstream") {
    @volatile var now = Instant.parse("2023-02-06T10:00:00Z")
    PollFetchers.clock = () => now
    val windows = new java.util.concurrent.ConcurrentLinkedQueue[(Instant, Instant)]()
    PollFetchers.register("test-afad", (a, b) => {
      windows.add((a, b))
      s"""[{"date":"2023-02-06T09:59:00","rms":"0.5","eventID":"1","location":"X","latitude":"37.0","longitude":"36.0","depth":"7.0","type":"Ke","magnitude":"5.0","country":"T","province":"Hatay","district":"D","neighborhood":"N","isEventUpdate":"false","lastUpdateDate":""}]"""
    })
    try {
      val raw = spark.readStream.format("graft-poll")
        .option("fetcher", "test-afad")
        .option("lookbackSec", "1200")
        .load()
      val out = Jobs.eventsPipeline(raw)
      val q = out.writeStream.format("memory").queryName("poll_out")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
      val rows = spark.table("poll_out")
      assert(rows.count() === 1)
      assert(rows.select($"fault_line").as[String].head() === "Doğu Anadolu")
      // first window = [now - lookback, now]
      val w = windows.peek()
      assert(w._1 === Instant.parse("2023-02-06T09:40:00Z"))
      assert(w._2 === Instant.parse("2023-02-06T10:00:00Z"))
    } finally {
      PollFetchers.clock = () => Instant.now()
    }
  }

  test("poll source resumes from checkpoint offsets (no window re-fetch)") {
    @volatile var now = Instant.parse("2023-03-01T00:00:00Z")
    PollFetchers.clock = () => now
    val fetched = new java.util.concurrent.ConcurrentLinkedQueue[(Instant, Instant)]()
    PollFetchers.register("test-resume", (a, b) => { fetched.add((a, b)); "[]" })
    val cp = java.nio.file.Files.createTempDirectory("poll-cp").toString
    def run(): Unit = {
      val raw = spark.readStream.format("graft-poll")
        .option("fetcher", "test-resume").option("lookbackSec", "600").load()
      val q = raw.writeStream.format("noop")
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(60000)
    }
    try {
      run()
      val firstEnd = fetched.peek()._2
      assert(firstEnd === now)
      now = now.plusSeconds(300)
      run()
      val ws = fetched.toArray.map(_.asInstanceOf[(Instant, Instant)])
      assert(ws.length === 2)
      // second run starts exactly where the first ended — no overlap,
      // no gap (vs the reference's deliberate re-poll duplicates)
      assert(ws(1)._1 === ws(0)._2)
      assert(ws(1)._2 === now)
    } finally {
      PollFetchers.clock = () => Instant.now()
    }
  }
}
