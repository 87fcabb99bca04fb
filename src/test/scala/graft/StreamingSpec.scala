package graft

import graft.streaming.Jobs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming tests per SURVEY §5 item 5: MemoryStream → pipeline →
  * memory sink; duplicate-window ingest must converge. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvent(id: Long, minute: Int, mag: Double, lastUpdate: String = ""): String =
    f"""{"date":"2023-02-06T04:$minute%02d:00","rms":"0.5","eventID":"$id","location":"X","latitude":"37.0","longitude":"36.0","depth":"7.0","type":"Ke","magnitude":"$mag","country":"T","province":"Hatay","district":"D","neighborhood":"N","isEventUpdate":"false","lastUpdateDate":"$lastUpdate"}"""

  test("events pipeline end-to-end over MemoryStream with keyed dedup") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val raw = input.toDF().selectExpr("cast(value as binary) as value")
    val out = Jobs.dedupStream(Jobs.eventsPipeline(raw))
    val query = out.writeStream
      .format("memory").queryName("stream_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: two events, one duplicated (overlapping poll windows)
      input.addData(s"[${mkEvent(1, 10, 5.0)},${mkEvent(2, 11, 3.0)}]")
      input.addData(s"[${mkEvent(1, 10, 5.0)}]") // exact re-poll duplicate
      query.processAllAvailable()
      val rows = spark.table("stream_out")
      assert(rows.count() === 2) // dup dropped by keyed dedup
      assert(rows.filter($"fault_line" === "Doğu Anadolu").count() === 2)
      // batch 2: an update to event 1 (new lastUpdateDate) must survive
      input.addData(s"[${mkEvent(1, 10, 5.1, "2023-02-06T06:00:00")}]")
      query.processAllAvailable()
      assert(spark.table("stream_out").count() === 3)
    } finally query.stop()
  }

  test("windowed region counts aggregate on the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val raw = input.toDF().selectExpr("cast(value as binary) as value")
    val out = Jobs.regionWindowCounts(Jobs.eventsPipeline(raw), "1 hour")
    val query = out.writeStream
      .format("memory").queryName("window_out")
      .outputMode("append")
      .start()
    try {
      input.addData(s"[${mkEvent(10, 1, 4.2)},${mkEvent(11, 2, 6.0)},${mkEvent(12, 3, 2.0)}]")
      query.processAllAvailable()
      // append mode emits only closed windows; push the watermark past the hour
      input.addData(s"""[{"date":"2023-02-20T00:00:00","rms":"0","eventID":"99","location":"X","latitude":"1","longitude":"1","depth":"1","type":"Ke","magnitude":"1.0","country":"T","province":"Hatay","district":"D","neighborhood":"N","isEventUpdate":"false","lastUpdateDate":""}]""")
      query.processAllAvailable()
      val rows = spark.table("window_out").filter($"fault_line" === "Doğu Anadolu")
      assert(rows.count() === 1)
      val r = rows.select($"n", $"max_magnitude").head()
      assert(r.getLong(0) === 3L)
      assert(r.getDouble(1) === 6.0)
    } finally query.stop()
  }

  test("raw archiver passthrough preserves the Kafka source schema") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Array[Byte], Array[Byte], String, Int, Long, java.sql.Timestamp, Int)]
    val raw = input.toDF().toDF("key", "value", "topic", "partition", "offset", "timestamp", "timestampType")
    val dir = java.nio.file.Files.createTempDirectory("lake").toString
    val cp = java.nio.file.Files.createTempDirectory("cp").toString
    val q = Jobs.rawToParquet(raw, dir, cp).start()
    try {
      input.addData((Array[Byte](1), "payload".getBytes, "earthquakeRaw", 0, 0L,
        java.sql.Timestamp.valueOf("2023-02-06 04:17:00"), 0))
      q.processAllAvailable()
      val lake = spark.read.parquet(dir)
      assert(lake.count() === 1)
      assert(lake.columns.contains("ingest_date")) // date-partitioned lake
      assert(new String(lake.select("value").head().getAs[Array[Byte]](0)) === "payload")
    } finally q.stop()
  }
}
