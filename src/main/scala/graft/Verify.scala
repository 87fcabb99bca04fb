package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter: comma-separated name substrings; unset
    // (the driver's case) runs everything
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(name.contains)) }
    // per-query record for verify_summary.json: ok / rows / seconds /
    // error — the machine-readable side of the dump, so a round whose
    // driver-side oracle compare dies (r16: CORRECTNESS_r16.json came
    // back `{}` with nothing attributing the outage) still leaves an
    // at-a-glance record of what the ENGINE actually produced
    val summary =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    selected.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        val rows = spark.read.parquet(s"$outDir/$name").count()
        val sec = (System.nanoTime() - t0) / 1e9
        summary += name ->
          f"""{"ok":true,"rows":$rows,"sec":$sec%.2f}"""
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        val sec = (System.nanoTime() - t0) / 1e9
        val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
          .take(300)
        summary += name ->
          f"""{"ok":false,"sec":$sec%.2f,"err":${jsonStr(msg)}}"""
      }
      // release caches a query built (shingle/sparse-vector/corpus
      // projections) so they don't pin executor storage across the
      // remaining queries — same discipline as Bench
      spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${jsonStr(k)}: ${jsonStr(v)}" }
      .mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // the summary: one object keyed by query name, plus totals — a
    // consumer (the driver, the judge, the next round's builder) reads
    // failed_count > 0 or a missing name without parsing stderr
    val okCount = summary.count(_._2.contains("\"ok\":true"))
    val sumJson =
      s"""{"queries_run":${summary.size},"ok_count":$okCount,""" +
        s""""failed_count":${summary.size - okCount},"queries":""" +
        summary.map { case (k, v) => s"${jsonStr(k)}:$v" }
          .mkString("{", ",", "}") + "}"
    Files.writeString(Paths.get(s"$outDir/verify_summary.json"), sumJson)
    println(s"[verify] ${summary.size} queries, $okCount ok, " +
      s"${summary.size - okCount} failed — summary at " +
      s"$outDir/verify_summary.json")
    spark.stop()
  }

  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def jsonStr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
