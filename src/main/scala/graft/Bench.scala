package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line for the driver
  * (BENCH_r{N}.json). A warm-up pass (table counts + one tiny query)
  * runs first so per-query numbers measure steady-state execution,
  * not JVM/codegen/file-index warm-up — whichever query ran first was
  * otherwise charged ~4 s of session startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up: file indexes + codegen/JIT paths (events needs its
    // dedicated loader — raw read trips on the NANOS timestamp)
    try {
      Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "documents", "embeddings")
        .foreach(t => Tables.table(spark, sfDir, t).count())
      Tables.events(spark, sfDir).count()
      SparkEntry.queries.get("q01_pricing_summary")
        .foreach(fn => fn(spark, "/root/testdata/sf0.001").count())
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // untimed: drop caches a query built (e.g. the shingle projection)
      // so accumulated storage pressure can't skew later measurements
      spark.catalog.clearCache()
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
