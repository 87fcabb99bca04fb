package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan (and optionally run)
  * selected queries. Usage:
  *   runMain graft.Explain <sfDir> <queryName> [<queryName> ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = SparkSession.builder()
      .appName("graft-explain")
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (name <- args.tail) {
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"===== $name =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"rows=$n time=${(System.nanoTime() - t0) / 1e9}%.2fs")
      // the finalized adaptive plan shows which duplicate subtrees AQE
      // actually collapsed (ReusedExchange / ReusedQueryStage);
      // foreach(noop) finalizes the identical plan without pulling the
      // result onto the driver
      df.foreach(_ => ())
      val fin = df.queryExecution.executedPlan.toString
      val reused = fin.linesIterator.count(l =>
        l.contains("ReusedQueryStage") || l.contains("ReusedExchange"))
      println(s"reused_stages=$reused")
    }
    spark.stop()
  }
}
