package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** HOT-BUCKET GUARD for every band/bucket candidate join.
  *
  * A bucket with B members yields B² candidate pairs in ONE task — a
  * single degenerate bucket (an empty-string block, a stopword-only
  * shingle set, a zero vector) turns the bucket equi-join the dedup
  * family is built on back into the O(n²) blowup it exists to avoid.
  * The guard drops all rows of any bucket larger than `cap`: members
  * of such a bucket are near-certainly degenerate-feature collisions,
  * and an all-pairs pass over them is exactly the straggler that kills
  * a 100 TB run (standard LSH practice: skip oversized buckets, tune
  * `cap` to the per-task pair budget — cap² pairs per bucket).
  *
  * Cost shape: the size count is a window over the SAME key
  * partitioning the candidate join shuffles on, so the guard adds no
  * extra shuffle and no extra job. The dropped mass is observed
  * LAZILY (`Dataset.observe`) and warn-logged when the query finishes
  * — a cap that fires is a data-quality signal the operator must not
  * swallow silently.
  */
object HotBuckets {

  /** Default cap: never reached by a sane corpus at test SF (buckets
    * there hold near-duplicates only), low enough that a degenerate
    * bucket is bounded at ~10⁸ candidate pairs instead of n². The
    * production dial on every operator that takes `maxBucket`. */
  val DefaultCap = 10000

  private val seq = new java.util.concurrent.atomic.AtomicLong()
  // weak keys: the registry must not pin a stopped session (a strong
  // static set would leak every session a long-lived JVM ever opened)
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))
  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Filter `df` down to rows whose (`keys`) bucket has ≤ `cap`
    * members; oversized-bucket mass is observed and logged on query
    * completion. `what` names the call site in the log line. */
  def guard(df: DataFrame, keys: Seq[String], cap: Int,
      what: String): DataFrame = {
    require(cap > 0, s"hot-bucket cap must be positive, got $cap")
    ensureListener(df.sparkSession)
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__bsz", count(lit(1)).over(w))
      .observe(s"graft_hot_buckets/$what/${seq.incrementAndGet()}",
        sum(when(col("__bsz") > cap, lit(1L)).otherwise(lit(0L)))
          .as("dropped_rows"),
        max(col("__bsz")).as("max_bucket"))
      .filter(col("__bsz") <= cap)
      .drop("__bsz")
  }

  private def ensureListener(spark: SparkSession): Unit =
    if (registered.add(spark)) {
      spark.listenerManager.register(new QueryExecutionListener {
        override def onSuccess(funcName: String, qe: QueryExecution,
            durationNs: Long): Unit =
          qe.observedMetrics.foreach { case (name, row) =>
            if (name.startsWith("graft_hot_buckets")) {
              val dropped = row.getAs[Long]("dropped_rows")
              if (dropped > 0) log.warn(
                s"$name: dropped $dropped rows in oversized buckets " +
                  s"(largest bucket: ${row.getAs[Long]("max_bucket")} rows); " +
                  "raise maxBucket or inspect the corpus for degenerate keys")
            }
          }
        override def onFailure(funcName: String, qe: QueryExecution,
            exception: Exception): Unit = ()
      })
    }
}
