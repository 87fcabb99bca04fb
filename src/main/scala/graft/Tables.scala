package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Table loaders for the driver's deterministic parquet tables
  * (TESTDATA.md): `region nation customer supplier part orders lineitem
  * events documents embeddings`, one parquet file per table under a
  * scale-factor directory.
  *
  * At cluster scale the same loaders work against a partitioned lake
  * (directory of files); nothing here assumes a single file.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table's raw `ts` has shipped in two encodings across
    * testdata generations: TIMESTAMP(NANOS) (int64 ns — Spark 4 reads
    * it only via nanosAsLong) and a plain µs parquet timestamp (which
    * Spark surfaces as TIMESTAMP_NTZ under default NTZ inference).
    * Normalize EITHER to the same two columns every consumer uses:
    *  - `ts_ns`: exact int64 nanoseconds — use for ordering/arithmetic
    *    (bit-exact vs DuckDB's epoch_ns / epoch_us semantics);
    *  - `ts`: µs TimestampType — use for date/window functions.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(table(s, d, "events"))
  }

  /** Schema-adaptive `ts` normalization, shared with the streaming
    * events reader: a LongType `ts` is legacy exact nanoseconds; a
    * (possibly NTZ) timestamp `ts` is µs since epoch with `ts_ns`
    * derived ×1000 — exact ONLY while |µs| ≤ Long.Max/1000 (year
    * ~2262), a bound the legacy NANOS encoding enforced structurally
    * but a µs timestamp can exceed (it represents out to year
    * ~294247). Out-of-range rows FAIL the job rather than silently
    * wrapping negative — a wrapped ts_ns would misorder every as-of
    * join, sessionization, and watermark downstream. The
    * NTZ→timestamp cast is instant-preserving under the UTC session
    * timezone every entry point pins. */
  private[graft] def normalizeEventTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn("ts", expr("timestamp_micros(ts_ns div 1000)"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
          .withColumn("ts_ns", expr(
            """CASE WHEN abs(unix_micros(ts)) <= 9223372036854775
              |  THEN unix_micros(ts) * 1000
              |  ELSE raise_error(concat('events.ts ', cast(ts as string),
              |    ' overflows int64 nanoseconds (post-2262) — ts_ns cannot',
              |    ' represent it; filter or re-encode the feed'))
              |END""".stripMargin))
    }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}

/** Shared helpers for oracle-stable arithmetic.
  *
  * The driver hash-compares our parquet output against DuckDB running
  * the `oracleSql` on the same tables. Floating-point aggregation order
  * differs between engines, so raw `sum(double)` is not hash-stable.
  * Strategy: cast inputs to exact decimals, aggregate exactly, cast the
  * exact result back to double (a deterministic IEEE value), and do any
  * residual arithmetic (avg, variance) as an identical explicit tree of
  * IEEE double ops on both sides.
  */
object OracleMath {
  import org.apache.spark.sql.Column

  val Dec: DecimalType = DecimalType(18, 4)

  /** Exact decimal sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Exact decimal sum of a per-row product, returned as double. */
  def dsumProd(a: Column, b: Column): Column =
    sum(a.cast(Dec) * b.cast(Dec)).cast(DoubleType)
}
