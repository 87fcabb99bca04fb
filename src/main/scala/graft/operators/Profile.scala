package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass data profiling (the deequ/dbt-test class of checks): per
  * column — row count, null count, exact distinct count, and
  * type-aware extremes. The entry gate of every ingestion pipeline:
  * schema drift, null floods, and key-cardinality collapse all
  * surface here before they poison downstream joins and dedup.
  *
  * Output is LONG-FORM (one row per profiled column) so the profile
  * of a 400-column table is still a 400-row frame a dashboard or
  * assertion harness consumes directly.
  *
  * Scale shape: ONE aggregation job. The exact multi-column
  * COUNT(DISTINCT) plans through Spark's Expand (input rows ×
  * profiled columns through the shuffle, each slice a skinny
  * (column, value) pair) — exact and partition-safe, the honest cost
  * of exact cardinality. For 100 TB interactive profiling swap the
  * distinct counts to the bounded KMV sketch
  * ([[graft.functions.KmvMinHashes]], q85/q89's kernel) and keep this
  * exact form for the oracle-gated audits.
  *
  * Extremes are type-aware so every output is cross-engine
  * deterministic: numeric columns report min/max AS DOUBLE (exact
  * IEEE widenings, no formatting); string columns report min/max
  * LENGTH (lexicographic min/max of the values themselves would be
  * collation-dependent across engines); everything else reports
  * nulls.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`. */
  def profile(df: DataFrame, cols: Seq[String] = Nil): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    require(names.nonEmpty, "profile: no columns")
    require(names.distinct.size == names.size,
      s"profile: duplicate columns in $names — each column is one " +
        "output row; dedup the request")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    names.foreach(n => require(types.contains(n),
      s"profile: no such column $n (have ${df.columns.mkString(", ")})"))

    def isNum(t: DataType): Boolean = t.isInstanceOf[NumericType]
    def isStr(t: DataType): Boolean = t == StringType

    val aggs: Seq[Column] = Seq(count(lit(1)).as("__n")) ++
      names.flatMap { c =>
        val t = types(c)
        Seq(
          count(col(c)).as(s"__nn_$c"),
          count_distinct(col(c)).as(s"__nd_$c"),
          (if (isNum(t)) min(col(c)).cast(DoubleType)
           else lit(null).cast(DoubleType)).as(s"__min_$c"),
          (if (isNum(t)) max(col(c)).cast(DoubleType)
           else lit(null).cast(DoubleType)).as(s"__max_$c"),
          (if (isStr(t)) min(length(col(c))).cast(LongType)
           else lit(null).cast(LongType)).as(s"__minl_$c"),
          (if (isStr(t)) max(length(col(c))).cast(LongType)
           else lit(null).cast(LongType)).as(s"__maxl_$c"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.map { c =>
      struct(lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_num"),
        col(s"__max_$c").as("max_num"),
        col(s"__minl_$c").as("min_len"),
        col(s"__maxl_$c").as("max_len"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select(col("p.*"))
  }
}
