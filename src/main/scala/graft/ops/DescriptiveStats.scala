package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** One-pass multi-column descriptive statistics (SURVEY §2.3 A1).
  *
  * The reference computes this with `pyspark.mllib.stat.Statistics
  * .colStats` (sparktoELKstream.py:194-239): count, sum, mean,
  * *sample* variance, stddev=√var, min, max per numeric column —
  * then runs 4 more full passes for region counts. Here: a single
  * `Aggregator` pass using Welford/Chan parallel merge, so a 100 TB
  * scan computes every column's stats in one tree-aggregated job with
  * map-side partial aggregation and O(columns) state.
  */
object DescriptiveStats {

  final case class ColState(
      var n: Long = 0L,
      var mean: Double = 0.0,
      var m2: Double = 0.0,
      var sum: Double = 0.0,
      var min: Double = Double.PositiveInfinity,
      var max: Double = Double.NegativeInfinity) {

    def add(x: Double): Unit = {
      n += 1
      val d = x - mean
      mean += d / n
      m2 += d * (x - mean)
      sum += x
      if (x < min) min = x
      if (x > max) max = x
    }

    /** Chan et al. parallel variance merge — associative, so partial
      * (map-side) aggregation is safe. */
    def merge(o: ColState): ColState = {
      if (o.n == 0) return this
      if (n == 0) return o
      val nn = n + o.n
      val d = o.mean - mean
      val merged = ColState(
        nn,
        mean + d * o.n / nn,
        m2 + o.m2 + d * d * n.toDouble * o.n.toDouble / nn,
        sum + o.sum,
        math.min(min, o.min),
        math.max(max, o.max))
      merged
    }
  }

  final case class ColStats(
      feature: String, n: Long, mean: Double, variance: Double,
      stddev: Double, min: Double, max: Double, sum: Double)

  /** Aggregates an array-of-doubles row (one slot per column; null →
    * NaN, skipped per-column like mllib's numNonzeros discipline). */
  final class MultiColAgg(names: Seq[String])
      extends Aggregator[Seq[Double], Array[ColState], Seq[ColStats]] {

    override def zero: Array[ColState] = Array.fill(names.size)(ColState())

    override def reduce(b: Array[ColState], row: Seq[Double]): Array[ColState] = {
      var i = 0
      while (i < names.size) {
        val x = row(i)
        if (!x.isNaN) b(i).add(x)
        i += 1
      }
      b
    }

    override def merge(a: Array[ColState], b: Array[ColState]): Array[ColState] =
      a.zip(b).map { case (x, y) => x.merge(y) }

    override def finish(b: Array[ColState]): Seq[ColStats] =
      names.zip(b).map { case (name, s) =>
        val variance = if (s.n > 1) s.m2 / (s.n - 1) else Double.NaN
        ColStats(name, s.n, if (s.n > 0) s.mean else Double.NaN, variance,
          math.sqrt(variance),
          if (s.n > 0) s.min else Double.NaN,
          if (s.n > 0) s.max else Double.NaN, s.sum)
      }

    override def bufferEncoder: Encoder[Array[ColState]] =
      Encoders.kryo[Array[ColState]]
    override def outputEncoder: Encoder[Seq[ColStats]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[ColStats]]()
  }

  /** One row per input column: feature, n, mean, variance (sample),
    * stddev, min, max, sum. */
  def compute(df: DataFrame, cols: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val vecs = df.select(array(cols.map(c =>
      coalesce(col(c).cast(DoubleType), lit(Double.NaN))): _*).as("v"))
      .as[Seq[Double]]
    val agg = new MultiColAgg(cols)
    vecs.select(agg.toColumn) // typed select — the only API that takes a TypedColumn
      .toDF("stats")
      .select(explode(col("stats")).as("s"))
      .select(col("s.*"))
  }
}
