package graft

import graft.ops.DescriptiveStats
import org.scalatest.prop.TableDrivenPropertyChecks

class DescriptiveStatsSpec extends SparkSpec {
  import spark.implicits._

  test("known vector: matches closed-form sample stats (mllib parity, ref :194-239)") {
    val df = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0).toDF("x")
    val r = DescriptiveStats.compute(df, Seq("x")).head()
    assert(r.getAs[Long]("n") === 8L)
    assert(math.abs(r.getAs[Double]("mean") - 5.0) < 1e-12)
    // sample variance of this classic vector: 32/7
    assert(math.abs(r.getAs[Double]("variance") - 32.0 / 7.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("stddev") - math.sqrt(32.0 / 7.0)) < 1e-12)
    assert(r.getAs[Double]("min") === 2.0)
    assert(r.getAs[Double]("max") === 9.0)
    assert(r.getAs[Double]("sum") === 40.0)
  }

  test("multi-column single pass matches Spark builtins on real data") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val ours = DescriptiveStats.compute(li, cols).collect()
      .map(r => r.getAs[String]("feature") -> r).toMap
    import org.apache.spark.sql.functions._
    for (c <- cols) {
      val exp = li.agg(
        count(col(c)), avg(col(c)), var_samp(col(c)), min(col(c)),
        max(col(c)), sum(col(c))).head()
      val got = ours(c)
      assert(got.getAs[Long]("n") === exp.getLong(0))
      assert(math.abs(got.getAs[Double]("mean") - exp.getDouble(1)) < 1e-9)
      assert(math.abs(got.getAs[Double]("variance") - exp.getDouble(2))
        < 1e-6 * math.max(1.0, exp.getDouble(2)))
      assert(got.getAs[Double]("min") === exp.getDouble(3))
      assert(got.getAs[Double]("max") === exp.getDouble(4))
      assert(math.abs(got.getAs[Double]("sum") - exp.getDouble(5))
        < 1e-6 * math.abs(exp.getDouble(5)))
    }
  }

  test("nulls are skipped per column, not per row") {
    val df = Seq((Some(1.0), None: Option[Double]), (Some(3.0), Some(10.0)))
      .toDF("a", "b")
    val r = DescriptiveStats.compute(df, Seq("a", "b")).collect()
      .map(x => x.getAs[String]("feature") -> x).toMap
    assert(r("a").getAs[Long]("n") === 2L)
    assert(r("b").getAs[Long]("n") === 1L)
    assert(r("b").getAs[Double]("mean") === 10.0)
  }
}
