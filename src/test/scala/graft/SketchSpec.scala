package graft

import org.apache.spark.sql.functions._

/** q34 is approximate by design (rows-only at the driver); here we
  * bound its error against exact computation. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL and approx_count_distinct within 5% of exact; percentiles sane") {
    val sf = "/root/testdata/sf0.01"
    val approx = queries.Advanced.q34Sketches(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("d_orders"),
        countDistinct($"l_partkey").as("d_parts"),
        min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"))
      .collect().map(r => r.getString(0) -> r).toMap
    for ((flag, e) <- exact) {
      val a = approx(flag)
      val hll = a.getAs[Long]("hll_orders")
      val acd = a.getAs[Long]("approx_parts")
      assert(math.abs(hll - e.getAs[Long]("d_orders")).toDouble /
        e.getAs[Long]("d_orders") < 0.05, s"$flag hll=$hll")
      assert(math.abs(acd - e.getAs[Long]("d_parts")).toDouble /
        e.getAs[Long]("d_parts") < 0.05, s"$flag acd=$acd")
      val p50 = a.getAs[Double]("p50")
      val p95 = a.getAs[Double]("p95")
      assert(p50 >= e.getAs[Double]("lo") && p95 <= e.getAs[Double]("hi"))
      assert(p50 <= p95)
    }
  }

  test("HLL sketches merge across shards (partial → union ≈ global)") {
    // the 100 TB pattern: each partition/day/shard keeps a tiny binary
    // sketch; the global distinct count is a union of sketches, never a
    // re-scan. DataSketches unions promote to the HLL_8 target type, so
    // the estimate can drift a fraction of a percent from the
    // single-pass sketch — bound it tightly rather than bit-compare.
    val sf = "/root/testdata/sf0.01"
    val li = Tables.lineitem(spark, sf)
      .withColumn("shard", pmod($"l_orderkey", lit(7)))
    val merged = li.groupBy($"shard")
      .agg(expr("hll_sketch_agg(l_orderkey)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .head().getLong(0)
    val global = li
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))"))
      .head().getLong(0)
    assert(math.abs(merged - global).toDouble / global < 0.005,
      s"merged=$merged global=$global")
  }
}
