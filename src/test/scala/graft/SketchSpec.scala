package graft

import org.apache.spark.sql.functions._

/** q34 emits within-bound booleans the oracle pins TRUE; here we
  * assert them directly plus the exact counts against an independent
  * computation. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("HLL and approx_count_distinct within 5% of exact; percentiles sane") {
    val sf = "/root/testdata/sf0.01"
    val approx = queries.Advanced.q34Sketches(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy($"l_returnflag")
      .agg(countDistinct($"l_orderkey").as("d_orders"),
        countDistinct($"l_partkey").as("d_parts"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(approx.keySet == exact.keySet)
    for ((flag, e) <- exact) {
      val a = approx(flag)
      assert(a.getAs[Long]("exact_orders") == e.getAs[Long]("d_orders"))
      assert(a.getAs[Long]("exact_parts") == e.getAs[Long]("d_parts"))
      for (gate <- Seq("hll_ok", "approx_parts_ok", "p50_ok", "p95_ok"))
        assert(a.getAs[Boolean](gate), s"$flag $gate")
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
