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

  // ---- KMV (q85) ----

  test("KMV buffer keeps exactly the k smallest DISTINCT hashes, any partitioning") {
    import graft.functions.KmvMinHashes.kmvMinHashes
    val k = 16
    // duplicates + a value landing in every partition: the sketch must
    // dedup and be invariant under repartitioning (merge path)
    val vals = (0L until 500L).map(i => (i * 7919L) % 1000L) ++ Seq.fill(50)(3L)
    val expected = vals.distinct.sorted.take(k)
    for (parts <- Seq(1, 4)) {
      val got = vals.toDF("h").repartition(parts)
        .agg(kmvMinHashes($"h", k).as("sk"))
        .head().getSeq[Long](0)
      assert(got == expected, s"parts=$parts")
    }
  }

  test("KMV sketch below k is exhaustive and estimates exactly") {
    val df = (0L until 40L).map(i => ("s", i * 1000L)).toDF("slice", "h")
    val sk = operators.Sketches.kmvSketch(df, "slice", $"h", k = 256)
    val est = sk.select(operators.Sketches.kmvEstimate("sketch", 256))
      .head().getLong(0)
    assert(est == 40L)
  }

  test("KMV estimator within 4σ on 50k distinct hashes; null hashes ignored") {
    // uniform 48-bit domain via the portable hash of the id itself;
    // k=256 → stderr ≈ 1/√254 ≈ 6.3%, 4σ ≈ 25%
    val n = 50000L
    val df = spark.range(n).toDF("id")
      .select(lit("s").as("slice"),
        when($"id" % 97 === 0, lit(null).cast("long"))
          .otherwise(operators.Sampling.portableHash48($"id".cast("string")))
          .as("h"))
    val sk = operators.Sketches.kmvSketch(df, "slice", $"h", k = 256)
    val est = sk.select(operators.Sketches.kmvEstimate("sketch", 256))
      .head().getLong(0)
    val exact = n - (n / 97 + 1) // ids ≡ 0 (mod 97) were nulled
    assert(math.abs(est - exact).toDouble / exact < 0.25,
      s"est=$est exact=$exact")
  }

  test("KMV overlap matrix: known-overlap slices estimate Jaccard within 4σ") {
    // A = [0, 30k), B = [15k, 45k): |A∩B| = 15k, |A∪B| = 45k, J = 1/3.
    // Jaccard stderr at k=256 ≈ √(J(1−J)/k) ≈ 0.029 → 4σ ≈ 0.12
    val a = spark.range(0, 30000).select(lit("a").as("slice"), $"id")
    val b = spark.range(15000, 45000).select(lit("b").as("slice"), $"id")
    val df = a.unionByName(b)
      .select($"slice",
        operators.Sampling.portableHash48($"id".cast("string")).as("h"))
    val row = operators.Sketches.kmvOverlapMatrix(df, "slice", $"h", k = 256)
      .head()
    assert(row.getAs[String]("slice_a") == "a")
    val j = row.getAs[Double]("jaccard_est")
    assert(math.abs(j - 1.0 / 3.0) < 0.12, s"jaccard_est=$j")
    val u = row.getAs[Long]("union_est")
    assert(math.abs(u - 45000L).toDouble / 45000.0 < 0.25, s"union_est=$u")
    // exhaustive regime: tiny slices → exact Jaccard, k_eff = |A∪B|
    val small = spark.range(0, 30).select(lit("a").as("slice"), $"id")
      .unionByName(spark.range(15, 45).select(lit("b").as("slice"), $"id"))
      .select($"slice",
        operators.Sampling.portableHash48($"id".cast("string")).as("h"))
    val sm = operators.Sketches.kmvOverlapMatrix(small, "slice", $"h", k = 256)
      .head()
    assert(sm.getAs[Long]("k_eff") == 45L)
    assert(sm.getAs[Long]("n_shared") == 15L)
    assert(sm.getAs[Long]("union_est") == 45L)
    assert(sm.getAs[Double]("jaccard_est") == 15.0 / 45.0)
  }

  test("KMV mergeability: sketch of the union == re-aggregated shard sketches") {
    // the 100 TB maintenance pattern: keep one sketch per day/shard,
    // answer global distincts by RE-AGGREGATING STORED SKETCHES (explode
    // + kmv again) — never rescanning the corpus. KMV makes the merge
    // LOSSLESS below k and exact-k-minima above it, so the merged
    // sketch is bit-identical to the single-pass sketch of the union
    import graft.functions.KmvMinHashes.kmvMinHashes
    val k = 64
    val df = spark.range(20000)
      .select(($"id" % 7).as("shard"),
        operators.Sampling.portableHash48($"id".cast("string")).as("h"))
    val direct = df.agg(kmvMinHashes($"h", k)).head().getSeq[Long](0)
    val merged = df.groupBy($"shard")
      .agg(kmvMinHashes($"h", k).as("sk"))
      .select(explode($"sk").as("h"))
      .agg(kmvMinHashes($"h", k)).head().getSeq[Long](0)
    assert(merged == direct)
  }

  test("streaming KMV updates across micro-batches and matches the batch sketch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.functions.KmvMinHashes.kmvMinHashes
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Long]
    val agg = input.toDF().toDF("id")
      .select(lit("s").as("slice"),
        operators.Sampling.portableHash48($"id".cast("string")).as("h"))
      .groupBy($"slice")
      .agg(kmvMinHashes($"h", 8).as("sk"))
    val q = agg.writeStream.format("memory").queryName("kmv_stream_out")
      .outputMode("complete").start()
    try {
      input.addData(0L until 100L: _*)
      q.processAllAvailable()
      val afterB1 = spark.table("kmv_stream_out").head().getSeq[Long](1)
      // second batch brings new ids — the state-store buffer must merge,
      // not restart
      input.addData(100L until 300L: _*)
      q.processAllAvailable()
      val afterB2 = spark.table("kmv_stream_out").head().getSeq[Long](1)
      val batch = spark.range(300)
        .select(operators.Sampling.portableHash48($"id".cast("string")).as("h"))
        .agg(kmvMinHashes($"h", 8)).head().getSeq[Long](0)
      assert(afterB2 == batch)
      assert(afterB1 != afterB2, "batch 2 must have refined the sketch")
    } finally {
      q.stop()
      spark.catalog.dropTempView("kmv_stream_out")
    }
  }

  test("q85 plans the KMV aggregate in Partial (map-side combinable) mode") {
    // the sketch must collapse to ≤ k longs per map partition BEFORE
    // the shuffle — a billion-gram slice ships k·partitions longs,
    // never the gram count
    val plan = SparkEntry.queries("q85_kmv_overlap")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan
    val partial = plan.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.aggregateExpressions.exists(e =>
          e.aggregateFunction.prettyName == "kmv_min_hashes" &&
            e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
        a.nodeName
    }
    assert(partial.nonEmpty,
      s"expected kmv_min_hashes in Partial mode:\n$plan")
  }
}
