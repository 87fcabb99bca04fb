package graft

import graft.operators.CountMin
import org.apache.spark.sql.functions._

class CountMinSpec extends SparkSpec {
  import spark.implicits._

  test("estimate is ONE-SIDED: >= the exact count for every key, " +
      "even in a deliberately collision-heavy geometry") {
    // 500 keys into a 1-row × 64-cell grid: ~8 keys per cell, every
    // estimate inflated — but NEVER below truth (the prune-then-verify
    // contract's load-bearing property)
    val df = spark.range(2000)
      .select(($"id" % 500).cast("string").as("k"))
      .withColumn("h", xxhash64($"k"))
    val sk = CountMin.buildWords(df, "h", depth = 1, width = 64)
    val checked = df
      .groupBy($"k").agg(count(lit(1)).as("exact"), min($"h").as("h"))
      .select($"k", $"exact", CountMin.estimate($"h", sk).as("est"))
      .as[(String, Long, Long)].collect()
    assert(checked.length === 500)
    checked.foreach { case (k, exact, est) =>
      assert(est >= exact, s"key $k: estimate $est < exact $exact")
    }
    // and the grid mass equals the row count per depth row
    assert(sk.words.sum === 2000L)
  }

  test("heavyHitters ≡ the exact groupBy even when collisions force " +
      "false positives through the prune; null keys excluded") {
    // keys 0..49 appear (id%50)+1 ≤ 50 times; planted key "hot" 500×
    val base = spark.range(1275) // sum 1..50 = 1275
      .select(floor((sqrt($"id" * 8 + 1) - 1) / 2).cast("string").as("k"))
    val df = base
      .union(spark.range(500).select(lit("hot").as("k")))
      .union(spark.range(10).select(lit(null).cast("string").as("k")))
    for (width <- Seq(64, 8192)) { // tight grid → real false positives
      val got = CountMin.heavyHitters(df.toDF("k"), "k",
          threshold = 40L, depth = 2, width = width)
        .as[(String, Long)].collect().toMap
      val exact = df.filter($"k".isNotNull)
        .groupBy($"k").agg(count(lit(1)).as("n"))
        .filter($"n" >= 40).as[(String, Long)].collect().toMap
      assert(got === exact, s"width=$width: got $got, exact $exact")
      assert(got("hot") === 500L && !got.keySet.exists(_ == null))
    }
  }

  test("a planted mega-key stays one aggregated row — the sketch " +
      "build never shuffles keys, only the depth×width cell grid") {
    val mega = spark.range(200000).select(lit("mega").as("k"))
      .union(spark.range(1000).select($"id".cast("string").as("k")))
    val got = CountMin.heavyHitters(mega, "k", threshold = 100000L)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("mega", 200000L)))
  }

  test("guards: geometry and threshold bounds fail loudly") {
    val df = Seq("a").toDF("k")
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", threshold = 0L) }
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", 1L, depth = 9) }
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", 1L, depth = 1, width = 32) }
    intercept[IllegalArgumentException] {
      CountMin.heavyHitters(df, "k", 1L, depth = 8, width = CountMin.MaxCells) }
  }
}
