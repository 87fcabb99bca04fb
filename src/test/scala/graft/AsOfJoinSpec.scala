package graft

import graft.plans.AsOf
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  // (key, time, label)
  private lazy val trades = Seq(
    (1L, 100L, "t1"), (1L, 200L, "t2"), (1L, 300L, "t3"),
    (2L, 150L, "t4"),
    (3L, 50L, "t5") // key with no quotes at all
  ).toDF("k", "t", "trade")

  private lazy val quotes = Seq(
    (1L, 90L, 10.0), (1L, 150L, 11.0), (1L, 250L, 12.0),
    (2L, 150L, 20.0), // exactly-equal timestamp must match (<=)
    (4L, 1L, 99.0)    // key never joined
  ).toDF("k", "t", "px")

  private def run(tol: Option[Long] = None) =
    AsOf.join(trades, quotes,
      trades("k"), quotes("k"), trades("t"), quotes("t"), tol)
      .select(trades("k"), trades("t"), $"trade", $"px")
      .orderBy(trades("k"), trades("t"))

  test("latest right row at or before each left time, per key") {
    val got = run().as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 100L, "t1", Some(10.0)), // quote@90
      (1L, 200L, "t2", Some(11.0)), // quote@150
      (1L, 300L, "t3", Some(12.0)), // quote@250
      (2L, 150L, "t4", Some(20.0)), // equal ts matches
      (3L, 50L, "t5", None)))       // no quotes for key
  }

  test("tolerance bounds the lookback") {
    val got = run(Some(20L)).as[(Long, Long, String, Option[Double])]
      .collect().toSeq
    assert(got === Seq(
      (1L, 100L, "t1", Some(10.0)), // 100-90=10 <= 20
      (1L, 200L, "t2", None),       // 200-150=50 > 20
      (1L, 300L, "t3", None),       // 300-250=50 > 20
      (2L, 150L, "t4", Some(20.0)), // exact: delta 0
      (3L, 50L, "t5", None)))
  }

  test("forward direction: earliest right row at or after each left time") {
    val got = AsOf.join(trades, quotes,
        trades("k"), quotes("k"), trades("t"), quotes("t"),
        direction = "forward")
      .select(trades("k"), trades("t"), $"trade", $"px")
      .orderBy(trades("k"), trades("t"))
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 100L, "t1", Some(11.0)), // next quote@150
      (1L, 200L, "t2", Some(12.0)), // next quote@250
      (1L, 300L, "t3", None),       // nothing after 300
      (2L, 150L, "t4", Some(20.0)), // equal ts matches (>=)
      (3L, 50L, "t5", None)))
  }

  test("forward direction with tolerance bounds the lookahead") {
    val got = AsOf.join(trades, quotes,
        trades("k"), quotes("k"), trades("t"), quotes("t"),
        tolerance = Some(49L), direction = "forward")
      .select(trades("k"), trades("t"), $"trade", $"px")
      .orderBy(trades("k"), trades("t"))
      .as[(Long, Long, String, Option[Double])].collect().toSeq
    assert(got === Seq(
      (1L, 100L, "t1", None),       // 150-100=50 > 49
      (1L, 200L, "t2", None),       // 250-200=50 > 49
      (1L, 300L, "t3", None),
      (2L, 150L, "t4", Some(20.0)), // delta 0
      (3L, 50L, "t5", None)))
  }

  test("forward direction: one shared match serves consecutive left rows") {
    val l = Seq((1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "c")).toDF("k", "t", "lbl")
    val r = Seq((1L, 15L, 1.5)).toDF("k", "t", "px")
    val got = AsOf.join(l, r, l("k"), r("k"), l("t"), r("t"),
        direction = "forward")
      .select($"lbl", $"px").orderBy($"lbl")
      .as[(String, Option[Double])].collect().toSeq
    assert(got === Seq(("a", Some(1.5)), ("b", Some(1.5)), ("c", Some(1.5))))
  }

  test("null keys/times never match and never crash (SQL equality), both directions") {
    // nulls on BOTH sides, in keys AND times; nulls sort first, so they
    // exercise the merge's prefix-skip path
    val l = Seq[(Option[Long], Option[Long], String)](
      (None, Some(100L), "lk_null"),   // null left key
      (Some(1L), None, "lt_null"),     // null left time
      (Some(1L), Some(200L), "ok"),
      (Some(9L), Some(50L), "no_match")
    ).toDF("k", "t", "lbl")
    val r = Seq[(Option[Long], Option[Long], Option[Double])](
      (None, Some(90L), Some(66.0)),   // null right key: skipped
      (Some(1L), None, Some(77.0)),    // null right time: skipped
      (Some(1L), Some(150L), Some(11.0))
    ).toDF("k", "t", "px")
    for (dir <- Seq("backward", "forward")) {
      val got = AsOf.join(l, r, l("k"), r("k"), l("t"), r("t"),
          direction = dir)
        .select($"lbl", $"px").orderBy($"lbl")
        .as[(String, Option[Double])].collect().toMap
      assert(got("lk_null") === None, dir)
      assert(got("lt_null") === None, dir)
      assert(got("no_match") === None, dir)
      // the one valid pairing still joins: 150 <= 200 (backward); for
      // forward, 150 < 200 means no match at-or-after
      if (dir == "backward") assert(got("ok") === Some(11.0))
      else assert(got("ok") === None)
    }
  }

  test("null keys with a STRING key type (non-primitive ordering path)") {
    val l = Seq[(Option[String], Option[Long], String)](
      (None, Some(10L), "lnull"), (Some("a"), Some(10L), "la")
    ).toDF("k", "t", "lbl")
    val r = Seq[(Option[String], Option[Long], Option[Double])](
      (None, Some(5L), Some(9.0)), (Some("a"), Some(5L), Some(1.0))
    ).toDF("k", "t", "px")
    val got = AsOf.join(l, r, l("k"), r("k"), l("t"), r("t"))
      .select($"lbl", $"px").orderBy($"lbl")
      .as[(String, Option[Double])].collect().toMap
    assert(got === Map("lnull" -> None, "la" -> Some(1.0)))
  }

  test("survives multi-partition shuffles (distribution requirements)") {
    val bigTrades = spark.range(0, 1000)
      .select(($"id" % 7).as("k"), ($"id" * 10).as("t"))
    val bigQuotes = spark.range(0, 500)
      .select(($"id" % 7).as("k"), ($"id" * 20).as("t"), ($"id" % 100).as("px"))
    val out = AsOf.join(bigTrades, bigQuotes,
      bigTrades("k"), bigQuotes("k"), bigTrades("t"), bigQuotes("t"))
    assert(out.count() === 1000)
    // spot-check one row against a window-based reference computation
    val ref = bigTrades.as("l").join(bigQuotes.as("r"),
        col("l.k") === col("r.k") && col("r.t") <= col("l.t"), "left")
      .groupBy(col("l.k").as("k"), col("l.t").as("t"))
      .agg(max(struct(col("r.t"), col("r.px"))).as("m"))
      .select($"k", $"t", $"m.px".as("px"))
    val a = out.select(bigTrades("k"), bigTrades("t"), $"px")
      .orderBy("k", "t").collect()
    val b = ref.orderBy("k", "t").collect()
    assert(a.toSeq === b.toSeq)
  }
}
