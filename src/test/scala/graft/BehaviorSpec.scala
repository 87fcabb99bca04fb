package graft

import graft.operators.{Cohort, Collocations, Graph, Histogram, Mixture,
  Timeseries, Transitions, Trend}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Unit contracts for the behavioral/statistical operators behind
  * q101–q106. */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  // ---- Histogram.groupQuantileEstimates (q101) ----

  test("groupQuantileEstimates: hand-checked per-key bins/ranks; " +
      "degenerate single-value key; all-null key absent; guards") {
    val df = Seq(
      // key "a": values 0..9 → lo 0, span 9, 4 bins → bin = min(3, floor(x*4/9))
      ("a", 0.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", 5.0), ("a", 6.0), ("a", 7.0), ("a", 8.0), ("a", 9.0),
      // key "b": constant — degenerate span 0, everything in bin 0
      ("b", 42.0), ("b", 42.0), ("b", 42.0),
      // key "c": nulls only — must not appear
      ("c", Double.NaN)).toDF("k", "x")
      .union(Seq(("c", Option.empty[Double])).toDF("k", "x"))
    val out = Histogram.groupQuantileEstimates(df, "k", "x",
        nBins = 4, pcts = Seq(50, 100))
      .orderBy($"key", $"pct")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    // key a, n=10: pct 50 → rank 5 → x=4.0 is the 5th value; bins:
    // x in [0,2.25)→0 [2.25,4.5)→1 [4.5,6.75)→2 [6.75,9]→3; cum:
    // bin0 has {0,1,2} cum 3, bin1 {3,4} cum 5 → rank5 → bin1, est
    // 0 + 1*(9/4) = 2.25. pct 100 → rank 10 → bin3, est 3*2.25=6.75
    assert(out === Seq(
      ("a", 50L, 5L, 1L, 2.25),
      ("a", 100L, 10L, 3L, 6.75),
      ("b", 50L, 2L, 0L, 42.0),
      ("b", 100L, 3L, 0L, 42.0)))
    intercept[IllegalArgumentException] {
      Histogram.groupQuantileEstimates(df, "k", "x", 0, Seq(50))
    }
    intercept[IllegalArgumentException] {
      Histogram.groupQuantileEstimates(df, "k", "x", 4, Seq(50, 50))
    }
    intercept[IllegalArgumentException] {
      Histogram.groupQuantileEstimates(df, "k", "x", 4, Seq(0))
    }
  }

  test("groupQuantileEstimates: non-finite values are excluded — one " +
      "Infinity must not collapse the histogram") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
      ("a", Double.PositiveInfinity), ("a", Double.NegativeInfinity),
      ("a", Double.NaN)).toDF("k", "x")
    val out = Histogram.groupQuantileEstimates(df, "k", "x", 4, Seq(100))
      .as[(String, Long, Long, Long, Double)].head()
    // only the 4 finite values count: rank 4, top bin, est 1+3*(3/4)
    assert(out === (("a", 100L, 4L, 3L, 3.25)))
  }

  test("groupQuantileEstimates: estimate within one bin width of the " +
      "exact quantile, per key") {
    val df = (1 to 500).flatMap(i =>
      Seq(("lin", i.toDouble), ("sq", (i * i).toDouble))).toDF("k", "x")
    val nBins = 64
    val out = Histogram.groupQuantileEstimates(df, "k", "x", nBins,
        Seq(50, 90, 99))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(4))
      .toMap
    for (k <- Seq("lin", "sq"); p <- Seq(50, 90, 99)) {
      val vals = (1 to 500).map(i => if (k == "lin") i.toDouble
        else (i * i).toDouble).sorted
      val exact = vals((vals.size * p + 99) / 100 - 1)
      val width = (vals.last - vals.head) / nBins
      val est = out((k, p.toLong))
      assert(est <= exact && exact <= est + width,
        s"$k p$p: est $est exact $exact width $width")
    }
  }

  // ---- Cohort.retention (q102) ----

  test("retention: hand-built monthly cohorts; offset 0 is 1.0; " +
      "multi-event periods dedup; unit guard") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      // u1: joins Jan, active Jan (twice — dedup), Feb, Apr
      (1L, ts("2024-01-05 00:00:00")), (1L, ts("2024-01-20 00:00:00")),
      (1L, ts("2024-02-01 00:00:00")), (1L, ts("2024-04-30 00:00:00")),
      // u2: joins Jan, active Jan only
      (2L, ts("2024-01-09 00:00:00")),
      // u3: joins Feb, active Feb + Mar
      (3L, ts("2024-02-11 00:00:00")), (3L, ts("2024-03-11 00:00:00")))
      .toDF("u", "t")
    val out = Cohort.retention(df, "u", "t", "month")
      .orderBy($"cohort_period", $"offset")
      .select(date_format($"cohort_period", "yyyy-MM").as("c"),
        $"offset", $"n_active", $"cohort_size", $"retention")
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("2024-01", 0L, 2L, 2L, 1.0),
      ("2024-01", 1L, 1L, 2L, 0.5),
      ("2024-01", 3L, 1L, 2L, 0.5),
      ("2024-02", 0L, 1L, 1L, 1.0),
      ("2024-02", 1L, 1L, 1L, 1.0)))
    intercept[IllegalArgumentException] {
      Cohort.retention(df, "u", "t", "fortnight")
    }
  }

  test("retention: day and week units produce exact integer offsets") {
    def ts(s: String) = Timestamp.valueOf(s)
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00")), // Monday
      (1L, ts("2024-01-03 09:00:00")),
      (1L, ts("2024-01-10 23:00:00"))).toDF("u", "t")
    val day = Cohort.retention(df, "u", "t", "day")
      .select($"offset").as[Long].collect().toSet
    assert(day === Set(0L, 2L, 9L))
    val week = Cohort.retention(df, "u", "t", "week")
      .select($"offset").as[Long].collect().toSet
    assert(week === Set(0L, 1L)) // Jan 1 + Jan 3 same ISO week; Jan 10 next
  }

  // ---- Transitions.transitionMatrix (q103) ----

  test("transitionMatrix: hand-built sequences; tie-break total order; " +
      "null states skipped over; per-source normalization") {
    val df = Seq(
      // u1: a→b→a (ordered by ts)
      (1L, Some("a"), 10L, 1L), (1L, Some("b"), 20L, 2L),
      (1L, Some("a"), 30L, 3L),
      // u2: ts tie broken by id: a(id 1)→b(id 2); null state between
      // b and c is skipped → b→c is adjacent
      (2L, Some("a"), 10L, 1L), (2L, Some("b"), 10L, 2L),
      (2L, None, 15L, 3L), (2L, Some("c"), 20L, 4L),
      // u3: single event — no transitions
      (3L, Some("a"), 10L, 1L))
      .toDF("u", "state", "ts", "id")
    val out = Transitions.transitionMatrix(df, "u", "state",
        col("ts"), col("id"))
      .orderBy($"from_state", $"to_state")
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "b", 2L, 2L, 1.0), // from a: both u1 and u2 go to b
      ("b", "a", 1L, 2L, 0.5),
      ("b", "c", 1L, 2L, 0.5)))
  }

  test("transitionMatrix: null-ORDER rows are skipped over (shared " +
      "contract with dwellTimes), not sorted engine-dependently") {
    // u1: a(ts 10) → [x at NULL ts — excluded] → b(ts 20): the pair is
    // a→b, never a→x or x→b. Were null-ts rows kept, Spark's NULLS
    // FIRST would put x BEFORE a (x→a→b) while DuckDB's NULLS LAST
    // would put it after b (a→b→x) — both wrong, each differently.
    val df = Seq(
      (1L, "a", Some(10L), 1L), (1L, "x", Option.empty[Long], 2L),
      (1L, "b", Some(20L), 3L))
      .toDF("u", "state", "ts", "id")
    val out = Transitions.transitionMatrix(df, "u", "state",
        col("ts"), col("id"))
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(out === Seq(("a", "b", 1L, 1L, 1.0)), out.toString)
  }

  test("dwellTimes: hand-checked gaps, mean/min/max in seconds, " +
      "null-ts rows excluded before pairing") {
    val df = Seq(
      // u1: a →(2s)→ b →(3s)→ a →(5s)→ b : two a→b dwells (2s, 5s),
      // one b→a (3s)
      (1L, Some("a"), Some(0L), 1L),
      (1L, Some("b"), Some(2000000000L), 2L),
      (1L, Some("a"), Some(5000000000L), 3L),
      (1L, Some("b"), Some(10000000000L), 4L),
      // u2: a →(1.5s)→ b ; a null-ts row must not break the pairing
      (2L, Some("a"), Some(0L), 1L),
      (2L, Some("x"), Option.empty[Long], 2L),
      (2L, Some("b"), Some(1500000000L), 3L))
      .toDF("u", "state", "t", "id")
    val out = graft.operators.Transitions
      .dwellTimes(df, "u", "state", col("t"), col("id"))
      .orderBy($"from_state", $"to_state")
      .as[(String, String, Long, Double, Double, Double)]
      .collect().toSeq
    assert(out === Seq(
      ("a", "b", 3L, 2.8333, 1.5, 5.0), // mean (2+5+1.5)/3 round 4
      ("b", "a", 1L, 3.0, 3.0, 3.0)))
  }

  test("dwellGaps → groupQuantileEstimates composition (q114 shape): " +
      "hand-checked p50/p95 over a planted bimodal dwell distribution") {
    // a→b dwells: nine fast (1..9 s) and one stalled (1000 s) — the
    // bimodal shape q113's mean/min/max hide (mean 102.7 s reads like
    // "typical ~2 minutes"; the p50 says 5 s, the p95 shows the stall)
    val rows = (0 until 10).flatMap { i =>
      val t0 = i * 1000000L * 1000000000L
      val dwell = (if (i == 9) 1000L else i + 1L) * 1000000000L
      Seq((1L + i, "a", t0, 1L), (1L + i, "b", t0 + dwell, 2L))
    }
    val gaps = Transitions.dwellGaps(
      rows.toDF("u", "state", "t", "id"), "u", "state", col("t"), col("id"))
    assert(gaps.count() === 10L)
    // the ONE shared composition the query and benchmark also call
    val got = Transitions.dwellQuantiles(
        rows.toDF("u", "state", "t", "id"), "u", "state", col("t"),
        col("id"))
      .select($"key", $"pct", $"rank", $"est")
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._2, r._3) -> r._4).toMap
    // n=10: p50 rank 5 → value 5e9 (bin floor ≤ one-bin-width under);
    // p95 rank 10 → the 1000 s stall's bin
    val binW = (1000e9 - 1e9) / 128.0
    assert(math.abs(got((50L, 5L)) - 5e9) <= binW, got.toString)
    assert(math.abs(got((95L, 10L)) - 1000e9) <= binW, got.toString)
  }

  test("windowedQuantiles: hand-checked exact ranks; quantization to " +
      "4dp; NaN/null exclusion; maxDistinct guard fires loudly") {
    import graft.operators.WindowedQuantiles
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 10:15:00")
    // one (A, 10:00) window with values 1..10 → p50 = rank 5 → 5.0;
    // p95 = rank ⌈9.5⌉ = 10 → 10.0; one NaN and one null must drop
    val rows = (1 to 10).map(v => ("A", t0, Some(v.toDouble))) ++
      Seq(("A", t0, Some(Double.NaN)), ("A", t0, Option.empty[Double]))
    val got = WindowedQuantiles.quantiles(
        rows.toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50, 95))
      .orderBy($"pct")
      .as[(String, java.sql.Timestamp, Long, Long, Double)]
      .collect().toSeq
    assert(got.map(r => (r._3, r._4, r._5)) ===
      Seq((50L, 10L, 5.0), (95L, 10L, 10.0)), got.toString)
    assert(got.forall(_._2 === java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
    // fractional values quantize at 4dp exactly
    val frac = WindowedQuantiles.quantiles(
        Seq(("B", t0, 0.12345), ("B", t0, 0.12355))
          .toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50))
      .select($"est").as[Double].head()
    assert(frac === 0.1234, s"floor-quantization must truncate: $frac")
    // guard: 3 distinct values over maxDistinct=2 must die loudly
    val e = intercept[Exception] {
      WindowedQuantiles.quantiles(
        Seq(("C", t0, 1.0), ("C", t0, 2.0), ("C", t0, 3.0))
          .toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50),
        maxDistinct = 2L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") + msgs(t.getCause)
    assert(msgs(e).contains("maxDistinct"), msgs(e))
    // preflight dial: the same over-cap domain dies AT PLAN-BUILD TIME
    // — a driver-side IllegalArgumentException from the sort-free gate
    // (the late path above surfaces as a SparkException wrapping
    // raise_error mid-execution, AFTER the window sort ran), and the
    // builder never returns a DataFrame for the mega-sort to plan
    val pf = intercept[IllegalArgumentException] {
      WindowedQuantiles.quantiles(
        Seq(("C", t0, 1.0), ("C", t0, 2.0), ("C", t0, 3.0))
          .toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50),
        maxDistinct = 2L, preflight = true)
    }
    assert(pf.getMessage.contains("preflight") &&
      pf.getMessage.contains("maxDistinct"), pf.getMessage)
    // ...and on an in-bounds domain preflight changes NOTHING
    val pfOk = WindowedQuantiles.quantiles(
        rows.toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50, 95),
        preflight = true)
      .orderBy($"pct")
      .as[(String, java.sql.Timestamp, Long, Long, Double)]
      .collect().toSeq
    assert(pfOk === got, s"preflight must be result-invisible: $pfOk")
    // timezone invariance (review finding): hour windows are
    // epoch-integer truncated, NOT session-tz date_trunc — an
    // Asia/Kolkata (+05:30) session must group identically to UTC
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    val inUtc = WindowedQuantiles.quantiles(
        rows.toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50))
      .select(unix_micros($"window_start"), $"est")
      .as[(Long, Double)].collect().toSet
    spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
    try {
      val inKolkata = WindowedQuantiles.quantiles(
          rows.toDF("k", "ts", "v"), "k", "ts", "v", "hour", Seq(50))
        .select(unix_micros($"window_start"), $"est")
        .as[(Long, Double)].collect().toSet
      assert(inKolkata === inUtc,
        s"hour windows moved with the session timezone: $inKolkata vs $inUtc")
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
  }

  // ---- Graph.triangleCounts (q104) ----

  test("triangleCounts: K4 has 4 triangles with every node in 3; " +
      "a star has none; duplicate/reversed/self edges canonicalize") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L),
      // noise: duplicates, reversed, self-loop — must not change counts
      (2L, 1L), (3L, 1L), (4L, 4L)).toDF("src", "dst")
    val out = Graph.triangleCounts(k4)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    val star = (2L to 20L).map(i => (1L, i)).toDF("src", "dst")
    assert(Graph.triangleCounts(star).count() === 0L)
  }

  test("triangleCounts: one triangle hanging off a hub star is found " +
      "exactly once (the orientation neutralizes the hub)") {
    val g = ((2L to 1000L).map(i => (1L, i)) ++
      Seq((2L, 3L))).toDF("src", "dst") // triangle 1-2-3
    val out = Graph.triangleCounts(g)
      .orderBy($"node").as[(Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L), (2L, 1L), (3L, 1L)))
  }

  // ---- Trend.groupTrend (q105) ----

  test("groupTrend: exact slope/intercept on a clean linear series; " +
      "zero-variance x and n=1 yield nulls; NaN/null y excluded") {
    val df = Seq(
      ("lin", 0L, 1.0), ("lin", 1L, 3.0), ("lin", 2L, 5.0),
      ("lin", 3L, 7.0), // y = 2x + 1 exactly
      ("flat", 5L, 1.0), ("flat", 5L, 9.0), // zero x variance
      ("one", 7L, 4.0), // single point
      ("nan", 1L, Double.NaN), ("nan", 2L, 2.0), ("nan", 3L, 4.0))
      .toDF("k", "x", "y")
    val out = Trend.groupTrend(df, "k", col("x"), col("y"))
      .orderBy($"key")
      .as[(String, Long, Option[Double], Option[Double])].collect().toSeq
    assert(out === Seq(
      ("flat", 2L, None, None),
      ("lin", 4L, Some(2.0), Some(1.0)),
      ("nan", 2L, Some(2.0), Some(-2.0)), // y=2x-2 over surviving points
      ("one", 1L, None, None)))
  }

  test("groupTrend: a y beyond the ±9e14 quantization bound (incl. " +
      "Infinity) fails loudly instead of silently clamping") {
    for (bad <- Seq(1.0e15, Double.PositiveInfinity)) {
      val df = Seq(("k", 1L, 1.0), ("k", 2L, bad)).toDF("k", "x", "y")
      val e = intercept[Exception] {
        Trend.groupTrend(df, "k", col("x"), col("y")).collect()
      }
      assert(e.getMessage.contains("quantization bound") ||
        (e.getCause != null &&
          e.getCause.getMessage.contains("quantization bound")),
        s"for y=$bad: $e")
    }
  }

  test("groupTrend: quantization contract — slopes are exact OLS of " +
      "floor(y·1e4), matching a BigDecimal reference") {
    val pts = (0 until 50).map(i => (i.toLong, math.sin(i) * 100.0))
    val df = pts.map { case (x, y) => ("s", x, y) }.toDF("k", "x", "y")
    val out = Trend.groupTrend(df, "k", col("x"), col("y"))
      .as[(String, Long, Option[Double], Option[Double])].head()
    val n = BigInt(pts.size)
    val xs = pts.map(p => BigInt(p._1))
    val ys = pts.map(p => BigInt(math.floor(p._2 * 10000.0).toLong))
    val sx = xs.sum; val sy = ys.sum
    val sxy = pts.indices.map(i => xs(i) * ys(i)).sum
    val sxx = xs.map(x => x * x).sum
    val den = (n * sxx - sx * sx) * 10000
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out._3.get ===
      r6((n * sxy - sx * sy).toDouble / den.toDouble))
    assert(out._4.get ===
      r6((sy * sxx - sx * sxy).toDouble / den.toDouble))
  }

  // ---- Collocations.pmiTopBigrams (q106) ----

  test("pmiTopBigrams: planted collocation scores the top band; " +
      "minCount filters; single-token docs contribute nothing; " +
      "hand-checked qpmi") {
    // corpus: 10 docs "alpha beta", 40 filler docs of one token each
    // (distinct fillers, so no other bigram or repeat)
    val docs = ((1 to 10).map(i => (i.toLong, "alpha beta")) ++
      (1 to 40).map(i => (100L + i, s"w$i"))).toDF("doc_id", "text")
    val out = Collocations.pmiTopBigrams(docs, "text", minCount = 5L,
        k = 10)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    // N = 60 tokens; n_alpha = n_beta = 10, n_ab = 10
    // ratio = 10*60/(10*10) = 6 → qpmi = floor(log2 6) = 2
    assert(out === Seq(("alpha", "beta", 10L, 10L, 10L, 2L)))
    // raise minCount past the plant: nothing survives
    assert(Collocations.pmiTopBigrams(docs, "text", 11L, 10).count() === 0)
    intercept[IllegalArgumentException] {
      Collocations.pmiTopBigrams(docs, "text", 0L, 10)
    }
  }

  // ---- Timeseries.timeWeightedAvg (q107) ----

  test("timeWeightedAvg: hand-checked duration weighting; duplicate " +
      "timestamps collapse to min; single sample yields nulls; " +
      "quantization guard raises") {
    val df = Seq(
      // key "a": v=1 held 10ns, v=3 held 30ns → twap (10+90)/40 = 2.5
      ("a", 0L, 1.0), ("a", 10L, 3.0), ("a", 40L, 0.0),
      // duplicate ts on "a" at t=10: min(3.0, 9.0) = 3.0 wins
      ("a", 10L, 9.0),
      // key "b": single sample — no duration
      ("b", 5L, 7.0),
      // key "c": NaN and null excluded → single survivor → nulls
      ("c", 1L, Double.NaN), ("c", 2L, 4.0))
      .toDF("k", "t", "v")
    val out = Timeseries.timeWeightedAvg(df, "k", "t", "v")
      .orderBy($"key")
      .as[(String, Long, Option[Long], Option[Double])].collect().toSeq
    assert(out === Seq(
      ("a", 3L, Some(40L), Some(2.5)),
      ("b", 1L, None, None),
      ("c", 1L, None, None)))
    val e = intercept[Exception] {
      Timeseries.timeWeightedAvg(
        Seq(("k", 1L, 1.0e15), ("k", 2L, 1.0)).toDF("k", "t", "v"),
        "k", "t", "v").collect()
    }
    assert(e.getMessage.contains("quantization bound") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("quantization bound")))
  }

  // ---- Timeseries.interpolateMinutes (q108) ----

  test("interpolateMinutes: on-sample minutes return the sample, " +
      "between-sample minutes lerp exactly, the leading partial " +
      "minute drops, duplicate timestamps collapse to min") {
    def ns(s: String) =
      java.sql.Timestamp.valueOf(s).getTime * 1000000L
    val df = Seq(
      // key "a": samples on minute boundaries 00:00 v=0 and 00:02 v=6
      // → 00:01 lerps to 3.0
      ("a", ns("2024-01-01 00:00:00"), 0.0),
      ("a", ns("2024-01-01 00:02:00"), 6.0),
      // duplicate at 00:02 collapses to min(6, 8) = 6
      ("a", ns("2024-01-01 00:02:00"), 8.0),
      // key "b": samples at 00:00:30 and 00:01:30 → grid 00:00 has no
      // backward bracket (drops); 00:01 lerps halfway to 5.0
      ("b", ns("2024-01-01 00:00:30"), 0.0),
      ("b", ns("2024-01-01 00:01:30"), 10.0))
      .toDF("k", "t", "v")
    val out = Timeseries.interpolateMinutes(df, "k", "t", "v")
      .select($"key",
        date_format($"minute_start", "HH:mm").as("m"), $"est")
      .orderBy($"key", $"m")
      .as[(String, String, Double)].collect().toSeq
    assert(out === Seq(
      ("a", "00:00", 0.0), ("a", "00:01", 3.0), ("a", "00:02", 6.0),
      ("b", "00:01", 5.0)))
  }

  // ---- Histogram.discretize (q110) ----

  test("discretize: near-balanced quartiles on a uniform column; " +
      "non-finite values get null bucket; non-divisor guard") {
    val df = ((1 to 100).map(_.toDouble) :+ Double.NaN :+
      Double.PositiveInfinity).toDF("x")
    val out = Histogram.discretize(df, "x", nBuckets = 4, nBins = 1000)
    val counts = out.filter($"bucket".isNotNull)
      .groupBy($"bucket").count().orderBy($"bucket")
      .as[(Long, Long)].collect().toSeq
    assert(counts.map(_._1) === Seq(0L, 1L, 2L, 3L))
    // equi-depth: each quartile holds 25 ± the one-bin-width slack
    assert(counts.forall(c => c._2 >= 20 && c._2 <= 30), counts.toString)
    assert(counts.map(_._2).sum === 100L)
    // buckets are ordered: every value in bucket k is <= every value
    // in bucket k+1
    val ranges = out.filter($"bucket".isNotNull)
      .groupBy($"bucket").agg(min($"x").as("lo"), max($"x").as("hi"))
      .orderBy($"bucket").as[(Long, Double, Double)].collect()
    assert(ranges.sliding(2).forall {
      case Array(a, b) => a._3 <= b._2; case _ => true })
    // the two non-finite rows surface with a null bucket
    assert(out.filter($"bucket".isNull).count() === 2L)
    intercept[IllegalArgumentException] {
      Histogram.discretize(df, "x", nBuckets = 3)
    }
  }

  // ---- Timeseries.rollingCorrelation (q111) ----

  test("rollingCorrelation: exact ±1 on linear series, null on zero " +
      "variance, day-boundary reset, guards") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // minutes 0..5 on day 1 + minutes 0..2 on day 2:
    //   A ramps 1,2,3,4,5,6 ; B = 2A (r=+1) ; C = -A shape (7-A, r=-1)
    //   D constant (zero variance -> null)
    val rows = (0 until 6).flatMap { i =>
      val t = ts(f"2024-01-01 00:0$i:00")
      Seq(("A", t, (i + 1).toDouble), ("B", t, 2.0 * (i + 1)),
        ("C", t, (7 - (i + 1)).toDouble), ("D", t, 5.0))
    } ++ (0 until 3).flatMap { i =>
      val t = ts(f"2024-01-02 00:0$i:00")
      Seq(("A", t, (i + 1).toDouble), ("B", t, 3.0 * (i + 1)))
    }
    val df = rows.toDF("k", "t", "v")
    def corr(b: String) = Timeseries
      .rollingCorrelation(df, "k", "t", "v", "A", b, trailing = 3)
      .orderBy($"period_start")
      .as[(java.sql.Timestamp, Option[Double])].collect().toSeq
    val ab = corr("B")
    // day 1: windows complete at minutes 2..5 (4 rows); day 2: at
    // minute 2 only (1 row) — the window RESET at midnight, otherwise
    // day 2's first minutes would emit too
    assert(ab.length === 5)
    assert(ab.forall(_._2.contains(1.0)), ab.toString)
    assert(corr("C").forall(_._2.contains(-1.0)))
    assert(corr("D").forall(_._2.isEmpty)) // zero variance
    intercept[IllegalArgumentException] {
      Timeseries.rollingCorrelation(df, "k", "t", "v", "A", "A", 3)
    }
    intercept[IllegalArgumentException] {
      Timeseries.rollingCorrelation(df, "k", "t", "v", "A", "B", 3,
        grain = "week")
    }
    // trailing beyond the day-partition capacity could never fill —
    // reject instead of silently emitting nothing
    intercept[IllegalArgumentException] {
      Timeseries.rollingCorrelation(df, "k", "t", "v", "A", "B",
        trailing = 30, grain = "hour")
    }
    // per-period magnitude cap is LOAD-BEARING: past 10^19/trailing
    // the au*au product overflows decimal(38,0) to NULL and window
    // SUM would silently skip it — must raise instead
    val big = (0 until 2).flatMap { i =>
      val t = ts(f"2024-01-01 00:0$i:00")
      (0 until 60).map(_ => ("A", t, 9.0e13)) :+ (("B", t, 1.0 * i))
    }.toDF("k", "t", "v")
    val e = intercept[Exception] {
      Timeseries.rollingCorrelation(big, "k", "t", "v", "A", "B", 2)
        .collect()
    }
    assert(e.getMessage.contains("per-period sum") ||
      (e.getCause != null &&
        e.getCause.getMessage.contains("per-period sum")), e.toString)
  }

  // ---- Mixture.apportion (q109) ----

  test("apportion: textbook largest-remainder case; ties break by " +
      "key; duplicate keys sum; sum always equals the budget") {
    // weights 5/3/2, budget 7: ideals 3.5/2.1/1.4 → bases 3/2/1,
    // leftover 1 goes to the largest remainder (a: rem 5)
    val out = Mixture.apportion(
        Seq(("a", 5L), ("b", 3L), ("c", 2L)).toDF("k", "w"), "k", "w", 7L)
      .orderBy($"key").as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("a", 5L, 4L), ("b", 3L, 2L), ("c", 2L, 1L)))
    // equal weights, budget 10 over 3 keys: all rems tie → extra unit
    // goes to the lexicographically first key
    val tie = Mixture.apportion(
        Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("k", "w"), "k", "w", 10L)
      .orderBy($"key").as[(String, Long, Long)].collect().toSeq
    assert(tie === Seq(("x", 1L, 4L), ("y", 1L, 3L), ("z", 1L, 3L)))
    // duplicate keys are summed before apportioning
    val dup = Mixture.apportion(
        Seq(("a", 3L), ("a", 2L), ("b", 5L)).toDF("k", "w"), "k", "w", 4L)
      .orderBy($"key").as[(String, Long, Long)].collect().toSeq
    assert(dup === Seq(("a", 5L, 2L), ("b", 5L, 2L)))
  }

  test("apportion: matches a reference implementation on 500 keys " +
      "across shard counts, and guards fire") {
    val ws = (0 until 500).map(i => (f"k$i%03d", (i * 37 % 101 + 1).toLong))
    val budget = 99991L
    // reference: exact BigInt largest remainder
    val w = ws.map(_._2).map(BigInt(_)).sum
    val base = ws.map { case (k, wi) =>
      (k, (BigInt(budget) * wi / w).toLong, (BigInt(budget) * wi % w)) }
    val leftover = budget - base.map(_._2).sum
    val extra = base.sortBy { case (k, _, r) => (-r, k) }
      .take(leftover.toInt).map(_._1).toSet
    val expect = base.map { case (k, b, _) =>
      k -> (b + (if (extra(k)) 1L else 0L)) }.toMap
    for (shards <- Seq(1, 7, 64)) {
      val got = Mixture.apportion(ws.toDF("k", "w"), "k", "w", budget,
          numShards = shards)
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> r._3).toMap
      assert(got === expect, s"shards=$shards")
      assert(got.values.sum === budget)
    }
    intercept[IllegalArgumentException] {
      Mixture.apportion(Seq(("a", -1L)).toDF("k", "w"), "k", "w", 5L)
    }
    // duplicate-key weights summing past 2^63 must fail loudly, not
    // wrap: two rows of 2^62 reach exactly 2^63 (a LongType sum would
    // wrap to -2^63 and fire a MISLEADING negative-weights error; four
    // would wrap to a plausible 0)
    val wrap = intercept[IllegalArgumentException] {
      Mixture.apportion(
        Seq(("a", 1L << 62), ("a", 1L << 62), ("b", 1L)).toDF("k", "w"),
        "k", "w", 5L)
    }
    assert(wrap.getMessage.contains("2^63"), wrap.getMessage)
    intercept[IllegalArgumentException] {
      Mixture.apportion(Seq(("a", 0L)).toDF("k", "w"), "k", "w", 5L)
    }
    intercept[IllegalArgumentException] {
      Mixture.apportion(
        Seq((Option.empty[String], 1L)).toDF("k", "w"), "k", "w", 5L)
    }
  }

  test("pmiTopBigrams: deterministic tie order and negative-PMI " +
      "exclusion") {
    // two bigrams with identical counts → tie broken lexicographically;
    // a bigram of two very common tokens with ratio < 1 is excluded
    val docs = ((1 to 6).map(i => (i.toLong, "aa bb")) ++
      (7 to 12).map(i => (i.toLong, "cc dd")) ++
      // "ee ff" co-occur 5 times but each appears 40 more times alone
      (13 to 17).map(i => (i.toLong, "ee ff")) ++
      (18 to 57).map(i => (i.toLong, "ee")) ++
      (58 to 97).map(i => (i.toLong, "ff"))).toDF("doc_id", "text")
    val out = Collocations.pmiTopBigrams(docs, "text", 5L, 10)
      .select($"a", $"b").as[(String, String)].collect().toSeq
    // N = 114; aa/bb: 6*114/36 = 19 → band 4; cc/dd same; ee/ff:
    // 5*114/(45*45) = 570/2025 → ratio 0 → excluded
    assert(out === Seq(("aa", "bb"), ("cc", "dd")))
  }
}
