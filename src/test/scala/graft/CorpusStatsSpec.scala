package graft

import graft.operators.CorpusStats
import org.apache.spark.sql.functions._

class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenDivergence: hand-computed TV on a two-slice corpus") {
    // slice a: tokens {x x y}  →  P_a = {x: 2/3, y: 1/3}
    // slice b: tokens {x z}    →  P_b = {x: 1/2, z: 1/2}
    // global:  {x: 3/5, y: 1/5, z: 1/5}
    // TV(a) = ½(|2/3−3/5| + |1/3−1/5| + |0−1/5|) = ½(1/15+2/15+3/15) = 1/5
    // TV(b) = ½(|1/2−3/5| + |0−1/5| + |1/2−1/5|) = ½(.1+.2+.3) = 3/10
    val docs = Seq(("a", "x x y"), ("b", "x z")).toDF("slice", "text")
    val got = CorpusStats.tokenDivergence(docs, "slice")
      .orderBy($"slice")
      .select($"slice", $"n_tokens", $"vocab", $"tv_dist")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got === Seq(("a", 3L, 2L, 0.2), ("b", 2L, 2L, 0.3)))
  }

  test("tokenDivergence: a single-slice corpus has zero drift; TV stays in [0, 1]") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val one = CorpusStats.tokenDivergence(
      docs.withColumn("all", lit("corpus")), "all")
    val tv = one.select($"tv_dist").as[Double].head()
    assert(tv === 0.0, s"single slice IS the global distribution, got $tv")
    val per = CorpusStats.tokenDivergence(docs, "source")
      .select($"tv_dist").as[Double].collect()
    assert(per.length === 20)
    assert(per.forall(d => d >= 0.0 && d <= 1.0), per.mkString(","))
  }

  test("tokenDivergence: disjoint-vocabulary slices approach the TV upper bound") {
    // two slices with NO shared tokens: TV(s) = 1 − N_s/N (each slice
    // sees all of the OTHER slice's mass as missing). For a 50/50
    // split that is 0.5 exactly — the statistic must land on it.
    val docs = Seq(("a", "x y"), ("b", "u v")).toDF("slice", "text")
    val got = CorpusStats.tokenDivergence(docs, "slice")
      .select($"slice", $"tv_dist").as[(String, Double)]
      .collect().toMap
    assert(got("a") === 0.5 && got("b") === 0.5, got.toString)
  }

  test("tokenDivergence: null slices are excluded, not grouped or crashed") {
    val docs = Seq(("a", "x y"), (null, "u v"), ("a", "x"))
      .toDF("slice", "text")
    val got = CorpusStats.tokenDivergence(docs, "slice")
    assert(got.count() === 1L)
    // the null slice's tokens must not leak into the global total:
    // with only slice a present, a IS the corpus → zero drift
    assert(got.select($"tv_dist").as[Double].head() === 0.0)
  }

  test("tokenDivergence: exactness guard fires LOUDLY past the bound, " +
      "including in non-ANSI sessions where overflow would otherwise be silent") {
    // First, the failure class the guard exists for, demonstrated
    // directly: in a non-ANSI session a decimal(38,0) product that
    // overflows becomes NULL, and SUM silently drops it — the sum of
    // {10^37 * 20 (overflows), 5} comes back 5, not an error. A
    // statistic built on that sum would be plausible-looking and wrong.
    val prevAnsi = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try {
      val silent = Seq(("1" + "0" * 37, 20L), ("5", 1L))
        .toDF("big", "k")
        .select((col("big").cast("decimal(38,0)") * col("k")).as("p"))
        .agg(sum($"p").cast("string")).as[String].head()
      assert(silent === "5",
        s"expected the overflowed term to be silently dropped, got $silent")

      // Now the guard: same non-ANSI session, bound lowered to 10
      // tokens via the test seam, corpus of 12 tokens → the query must
      // fail LOUDLY with the self-describing message, not return a
      // wrong tv_dist.
      val docs = Seq(("a", "t1 t2 t3 t4 t5 t6"), ("b", "t1 t2 t3 t4 t5 t6"))
        .toDF("slice", "text")
      val ex = intercept[Exception] {
        CorpusStats.tokenDivergenceBounded(docs, "slice", "text", "10")
          .collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      val all = messages(ex).mkString("\n")
      assert(all.contains("beyond the exact-decimal bound"),
        s"guard did not fire with its message; got: $all")

      // and under the REAL bound the same corpus computes fine non-ANSI
      val ok = CorpusStats.tokenDivergence(docs, "slice")
        .select($"tv_dist").as[Double].collect()
      assert(ok.forall(_ === 0.0), ok.mkString(","))
    } finally spark.conf.set("spark.sql.ansi.enabled", prevAnsi)
  }

  test("duplicationMatrix: hand-computed ordered pairs; within-slice " +
      "duplicates aggregate instead of inflating the join") {
    // a: {T1, T2, T1(dup), "t1!" (≡ T1 after normalization)}  b: {T1, T3}  c: {T3}
    val docs = Seq(
      ("a", "alpha beta"), ("a", "gamma"), ("a", "alpha beta"),
      ("a", "Alpha, BETA!"),
      ("b", "alpha beta"), ("b", "delta"),
      ("c", "delta")).toDF("slice", "text")
    val got = CorpusStats.duplicationMatrix(docs, "slice")
      .orderBy($"slice_a", $"slice_b")
      .select($"slice_a", $"slice_b", $"n_dup_docs", $"dup_frac")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(got === Seq(
      // 3 of a's 4 docs normalize to "alphabeta", present in b
      ("a", "b", 3L, 0.75),
      ("b", "a", 1L, 0.5),
      ("b", "c", 1L, 0.5),
      ("c", "b", 1L, 1.0)))
  }

  test("duplicationMatrix: disjoint corpora produce an empty matrix; " +
      "null slices are excluded") {
    val disjoint = Seq(("a", "x"), ("b", "y"), (null, "x"))
      .toDF("slice", "text")
    assert(CorpusStats.duplicationMatrix(disjoint, "slice").count() === 0L)
  }

  test("ngramNovelty: exact fractions — verbatim copy 0, fresh doc 1, " +
      "collage scores its stitch points, short docs excluded") {
    def ws(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val refA = ws("a", 6) // windows (n=3): 4 distinct
    val refB = ws("b", 6)
    val reference = Seq((100L, refA), (101L, refB)).toDF("doc_id", "text")
    val candidates = Seq(
      (0L, refA),                 // verbatim copy → novelty 0
      (1L, ws("f", 6)),           // fully fresh → novelty 1
      // collage a0..a5 b0..b5: 10 windows; the 2 straddling the seam
      // (a4 a5 b0, a5 b0 b1) exist in neither reference doc
      (2L, refA + " " + refB),
      (3L, "a0 a1"),              // < 3 tokens → excluded
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(candidates, reference, n = 3)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (0L, 4L, 0L, 0.0),
      (1L, 4L, 4L, 1.0),
      (2L, 10L, 2L, 0.2)))
  }

  test("ngramNovelty: repetition inside a candidate does not inflate " +
      "the window count (distinct windows)") {
    def ws(tag: String, n: Int) = (0 until n).map(i => s"$tag$i").mkString(" ")
    val reference = Seq((100L, ws("r", 5))).toDF("doc_id", "text")
    // r0..r4 r0..r4: 8 windows, but only 5 DISTINCT (3 in-run + the
    // 2 wrap windows r3 r4 r0, r4 r0 r1 — wait: windows of the 10-token
    // doc are 8 positions; distinct strings: r0r1r2, r1r2r3, r2r3r4,
    // r3r4r0, r4r0r1 = 5); the 3 in-reference ones are known
    val cand = Seq((0L, ws("r", 5) + " " + ws("r", 5)))
      .toDF("doc_id", "text")
    val got = CorpusStats.ngramNovelty(cand, reference, n = 3)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((0L, 5L, 2L, 0.4)))
  }
}
