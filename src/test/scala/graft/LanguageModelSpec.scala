package graft

import graft.operators.LanguageModel
import org.apache.spark.sql.functions._

/** [[LanguageModel.bigramSurprisal]]: hand-checked quantized
  * conditional surprisals, context-count (not unigram) denominators,
  * and the ranking property the filter exists for. */
class LanguageModelSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked surprisals: q = bitlength(2^10·n_ctx/n_ab) − 1, " +
      "context counts exclude doc-final tokens") {
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    // n(ab)=2, n(ac)=1, context n(a·)=3 — the trailing b/c tokens are
    // unigram occurrences but never contexts
    // q(ab) = bitlen(3·1024 div 2 = 1536) − 1 = 10
    // q(ac) = bitlen(3072) − 1 = 11
    assert(got === Seq((1L, 1L, 10L, 10.0), (2L, 1L, 10L, 10.0),
      (3L, 1L, 11L, 11.0)), got.toString)
  }

  test("repeated bigrams inside one doc count each occurrence; docs " +
      "with < 2 tokens and null text emit no row") {
    val docs = Seq((1L, "x y x y"), (2L, "solo"), (3L, ""),
      (4L, null: String)).toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // bigrams: xy, yx, xy → n(xy)=2, n(yx)=1, n(x·)=2, n(y·)=1
    // q(xy) = bitlen(2048 div 2) − 1 = 10; q(yx) = bitlen(1024) − 1 = 10
    assert(got === Seq((1L, 3L, 30L, 10.0)), got.toString)
  }

  test("ranking property: the doc with the rare continuation scores " +
      "strictly higher than the boilerplate docs") {
    val docs = ((1L to 7L).map(i => (i, "p q")) :+ (8L, "p r"))
      .toDF("doc_id", "text")
    val got = LanguageModel.bigramSurprisal(docs)
      .select($"doc_id", $"q_avg").as[(Long, Double)].collect().toMap
    // n(pq)=7, n(pr)=1, n(p·)=8: q(pq)=bitlen(8192 div 7=1170)−1=10,
    // q(pr)=bitlen(8192)−1=13
    assert((1L to 7L).forall(got(_) === 10.0), got.toString)
    assert(got(8L) === 13.0, got.toString)
  }

  test("domainReweight: hand-checked integer weights, quotas sum to " +
      "the budget exactly, harder domain gets the larger share") {
    // easy: 7 identical "p q" docs (q_avg 10 each, see above);
    // hard: the rare continuation (q_avg 13) — one doc, one bigram
    val docs = ((1L to 7L).map(i => (i, "p q", "easy")) :+
        (8L, "p r", "hard"))
      .toDF("doc_id", "text", "source")
    val got = LanguageModel.domainReweight(docs, "source",
        budget = 100L, scale = 1000L)
      .orderBy($"source")
      .as[(String, Long, Long, Long)].collect().toSeq
    // easy: Σq=70, Σn=7 → w = 70·1000 div 7 = 10000; hard: w = 13000
    // apportion(100 over 10000:13000): base 43/56, leftover 1 → the
    // larger remainder (easy: 100·10000 % 23000 = 11000 vs hard 12000)
    // goes to hard → (43, 57)
    assert(got === Seq(("easy", 7L, 10000L, 43L),
      ("hard", 1L, 13000L, 57L)), got.toString)
    assert(got.map(_._4).sum === 100L)
  }

  test("domainReweight: sub-2-token docs join no domain's weight; an " +
      "all-short domain disappears; null-text docs don't crash") {
    val docs = Seq((1L, "m n", "kept"), (2L, "solo", "gone"),
      (3L, null: String, "gone")).toDF("doc_id", "text", "source")
    val got = LanguageModel.domainReweight(docs, "source", budget = 10L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("kept"), got.toString)
    assert(got.head._4 === 10L, got.toString) // whole budget, one domain
  }

  test("surprisalBandFilter: exact integer band edges drop both " +
      "tails per group; sub-2-token docs are not ranked; bad bands " +
      "raise") {
    // one group of 10 scored docs: 7 boilerplate (q_avg 10), the 8th
    // a rare continuation (13 — the 'gibberish' tail), plus 2 more
    // boilerplate to make the edge arithmetic interesting
    val docs = ((1L to 9L).map(i => (i, "p q", "tr")) :+
        (10L, "p r", "tr") :+ (11L, "solo", "tr"))
      .toDF("doc_id", "text", "source")
      .withColumnRenamed("source", "lang")
    val got = LanguageModel.surprisalBandFilter(docs, "lang",
        lowPct = 10, highPct = 90)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    // n = 10 ranked docs (doc 11 has no bigram): keep r in
    // (floor(10·10/100), floor(10·90/100)] = (1, 9] → ranks 2..9.
    // Order is (q_avg, doc_id): docs 1..9 (q_avg 10) then 10 (13) —
    // so doc 1 (low tail) and doc 10 (high tail) both drop
    assert(got === (2L to 9L), got.toString)
    intercept[IllegalArgumentException] {
      LanguageModel.surprisalBandFilter(docs, "lang", 90, 10)
    }
  }

  test("bigramSurprisalHeldOut: hand-checked add-1 smoothing — seen, " +
      "unseen-continuation, and fully-OOV bigrams; V counts 1-token " +
      "train docs") {
    // train: "a b c d" + "a b" + "zz" (1 token — vocabulary only)
    // → V = |{a,b,c,d,zz}| = 5; n(ab)=2, n(bc)=1, n(cd)=1;
    //   contexts n(a·)=2, n(b·)=1, n(c·)=1
    val train = Seq((1L, "a b c d"), (2L, "a b"), (3L, "zz"))
      .toDF("doc_id", "text")
    val score = Seq(
      (10L, "a b"),   // seen:  (2+5)·1024 div (2+1) = 2389 → q=11
      (11L, "a d"),   // unseen continuation, seen context:
                      //        (2+5)·1024 div 1 = 7168 → q=12, oov
      (12L, "x y"))   // fully OOV: (0+5)·1024 div 1 = 5120 → q=12, oov
      .toDF("doc_id", "text")
    val got = graft.operators.LanguageModel
      .bigramSurprisalHeldOut(train, score)
      .orderBy($"doc_id")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((10L, 1L, 0L, 11L, 11.0),
      (11L, 1L, 1L, 12L, 12.0), (12L, 1L, 1L, 12L, 12.0)),
      got.toString)
  }

  test("bigramSurprisalHeldOut: a doc of 100% unseen bigrams scores " +
      "the finite OOV ceiling (no NaN/∞ path), n_oov = n_bigrams; " +
      "addK shifts the ceiling; k = 0 is rejected") {
    val train = Seq((1L, "a b")).toDF("doc_id", "text") // V = 2
    val score = Seq((10L, "x y z")).toDF("doc_id", "text")
    val got = graft.operators.LanguageModel
      .bigramSurprisalHeldOut(train, score)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // each bigram: (0 + 2)·1024 div 1 = 2048 → q = 11; 2 bigrams
    assert(got === Seq((10L, 2L, 2L, 22L, 11.0)), got.toString)
    // addK = 2: (0 + 2·2)·1024 div 2 = 2048 → q = 11 still, but a
    // SEEN pair shifts: "a b" → (1+4)·1024 div (1+2) = 1706 → q = 10
    val seen = graft.operators.LanguageModel
      .bigramSurprisalHeldOut(train,
        Seq((20L, "a b")).toDF("doc_id", "text"), addK = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(seen === Seq((20L, 1L, 0L, 10L, 10.0)), seen.toString)
    intercept[IllegalArgumentException] {
      graft.operators.LanguageModel
        .bigramSurprisalHeldOut(train, score, addK = 0)
    }
  }

  test("bigramSurprisalHeldOut: ranking property — the in-domain doc " +
      "scores strictly lower than the out-of-domain doc") {
    val train = (1L to 50L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val score = Seq((100L, "the cat sat"), (101L, "quantum flux node"))
      .toDF("doc_id", "text")
    val got = graft.operators.LanguageModel
      .bigramSurprisalHeldOut(train, score)
      .select($"doc_id", $"q_avg").as[(Long, Double)].collect().toMap
    assert(got(100L) < got(101L), got.toString)
  }

  test("surprisalBandFilterHeldOut: band edges run on HELD-OUT " +
      "scores — the out-of-domain doc is the high tail and drops, " +
      "ties rank by doc_id through the shared tail") {
    val train = (1L to 50L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    val docs = ((100L to 109L).map(i => (i, "the cat sat", "en")) :+
        (110L, "quantum flux node", "en"))
      .toDF("doc_id", "text", "lang")
    val got = graft.operators.LanguageModel
      .surprisalBandFilterHeldOut(train, docs, "lang",
        lowPct = 0, highPct = 90)
      .select($"doc_id").as[Long].collect().toSeq.sorted
    // 11 ranked docs: the ten identical in-domain docs tie on q_avg
    // (ranks 1..10 by doc_id), the OOV-heavy doc ranks 11; band
    // (0, floor(11·90/100) = 9] keeps docs 100..108
    assert(got === (100L to 108L), got.toString)
  }

  test("domainReweightHeldOut: quotas follow held-out difficulty and " +
      "sum to the budget exactly; the shared tail keeps the integer " +
      "weight contract") {
    val train = (1L to 50L).map(i => (i, "the cat sat on the mat"))
      .toDF("doc_id", "text")
    // in-domain source: text the reference model predicts well;
    // ood source: fully OOV — higher held-out surprisal per bigram
    val docs = ((100L to 104L).map(i => (i, "the cat sat", "indomain"))
        ++ (200L to 204L).map(i => (i, "zz yy xx", "ood")))
      .toDF("doc_id", "text", "source")
    val got = graft.operators.LanguageModel
      .domainReweightHeldOut(train, docs, "source", budget = 100L)
      .orderBy($"source")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) === Seq("indomain", "ood"), got.toString)
    assert(got.map(_._4).sum === 100L, got.toString)
    val byKey = got.map(t => t._1 -> t._4).toMap
    assert(byKey("ood") > byKey("indomain"),
      s"held-out-harder domain must get the larger quota: $got")
  }

  test("bigramSurprisalHeldOut: an empty (or all-null-text) reference " +
      "corpus dies loudly (V = 0 would silently score every candidate " +
      "q = 0, violating the q >= 10 invariant)") {
    val score = Seq((10L, "a b")).toDF("doc_id", "text")
    for (train <- Seq(
        Seq.empty[(Long, String)].toDF("doc_id", "text"),
        Seq((1L, null: String)).toDF("doc_id", "text"))) {
      val e = intercept[Throwable] {
        LanguageModel.bigramSurprisalHeldOut(train, score).collect()
      }
      val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(msgs.contains("reference corpus has no tokens"), msgs)
    }
  }

  test("domainReweight: a domain summing scaled surprisal past int64 " +
      "dies loudly, not by wrapping") {
    val docs = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    val e = intercept[Throwable] {
      // scale chosen so qt·scale (10·scale) exceeds Long.MaxValue
      LanguageModel.domainReweight(docs, "source", budget = 10L,
        scale = Long.MaxValue / 9).collect()
    }
    val msgs = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("widen to decimal"), msgs)
  }
}
