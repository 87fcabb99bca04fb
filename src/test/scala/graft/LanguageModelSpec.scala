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
