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
}
