package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

/** [[operators.Retrieval.bm25TopK]]: hand-checked integer scores,
  * ranking semantics, edge cases, and the bounded no-window plan. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def q(rows: (Long, String)*) = rows.toDF("query_id", "term")

  test("scores match the quantized formulas computed by hand") {
    // corpus: 3 docs, dl = 4/4/2 → N=3, Σdl=10, A = 1000//3 = 333
    val docs = Seq(
      (1L, "apple banana cherry date"),
      (2L, "apple apple banana fig"),
      (3L, "grape fig")).toDF("doc_id", "text")
    val out = operators.Retrieval.bm25TopK(docs, q(7L -> "apple"), k = 10)
      .orderBy($"rank").collect()
    val a = 333L
    def tfq(tf: Long, dl: Long): Long =
      (22 * tf * a * 1000) / (10 * tf * a + 3 * a + 9 * dl * 100)
    def idfq(df: Long, n: Long): Long =
      java.lang.Long.toBinaryString(
        ((2 * n - 2 * df + 1) * 1048576L) / (2 * df + 1)).length.toLong
    // apple: df=2, doc2 tf=2 dl=4, doc1 tf=1 dl=4
    val exp = Seq(
      (2L, tfq(2, 4) * idfq(2, 3)),
      (1L, tfq(1, 4) * idfq(2, 3)))
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score")))
      .toSeq == exp)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L))
  }

  test("more matched terms beat fewer; rarer terms beat common; doc_id breaks ties") {
    val docs = Seq(
      (1L, "alpha beta gamma pad pad pad"),
      (2L, "alpha beta delta pad pad pad"),
      (3L, "alpha pad pad pad pad pad"),
      (4L, "pad pad pad pad pad pad"),
      (5L, "alpha beta gamma pad pad pad")) // identical stats to doc 1
      .toDF("doc_id", "text")
    val out = operators.Retrieval.bm25TopK(
        docs, q(1L -> "alpha", 1L -> "beta", 1L -> "gamma"), k = 10)
      .orderBy($"rank")
      .select($"doc_id").as[Long].collect().toSeq
    // docs 1 and 5 match all three terms (tie → id order), 2 matches
    // two, 3 one, 4 none (absent from results)
    assert(out == Seq(1L, 5L, 2L, 3L))
  }

  test("k bounds the result; blank docs never score; duplicate query terms dedup") {
    val docs = Seq(
      (1L, "x y"), (2L, "x z"), (3L, "x w"), (4L, "   "), (5L, ""))
      .toDF("doc_id", "text")
    val out = operators.Retrieval.bm25TopK(
      docs, q(1L -> "x", 1L -> "x"), k = 2).collect()
    assert(out.length == 2)
    assert(out.map(_.getAs[Long]("doc_id")).toSet.subsetOf(Set(1L, 2L, 3L)))
    // dedup of the repeated term: score equals the single-term score
    val single = operators.Retrieval.bm25TopK(
      docs, q(1L -> "x"), k = 2).collect()
    assert(out.map(_.getAs[Long]("score")).toSeq ==
      single.map(_.getAs[Long]("score")).toSeq)
  }

  test("empty corpus and bad k fail loudly") {
    val blank = Seq((1L, " ")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      operators.Retrieval.bm25TopK(blank, q(1L -> "x"), k = 1)
    }
    intercept[IllegalArgumentException] {
      operators.Retrieval.bm25TopK(
        Seq((1L, "x")).toDF("doc_id", "text"), q(1L -> "x"), k = 0)
    }
  }

  test("q88 plan: no WindowExec; bounded pair aggregate in Partial mode") {
    // a stopword query's candidate set is the whole corpus — top-k
    // must come from the bounded aggregate (≤ k pairs per map
    // partition), never a row_number sort of the hottest query's rows
    val plan = SparkEntry.queries("q88_bm25_topk")(
      spark, "/root/testdata/sf0.001").queryExecution.sparkPlan
    val windows = plan.collectWithSubqueries { case w: WindowExec => w.nodeName }
    assert(windows.isEmpty, s"q88 must not plan a window: $windows")
    val partial = plan.collectWithSubqueries {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
        if a.aggregateExpressions.exists(e =>
          e.aggregateFunction.prettyName == "bounded_max_long_pairs" &&
            e.mode == org.apache.spark.sql.catalyst.expressions.aggregate.Partial) =>
        a.nodeName
    }
    assert(partial.nonEmpty,
      s"expected bounded_max_long_pairs in Partial mode:\n$plan")
  }

  test("phraseSearch: contiguous matches only, 1-based positions, " +
      "overlapping repeated-term phrases, misses excluded") {
    val docs = Seq(
      (1L, "a b c a b"),       // "a b" at 1 and 4
      (2L, "b a c"),           // tokens present, never contiguous
      (3L, "x y z"),           // no phrase tokens at all
      (4L, "c a b c")          // "a b" at 2
    ).toDF("doc_id", "text")
    val got = operators.Retrieval.phraseSearch(docs, Seq("a", "b"))
      .orderBy($"doc_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 1L), (4L, 1L, 2L)), got.toString)
    // overlapping occurrences of a repeated-term phrase: "a a a" has
    // "a a" at positions 1 AND 2
    val rep = operators.Retrieval.phraseSearch(
        Seq((9L, "a a a")).toDF("doc_id", "text"), Seq("a", "a"))
      .as[(Long, Long, Long)].collect().toSeq
    assert(rep === Seq((9L, 2L, 1L)), rep.toString)
    // single-term phrase = plain token occurrences
    val one = operators.Retrieval.phraseSearch(docs, Seq("c"))
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(one === Seq((1L, 1L, 3L), (2L, 1L, 3L), (4L, 2L, 1L)))
    // null text is excluded, not an error
    val withNull = Seq((5L, null: String), (6L, "a b"))
      .toDF("doc_id", "text")
    assert(operators.Retrieval.phraseSearch(withNull, Seq("a", "b"))
      .as[(Long, Long, Long)].collect().toSeq === Seq((6L, 1L, 1L)))
    intercept[IllegalArgumentException] {
      operators.Retrieval.phraseSearch(docs, Seq.empty)
    }
    intercept[IllegalArgumentException] {
      operators.Retrieval.phraseSearch(docs, Seq("a b"))
    }
  }

  test("phraseSearch plan: one scan, phrase-vocabulary filter below " +
      "the single shuffle, no join anywhere") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = operators.Retrieval.phraseSearch(docs, Seq("a", "b"))
      .queryExecution.sparkPlan
    val joins = plan.collectWithSubqueries {
      case j if j.nodeName.toLowerCase.contains("join") => j.nodeName
    }
    assert(joins.isEmpty, s"phrase plan must not join: $joins")
    val exchanges = plan.collectWithSubqueries {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.nodeName
    }
    assert(exchanges.size <= 1,
      s"expected at most one corpus shuffle, got $exchanges")
  }
}
