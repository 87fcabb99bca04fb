package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.BoundedMaxLongPairs.boundedMaxLongPairs

/** Lexical retrieval: inverted-index BM25 scoring with top-k per
  * query — the exact-match twin of the ANN family (q24/q55/q66 search
  * by embedding geometry; this searches by term statistics).
  *
  * QUANTIZED-BM25 contract: textbook BM25 needs `ln` — and `ln` is not
  * IEEE-determined, so scores would drift between engines/libms and a
  * hash-exact oracle is impossible. This operator quantizes both
  * factors into EXACT integer arithmetic (every engine with 64-bit
  * integers reproduces the score bit-for-bit):
  *
  *  - tf saturation (k₁ = 1.2, b = 0.75, ×1000): with `A = (100·Σdl)
  *    div N` (the ×100 average doc length), `tfq = (22·tf·A·1000) div
  *    (10·tf·A + 3·A + 9·dl·100)` — algebraically `1000·tf·(k₁+1) /
  *    (tf + k₁·(1−b+b·dl/avgdl))` with every rational cleared.
  *  - idf, log2-quantized: `idfq = length(bin(R))` with `R = ((2N −
  *    2df + 1)·2²⁰) div (2df + 1)` — the integer bit-length IS
  *    ⌊log₂R⌋+1, an exact, monotone, engine-portable stand-in for the
  *    Robertson–Spärck-Jones idf (quantized to factor-of-2 bands; the
  *    documented divergence from `ln`).
  *
  * Scale shape: two corpus passes — one tiny stats aggregate for the
  * plan-time constants (N, avgdl, the overflow envelope), one scoring
  * pass where doc length rides the exploded token rows (no separate
  * dl branch, no corpus-sized dl join). Term frequencies are computed
  * only for the query vocabulary (broadcast semi-join BEFORE the tf
  * aggregation — the corpus never aggregates its full vocabulary);
  * document frequencies derive from that tf table (per-term row
  * count), so they too are query-vocabulary-sized and broadcast back.
  * The only corpus-sized shuffles are the tf groupBy and the
  * per-(query, doc) score sum. Top-k selection is the bounded
  * partial-aggregatable kernel ([[graft.functions.BoundedMaxLongPairs]])
  * — a stopword query whose candidate set is the whole corpus still
  * ships ≤ k pairs per map partition, no row_number window anywhere.
  */
object Retrieval {

  /** BM25 top-k: `(query_id, rank, doc_id, score)` — rank 1..k per
    * query by `(score DESC, doc_id ASC)`, score the exact integer
    * quantized-BM25 sum over matched query terms. `queries` is one row
    * per (query_id, term); duplicate terms in a query are deduped
    * (documented divergence from qtf-weighted BM25). Blank docs are
    * excluded from the corpus and from N/avgdl. */
  def bm25TopK(docs: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text",
      queryIdCol: String = "query_id", termCol: String = "term"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
    // one tiny action for the two corpus constants the integer formulas
    // need (N, A) plus the max doc length the overflow guard needs —
    // 1 row collected, one corpus pass (column-pruned to the token count)
    val stats = base
      .agg(count(lit(1)).as("n"), sum(size(col("__toks"))).as("sdl"),
        max(size(col("__toks"))).as("mdl"))
      .head()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK: empty corpus (all docs blank)")
    val a = 100L * stats.getLong(1) / n
    val maxDl = stats.getAs[Number](2).longValue()
    // 22·tf·A·1000 must stay inside a long: tf ≤ maxDl, so gate the
    // product loudly instead of dying in an opaque ANSI overflow. The
    // comparison is in DIVISION form — the product form `maxDl * a`
    // can itself wrap past 2^63 and sail under the bound in exactly
    // the regime the guard exists to reject (a ≥ 100 always: every
    // non-blank doc has ≥ 1 token)
    require(maxDl <= Long.MaxValue / 22000L / a,
      s"bm25TopK: maxDl=$maxDl × A=$a would overflow the quantized tf " +
        "numerator — corpus doc lengths exceed the integer-exact envelope")
    require(n < (1L << 41),
      s"bm25TopK: N=$n docs overflows the quantized idf numerator")

    val qterms = queries
      .select(col(queryIdCol).cast("long").as("query_id"),
        col(termCol).as("term"))
      .distinct()
    val qvocab = qterms.select(col("term")).distinct()
    // ONE scoring-side tokenize: dl rides the exploded rows (constant
    // per doc) and folds into the tf aggregate — carrying it as a
    // separate `base` branch would re-tokenize the corpus AND shuffle
    // a corpus-sized dl table into a join that tf (already
    // query-vocabulary-restricted) doesn't need
    val toks = base.select(col("doc_id"),
      size(col("__toks")).cast("long").as("dl"),
      explode(col("__toks")).as("term"))
    // tf restricted to the query vocabulary BEFORE aggregating: the
    // corpus's full vocabulary never shuffles
    val tf = toks.join(broadcast(qvocab), Seq("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), max(col("dl")).as("dl"))
    // per-term doc frequency — one row per query-vocabulary term
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val cand = tf
      .join(broadcast(dfreq), Seq("term"))
      .join(broadcast(qterms), Seq("term"))
      .withColumn("tfq", expr(
        s"(22L * tf * ${a}L * 1000L) div " +
          s"(10L * tf * ${a}L + 3L * ${a}L + 9L * dl * 100L)"))
      .withColumn("idfq", expr(
        s"length(bin(((2L * ${n}L - 2L * df + 1L) * 1048576L) div " +
          "(2L * df + 1L)))").cast("long"))
    val scores = cand
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("tfq") * col("idfq")).as("score"))
    scores
      .groupBy(col("query_id"))
      .agg(boundedMaxLongPairs(col("score"), col("doc_id"), k).as("__ps"))
      .select(col("query_id"), posexplode(col("__ps")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score"))
  }

  /** TF-IDF keyword extraction: the top-`k` most characteristic terms
    * per document — `(doc_id, rank, term, score)`, rank 1..k by
    * `(score DESC, term-hash ASC)`.
    *
    * The corpus-wide inversion of [[bm25TopK]]: BM25 scores docs for a
    * few queries (tf restricted to the query vocabulary before any
    * shuffle); this tags EVERY doc with its top terms, so the full
    * vocabulary aggregates — tf by (doc, term), df by term — and the
    * idf reuses the same log2-quantized integer band
    * (`length(bin(((2N−2df+1)·2²⁰) div (2df+1)))`, the
    * Robertson–Spärck-Jones form) so the two operators score in ONE
    * shared integer domain. `score = tf · idfq` — exact 64-bit
    * arithmetic end to end, no `ln`, hash-replayable in any engine.
    *
    * Scale shape: tf and df are plain hash aggregates with map-side
    * combine (vocabulary shuffles once, as counts — never as raw
    * token rows twice); per-doc selection is the bounded
    * partial-aggregatable top-k kernel, NOT a row_number window over
    * (doc, term) — a boilerplate-heavy doc with 10⁶ distinct terms
    * ships ≤ k pairs per map partition. Term identity crosses the
    * bounded kernel as the portable 48-bit md5 hash
    * ([[Sampling.portableHash48]]) and the string is joined back from
    * a term_id-UNIQUE table afterwards; a 48-bit collision between two
    * distinct vocabulary terms (birthday bound ~50% at ~17M distinct
    * tokens — realistic at web scale) FAILS LOUDLY via the collision
    * gate on the join-back table rather than fanning ranks out or
    * attaching the wrong term.
    */
  def tfIdfTopTerms(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val base = docs.filter(trim(col(textCol)) =!= "")
      .select(col(idCol).as("doc_id"),
        split(trim(col(textCol)), "\\s+").as("__toks"))
    val n = base.count() // 1-row driver action for the idf constant
    require(n > 0, "tfIdfTopTerms: empty corpus (all docs blank)")
    require(n < (1L << 41),
      s"tfIdfTopTerms: N=$n docs overflows the quantized idf numerator")
    val tf = base
      .select(col("doc_id"), explode(col("__toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .withColumn("term_id", Sampling.portableHash48(col("term")))
    val scored = tf.join(dfreq, Seq("term"))
      .withColumn("idfq", expr(
        s"length(bin(((2L * ${n}L - 2L * df + 1L) * 1048576L) div " +
          "(2L * df + 1L)))").cast("long"))
      .withColumn("score", col("tf") * col("idfq"))
    // join-back table keyed UNIQUELY on term_id, with a loud collision
    // gate: a 48-bit collision between two DISTINCT terms would
    // otherwise fan every affected (doc_id, rank) row out into
    // duplicates with the wrong term attached — at web scale the
    // birthday bound makes that a real event (~50% at 17M distinct
    // tokens), so it must kill the job, not corrupt the output. One
    // vocab-sized aggregate; min≠max of the colliding strings is the
    // detector (raise_error is codegen'd, no UDF)
    val byId = dfreq
      .groupBy(col("term_id"))
      .agg(min(col("term")).as("term"), max(col("term")).as("__t2"))
      .select(col("term_id"),
        when(col("term") =!= col("__t2"),
          raise_error(concat(lit("tfIdfTopTerms: 48-bit term-hash " +
            "collision between '"), col("term"), lit("' and '"),
            col("__t2"), lit("' — widen the hash domain or pre-dedup"))))
          .otherwise(col("term")).as("term"))
    scored
      .groupBy(col("doc_id"))
      .agg(boundedMaxLongPairs(col("score"), col("term_id"), k).as("__ps"))
      .select(col("doc_id"), posexplode(col("__ps")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("term_id"), col("col.score").as("score"))
      .join(byId, Seq("term_id"))
      .select(col("doc_id"), col("rank"), col("term"), col("score"))
  }

  /** Positional phrase search — "which docs contain these tokens
    * CONTIGUOUSLY, and where": the positional completion of the
    * retrieval family (BM25/TF-IDF are bag-of-words; a phrase query
    * needs token POSITIONS). Returns `(doc_id, hits, first_pos)` for
    * docs with ≥ 1 occurrence; positions are 1-based over the
    * repo-wide whitespace tokenizer ([[graft.functions.TextFunctions
    * .tokens]] contract).
    *
    * Scale shape — ONE corpus scan, ONE corpus-sized shuffle, ZERO
    * self-joins: the naive positional-index plan joins the postings
    * list to itself L−1 times (L = phrase length), re-scanning or
    * re-shuffling the corpus each time; here postings are pruned to
    * the phrase vocabulary IMMEDIATELY after the explode (the filter
    * runs before any exchange, so the shuffle carries only
    * phrase-term rows — for realistic phrases a vanishing fraction
    * of the corpus), then ONE per-doc aggregate collects each term's
    * candidate anchor positions (`pos − i` for the term at phrase
    * offset i) and the contiguous-match set is the pure array
    * intersection of those anchor sets — codegen'd `array_intersect`
    * chain, no join at all. Per-doc state is bounded by the doc's
    * phrase-term occurrence count (≤ doc length — the same per-doc
    * bound every chunking/packing op already carries).
    *
    * Anchor sets are duplicate-free by construction (a token occupies
    * exactly one position), so `array_intersect`'s set semantics are
    * exact; repeated phrase terms ("w w") work because each offset
    * filters the SAME postings rows into its own shifted set. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one term")
    require(phrase.forall(t => t.nonEmpty && !t.exists(_.isWhitespace)),
      s"phrase terms must be non-empty single tokens, got $phrase")
    val postings = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")))
      .filter(col("col").isin(phrase.distinct.map(lit): _*))
      .select(col("doc_id"), (col("pos") + 1).as("pos"), col("col").as("tok"))
    val anchorSets = phrase.zipWithIndex.map { case (t, i) =>
      sort_array(collect_list(when(col("tok") === t, col("pos") - i)))
        .as(s"__a$i")
    }
    val perDoc = postings.groupBy(col("doc_id")).agg(
      anchorSets.head, anchorSets.tail: _*)
    val matched = phrase.indices.map(i => col(s"__a$i"))
      .reduce((a, b) => array_intersect(a, b))
    perDoc
      .select(col("doc_id"), matched.as("__m"))
      .filter(size(col("__m")) > 0)
      .select(col("doc_id"), size(col("__m")).cast("long").as("hits"),
        array_min(col("__m")).cast("long").as("first_pos"))
  }
}
