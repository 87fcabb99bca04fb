package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bigram language-model surprisal scoring — the perplexity-style
  * quality filter (CCNet/Gopher lineage, see PAPERS.md) a curation
  * pipeline runs between the cheap ratio heuristics (q20) and
  * anything model-based: score each document by how PREDICTABLE its
  * token sequence is under a bigram model trained on the corpus
  * itself. Boilerplate scores low (every bigram is common),
  * gibberish and mojibake score high (every bigram is a surprise);
  * both tails are what curators drop or audit.
  *
  * QUANTIZED-LOG CONTRACT ([[Collocations]]' trick, pointed at
  * conditional probability): per-bigram surprisal is
  * `−log₂ P(b|a) = log₂(n(a·)/n(ab))` with `n(a·)` the CONTEXT count
  * (Σ over bigrams starting at `a` — the proper conditional
  * denominator, not the unigram count: the last token of a doc is a
  * unigram occurrence but never a context). A libm `log` would drift
  * across engines, so the score is the floor-log₂ of the EXACT
  * scaled integer ratio `(n(a·)·2¹⁰) div n(ab)`, recovered as
  * `bitlength − 1` — pure integer arithmetic, 10 fractional bits
  * (q = 1024·log₂ would need 38-digit products; 2¹⁰ resolution is
  * plenty to rank docs). `n(a·) ≥ n(ab)` always, so q ≥ 10; subtract
  * 10 for whole bits.
  *
  * TWO SCORING MODES: [[bigramSurprisal]] is SELF-SCORED — the model
  * is trained on the corpus being scored, so every scored bigram has
  * count ≥ 1 and no smoothing is needed. [[bigramSurprisalHeldOut]]
  * is the CCNet deployment shape — train on a reference corpus, score
  * a candidate corpus — which REQUIRES an explicit OOV policy (add-k
  * smoothing here; see its doc). Docs with < 2 tokens have no bigrams
  * and emit no row in either mode.
  *
  * Scale shape: bigram generation is the NARROW in-row zip
  * ([[Collocations]] — no posexplode self-join); the model tables
  * are hash aggregates with map-side combine; scoring joins are
  * vocabulary-keyed equi-joins (bigram table on (a,b), context table
  * on (a) — corpus rows never join row-wise); the readout is one
  * per-doc aggregate. Four shuffles total, all keyed, all partial-
  * aggregated — the q91 TF-IDF shape with a second model join. */
object LanguageModel {

  /** `(doc_id, a, b)` bigram rows — the narrow in-row zip shared by
    * the self-scored and held-out scorers (ONE bigram contract, one
    * place: a tokenizer/zip drift between train and score sides would
    * silently decouple the model from what it scores). */
  private def bigrams(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
    val pairLen = greatest(size(col("toks")) - 1, lit(0))
    toks
      .select(col("doc_id"), explode(zip_with(
        slice(col("toks"), lit(1), pairLen),
        slice(col("toks"), lit(2), pairLen),
        (l, r) => struct(l.as("a"), r.as("b")))).as("bg"))
      .select(col("doc_id"), col("bg.a").as("a"), col("bg.b").as("b"))
  }

  /** `(doc_id, n_bigrams, q_total, q_avg)` per doc with ≥ 1 bigram:
    * `q_total` = Σ floor(log₂(2¹⁰·n(a·)/n(ab))) over the doc's
    * bigrams (order-independent, exactly reproducible), `q_avg` the
    * one raw IEEE division `q_total / n_bigrams` (un-rounded — the
    * q127 rounding stance). */
  def bigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val bg = bigrams(docs, idCol, textCol)
    val nab = bg.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    // context counts derive from the bigram table — vocabulary-sized
    // input, so this aggregate never rescans the corpus
    val ctx = nab.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    // model tables pre-joined on `a` (vocabulary-scale) so the
    // corpus-bigram-scale `bg` crosses ONE exchange (keyed (a, b))
    // instead of two — the previous bg⋈nab⋈ctx shape reshuffled every
    // scored bigram a second time by (a) (r20 optimization). Inner
    // joins on a self-trained model: every bg row has an nab row AND
    // a ctx row, so the fused join is row-identical.
    bg
      .join(nab.join(ctx, Seq("a")), Seq("a", "b"))
      .select(col("doc_id"),
        // loud scale bound (the quantize4 stance): 2¹⁰·n(a·) must
        // stay in int64 — fires at ~9·10¹⁵ context occurrences
        when(col("n_a") <= lit(9000000000000000L),
          (length(bin(expr("(n_a * 1024) div n_ab"))) - 1)
            .cast(LongType))
          .otherwise(raise_error(concat(
            lit("bigramSurprisal: context count "), col("n_a"),
            lit(" overflows the 2^10-scaled ratio — widen to decimal")))
            .cast(LongType)).as("q"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("q")).as("q_total"))
      .select(col("doc_id"), col("n_bigrams"), col("q_total"),
        (col("q_total").cast("double") /
          col("n_bigrams").cast("double")).as("q_avg"))
  }

  /** Held-out bigram surprisal — the CCNet deployment shape (train on
    * a REFERENCE corpus, score a CANDIDATE corpus; see PAPERS.md): the
    * self-scored variant cannot play that role because training on the
    * corpus being filtered lets the filter learn the junk it should be
    * cutting. Scoring a held-out set means unseen bigrams and unseen
    * contexts WILL occur, so the probability needs an explicit OOV
    * policy — add-k (Laplace for k = 1) smoothing, kept integral so
    * the quantized-log contract survives:
    *
    *   P(b|a) = (n(ab) + k) / (n(a·) + k·V)
    *
    * with `V` the train vocabulary size (distinct tokens across the
    * whole train token stream — including 1-token docs, which carry a
    * vocabulary entry but no bigram) and n(ab)/n(a·) = 0 for unseen
    * pairs/contexts. Per-bigram surprisal is the same floor-log₂ of
    * the exact scaled integer ratio as [[bigramSurprisal]]:
    * `q = bitlength((n(a·) + k·V)·2¹⁰ div (n(ab) + k)) − 1`. A fully
    * unseen bigram in an unseen context costs `≈ 10 + log₂(V/k)` bits
    * — the OOV ceiling, finite by construction (no −∞/NaN path
    * exists). `n(a·) + k·V ≥ n(ab) + k` always (n(a·) ≥ n(ab), V ≥ 1),
    * so q ≥ 10 and every doc's total is positive.
    *
    * Output: `(doc_id, n_bigrams, n_oov, q_total, q_avg)` per scored
    * doc with ≥ 1 bigram — `n_oov` counts the doc's bigrams absent
    * from the train model (the decontamination-adjacent readout: a
    * candidate doc with n_oov = 0 against a small reference is
    * suspiciously in-domain), `q_avg` the one raw IEEE division.
    *
    * Scale shape: [[bigramSurprisal]]'s keyed shuffles split across
    * two corpora — model aggregates scan TRAIN once, scoring joins are
    * vocabulary-keyed LEFT equi-joins against model tables (broadcast
    * when the reference is small — the common case), plus one
    * train-token distinct aggregate for V (1 row, crossed in
    * broadcast, never a driver action). Candidate rows are scanned
    * once. */
  def bigramSurprisalHeldOut(train: DataFrame, score: DataFrame,
      addK: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(addK >= 1,
      s"bigramSurprisalHeldOut: addK=$addK must be >= 1 — k = 0 is " +
        "unsmoothed and divides by zero on any unseen context")
    val tbg = bigrams(train, idCol, textCol)
    val nab = tbg.groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"))
    val ctx = nab.groupBy(col("a")).agg(sum(col("n_ab")).as("n_a"))
    // V over the full train TOKEN stream, not the bigram table —
    // 1-token docs contribute vocabulary but no bigram. V = 0 (an
    // empty or all-null-text reference corpus) is guarded LOUDLY: with
    // no vocabulary every smoothed numerator is k·0, every score comes
    // out q = 0 — violating the documented q ≥ 10 invariant and
    // ranking every candidate identically, the exact silent failure a
    // misrouted empty train slice would otherwise produce (the addK = 0
    // require's stance, applied to the data side).
    val voc = train
      .select(TextFunctions.tokens(col(textCol)).as("toks"))
      .filter(col("toks").isNotNull)
      .select(explode(col("toks")).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
      .select(when(col("v") > 0, col("v"))
        .otherwise(raise_error(lit("bigramSurprisalHeldOut: reference " +
          "corpus has no tokens (V = 0) — every candidate would score " +
          "q = 0 and rank identically; route a non-empty train slice"))
          .cast(LongType)).as("v"))
    val num = coalesce(col("n_a"), lit(0L)) + lit(addK.toLong) * col("v")
    val den = coalesce(col("n_ab"), lit(0L)) + lit(addK.toLong)
    bigrams(score, idCol, textCol)
      .join(nab, Seq("a", "b"), "left")
      .join(ctx, Seq("a"), "left")
      .crossJoin(broadcast(voc))
      .select(col("doc_id"),
        col("n_ab").isNull.cast(LongType).as("oov"),
        // the bigramSurprisal int64 bound, on the SMOOTHED context
        // count (n(a·) + k·V must survive the 2¹⁰ scale in int64)
        when(num <= lit(9000000000000000L), num * lit(1024L))
          .otherwise(raise_error(concat(
            lit("bigramSurprisalHeldOut: smoothed context count "),
            num.cast("string"),
            lit(" overflows the 2^10-scaled ratio — widen to decimal")))
            .cast(LongType)).as("__sn"),
        den.as("__den"))
      .withColumn("q",
        (length(bin(expr("__sn div __den"))) - 1).cast(LongType))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("oov")).as("n_oov"),
        sum(col("q")).as("q_total"))
      .select(col("doc_id"), col("n_bigrams"), col("n_oov"),
        col("q_total"),
        (col("q_total").cast("double") /
          col("n_bigrams").cast("double")).as("q_avg"))
  }

  /** The canonical "keep the middle of the perplexity distribution"
    * curation filter (CCNet/Gopher lineage): within each group
    * (language, usually), rank docs by [[bigramSurprisal]]'s `q_avg`
    * and keep the band `(lowPct, highPct]` of the per-group rank
    * distribution — the low tail is boilerplate (every bigram common),
    * the high tail gibberish/mojibake (every bigram a surprise); both
    * are what curators drop. The band edges are EXACT integer rank
    * arithmetic (`rank > floor(lowPct·n/100)` and
    * `rank ≤ floor(highPct·n/100)`, ranks ordered by `(q_avg, doc_id)`
    * — no percentile interpolation to disagree across engines.
    *
    * Docs with < 2 tokens have no surprisal and are NOT ranked (they
    * don't appear — run a length filter first, q20's job). Scale
    * shape: [[bigramSurprisal]]'s keyed shuffles + one doc_id join +
    * one per-group window (group cardinality = languages, each
    * partition corpus-sized/|groups| — rank-banding is a sort per
    * group, the honest price of exact rank semantics; swap in
    * [[Histogram]] estimates when groups stop fitting a sort). */
  def surprisalBandFilter(docs: DataFrame, groupCol: String = "lang",
      lowPct: Int = 5, highPct: Int = 95,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    rankBand(bigramSurprisal(docs, idCol, textCol), docs, groupCol,
      lowPct, highPct, idCol)

  /** [[surprisalBandFilter]] scored by the HELD-OUT model instead of
    * the self-scored one — the full CCNet deployment shape: the band
    * edges come from how the REFERENCE corpus's LM ranks the
    * candidates, so corpus junk cannot shape the model that filters
    * it ([[bigramSurprisalHeldOut]]'s argument, carried through to
    * the selection step). Same exact integer band arithmetic; docs
    * with < 2 tokens are not ranked (run a length filter first). */
  def surprisalBandFilterHeldOut(train: DataFrame, docs: DataFrame,
      groupCol: String = "lang", lowPct: Int = 5, highPct: Int = 95,
      addK: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    rankBand(bigramSurprisalHeldOut(train, docs, addK, idCol, textCol),
      docs, groupCol, lowPct, highPct, idCol)

  /** The band selection over a PRECOMPUTED per-doc score frame
    * ([[bigramSurprisal]] / [[bigramSurprisalHeldOut]] output — needs
    * `doc_id`, `q_avg`) — the share-the-scoring entry point: a caller
    * that consumes the SAME scores twice (band the corpus, then
    * reweight the survivors — [[graft.TrainingPipeline.prepare]]'s
    * held-out q151 shape) scores ONCE, pins the per-doc frame, and
    * feeds it here and to [[domainReweightFromScores]] instead of
    * re-training the model and re-scoring the corpus per stage.
    * Selection semantics are [[surprisalBandFilter]]'s verbatim (the
    * shared [[rankBand]] tail). */
  def bandFromScores(scored: DataFrame, docs: DataFrame,
      groupCol: String = "lang", lowPct: Int = 5, highPct: Int = 95,
      idCol: String = "doc_id"): DataFrame =
    rankBand(scored, docs, groupCol, lowPct, highPct, idCol)

  /** The per-group rank-band tail shared by the self-scored and
    * held-out band filters — ONE edge-arithmetic contract (`r >
    * floor(low·n/100)`, `r ≤ floor(high·n/100)`, rank order
    * `(q_avg, doc_id)`), so the two scoring modes cannot drift on
    * selection semantics. `scored` needs (doc_id, q_avg). */
  private def rankBand(scored: DataFrame, docs: DataFrame,
      groupCol: String, lowPct: Int, highPct: Int,
      idCol: String): DataFrame = {
    require(0 <= lowPct && lowPct < highPct && highPct <= 100,
      s"surprisalBandFilter: band ($lowPct, $highPct] must satisfy " +
        "0 <= low < high <= 100")
    import org.apache.spark.sql.expressions.Window
    val grouped = scored.select(col("doc_id"), col("q_avg"))
      .join(docs.select(col(idCol).as("doc_id"),
        col(groupCol).as("grp")), "doc_id")
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("q_avg"), col("doc_id"))
    val n = Window.partitionBy(col("grp"))
    grouped
      .withColumn("__r", row_number().over(w).cast(LongType))
      .withColumn("__n", count(lit(1)).over(n))
      .filter(col("__r") > expr(s"(__n * $lowPct) div 100") &&
        col("__r") <= expr(s"(__n * $highPct) div 100"))
      .select(col("doc_id"), col("grp").as(groupCol), col("q_avg"))
  }

  /** Surprisal-driven domain reweighting (the DoReMi-lineage mixture
    * step, see PAPERS.md): give each domain a sampling quota
    * proportional to how HARD its text is for the corpus-trained
    * bigram LM — the harder a domain scores, the more of the training
    * budget it receives. The whole chain stays in exact integer
    * arithmetic: per-domain weight is the `scale`-scaled mean
    * surprisal `(Σ q_total · scale) div (Σ n_bigrams)` (floor — the
    * quantized-log contract of [[bigramSurprisal]] carried through),
    * and the budget split is [[Mixture.apportion]]'s largest-remainder
    * method, so quotas sum to `budget` EXACTLY and the full
    * composition replays bit-for-bit in SQL.
    *
    * Contract: docs with < 2 tokens carry no bigrams, so they join
    * into no domain's weight; a domain whose every doc is that short
    * never appears (it has no measurable difficulty). `q ≥ 10` per
    * bigram means every appearing domain has positive weight —
    * apportion's zero-total guard can only fire on an empty corpus.
    *
    * Scale shape: [[bigramSurprisal]]'s four keyed shuffles, then one
    * doc_id equi-join against a two-column projection of the corpus,
    * one domain-keyed aggregate (domain cardinality ≪ corpus), and
    * apportion's driver-folded remainder ranking over the tiny
    * per-domain frame. Nothing downstream of the per-doc score ever
    * rescans the corpus.
    *
    * EAGER: calling this EXECUTES the per-doc scoring subtree (the
    * domain-weight rows become a driver-local relation so apportion's
    * multi-action contract replays a literal scan, not the corpus —
    * and nothing stays pinned in the CacheManager, the r16 leak).
    * Build-plan-only callers (explain tooling, plan sweeps) pay one
    * full scoring execution at construction time — budget for it. */
  def domainReweight(docs: DataFrame, groupCol: String = "source",
      budget: Long = 100000L, scale: Long = 10000L,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    reweightFrom(bigramSurprisal(docs, idCol, textCol), docs, groupCol,
      budget, scale, idCol)

  /** [[domainReweight]] driven by the HELD-OUT model — the DoReMi
    * deployment shape proper: domain difficulty is how hard each
    * domain's text is for a model trained on the REFERENCE corpus,
    * not on the mixture being weighted (self-scored difficulty is
    * biased toward domains whose text dominates the training counts).
    * Same integer weight/apportion contract through the shared tail —
    * including its EAGER execution at construction time (see
    * [[domainReweight]]). */
  def domainReweightHeldOut(train: DataFrame, docs: DataFrame,
      groupCol: String = "source", budget: Long = 100000L,
      scale: Long = 10000L, addK: Int = 1, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    reweightFrom(bigramSurprisalHeldOut(train, docs, addK, idCol,
      textCol), docs, groupCol, budget, scale, idCol)

  /** The reweighter over a PRECOMPUTED per-doc score frame (needs
    * `doc_id`, `n_bigrams`, `q_total`) — [[bandFromScores]]' sibling:
    * per-doc scores are row-independent, so a frame scored over a
    * SUPERSET corpus restricted here by the inner `doc_id` join is
    * bit-identical to scoring `docs` directly (the band→reweight
    * composition scores the winnow-clean corpus once and reweights
    * the band survivors from the same frame). Same EAGER weight fold
    * as [[domainReweight]] (see its doc). */
  def domainReweightFromScores(perDoc: DataFrame, docs: DataFrame,
      groupCol: String = "source", budget: Long = 100000L,
      scale: Long = 10000L, idCol: String = "doc_id"): DataFrame =
    reweightFrom(perDoc, docs, groupCol, budget, scale, idCol)

  /** The weight-and-apportion tail shared by the self-scored and
    * held-out reweighters (ONE integer contract — the [[rankBand]]
    * argument at the mixture level). `perDoc` needs
    * (doc_id, n_bigrams, q_total). */
  private def reweightFrom(perDoc: DataFrame, docs: DataFrame,
      groupCol: String, budget: Long, scale: Long,
      idCol: String): DataFrame = {
    require(scale > 0L, s"domainReweight: scale=$scale must be > 0")
    val grouped = perDoc
      .join(docs.select(col(idCol).as("doc_id"),
        col(groupCol).as("key")), "doc_id")
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("q_total")).as("qt"), sum(col("n_bigrams")).as("nb"))
    val wCol =
      // loud scale bound (the quantize4 stance): qt·scale must stay in
      // int64 — at scale 10⁴ that is ~9·10¹⁴ summed surprisal bits per
      // domain (~10¹³ bigrams), the point to widen to decimal
      when(col("qt") <= lit(Long.MaxValue / scale),
        expr(s"(qt * ${scale}L) div nb"))
        .otherwise(raise_error(concat(
          lit("domainReweight: domain "), col("key"),
          lit(s" sums $scale-scaled surprisal past int64 — widen to " +
            "decimal or lower scale"))).cast(LongType))
    // weights is keys-scale (one row per domain) but its LINEAGE is
    // the whole per-doc scoring subtree (bigram explosion over the
    // candidate corpus + model joins). Apportion's documented contract
    // is THREE actions over its input (bounds pass, shard-stat fold,
    // the returned plan) and pipeline callers broadcast the quota
    // frame in a fourth — unpinned, the scoring subtree re-executed
    // per action (measured: q151's composed reweight stage cost
    // 7.9 s vs 4.1 s for the standalone reweight). Materializing the
    // #domains rows as a LOCAL relation (the same driver-bounded class
    // as apportion's own shard fold, and no more than the broadcast
    // downstream already ships) executes the subtree exactly once and
    // leaves NOTHING persisted — a session-lifetime cache pin here
    // leaked one entry per reweight call (r16 ADVICE), and every later
    // action now reads a literal scan instead of a cached subtree.
    val weightPlan = grouped.select(col("key"), col("n_docs"),
      wCol.cast(LongType).as("w"))
    val weights = perDoc.sparkSession.createDataFrame(
      java.util.Arrays.asList(weightPlan.collect(): _*),
      weightPlan.schema)
    Mixture.apportion(weights.select(col("key"), col("w")),
        "key", "w", budget)
      .join(weights.select(col("key"), col("n_docs")), "key")
      .select(col("key").as(groupCol), col("n_docs"), col("w"),
        col("quota"))
  }
}
