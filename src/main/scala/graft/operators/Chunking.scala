package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Context-window chunking — split documents into overlapping
  * token-window chunks (the standard LLM pre-training / RAG prep step:
  * a doc longer than the model context becomes `ceil((n−C)/S)+1`
  * windows of C tokens advancing by stride S, so every token appears
  * in ≥1 chunk and consecutive chunks share C−S tokens of context).
  *
  * Scale shape: a purely NARROW op — tokenize, compute the window
  * count per row, explode. No shuffle, no state, no skew surface;
  * output volume is bounded by `⌈C/S⌉ × input tokens` (the deliberate
  * overlap factor — `require`d sane so a stride typo can't turn
  * 100 TB into a multiple of itself unnoticed). Memory per row is one
  * doc's token array — the same bound as every other text op here.
  */
object Chunking {

  /** Overlapping token-window chunks of `textCol`:
    * `(idCol, chunk_idx, chunk_text, n_tokens)`, one row per window.
    * Tokens are whitespace-split (the repo-wide tokenizer contract);
    * chunk i covers tokens `[i·stride, i·stride + chunkTokens)`; the
    * final chunk may be shorter (never empty). Blank docs emit ZERO
    * chunks — filter or coalesce upstream if they must survive. */
  def chunkByTokens(docs: DataFrame, chunkTokens: Int, stride: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkTokens >= 1, s"chunkTokens must be >= 1, got $chunkTokens")
    require(stride >= 1 && stride <= chunkTokens,
      s"stride must be in [1, chunkTokens=$chunkTokens], got $stride " +
        "(stride > chunk drops tokens; stride < 1 never advances)")
    val toks = split(trim(col(textCol)), "\\s+")
    // token counts are ≪ 2^52, so the double ceil is exact
    val nChunks = when(col("__nt") <= chunkTokens, lit(1))
      .otherwise(lit(1) +
        ceil((col("__nt") - lit(chunkTokens)).cast("double") / stride)
          .cast("int"))
    docs
      .withColumn("__toks", toks)
      .withColumn("__nt",
        when(trim(col(textCol)) === "", lit(0)).otherwise(size(col("__toks"))))
      .filter(col("__nt") > 0)
      .withColumn("__i", explode(sequence(lit(0), nChunks - 1)))
      .select(
        col(idCol),
        col("__i").cast("long").as("chunk_idx"),
        array_join(
          slice(col("__toks"), col("__i") * stride + 1, lit(chunkTokens)),
          " ").as("chunk_text"),
        size(slice(col("__toks"), col("__i") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_tokens"))
  }
}
