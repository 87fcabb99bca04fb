package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Dedup, Similarity, SketchStore}
import graft.sources.Multimodal
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Training-data pipeline operators over the `documents` and
  * `embeddings` tables: text analysis, fingerprinting, dedup
  * (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding), and
  * similarity search. Oracle-backed where DuckDB can express the same
  * computation; hash-based ops (xxhash64 signatures) are rows-only
  * checked by the driver and exactly asserted in ScalaTest instead.
  */
object TrainingData {

  private val stopList = "('the','a','of','and','to','in','is')"

  /** Token counting (whitespace tokenizer) aggregated per language. */
  def q19TokenStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("n_tokens", TextFunctions.tokenCount($"text"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").as("sum_tokens"),
        max($"n_tokens").cast("long").as("max_tokens"))
      .orderBy($"lang")
  }

  val q19Sql: String =
    """SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
      |  MAX(n_tokens) AS max_tokens
      |FROM (SELECT lang, len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |      FROM documents)
      |GROUP BY lang ORDER BY lang""".stripMargin

  /** Per-document quality metrics (length/stopword/uniq ratios —
    * int/int double divisions, deterministic across engines). */
  def q20TextQuality(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextFunctions.tokens($"text")
    val nTok = size(toks)
    Tables.documents(s, dir).select(
      $"doc_id",
      length($"text").cast("long").as("char_len"),
      nTok.cast("long").as("n_tokens"),
      size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast("long").as("stop_cnt"),
      size(array_distinct(toks)).cast("long").as("uniq_cnt"),
      (size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in", "is")))
        .cast(DoubleType) / nTok.cast(DoubleType)).as("stop_ratio"),
      (size(array_distinct(toks)).cast(DoubleType) / nTok.cast(DoubleType))
        .as("uniq_ratio"))
      .orderBy($"doc_id")
  }

  val q20Sql: String =
    s"""SELECT doc_id, length(text) AS char_len, len(toks) AS n_tokens,
       |  len(list_filter(toks, x -> x IN $stopList)) AS stop_cnt,
       |  len(list_distinct(toks)) AS uniq_cnt,
       |  CAST(len(list_filter(toks, x -> x IN $stopList)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS stop_ratio,
       |  CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS uniq_ratio
       |FROM (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS toks
       |      FROM documents)
       |ORDER BY doc_id""".stripMargin

  /** Language-ID heuristic (stopword-profile argmax) vs the labeled
    * lang column — the confusion-matrix shape of a langid evaluation. */
  def q21LangPredict(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("predicted", TextFunctions.langIdHeuristic($"text"))
      .groupBy($"lang", $"predicted")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"predicted")
  }

  val q21Sql: String = {
    val scores = TextFunctions.langProfiles.map { case (lang, stops) =>
      lang -> s"len(list_filter(toks, x -> x IN (${stops.map("'" + _ + "'").mkString(",")})))"
    }
    val maxExpr = s"greatest(${scores.map(_._2).mkString(", ")})"
    val caseExpr = scores.map { case (lang, e) =>
      s"WHEN $e = m AND $e > 0 THEN '$lang'"
    }.mkString(" ")
    s"""SELECT lang, predicted, COUNT(*) AS n FROM (
       |  SELECT lang, CASE $caseExpr ELSE 'und' END AS predicted FROM (
       |    SELECT lang, toks, $maxExpr AS m FROM (
       |      SELECT lang, string_split_regex(trim(text), '\\s+') AS toks
       |      FROM documents)))
       |GROUP BY lang, predicted ORDER BY lang, predicted""".stripMargin
  }

  /** Canonical fingerprint (md5 of normalized text) per document. */
  def q22Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.fingerprint($"text").as("fp"))
      .orderBy($"doc_id")
  }

  val q22Sql: String =
    """SELECT doc_id, md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Exact dedup accounting per source: total vs distinct fingerprints. */
  def q23ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("fp", TextFunctions.fingerprint($"text"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct($"fp").as("n_distinct"))
      .orderBy($"source")
  }

  val q23Sql: String =
    """SELECT source, COUNT(*) AS n_docs,
      |  COUNT(DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) AS n_distinct
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  /** Brute-force exact cosine top-5 for the first 10 vectors as the
    * query set (broadcast), corpus = whole table. */
  def q24AnnTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    Similarity.bruteForceTopK(emb.filter($"vec_id" < 10), emb, 5)
      .orderBy($"q_id", $"rank")
  }

  // the `fin` CTE mirrors the operator's finite-norm exclusion
  // (zero-norm/NaN vectors score cosine NaN and would ride Spark's
  // NaN-is-largest ordering to rank 1): the synthetic embeddings are
  // all finite, so the filter is a no-op here, but operator and
  // oracle must encode the SAME contract or a degenerate input would
  // diff them (the exclusion is also unit-pinned in TrainingDataSpec
  // with deliberately degenerate vectors)
  val q24Sql: String =
    """WITH fin AS (
      |  SELECT vec_id, embedding FROM (
      |    SELECT vec_id, embedding,
      |      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
      |    FROM embeddings
      |    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
      |  WHERE nrm > 0 AND isfinite(nrm))
      |SELECT q_id, rank, n_id, score FROM (
      |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
      |    round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
      |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
      |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) AS score,
      |    row_number() OVER (PARTITION BY q.vec_id ORDER BY round(list_dot_product(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) /
      |      (sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])) *
      |       sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))), 4) DESC, c.vec_id ASC) AS rank
      |  FROM (SELECT * FROM fin WHERE vec_id < 10) q
      |  JOIN fin c ON q.vec_id <> c.vec_id
      |) WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** N-gram Jaccard near-dup pairs blocked on a 40-char text prefix
    * (the planted near-dups share long prefixes; the blocking key is
    * the scale lever — swap for MinHash when prefixes can't block). */
  def q25NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), 0.3,
        t => substring(t, 1, 40))
      .orderBy($"id_a", $"id_b")
  }

  val q25Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, substr(text, 1, 40) AS blk,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 1)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |  CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) AS jaccard
      |FROM sh a JOIN sh b ON a.blk = b.blk AND a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |      CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** Multimodal plumbing: binary media column → batched "decode" →
    * typed metadata. Oracle covers the SQL-derivable fields
    * (byte_len, format); the stub's hash-derived width/height are
    * asserted in ScalaTest. */
  def q26MultimodalMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val media = Multimodal.mediaFromText(Tables.documents(s, dir))
    Multimodal.withMediaMeta(media)
      .select($"doc_id",
        $"media_meta.byte_len".cast("long").as("byte_len"),
        $"media_meta.format".as("format"))
      .orderBy($"doc_id")
  }

  val q26Sql: String =
    """SELECT doc_id, octet_length(encode(text)) AS byte_len,
      |  CASE WHEN octet_length(encode(text)) % 2 = 0 THEN 'img' ELSE 'vid' END AS format
      |FROM documents ORDER BY doc_id""".stripMargin

  /** MinHash+LSH near-duplicate pairs (shingle→minhash→band→bucket
    * join→exact-Jaccard verify). Fully oracled: the output is the
    * exact-Jaccard-verified pair set, and on this corpus every true
    * pair has J ≥ 0.9 at sf0.01 / ≥ 0.8 at sf0.1 (measured), where a
    * 32-band/r=4 LSH miss has probability (1-J⁴)³² ≤ 5e-8 — so the
    * LSH candidates cover the truth set and the output equals DuckDB's
    * all-pairs exact Jaccard at the same threshold. Cross-validated at
    * sf0.1 (where the all-pairs oracle is impractical): the LSH pair
    * set is IDENTICAL to q25's prefix-blocked exact pair set — two
    * independent candidate generators agreeing on all 256 pairs. */
  def q27MinHashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.minHashDupPairs(Tables.documents(s, dir), 0.3)
      .orderBy($"id_a", $"id_b")
  }

  /** All-pairs exact Jaccard — the independent brute-force baseline
    * for the LSH pipeline (fine at correctness SF; the Spark side is
    * the one that scales). Shingle/jaccard SQL identical to q25Sql.
    * Replays at inverted-index cost via the exact shared-shingle
    * prefilter (J ≥ 0.3 > 0 forces ≥ 1 shared shingle — the
    * [[curatedChainCtes]] rewrite; pair set verified identical). */
  val q27Sql: String =
    """WITH sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)
      |  WHERE len(toks) >= 1),
      |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2)
      |SELECT id_a, id_b, jaccard FROM (
      |  SELECT c.id_a, c.id_b,
      |    CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |    CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) AS jaccard
      |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b)
      |WHERE jaccard >= 0.3
      |ORDER BY id_a, id_b""".stripMargin

  /** SimHash near-duplicate pairs (banded buckets, Hamming ≤ 6
    * verify). The driver query uses the portable 96-bit md5-domain
    * signature — two 48-bit words from `md5_number_upper/lower` — so
    * DuckDB can replay the whole pipeline: shingle → per-feature hash
    * → bit votes → banding → bucket join → hamming — independently
    * (see q28Sql). 96 bits keep the maxHamming+1 pigeonhole chunks
    * 13-14 bits wide (≥ 2^13 buckets per band); the xxhash64 128-bit
    * fast path stays in [[Dedup.simHashDupPairs]], spec-covered. */
  def q28SimHashDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.simHashDupPairsPortable(Tables.documents(s, dir), maxHamming = 6)
      .orderBy($"id_a", $"id_b")
  }

  /** Independent DuckDB replay of the portable SimHash-96 spec. The
    * 2×48 per-bit vote sums are generated terms; everything is fully
    * parenthesized (DuckDB gives <<, >>, &, | one precedence level).
    * The per-band chunk expressions are GENERATED from
    * [[Dedup.simHashBandSpec]] — the same (offset, width) layout the
    * Spark side bands with, including the word-straddling recombine —
    * so the oracle replays the exact pigeonhole contract (7 chunks for
    * hamming ≤ 6) and cannot drift from the implementation. */
  val q28Sql: String = {
    def sigTerms(h: String): String = (0 until 48).map { j =>
      s"(CASE WHEN SUM(CASE WHEN (($h >> $j) & 1) = 1 THEN 1 ELSE -1 END) > 0" +
        s" THEN (CAST(1 AS BIGINT) << $j) ELSE 0 END)"
    }.mkString("\n      + ")
    // the same word/straddle split as Dedup.sigChunkExpr, over the two
    // 48-bit portable words
    def chunkSql(off: Int, w: Int): String = {
      val mask = (1L << w) - 1
      val i = off / 48
      val r = off % 48
      if (r + w <= 48) s"((sig$i >> $r) & $mask)"
      else s"(((sig0 >> $r) | (sig1 << ${48 - r})) & $mask)"
    }
    val chunkCases = Dedup.simHashBandSpec(96, 6).zipWithIndex
      .map { case ((off, w), b) => s"WHEN $b THEN ${chunkSql(off, w)}" }
      .mkString("\n    ")
    val bandRows = Dedup.simHashBandSpec(96, 6).indices
      .map(b => s"($b)").mkString(", ")
    s"""WITH sh AS (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(len(toks) - 2, 1)),
       |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |        FROM documents)
       |  WHERE len(toks) >= 1),
       |hv AS (
       |  SELECT doc_id,
       |    CAST(md5_number_upper(s) & 281474976710655 AS BIGINT) AS h0,
       |    CAST(md5_number_lower(s) & 281474976710655 AS BIGINT) AS h1
       |  FROM (SELECT doc_id, unnest(shingles) AS s FROM sh)),
       |sig AS (
       |  SELECT doc_id, ${sigTerms("h0")} AS sig0,
       |    ${sigTerms("h1")} AS sig1
       |  FROM hv GROUP BY doc_id),
       |banded AS (
       |  SELECT doc_id, sig0, sig1, b.band AS band, CASE b.band
       |    $chunkCases
       |    END AS chunk
       |  FROM sig, (VALUES $bandRows) AS b(band))
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig0, b.sig0)) +
       |       bit_count(xor(a.sig1, b.sig1)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig0, b.sig0)) +
       |      bit_count(xor(a.sig1, b.sig1)) <= 6
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Embedding-cosine near-dup via random-hyperplane LSH buckets. */
  def q29EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Similarity.lshNearDupPairs(Tables.embeddings(s, dir),
        threshold = 0.25, dim = 64, bits = 6)
      .orderBy($"id_a", $"id_b")
  }

  /** Independent DuckDB replay of the full hyperplane-LSH spec —
    * normalize → sign-bucket against the SAME hyperplane constants
    * (embedded as round-tripping double literals) → same-bucket join →
    * dot-product verify at the same threshold. Gates every
    * computational step of the implementation; the recall/cost dial
    * (bits) is part of the operator's contract, so the oracle replays
    * it rather than brute-forcing all pairs. */
  val q29Sql: String = {
    val bucketExpr = Similarity.hyperplaneValues(dim = 64, bits = 6)
      .zipWithIndex.map { case (p, h) =>
        val plane = p.map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(vec, $plane) > 0 THEN ${1L << h} ELSE 0 END)"
      }.mkString("\n      + ")
    s"""WITH v AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS raw,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings),
       |n AS (
       |  SELECT id, list_transform(raw, x -> x / nrm) AS vec
       |  FROM v WHERE nrm > 0),
       |b AS (
       |  SELECT id, vec, $bucketExpr AS bucket FROM n)
       |SELECT a.id AS id_a, c.id AS id_b,
       |  round(list_dot_product(a.vec, c.vec), 4) AS score
       |FROM b a JOIN b c ON a.bucket = c.bucket AND a.id < c.id
       |WHERE round(list_dot_product(a.vec, c.vec), 4) >= 0.25
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Corpus-level exact dedup: the canonical keeper per normalized
    * fingerprint (min doc_id) — the output corpus, not a pair report. */
  def q38DedupCorpusExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("fp", TextFunctions.fingerprint($"text"))
      .groupBy($"fp").agg(min($"doc_id").as("keep_id"))
      .select($"keep_id")
      .orderBy($"keep_id")
  }

  val q38Sql: String =
    """SELECT min(doc_id) AS keep_id FROM documents
      |GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
      |ORDER BY keep_id""".stripMargin

  /** Corpus-level near-dedup: MinHash-LSH pairs → connected
    * components → cluster-min survivors. Fully oracled: DuckDB
    * replays the whole pipeline independently — exact-dup collapse,
    * brute-force all-pairs Jaccard ≥ 0.5 (LSH recall is provably
    * complete here, see q27), connected components via a recursive
    * CTE, cluster-min keeper. */
  def q39DedupCorpusNear(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.dedupCorpus(Tables.documents(s, dir), jaccardThreshold = 0.5)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val q39Sql: String =
    """WITH RECURSIVE kept AS (
      |  SELECT d.* FROM documents d
      |  JOIN (SELECT min(doc_id) AS doc_id FROM documents
      |        GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k
      |  ON d.doc_id = k.doc_id),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM kept)
      |  WHERE len(toks) >= 1),
      |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |r(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
      |comp AS (
      |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src)
      |SELECT doc_id, source FROM kept
      |WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)
      |ORDER BY doc_id""".stripMargin

  /** q120: label-centroid affinity matrix
    * ([[graft.operators.Affinity.centroidAffinity]]) — pairwise
    * cosine between label mean-embeddings, integer-exact up to two
    * correctly-rounded sqrt's (the count terms cancel in the cosine
    * of means, so the statistic runs on raw quantized sum vectors). */
  def q120CentroidAffinity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Affinity.centroidAffinity(
        Tables.embeddings(s, dir), "label", "embedding")
      .orderBy($"label_a", $"label_b")
  }

  val q120Sql: String =
    """WITH v AS (
      |  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 10000.0)
      |      AS HUGEINT) AS q
      |  FROM embeddings
      |  WHERE label IS NOT NULL AND embedding IS NOT NULL
      |    AND len(list_filter(embedding, x -> isnan(x))) = 0
      |    AND len(list_filter(embedding, x -> x IS NULL)) = 0),
      |s AS (SELECT label, dim, sum(q) AS s FROM v GROUP BY 1, 2),
      |n AS (SELECT label, sum(s * s) AS nq,
      |        CAST(count(*) AS BIGINT) AS n_dims
      |      FROM s GROUP BY 1),
      |p AS (SELECT a.label AS label_a, b.label AS label_b,
      |        sum(a.s * b.s) AS dot
      |      FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
      |      GROUP BY 1, 2)
      |SELECT p.label_a, p.label_b, na.n_dims,
      |  CASE WHEN na.nq > 0 AND nb.nq > 0 THEN
      |    CAST(p.dot AS DOUBLE)
      |      / (sqrt(CAST(na.nq AS DOUBLE)) * sqrt(CAST(nb.nq AS DOUBLE)))
      |  END AS cos
      |FROM p JOIN n na ON p.label_a = na.label
      |       JOIN n nb ON p.label_b = nb.label
      |ORDER BY label_a, label_b""".stripMargin

  /** q119: leakage-safe 90/10 split
    * ([[graft.operators.Dedup.leakageSafeSplit]]) — every exact or
    * near-dup (J ≥ 0.5) cluster lands whole on one side, keyed by the
    * portable bucket of its representative. Oracle replays the ENTIRE
    * derivation: fingerprint collapse, brute-force Jaccard pairs
    * (complete at this scale, q39's argument), recursive-CTE
    * components, md5-domain bucket. */
  def q119LeakageSafeSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.leakageSafeSplit(Tables.documents(s, dir), trainPct = 90,
        jaccardThreshold = 0.5, shingleSize = 3)
      .select($"doc_id", $"split_rep", $"split")
      .orderBy($"doc_id")
  }

  val q119Sql: String =
    """WITH RECURSIVE fpr AS (
      |  SELECT doc_id, min(doc_id) OVER (
      |      PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')))
      |    AS rep0
      |  FROM documents),
      |kept AS (
      |  SELECT d.* FROM documents d
      |  JOIN fpr ON d.doc_id = fpr.doc_id AND fpr.doc_id = fpr.rep0),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM kept)
      |  WHERE len(toks) >= 1),
      |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |r(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
      |comp AS (
      |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src)
      |SELECT f.doc_id,
      |  coalesce(c.comp, f.rep0) AS split_rep,
      |  CASE WHEN CAST(md5_number_upper(CAST(coalesce(c.comp, f.rep0)
      |              AS VARCHAR)) & 281474976710655 AS BIGINT) % 100 < 90
      |       THEN 'train' ELSE 'eval' END AS split
      |FROM fpr f LEFT JOIN comp c ON f.rep0 = c.id
      |ORDER BY f.doc_id""".stripMargin

  /** Sequence packing (context-window binning): docs in doc_id order
    * packed greedily into 4096-token bins; per-pack stats. The window
    * cumsum is SQL-portable, so this one is fully oracled. */
  def q46SequencePacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("n_tokens", TextFunctions.tokenCount($"text"))
    graft.operators.Sampling.packSequences(docs, "n_tokens", "doc_id", 4096L)
      .groupBy($"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("pack_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"pack_id")
  }

  val q46Sql: String =
    """SELECT pack_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM (
      |  SELECT doc_id, n_tokens,
      |    CAST(FLOOR(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 4096) AS BIGINT) AS pack_id
      |  FROM (SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
      |        FROM documents))
      |GROUP BY pack_id ORDER BY pack_id""".stripMargin

  /** Deterministic hash split + stratified sample accounting. Gated on
    * the md5-derived portable bucket so DuckDB can replay the exact
    * split (the xxhash64 fast path stays in `Sampling.hashSplit`,
    * covered rows-only by ScalaTest). */
  def q47HashSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val (train, test) =
      graft.operators.Sampling.hashSplitPortable(docs, "doc_id", 90)
    train.select(lit("train").as("split"), $"lang")
      .union(test.select(lit("test").as("split"), $"lang"))
      .groupBy($"split", $"lang").agg(count(lit(1)).as("n"))
      .orderBy($"split", $"lang")
  }

  val q47Sql: String = {
    val bucket = graft.operators.Sampling.portableBucketSql("doc_id", 100)
    s"""SELECT split, lang, COUNT(*) AS n FROM (
       |  SELECT CASE WHEN $bucket < 90 THEN 'train' ELSE 'test' END AS split, lang
       |  FROM documents)
       |GROUP BY split, lang ORDER BY split, lang""".stripMargin
  }

  /** q128: deterministic global shuffle → shard manifest
    * ([[graft.operators.Sampling.shardManifest]]) — the seeded
    * pseudo-random permutation handed to the trainer, partitioned
    * into 16 shards so no global sort/window exists anywhere. The
    * oracle replays the md5 permutation key, the mod-16 shard and
    * the within-shard row_number exactly. */
  def q128ShardManifest(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Sampling.shardManifest(
        Tables.documents(s, dir), "doc_id", nShards = 16, seed = "42")
      .orderBy($"shard", $"pos_in_shard")
  }

  val q128Sql: String = {
    val hk = graft.operators.Sampling.portableHash48Sql(
      "concat('42:', CAST(doc_id AS VARCHAR))")
    s"""WITH h AS (SELECT doc_id, $hk AS hk FROM documents)
       |SELECT doc_id, CAST(hk % 16 AS INTEGER) AS shard,
       |  CAST(row_number() OVER (PARTITION BY hk % 16
       |    ORDER BY hk, doc_id) AS BIGINT) AS pos_in_shard
       |FROM h ORDER BY shard, pos_in_shard""".stripMargin
  }

  /** q129: bigram-LM surprisal scoring
    * ([[graft.operators.LanguageModel.bigramSurprisal]]) — the
    * perplexity-style quality filter between q20's ratio heuristics
    * and anything model-based; quantized floor-log₂ of the exact
    * scaled conditional ratio, so the whole model (train + score)
    * replays bit-for-bit in the oracle. */
  def q129LmSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.LanguageModel.bigramSurprisal(
        Tables.documents(s, dir))
      .orderBy($"doc_id")
  }

  val q129Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |idx AS (SELECT doc_id, l,
      |          unnest(range(1, CAST(len(l) AS BIGINT))) AS i
      |        FROM toks),
      |bg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b FROM idx),
      |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      |        FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
      |        FROM nab GROUP BY 1),
      |scored AS (
      |  SELECT g.doc_id,
      |    CAST(length(bin((c.n_a * 1024) // n.n_ab)) - 1 AS BIGINT) AS q
      |  FROM bg g
      |  JOIN nab n ON n.a = g.a AND n.b = g.b
      |  JOIN ctx c ON c.a = g.a)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(q) AS BIGINT) AS q_total,
      |  CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
      |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  /** q131: surprisal-driven domain reweighting
    * ([[graft.operators.LanguageModel.domainReweight]]) — the
    * DoReMi-lineage mixture step: per-source training quotas
    * proportional to scaled mean bigram surprisal, split by
    * largest-remainder apportionment so quotas sum to the budget
    * exactly. The oracle replays the ENTIRE composition — LM train +
    * score (q129's CTEs), per-source integer weights, and the q109
    * remainder-ranking — in one statement. */
  def q131DomainReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.LanguageModel.domainReweight(
        Tables.documents(s, dir), groupCol = "source",
        budget = 100000L, scale = 10000L)
      .orderBy($"source")
  }

  val q131Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |idx AS (SELECT doc_id, l,
      |          unnest(range(1, CAST(len(l) AS BIGINT))) AS i
      |        FROM toks),
      |bg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b FROM idx),
      |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      |        FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
      |        FROM nab GROUP BY 1),
      |scored AS (
      |  SELECT g.doc_id,
      |    CAST(length(bin((c.n_a * 1024) // n.n_ab)) - 1 AS BIGINT) AS q
      |  FROM bg g
      |  JOIN nab n ON n.a = g.a AND n.b = g.b
      |  JOIN ctx c ON c.a = g.a),
      |per_doc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |    CAST(sum(q) AS BIGINT) AS q_total
      |  FROM scored GROUP BY 1),
      |pk AS (SELECT d.source AS key,
      |         CAST(count(*) AS BIGINT) AS n_docs,
      |         (CAST(sum(p.q_total) AS BIGINT) * 10000)
      |           // CAST(sum(p.n_bigrams) AS BIGINT) AS w
      |       FROM per_doc p JOIN documents d USING (doc_id)
      |       GROUP BY 1),
      |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM pk),
      |a AS (SELECT key, n_docs, w,
      |        (CAST(100000 AS HUGEINT) * w) // t.tw AS base,
      |        (CAST(100000 AS HUGEINT) * w) % t.tw AS rem
      |      FROM pk CROSS JOIN t),
      |l AS (SELECT 100000 - sum(base) AS leftover FROM a),
      |rk AS (SELECT key, n_docs, w, base, rem,
      |         row_number() OVER (ORDER BY rem DESC, key) AS rnk
      |       FROM a)
      |SELECT key AS source, n_docs, CAST(w AS BIGINT) AS w,
      |  CAST(base + CASE WHEN rnk <= l.leftover THEN 1 ELSE 0 END
      |    AS BIGINT) AS quota
      |FROM rk CROSS JOIN l ORDER BY source""".stripMargin

  /** q132: winnowing copy-suspect pairs
    * ([[graft.operators.Winnowing.sharedPairs]]) — MOSS-style
    * rightmost-min-per-window fingerprint selection (k=3 token
    * shingles, w=4 windows), pairs sharing ≥ 2 distinct selected
    * fingerprints. The oracle replays the exact selection: same
    * md5-derived shingle hashes, same full-window membership, same
    * min + rightmost-tie rule. */
  def q132WinnowingPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Winnowing.sharedPairs(
        Tables.documents(s, dir), k = 3, w = 4, minShared = 2)
      .orderBy($"doc_a", $"doc_b")
  }

  val q132Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents
      |  WHERE text IS NOT NULL AND len(string_split_regex(trim(text), '\s+')) >= 6),
      |sh AS (
      |  SELECT doc_id, CAST(len(l) AS BIGINT) - 2 AS nsh, i,
      |    CAST(md5_number_upper(array_to_string(l[i:i+2], ' '))
      |      & 281474976710655 AS BIGINT) AS h
      |  FROM (SELECT doc_id, l,
      |          unnest(range(1, CAST(len(l) AS BIGINT) - 1)) AS i
      |        FROM toks)),
      |mem AS (
      |  SELECT doc_id, i, h,
      |    unnest(range(greatest(1, i - 3), least(i, nsh - 3) + 1)) AS s
      |  FROM sh),
      |wmin AS (SELECT doc_id, s, min(h) AS mh FROM mem GROUP BY 1, 2),
      |fps AS (
      |  SELECT DISTINCT m.doc_id, q.mh AS fp
      |  FROM mem m JOIN wmin q
      |    ON q.doc_id = m.doc_id AND q.s = m.s AND m.h = q.mh)
      |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |  CAST(count(*) AS BIGINT) AS n_shared
      |FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
      |GROUP BY 1, 2 HAVING count(*) >= 2
      |ORDER BY doc_a, doc_b""".stripMargin

  /** q134: seeded Johnson–Lindenstrauss random projection
    * ([[graft.operators.Similarity.randomProjection]]) — 64-dim
    * embeddings down to 8, unbiased scale, exploded to
    * (vec_id, proj_dim, value) rows. The oracle replays the exact
    * projection: the same direction literals (doubles round-trip),
    * the same in-order double dot product, the same round-4. */
  def q134RandomProjection(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Similarity.randomProjection(
        Tables.embeddings(s, dir), dim = 64, outDim = 8)
      .select($"vec_id", posexplode($"proj"))
      .select($"vec_id", $"pos".as("proj_dim"), $"col".as("value"))
      .orderBy($"vec_id", $"proj_dim")
  }

  /** The `round(list_dot_product(vec, [plane]) * scale, 4)` literal
    * list shared by the q134/q135 oracles — ONE SQL rendering of the
    * projection arithmetic, mirroring `Similarity.projArray` being
    * the one Spark-side rendering. */
  private def projCompsSql(dim: Int, outDim: Int): String = {
    val scale =
      graft.operators.Similarity.projectionScale(outDim).toString
    graft.operators.Similarity.projectionValues(dim, outDim)
      .map { p =>
        val plane = p.map(_.toString).mkString("[", ", ", "]")
        s"round(list_dot_product(vec, $plane) * $scale, 4)"
      }.mkString("[\n      ", ",\n      ", "]")
  }

  val q134Sql: String = {
    val comps = projCompsSql(64, 8)
    s"""WITH v AS (
       |  SELECT vec_id, embedding::DOUBLE[] AS vec FROM embeddings
       |  WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
       |p AS (SELECT vec_id, $comps AS l FROM v),
       |e AS (SELECT vec_id, unnest(range(1, 9)) AS i, l FROM p)
       |SELECT vec_id, CAST(i - 1 AS INTEGER) AS proj_dim, l[i] AS value
       |FROM e ORDER BY vec_id, proj_dim""".stripMargin
  }

  /** q135: projected ANN with exact re-rank
    * ([[graft.operators.Similarity.projectedTopK]]) — candidates from
    * the q134 JL space (16 of 64 dims), pool of 200 re-ranked by exact
    * cosine. The oracle replays the WHOLE pipeline (the q29 dial
    * stance): projection, pool selection (ascore desc, id ties), and
    * the exact re-rank — the pool dial is part of the contract, and
    * this synthetic corpus is near-random (top cosines ≈ 0.3), the
    * worst case for JL rank concentration, so exact-recall would pin
    * the dial to pool ≈ corpus and prove nothing. */
  def q135ProjectedAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.projectedTopK(
        emb.filter($"vec_id" >= 5 && $"vec_id" < 15), emb,
        k = 8, dim = 64, outDim = 16, pool = 200)
      .orderBy($"q_id", $"rank")
  }

  val q135Sql: String = {
    val comps = projCompsSql(64, 16)
    s"""WITH v AS (
       |  SELECT vec_id, vec FROM (
       |    SELECT vec_id, embedding::DOUBLE[] AS vec,
       |      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |    FROM embeddings
       |    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
       |  WHERE nrm > 0 AND isfinite(nrm)),
       |p AS (SELECT vec_id, vec, $comps AS proj FROM v),
       |a AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |        q.vec AS qv, c.vec AS cv,
       |        round(list_dot_product(q.proj, c.proj), 4) AS ascore
       |      FROM (SELECT * FROM p WHERE vec_id >= 5 AND vec_id < 15) q
       |      JOIN p c ON q.vec_id <> c.vec_id),
       |pool AS (SELECT q_id, n_id, qv, cv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY ascore DESC, n_id ASC) AS prn FROM a)
       |  WHERE prn <= 200),
       |r AS (SELECT q_id, n_id,
       |        round(list_dot_product(qv, cv) /
       |          (sqrt(list_dot_product(qv, qv)) *
       |           sqrt(list_dot_product(cv, cv))), 4) AS score
       |      FROM pool)
       |SELECT q_id, rank, n_id, score FROM (
       |  SELECT q_id, n_id, score, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, n_id ASC) AS rank FROM r)
       |WHERE rank <= 8 ORDER BY q_id, rank""".stripMargin
  }

  /** The `[list_dot_product(<projCol>, [centroid...]), ...]` literal
    * list shared by the q141 oracle — the centroids are
    * [[graft.operators.Similarity.hashCentroids]]' seeded literals in
    * the PROJECTED space, so the SQL replays the exact cell scan. */
  private def cellScoresSql(projCol: String, outDim: Int,
      nCells: Int): String =
    graft.operators.Similarity.hashCentroids(outDim, nCells)
      .map { c =>
        val cent = c.map(_.toString).mkString("[", ", ", "]")
        s"list_dot_product($projCol, $cent)"
      }.mkString("[\n      ", ",\n      ", "]")

  /** q141: projected IVF ANN
    * ([[graft.operators.Similarity.projectedIvfTopK]]) — the 100 TB
    * composition q134/q135 build toward: JL-project both sides (16 of
    * 64 dims), assign IVF cells IN the projected space (16 hash
    * centroids, 8-probe), rank candidates by projected dot, re-rank
    * the 200-pool by exact raw cosine. The oracle replays the WHOLE
    * pipeline — projection literals, argmax cell with first-index
    * ties, the (score desc, cell) probe set, pool selection, exact
    * re-rank — the q135 dial-is-the-contract stance with the cell
    * stage added. */
  def q141ProjectedIvf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    graft.operators.Similarity.projectedIvfTopK(
        emb.filter($"vec_id" >= 15 && $"vec_id" < 25), emb,
        k = 8, dim = 64, outDim = 16, nCells = 16, nProbe = 8,
        pool = 200)
      .orderBy($"q_id", $"rank")
  }

  val q141Sql: String = {
    val comps = projCompsSql(64, 16)
    val cells = cellScoresSql("proj", 16, 16)
    s"""WITH v AS (
       |  SELECT vec_id, vec FROM (
       |    SELECT vec_id, embedding::DOUBLE[] AS vec,
       |      sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |    FROM embeddings
       |    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL)
       |  WHERE nrm > 0 AND isfinite(nrm)),
       |p AS (SELECT vec_id, vec, $comps AS proj FROM v),
       |cs AS (SELECT vec_id, vec, proj, $cells AS sc FROM p),
       |cc AS (SELECT vec_id, vec, proj,
       |         CAST(list_position(sc, list_max(sc)) - 1 AS INTEGER)
       |           AS cell
       |       FROM cs),
       |qexp AS (
       |  SELECT vec_id, vec, proj, ci, sc[ci] AS cscore
       |  FROM (SELECT *, unnest(generate_series(1, 16)) AS ci
       |        FROM cs WHERE vec_id >= 15 AND vec_id < 25)),
       |qprobe AS (
       |  SELECT vec_id, vec, proj, CAST(ci - 1 AS INTEGER) AS cell
       |  FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
       |          ORDER BY cscore DESC, ci) AS crn FROM qexp)
       |  WHERE crn <= 8),
       |a AS (SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |        q.vec AS qv, c.vec AS cv,
       |        round(list_dot_product(q.proj, c.proj), 4) AS ascore
       |      FROM qprobe q
       |      JOIN cc c ON c.cell = q.cell AND q.vec_id <> c.vec_id),
       |pool AS (SELECT q_id, n_id, qv, cv FROM (
       |    SELECT *, row_number() OVER (PARTITION BY q_id
       |      ORDER BY ascore DESC, n_id ASC) AS prn FROM a)
       |  WHERE prn <= 200),
       |r AS (SELECT q_id, n_id,
       |        round(list_dot_product(qv, cv) /
       |          (sqrt(list_dot_product(qv, qv)) *
       |           sqrt(list_dot_product(cv, cv))), 4) AS score
       |      FROM pool)
       |SELECT q_id, rank, n_id, score FROM (
       |  SELECT q_id, n_id, score, row_number() OVER (PARTITION BY q_id
       |    ORDER BY score DESC, n_id ASC) AS rank FROM r)
       |WHERE rank <= 8 ORDER BY q_id, rank""".stripMargin
  }

  /** q148: projected IVF with TRAINED centroids — q141's composition
    * with the hash-centroid stand-ins replaced by spherical k-means
    * run IN the projected space ([[graft.operators.Similarity
    * .kmeansCentroids]] over [[graft.operators.Similarity
    * .randomProjection]]'s output — the training pass a real
    * billion-vector deployment runs, since Lloyd-trained cells on
    * clustered embeddings cut candidates harder than seeded hashes at
    * the same nProbe). Gated at FULL probe with q135's exact dials
    * (slice/k/outDim/pool), where the trained cell partition must be
    * RESULT-INVISIBLE — every (query, corpus) pair survives the cell
    * join exactly once iff the assignment partitions the corpus, so a
    * dropped/duplicated assignment diffs the oracle — the q65
    * full-probe stance; training determinism itself is pinned by
    * KMeansSpec, and the partial-probe speedup is measured in
    * ScaleBench (projected_ivf_trained vs q141's hash-cell row). The
    * oracle is q135's projected-pool replay VERBATIM (the q140←q136
    * round-trip-invisible pattern). */
  def q148ProjectedIvfTrained(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    val trained = graft.operators.Similarity.kmeansCentroids(
      graft.operators.Similarity.randomProjection(emb, dim = 64,
        outDim = 16),
      nCells = 16, iters = 2, dim = 16, vecCol = "proj")
    graft.operators.Similarity.projectedIvfTopK(
        emb.filter($"vec_id" >= 5 && $"vec_id" < 15), emb,
        k = 8, dim = 64, outDim = 16, nCells = 16, nProbe = 16,
        pool = 200, centroids = Some(trained))
      .orderBy($"q_id", $"rank")
  }

  /** q143: the CURATED pipeline — q83's composed chain with the two
    * round-13 curation stages folded into
    * [[graft.TrainingPipeline.prepare]] itself: winnowing
    * decontamination against an eval slice (`winnowEval`, catches
    * reordered/partial copies the exact-gram stage misses) and the
    * per-lang_pred perplexity band filter (`surprisalBand`), both on
    * the clean corpus before quota balancing. Corpus = doc_id ≥
    * max/10+1, eval = the rest (the q136 split). The ENTIRE chain —
    * quality → mask → span dedup → langID → corpus dedup → winnow
    * decon → LM band → quota → pack → split — is replayed in ONE
    * DuckDB statement, so a regression in STAGE INTERACTION (the band
    * scoring pre-decon text, the winnow flags computed pre-mask…)
    * surfaces in one hash. Same LSH-recall adjudication as q83
    * (all-pairs oracle vs banded LSH, recall ≥ 0.98 at t = 0.5;
    * sf0.1 oracle replay is hours-long by construction — the driver
    * gates at sf0.01, the q83 stance). */
  def q143PipelineCurated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.TrainingPipeline.prepare(
        docs.filter($"doc_id" >= cut),
        budget = 2048L,
        jaccardThreshold = 0.5,
        trainPct = 95,
        spanWords = 10,
        domainQuota = Some(("source", 15)),
        winnowEval = Some(docs.filter($"doc_id" < cut)),
        surprisalBand = Some((5, 95)))
      .select($"doc_id", $"source", $"n_tokens".cast("long").as("n_tokens"),
        $"lang_pred", $"pack_id", $"split")
      .orderBy($"doc_id")
  }

  /** DuckDB replay of the whole [[q143PipelineCurated]] chain — the
    * q83 oracle's CTEs on the corpus slice, plus the q136 winnowing
    * fragments (eval side on RAW text, train side on the survivors'
    * REBUILT text — the order the pipeline mutates text in is part of
    * what this gates) and the q137 band fragments (LM self-scored on
    * the post-decon corpus, ranked per lang_pred). */
  /** The curated-pipeline CTE chain shared VERBATIM by the q143
    * (self-scored band) and q147 (held-out band) oracles — everything
    * from the corpus split through `wclean` (quality → mask → span
    * dedup → floor → langID → exact+near dedup → winnow decon). ONE
    * rendering of the 9 shared stages, so a stage fix cannot land in
    * one oracle and miss the other; the two differ ONLY in the LM
    * block that produces `lmdoc` (per-doc q_avg) and share the
    * rank-band/quota/pack tail below.
    *
    * Replay-cost notes (r17 — the driver's t2 gate replays these at
    * sf0.01, and the r16 sweep spent 547 s on q151 ALONE): (1) the
    * near-dup `pairs` stage prefilters candidates through a
    * shared-shingle inverted-index join (`shx`/`cand`) before the
    * exact Jaccard — EXACT, not approximate: J ≥ 0.5 > 0 forces ≥1
    * shared shingle, so non-candidates provably fail the threshold
    * (verified: identical pair sets with and without the prefilter);
    * the all-pairs ADJUDICATION stance vs the Spark side's banded LSH
    * is unchanged, the exact pair set is just computed at inverted-
    * index cost. (2) `AS MATERIALIZED` on the multiply-referenced
    * CTEs (`sh`, `survivors`, `wclean`, `lmscored`, `banded`) stops
    * DuckDB re-inlining the whole upstream chain per reference —
    * q151's oracle re-evaluated `lmscored`+`banded` 3× through its
    * quota block (547 s → 9.7 s measured; results identical). */
  private val curatedChainCtes: String =
    s"""cut AS (SELECT max(doc_id) // 10 + 1 AS c FROM documents),
       |toks0 AS (
       |  SELECT doc_id, source, text,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents, cut WHERE doc_id >= cut.c),
       |quality AS (
       |  SELECT doc_id, source, text FROM toks0
       |  WHERE len(toks) >= 5
       |    AND CAST(len(list_distinct(toks)) AS DOUBLE) /
       |        greatest(CAST(len(toks) AS DOUBLE), 1.0) > 0.2
       |    AND CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) /
       |        greatest(CAST(length(text) AS DOUBLE), 1.0) < 0.5
       |    AND 1.0 - CAST(len(list_distinct(list_transform(
       |          generate_series(1, greatest(len(toks) - 2, 1)),
       |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) /
       |        CAST(greatest(len(toks) - 2, 1) AS DOUBLE) <= 0.6),
       |masked AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '${TextFunctions.EmailRe}', '<EMAIL>', 'g'),
       |      '${TextFunctions.PhoneRe}', '<PHONE>', 'g'),
       |      '${TextFunctions.LongDigitsRe}', '<NUM>', 'g') AS text
       |  FROM quality),
       |mtoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM masked),
       |chunks AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS idx,
       |    unnest(list_transform(
       |      generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1),
       |      i -> array_to_string(w[(i*10+1):(i*10+10)], ' '))) AS chunk
       |  FROM mtoks),
       |ckept AS (
       |  SELECT doc_id, idx, chunk,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
       |  FROM chunks),
       |rebuilt AS (
       |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS text
       |  FROM ckept WHERE rn = 1 GROUP BY doc_id),
       |floored AS (
       |  SELECT r.doc_id, m.source, r.text,
       |    len(string_split_regex(trim(r.text), '\\s+')) AS n_tokens
       |  FROM rebuilt r JOIN masked m USING (doc_id)
       |  WHERE len(string_split_regex(trim(r.text), '\\s+')) >= 5),
       |langed AS (
       |  SELECT doc_id, source, text, n_tokens, CASE
       |      WHEN s_en = m AND s_en > 0 THEN 'en'
       |      WHEN s_de = m AND s_de > 0 THEN 'de'
       |      WHEN s_fr = m AND s_fr > 0 THEN 'fr'
       |      WHEN s_es = m AND s_es > 0 THEN 'es'
       |      ELSE 'und' END AS lang_pred
       |  FROM (
       |    SELECT doc_id, source, text, n_tokens,
       |      s_en, s_de, s_fr, s_es, greatest(s_en, s_de, s_fr, s_es) AS m
       |    FROM (
       |      SELECT doc_id, source, text, n_tokens,
       |        len(list_filter(lt, x -> x IN ('the','a','of','and','is'))) AS s_en,
       |        len(list_filter(lt, x -> x IN ('der','die','das','und','ist'))) AS s_de,
       |        len(list_filter(lt, x -> x IN ('le','la','les','et','est'))) AS s_fr,
       |        len(list_filter(lt, x -> x IN ('el','la','los','y','es'))) AS s_es
       |      FROM (SELECT doc_id, source, text, n_tokens,
       |              string_split_regex(trim(text), '\\s+') AS lt
       |            FROM floored)))),
       |exact_kept AS (
       |  SELECT f.* FROM langed f
       |  JOIN (SELECT min(doc_id) AS doc_id FROM langed
       |        GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k
       |  USING (doc_id)),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(len(toks) - 2, 1)),
       |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |        FROM exact_kept)
       |  WHERE len(toks) >= 1),
       |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b
       |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b
       |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
       |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |r(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src),
       |survivors AS MATERIALIZED (
       |  SELECT * FROM exact_kept
       |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)),
       |etoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       |  FROM documents, cut
       |  WHERE doc_id < cut.c AND text IS NOT NULL
       |    AND len(string_split_regex(trim(text), '\\s+')) >= 6),
       |esh AS (
       |  SELECT doc_id, CAST(len(l) AS BIGINT) - 2 AS nsh, i,
       |    CAST(md5_number_upper(array_to_string(l[i:i+2], ' '))
       |      & 281474976710655 AS BIGINT) AS h
       |  FROM (SELECT doc_id, l,
       |          unnest(range(1, CAST(len(l) AS BIGINT) - 1)) AS i
       |        FROM etoks)),
       |emem AS (
       |  SELECT doc_id, i, h,
       |    unnest(range(greatest(1, i - 3), least(i, nsh - 3) + 1)) AS s
       |  FROM esh),
       |ewmin AS (SELECT doc_id, s, min(h) AS mh FROM emem GROUP BY 1, 2),
       |efps AS (
       |  SELECT DISTINCT q.mh AS fp
       |  FROM emem m JOIN ewmin q
       |    ON q.doc_id = m.doc_id AND q.s = m.s AND m.h = q.mh),
       |ttoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       |  FROM survivors
       |  WHERE len(string_split_regex(trim(text), '\\s+')) >= 6),
       |tsh AS (
       |  SELECT doc_id, CAST(len(l) AS BIGINT) - 2 AS nsh, i,
       |    CAST(md5_number_upper(array_to_string(l[i:i+2], ' '))
       |      & 281474976710655 AS BIGINT) AS h
       |  FROM (SELECT doc_id, l,
       |          unnest(range(1, CAST(len(l) AS BIGINT) - 1)) AS i
       |        FROM ttoks)),
       |tmem AS (
       |  SELECT doc_id, i, h,
       |    unnest(range(greatest(1, i - 3), least(i, nsh - 3) + 1)) AS s
       |  FROM tsh),
       |twmin AS (SELECT doc_id, s, min(h) AS mh FROM tmem GROUP BY 1, 2),
       |tfps AS (
       |  SELECT DISTINCT m.doc_id, q.mh AS fp
       |  FROM tmem m JOIN twmin q
       |    ON q.doc_id = m.doc_id AND q.s = m.s AND m.h = q.mh),
       |flagged AS (
       |  SELECT t.doc_id FROM tfps t JOIN efps USING (fp)
       |  GROUP BY 1 HAVING count(*) >= 2),
       |wclean AS MATERIALIZED (
       |  SELECT * FROM survivors
       |  WHERE doc_id NOT IN (SELECT doc_id FROM flagged))""".stripMargin

  /** The rank-band → quota → pack → split tail shared by the q143,
    * q147, and q151 oracles — consumes whichever `lmdoc` (per-doc
    * q_avg) the variant's LM block produced; `quotaCtes` is the
    * variant's balancing block (must end in a CTE named `quota` with
    * (doc_id, source, n_tokens, lang_pred) — the fixed-15 default for
    * q143/q147, the held-out reweighter for q151), so the band/pack/
    * split arithmetic has exactly ONE rendering across the pipeline
    * family. */
  private def curatedTail(quotaCtes: String): String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""ranked AS (
       |  SELECT w.doc_id, w.source, w.n_tokens, w.lang_pred,
       |    row_number() OVER (PARTITION BY w.lang_pred
       |      ORDER BY p.q_avg, w.doc_id) AS r,
       |    count(*) OVER (PARTITION BY w.lang_pred) AS n
       |  FROM wclean w JOIN lmdoc p USING (doc_id)),
       |banded AS MATERIALIZED (
       |  SELECT doc_id, source, n_tokens, lang_pred FROM ranked
       |  WHERE r > (n * 5) // 100 AND r <= (n * 95) // 100),
       |$quotaCtes,
       |packed AS (
       |  SELECT doc_id, source, n_tokens, lang_pred,
       |    CAST(FLOOR(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS pack_id
       |  FROM quota)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, lang_pred, pack_id,
       |  CASE WHEN $h % 100 < 95 THEN 'train' ELSE 'test' END AS split
       |FROM packed
       |ORDER BY doc_id""".stripMargin
  }

  private val curatedBandTail: String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    curatedTail(
      s"""quota AS (
         |  SELECT doc_id, source, n_tokens, lang_pred FROM (
         |    SELECT doc_id, source, n_tokens, lang_pred, row_number() OVER (
         |      PARTITION BY source ORDER BY $h, doc_id) AS rn
         |    FROM banded)
         |  WHERE rn <= 15)""".stripMargin)
  }

  val q143Sql: String =
    s"""WITH RECURSIVE
       |$curatedChainCtes,
       |lmtoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       |  FROM wclean),
       |lmidx AS (SELECT doc_id, l,
       |            unnest(range(1, CAST(len(l) AS BIGINT))) AS i
       |          FROM lmtoks),
       |lmbg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b FROM lmidx),
       |lmnab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
       |          FROM lmbg GROUP BY 1, 2),
       |lmctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
       |          FROM lmnab GROUP BY 1),
       |lmscored AS MATERIALIZED (
       |  SELECT g.doc_id,
       |    CAST(length(bin((c.n_a * 1024) // n.n_ab)) - 1 AS BIGINT) AS q
       |  FROM lmbg g
       |  JOIN lmnab n ON n.a = g.a AND n.b = g.b
       |  JOIN lmctx c ON c.a = g.a),
       |lmdoc AS (
       |  SELECT doc_id, CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
       |  FROM lmscored GROUP BY 1),
       |$curatedBandTail""".stripMargin

  /** q147: the curated pipeline with the HELD-OUT band mode
    * (`bandTrain` — [[graft.TrainingPipeline.prepare]]'s CCNet
    * deployment shape): q143's 11-stage chain, but the perplexity
    * band is scored by the add-1-smoothed LM trained on the RESERVED
    * reference slice (doc_id < cut — the same slice winnowing
    * decontaminates against), not on the corpus being filtered, so
    * corpus junk cannot make itself predictable to the model that
    * cuts it (TrainingPipelineSpec plants exactly that junk). The
    * oracle shares q143's chain CTEs VERBATIM and swaps only the LM
    * block for q138's smoothed held-out scoring — train counts over
    * the reference's RAW text, candidates scored on their REBUILT
    * (masked, span-cut) text, OOV ceiling included. Same all-pairs
    * stance as q83/q143: the driver gates at sf0.001/0.01. */
  def q147PipelineHeldoutBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.TrainingPipeline.prepare(
        docs.filter($"doc_id" >= cut),
        budget = 2048L,
        jaccardThreshold = 0.5,
        trainPct = 95,
        spanWords = 10,
        domainQuota = Some(("source", 15)),
        winnowEval = Some(docs.filter($"doc_id" < cut)),
        surprisalBand = Some((5, 95)),
        bandTrain = Some(docs.filter($"doc_id" < cut)))
      .select($"doc_id", $"source", $"n_tokens".cast("long").as("n_tokens"),
        $"lang_pred", $"pack_id", $"split")
      .orderBy($"doc_id")
  }

  /** The held-out LM block shared VERBATIM by the q147 and q151
    * oracles (reference-trained smoothed bigram model scoring the
    * winnow-clean corpus's rebuilt text — per-bigram `lmscored`,
    * per-doc `lmdoc`): one rendering, so a smoothing fix cannot land
    * in the band oracle and miss the reweight one. */
  private val heldoutPipelineLmCtes: String =
    s"""hbt AS (
       |  SELECT string_split_regex(trim(text), '\\s+') AS l
       |  FROM documents, cut WHERE doc_id < cut.c AND text IS NOT NULL),
       |hbg AS (SELECT l[i] AS a, l[i + 1] AS b
       |        FROM (SELECT l, unnest(range(1, CAST(len(l) AS BIGINT)))
       |                AS i FROM hbt)),
       |hnab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
       |         FROM hbg GROUP BY 1, 2),
       |hctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
       |         FROM hnab GROUP BY 1),
       |hvoc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
       |         FROM (SELECT unnest(l) AS tok FROM hbt)),
       |lmtoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS l
       |  FROM wclean),
       |lmidx AS (SELECT doc_id, l,
       |            unnest(range(1, CAST(len(l) AS BIGINT))) AS i
       |          FROM lmtoks),
       |lmbg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b FROM lmidx),
       |lmscored AS MATERIALIZED (
       |  SELECT g.doc_id,
       |    CAST(length(bin(((COALESCE(c.n_a, 0) + hvoc.v) * 1024)
       |      // (COALESCE(n.n_ab, 0) + 1))) - 1 AS BIGINT) AS q
       |  FROM lmbg g
       |  LEFT JOIN hnab n ON n.a = g.a AND n.b = g.b
       |  LEFT JOIN hctx c ON c.a = g.a
       |  CROSS JOIN hvoc),
       |lmdoc AS (
       |  SELECT doc_id, CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
       |  FROM lmscored GROUP BY 1)""".stripMargin

  val q147Sql: String =
    s"""WITH RECURSIVE
       |$curatedChainCtes,
       |$heldoutPipelineLmCtes,
       |$curatedBandTail""".stripMargin

  /** q151: the curated pipeline with HELD-OUT domain reweighting as
    * the balancing stage ([[graft.Balance.Reweighted]] +
    * `reweightTrain` — DoReMi's shape composed into the chain): q147's
    * 11 stages verbatim, but the fixed per-source quota (15) is
    * replaced by quotas APPORTIONED from how hard each source's
    * SURVIVING text is for the reference-trained model
    * ([[graft.operators.LanguageModel.domainReweightHeldOut]] over the
    * banded corpus → [[graft.operators.Sampling.quotaPerKeyFrom]]'s
    * hash-ordered prefix selection). The oracle shares q147's chain
    * CTEs and LM block VERBATIM and swaps only the quota block:
    * q146's integer weight/largest-remainder fragments computed from
    * `lmscored` restricted to the band survivors, then the per-source
    * rn ≤ quota(source) prefix — the whole 11-stage composition plus
    * the in-pipeline mixture replays in one statement. Same all-pairs
    * stance as q83/q143/q147 (driver gates at sf0.01). */
  def q151PipelineHeldoutReweight(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.TrainingPipeline.prepare(
        docs.filter($"doc_id" >= cut),
        budget = 2048L,
        jaccardThreshold = 0.5,
        trainPct = 95,
        spanWords = 10,
        balance = Some(graft.Balance.Reweighted("source",
          budget = 150L, maxQuota = 150)),
        winnowEval = Some(docs.filter($"doc_id" < cut)),
        surprisalBand = Some((5, 95)),
        bandTrain = Some(docs.filter($"doc_id" < cut)),
        reweightTrain = Some(docs.filter($"doc_id" < cut)))
      .select($"doc_id", $"source", $"n_tokens".cast("long").as("n_tokens"),
        $"lang_pred", $"pack_id", $"split")
      .orderBy($"doc_id")
  }

  val q151Sql: String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""WITH RECURSIVE
       |$curatedChainCtes,
       |$heldoutPipelineLmCtes,
       |${curatedTail(
      s"""rwdoc AS (
         |  SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         |    CAST(sum(l.q) AS BIGINT) AS q_total
         |  FROM lmscored l JOIN banded b USING (doc_id) GROUP BY 1),
         |rwpk AS (SELECT b.source AS key,
         |         (CAST(sum(p.q_total) AS BIGINT) * 10000)
         |           // CAST(sum(p.n_bigrams) AS BIGINT) AS w
         |       FROM rwdoc p JOIN banded b USING (doc_id) GROUP BY 1),
         |rwt AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM rwpk),
         |rwa AS (SELECT key, w,
         |        (CAST(150 AS HUGEINT) * w) // rwt.tw AS base,
         |        (CAST(150 AS HUGEINT) * w) % rwt.tw AS rem
         |      FROM rwpk CROSS JOIN rwt),
         |rwl AS (SELECT 150 - sum(base) AS leftover FROM rwa),
         |rwrk AS (SELECT key, base, rem,
         |         row_number() OVER (ORDER BY rem DESC, key) AS rnk
         |       FROM rwa),
         |rwq AS (SELECT key AS source,
         |        CAST(base + CASE WHEN rnk <= rwl.leftover THEN 1 ELSE 0
         |          END AS BIGINT) AS quota
         |      FROM rwrk CROSS JOIN rwl),
         |quota AS (
         |  SELECT doc_id, source, n_tokens, lang_pred FROM (
         |    SELECT b.doc_id, b.source, b.n_tokens, b.lang_pred, q.quota,
         |      row_number() OVER (PARTITION BY b.source
         |        ORDER BY $h, b.doc_id) AS rn
         |    FROM banded b JOIN rwq q USING (source))
         |  WHERE rn <= quota)""".stripMargin)}""".stripMargin
  }

  /** q152: exact-substring REPEAT SPANS
    * ([[graft.operators.Dedup.exactSubstringSpans]] — the
    * suffix-array-granularity Lee-et-al family): every maximal token
    * span participating in an exact ≥ 10-token repeat anywhere in the
    * corpus, as (doc_id, span_start, span_end, n_windows). The oracle
    * replays the duplicated-window union + island merge on the LITERAL
    * window strings (the Spark side joins on xxhash64 of the same
    * string — the [[graft.operators.Dedup.decontaminate]] collision
    * contract); n = 10 matches q70's span width so the planted
    * boilerplate families produce non-trivial spans at both SFs. */
  def q152ExactSubstringSpans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup
      .exactSubstringSpans(Tables.documents(s, dir), n = 10)
      .orderBy($"doc_id", $"span_start")
  }

  val q152Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, i, array_to_string(l[i:i+9], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 9)) AS i
      |        FROM t WHERE len(l) >= 10)),
      |dupw AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 2),
      |occ AS (SELECT doc_id, i FROM w JOIN dupw USING (g)),
      |isl AS (
      |  SELECT doc_id, i,
      |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 10
      |         THEN 0 ELSE 1 END AS brk
      |  FROM occ),
      |grp AS (SELECT doc_id, i,
      |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
      |        FROM isl)
      |SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |  CAST(max(i) + 9 AS BIGINT) AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM grp GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** q153: exact-substring DEDUP
    * ([[graft.operators.Dedup.dedupExactSubstrings]]) — the cut Lee
    * et al. apply: each duplicated 10-token window keeps its globally
    * first occurrence, every other occurrence's tokens are removed,
    * and text is rebuilt from the survivors in position order. The
    * oracle replays canonical selection (row_number over the literal
    * window string), coverage union, and the per-token rebuild in one
    * statement — stage INTERACTION (first-occurrence tiebreak,
    * overlap union, rebuild whitespace contract) lands in one hash. */
  def q153ExactSubstringDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup
      .dedupExactSubstrings(Tables.documents(s, dir), n = 10)
      .select($"doc_id", $"text")
      .orderBy($"doc_id")
  }

  val q153Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, i, array_to_string(l[i:i+9], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 9)) AS i
      |        FROM t WHERE len(l) >= 10)),
      |wd AS (SELECT doc_id, i,
      |         row_number() OVER (PARTITION BY g ORDER BY doc_id, i) AS rn,
      |         count(*) OVER (PARTITION BY g) AS c
      |       FROM w),
      |cov AS (SELECT DISTINCT doc_id, p FROM (
      |          SELECT doc_id, unnest(generate_series(i, i + 9)) AS p
      |          FROM wd WHERE c >= 2 AND rn > 1)),
      |tok AS (SELECT doc_id, i AS p, l[i] AS wtok
      |        FROM (SELECT doc_id, l,
      |                unnest(generate_series(1, CAST(len(l) AS BIGINT))) AS i
      |              FROM t)),
      |kept AS (SELECT k.doc_id, k.p, k.wtok FROM tok k
      |         LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.p = k.p
      |         WHERE c.p IS NULL),
      |reb AS (SELECT doc_id, string_agg(wtok, ' ' ORDER BY p) AS text
      |        FROM kept GROUP BY doc_id)
      |SELECT d.doc_id, COALESCE(r.text, '') AS text
      |FROM documents d LEFT JOIN reb r USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** q154: exact-substring repeat statistics per source
    * ([[graft.operators.Dedup.exactSubstringStats]]) — the Lee-et-al
    * headline corpus measurement: what fraction of each source's
    * tokens sits inside some ≥ 10-token exact repeat. Oracle replays
    * q152's duplicated-window union, counts DISTINCT covered token
    * positions per doc (≡ the Spark side's island-length sum — the
    * islands are disjoint maximal intervals), and aggregates per
    * source; the one double division is computed identically by both
    * engines from the same exact integer sums. */
  def q154ExactSubstringStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup
      .exactSubstringStats(Tables.documents(s, dir), n = 10)
      .orderBy($"source")
  }

  val q154Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source,
      |    string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, i, array_to_string(l[i:i+9], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 9)) AS i
      |        FROM t WHERE len(l) >= 10)),
      |dupw AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 2),
      |occ AS (SELECT doc_id, i FROM w JOIN dupw USING (g)),
      |cov AS (SELECT DISTINCT doc_id, p FROM (
      |          SELECT doc_id, unnest(generate_series(i, i + 9)) AS p
      |          FROM occ)),
      |percov AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS cv
      |           FROM cov GROUP BY 1),
      |tok AS (SELECT doc_id, source, CAST(len(l) AS BIGINT) AS ntok
      |        FROM t)
      |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(count(p.cv) AS BIGINT) AS docs_with_repeat,
      |  CAST(sum(ntok) AS BIGINT) AS total_tokens,
      |  CAST(sum(COALESCE(p.cv, 0)) AS BIGINT) AS covered_tokens,
      |  CAST(sum(COALESCE(p.cv, 0)) AS DOUBLE) /
      |    CAST(sum(ntok) AS DOUBLE) AS covered_frac
      |FROM tok LEFT JOIN percov p USING (doc_id)
      |GROUP BY source
      |ORDER BY source""".stripMargin

  /** q155: frequency-THRESHOLDED exact-substring spans
    * ([[graft.operators.Dedup.exactSubstringSpans]] with `minCount` —
    * the dial that separates heavy boilerplate from incidental
    * repeats): maximal token spans whose every covering 10-token
    * window occurs ≥ 3 times corpus-wide. Same island-merge contract
    * as q152; the oracle is q152's literal-window replay with the
    * HAVING threshold raised. The q152/q155 PAIR gates that the
    * threshold actually binds (q155 ⊂ q152 strictly on these corpora
    * — the planted boilerplate families repeat ≥ 3×, pair-quoted text
    * does not; ≥ 4 finds nothing at sf0.01, probed). */
  def q155ExactSubstringSpansMin3(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup
      .exactSubstringSpans(Tables.documents(s, dir), n = 10,
        minCount = 3)
      .orderBy($"doc_id", $"span_start")
  }

  val q155Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, i, array_to_string(l[i:i+9], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 9)) AS i
      |        FROM t WHERE len(l) >= 10)),
      |dupw AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 3),
      |occ AS (SELECT doc_id, i FROM w JOIN dupw USING (g)),
      |isl AS (
      |  SELECT doc_id, i,
      |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 10
      |         THEN 0 ELSE 1 END AS brk
      |  FROM occ),
      |grp AS (SELECT doc_id, i,
      |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
      |        FROM isl)
      |SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |  CAST(max(i) + 9 AS BIGINT) AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM grp GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** q156: per-doc n-gram NOVELTY vs a reference corpus
    * ([[graft.operators.CorpusStats.ngramNovelty]]) — the memorization
    * metric: what fraction of a candidate doc's DISTINCT 8-token
    * windows appears nowhere in the reference. Reference = docs below
    * a tenth of the id range, candidates = the rest (the q64/q136
    * split convention). The Spark side joins 64-bit window hashes
    * (the decontaminate collision contract); the oracle replays the
    * literal window strings. One double division from exact integer
    * counts. */
  def q156NgramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.operators.CorpusStats.ngramNovelty(
        docs.filter($"doc_id" >= cut), docs.filter($"doc_id" < cut),
        n = 8)
      .orderBy($"doc_id")
  }

  val q156Sql: String =
    """WITH cut AS (SELECT max(doc_id) // 10 + 1 AS c FROM documents),
      |t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, array_to_string(l[i:i+7], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 7)) AS i
      |        FROM t WHERE len(l) >= 8)),
      |cand AS (SELECT DISTINCT doc_id, g
      |         FROM w CROSS JOIN cut WHERE doc_id >= cut.c),
      |ref AS (SELECT DISTINCT g
      |        FROM w CROSS JOIN cut WHERE doc_id < cut.c)
      |SELECT c.doc_id,
      |  CAST(count(*) AS BIGINT) AS n_windows,
      |  CAST(count(*) - count(r.g) AS BIGINT) AS novel_windows,
      |  CAST(count(*) - count(r.g) AS DOUBLE) / CAST(count(*) AS DOUBLE)
      |    AS novel_frac
      |FROM cand c LEFT JOIN ref r ON c.g = r.g
      |GROUP BY c.doc_id
      |ORDER BY c.doc_id""".stripMargin

  /** q157: exact-substring spans at the Lee-et-al OPERATING POINT —
    * n = 50 tokens, the span length the paper's ExactSubstr dedup
    * actually removes (arXiv:2107.06499 §2: 50-token threshold on
    * real text; the q152-q155 family gates n = 10, where window
    * COUNT dominates — at n = 50 windows are ~5× longer and rarer,
    * stressing the island-merge and the window-hash kernel on long
    * strings instead of the grouping on many short ones). minCount
    * stays the default 2 — the threshold that BINDS at these SFs
    * (corpus probe: 251 distinct 50-token windows repeat ≥ 2× at
    * sf0.01, none reach 10; the ≥ 10 point only binds on amplified
    * corpora and is measured in the ScaleBench ladder). Oracle =
    * q152's literal-window replay with the window width raised. */
  def q157ExactSubstringN50(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup
      .exactSubstringSpans(Tables.documents(s, dir), n = 50)
      .orderBy($"doc_id", $"span_start")
  }

  val q157Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |w AS (
      |  SELECT doc_id, i, array_to_string(l[i:i+49], ' ') AS g
      |  FROM (SELECT doc_id, l,
      |          unnest(generate_series(1, CAST(len(l) AS BIGINT) - 49)) AS i
      |        FROM t WHERE len(l) >= 50)),
      |dupw AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 2),
      |occ AS (SELECT doc_id, i FROM w JOIN dupw USING (g)),
      |isl AS (
      |  SELECT doc_id, i,
      |    CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 50
      |         THEN 0 ELSE 1 END AS brk
      |  FROM occ),
      |grp AS (SELECT doc_id, i,
      |          sum(brk) OVER (PARTITION BY doc_id ORDER BY i) AS island
      |        FROM isl)
      |SELECT doc_id, CAST(min(i) AS BIGINT) AS span_start,
      |  CAST(max(i) + 49 AS BIGINT) AS span_end,
      |  CAST(count(*) AS BIGINT) AS n_windows
      |FROM grp GROUP BY doc_id, island
      |ORDER BY doc_id, span_start""".stripMargin

  /** q136: winnowing decontamination
    * ([[graft.operators.Winnowing.evalOverlap]]) — docs with id below
    * a tenth of the range play the eval/benchmark set (the q64 split
    * convention), the rest the training corpus; a training doc is
    * flagged when ≥ 2 of its selected fingerprints appear anywhere in
    * the eval set. Exact selection replay (the q132 CTEs) on both
    * sides, then the set-overlap count. */
  def q136WinnowDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.operators.Winnowing.evalOverlap(
        docs.filter($"doc_id" >= cut), docs.filter($"doc_id" < cut),
        minShared = 2)
      .orderBy($"doc_id")
  }

  val q136Sql: String =
    """WITH cut AS (SELECT max(doc_id) // 10 + 1 AS c FROM documents),
      |toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents
      |  WHERE text IS NOT NULL AND len(string_split_regex(trim(text), '\s+')) >= 6),
      |sh AS (
      |  SELECT doc_id, CAST(len(l) AS BIGINT) - 2 AS nsh, i,
      |    CAST(md5_number_upper(array_to_string(l[i:i+2], ' '))
      |      & 281474976710655 AS BIGINT) AS h
      |  FROM (SELECT doc_id, l,
      |          unnest(range(1, CAST(len(l) AS BIGINT) - 1)) AS i
      |        FROM toks)),
      |mem AS (
      |  SELECT doc_id, i, h,
      |    unnest(range(greatest(1, i - 3), least(i, nsh - 3) + 1)) AS s
      |  FROM sh),
      |wmin AS (SELECT doc_id, s, min(h) AS mh FROM mem GROUP BY 1, 2),
      |fps AS (
      |  SELECT DISTINCT m.doc_id, q.mh AS fp
      |  FROM mem m JOIN wmin q
      |    ON q.doc_id = m.doc_id AND q.s = m.s AND m.h = q.mh),
      |ef AS (SELECT DISTINCT fp FROM fps, cut WHERE doc_id < cut.c)
      |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_shared
      |FROM fps t JOIN ef USING (fp) CROSS JOIN cut
      |WHERE t.doc_id >= cut.c
      |GROUP BY 1 HAVING count(*) >= 2
      |ORDER BY doc_id""".stripMargin

  /** q137: perplexity band filter
    * ([[graft.operators.LanguageModel.surprisalBandFilter]]) — per
    * language, keep the (5, 95] band of the q_avg rank distribution
    * (drop boilerplate AND gibberish tails). Exact integer rank
    * arithmetic replayed: same LM, same (q_avg, doc_id) rank order,
    * same floor band edges. */
  def q137SurprisalBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.LanguageModel.surprisalBandFilter(
        Tables.documents(s, dir), groupCol = "lang")
      .orderBy($"doc_id")
  }

  val q137Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |idx AS (SELECT doc_id, l,
      |          unnest(range(1, CAST(len(l) AS BIGINT))) AS i
      |        FROM toks),
      |bg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b FROM idx),
      |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      |        FROM bg GROUP BY 1, 2),
      |ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
      |        FROM nab GROUP BY 1),
      |scored AS (
      |  SELECT g.doc_id,
      |    CAST(length(bin((c.n_a * 1024) // n.n_ab)) - 1 AS BIGINT) AS q
      |  FROM bg g
      |  JOIN nab n ON n.a = g.a AND n.b = g.b
      |  JOIN ctx c ON c.a = g.a),
      |per_doc AS (
      |  SELECT doc_id,
      |    CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
      |  FROM scored GROUP BY 1),
      |ranked AS (
      |  SELECT p.doc_id, d.lang, p.q_avg,
      |    row_number() OVER (PARTITION BY d.lang
      |      ORDER BY p.q_avg, p.doc_id) AS r,
      |    count(*) OVER (PARTITION BY d.lang) AS n
      |  FROM per_doc p JOIN documents d USING (doc_id))
      |SELECT doc_id, lang, q_avg FROM ranked
      |WHERE r > (n * 5) // 100 AND r <= (n * 95) // 100
      |ORDER BY doc_id""".stripMargin

  /** q138: HELD-OUT bigram surprisal with add-1 OOV smoothing
    * ([[graft.operators.LanguageModel.bigramSurprisalHeldOut]]) — the
    * CCNet deployment shape q129 cannot play: the model trains on the
    * doc_id < max/10 reference slice and scores the REST, so unseen
    * bigrams/contexts genuinely occur and the add-k policy is
    * exercised on real data (n_oov is emitted per doc and gated). The
    * oracle replays the whole thing: train counts, the distinct-token
    * vocabulary V, LEFT joins with 0-coalesce, and the same
    * floor-log₂ of the smoothed integer ratio. */
  def q138HeldoutSurprisal(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.operators.LanguageModel.bigramSurprisalHeldOut(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut))
      .orderBy($"doc_id")
  }

  /** The held-out-scoring CTE block shared by the q138 and q145
    * oracles (cut split, train counts, vocabulary, add-1 smoothed
    * per-bigram `scored`) — ONE SQL rendering of the smoothing
    * arithmetic, mirroring `bigramSurprisalHeldOut` being the one
    * Spark-side rendering; a fix applied to one oracle cannot miss
    * the other. */
  private val heldoutScoredCtes: String =
    """cut AS (SELECT max(doc_id) // 10 + 1 AS c FROM documents),
      |toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS l
      |  FROM documents WHERE text IS NOT NULL),
      |tr AS (SELECT t.* FROM toks t, cut WHERE doc_id < cut.c),
      |sc AS (SELECT t.* FROM toks t, cut WHERE doc_id >= cut.c),
      |tbg AS (SELECT l[i] AS a, l[i + 1] AS b
      |        FROM (SELECT l, unnest(range(1, CAST(len(l) AS BIGINT)))
      |                AS i FROM tr)),
      |nab AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      |        FROM tbg GROUP BY 1, 2),
      |ctx AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a
      |        FROM nab GROUP BY 1),
      |voc AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      |        FROM (SELECT unnest(l) AS tok FROM tr)),
      |sbg AS (SELECT doc_id, l[i] AS a, l[i + 1] AS b
      |        FROM (SELECT doc_id, l,
      |                unnest(range(1, CAST(len(l) AS BIGINT))) AS i
      |              FROM sc)),
      |scored AS (
      |  SELECT g.doc_id,
      |    CASE WHEN n.n_ab IS NULL THEN 1 ELSE 0 END AS oov,
      |    CAST(length(bin(((COALESCE(c.n_a, 0) + voc.v) * 1024)
      |      // (COALESCE(n.n_ab, 0) + 1))) - 1 AS BIGINT) AS q
      |  FROM sbg g
      |  LEFT JOIN nab n ON n.a = g.a AND n.b = g.b
      |  LEFT JOIN ctx c ON c.a = g.a
      |  CROSS JOIN voc)""".stripMargin

  val q138Sql: String =
    s"""WITH $heldoutScoredCtes
       |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |  CAST(sum(oov) AS BIGINT) AS n_oov,
       |  CAST(sum(q) AS BIGINT) AS q_total,
       |  CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
       |FROM scored GROUP BY 1 ORDER BY 1""".stripMargin

  /** q140: winnowing decontamination served from a PERSISTED
    * fingerprint index ([[graft.operators.Winnowing
    * .writeFingerprintIndex]] / [[graft.operators.Winnowing
    * .evalOverlapFromIndex]]) — q136's exact semantics through the
    * build-once/probe-many artifact lifecycle: the eval set is
    * winnowed ONCE into a stamped parquet index, read back COLD, and
    * the training side probes the artifact. The oracle is q136's
    * artifact-free SQL verbatim (the q121 pattern): the round-trip
    * must be invisible in the result, or a torn/mis-stamped index
    * diffs. */
  def q140WinnowArtifact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.Scratch.withTempDir(s, "graft_q140_winnowidx") { base =>
      graft.operators.Winnowing.writeFingerprintIndex(
        docs.filter($"doc_id" < cut), s"$base/idx")
      graft.operators.Winnowing.evalOverlapFromIndex(
          docs.filter($"doc_id" >= cut), s"$base/idx", minShared = 2)
        .orderBy($"doc_id")
        .localCheckpoint()
    }
  }

  /** q145: held-out perplexity band
    * ([[graft.operators.LanguageModel.surprisalBandFilterHeldOut]]) —
    * the full CCNet deployment: the band edges come from how the
    * REFERENCE slice's LM (add-1 smoothed, q138's model) ranks the
    * candidate corpus, per language. Composes the two round-14 LM
    * pieces: held-out scoring (q138) through the shared rank-band
    * tail (q137). The oracle replays model + smoothing + rank + exact
    * integer edges in one statement. */
  def q145HeldoutBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.operators.LanguageModel.surprisalBandFilterHeldOut(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut),
        groupCol = "lang")
      .orderBy($"doc_id")
  }

  val q145Sql: String =
    s"""WITH $heldoutScoredCtes,
       |per_doc AS (
       |  SELECT doc_id, CAST(sum(q) AS DOUBLE) / count(*) AS q_avg
       |  FROM scored GROUP BY 1),
       |ranked AS (
       |  SELECT p.doc_id, d.lang, p.q_avg,
       |    row_number() OVER (PARTITION BY d.lang
       |      ORDER BY p.q_avg, p.doc_id) AS r,
       |    count(*) OVER (PARTITION BY d.lang) AS n
       |  FROM per_doc p JOIN documents d USING (doc_id))
       |SELECT doc_id, lang, q_avg FROM ranked
       |WHERE r > (n * 5) // 100 AND r <= (n * 95) // 100
       |ORDER BY doc_id""".stripMargin

  /** q146: held-out domain reweighting
    * ([[graft.operators.LanguageModel.domainReweightHeldOut]]) — the
    * DoReMi deployment shape proper: per-source quotas from how hard
    * each source's text is for the REFERENCE slice's add-1 model
    * (self-scored difficulty is biased toward sources that dominate
    * the training counts). Completes the held-out trio
    * (q138 scoring → q145 band → q146 mixture); the oracle composes
    * the q138 CTEs with q131's integer-weight + largest-remainder
    * fragments in one statement. */
  def q146HeldoutReweight(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val cut = docs.agg(max($"doc_id")).head().getLong(0) / 10 + 1
    graft.operators.LanguageModel.domainReweightHeldOut(
        docs.filter($"doc_id" < cut), docs.filter($"doc_id" >= cut),
        groupCol = "source", budget = 100000L, scale = 10000L)
      .orderBy($"source")
  }

  val q146Sql: String =
    s"""WITH $heldoutScoredCtes,
       |per_doc AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |    CAST(sum(q) AS BIGINT) AS q_total
       |  FROM scored GROUP BY 1),
       |pk AS (SELECT d.source AS key,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         (CAST(sum(p.q_total) AS BIGINT) * 10000)
       |           // CAST(sum(p.n_bigrams) AS BIGINT) AS w
       |       FROM per_doc p JOIN documents d USING (doc_id)
       |       GROUP BY 1),
       |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM pk),
       |a AS (SELECT key, n_docs, w,
       |        (CAST(100000 AS HUGEINT) * w) // t.tw AS base,
       |        (CAST(100000 AS HUGEINT) * w) % t.tw AS rem
       |      FROM pk CROSS JOIN t),
       |l AS (SELECT 100000 - sum(base) AS leftover FROM a),
       |rk AS (SELECT key, n_docs, w, base, rem,
       |         row_number() OVER (ORDER BY rem DESC, key) AS rnk
       |       FROM a)
       |SELECT key AS source, n_docs, CAST(w AS BIGINT) AS w,
       |  CAST(base + CASE WHEN rnk <= l.leftover THEN 1 ELSE 0 END
       |    AS BIGINT) AS quota
       |FROM rk CROSS JOIN l ORDER BY source""".stripMargin

  /** q130: maximal-marginal-relevance diverse selection
    * ([[graft.operators.Similarity.mmrSelect]]) — 8 exemplars
    * relevant to vec 0 but mutually dissimilar; round-4 cosines +
    * smallest-id ties make the greedy walk fully deterministic, so
    * the oracle replays ALL 8 steps in one recursive CTE (the
    * selected-set list accumulates through the recursion). */
  def q130MmrSelect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Similarity.mmrSelect(
        Tables.embeddings(s, dir), queryId = 0L, k = 8)
      .orderBy($"step")
  }

  val q130Sql: String =
    """WITH RECURSIVE
      |  base AS (
      |    SELECT vec_id AS id, embedding::DOUBLE[] AS vec
      |    FROM embeddings
      |    WHERE vec_id IS NOT NULL AND embedding IS NOT NULL),
      |  qv AS (SELECT vec FROM base WHERE id = 0),
      |  cand AS (
      |    SELECT b.id, b.vec,
      |      round(list_dot_product(b.vec, q.vec) /
      |        (sqrt(list_dot_product(b.vec, b.vec)) *
      |         sqrt(list_dot_product(q.vec, q.vec))), 4) AS rel4
      |    FROM base b, qv q WHERE b.id <> 0),
      |  sel(step, ids, id, score) AS (
      |    (SELECT 1, [c.id], c.id, c.rel4
      |     FROM cand c ORDER BY c.rel4 DESC, c.id LIMIT 1)
      |    UNION ALL
      |    (SELECT s.step + 1, list_append(s.ids, w.id), w.id, w.score
      |     FROM sel s, LATERAL (
      |       SELECT c.id AS id, c.rel4 - (
      |           SELECT max(round(list_dot_product(c.vec, p.vec) /
      |             (sqrt(list_dot_product(c.vec, c.vec)) *
      |              sqrt(list_dot_product(p.vec, p.vec))), 4))
      |           FROM base p WHERE list_contains(s.ids, p.id)) AS score
      |       FROM cand c WHERE NOT list_contains(s.ids, c.id)
      |       ORDER BY score DESC, c.id LIMIT 1) w
      |     WHERE s.step < 8))
      |SELECT CAST(step AS BIGINT) AS step, id AS vec_id, score
      |FROM sel ORDER BY step""".stripMargin

  /** Rolling-hash document fingerprints. The driver query uses the
    * md5-derived portable variant so DuckDB can replay the exact fold
    * (the q47 `hashSplitPortable` play); the xxhash64 fast path stays
    * in [[TextFunctions.rollingHash]], covered by ScalaTest. */
  def q30RollingFingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.rollingHashPortable($"text").as("rh"))
      .orderBy($"doc_id")
  }

  val q30Sql: String =
    s"""SELECT doc_id,
       |  ${TextFunctions.rollingHashPortableSql("text")} AS rh
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Incremental corpus dedup (the growing-training-set ingestion op):
    * docs with id < half are the EXISTING corpus, the rest are the NEW
    * batch; output = the new rows to add (batch-internal dedup, then
    * exact + near cross-dedup against the corpus via an asymmetric
    * banded LSH join — the corpus is never self-joined). Oracled by a
    * DuckDB replay: within-batch recursive-CTE dedup, then all-pairs
    * fingerprint/Jaccard removal against the corpus (recall
    * completeness as measured for q27: true pairs ≥ 0.8 Jaccard).
    * Both exact-Jaccard stages replay at inverted-index cost via the
    * shared-shingle candidate prefilter (J ≥ 0.5 forces ≥ 1 shared
    * shingle — EXACT, the [[curatedChainCtes]] rewrite; 15 → ~2 s at
    * sf0.01, result verified identical). */
  def q64IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val half = docs.agg(max($"doc_id")).head().getLong(0) / 2 + 1
    Dedup.dedupIncremental(
        docs.filter($"doc_id" >= half), docs.filter($"doc_id" < half),
        jaccardThreshold = 0.5)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val q64Sql: String =
    """WITH RECURSIVE
      |half AS (SELECT (max(doc_id) // 2 + 1) AS h FROM documents),
      |corpus AS (SELECT d.* FROM documents d, half WHERE d.doc_id < h),
      |fresh AS (SELECT d.* FROM documents d, half WHERE d.doc_id >= h),
      |kept AS (
      |  SELECT d.* FROM fresh d
      |  JOIN (SELECT min(doc_id) AS doc_id FROM fresh
      |        GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k2
      |  ON d.doc_id = k2.doc_id),
      |sh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM kept)
      |  WHERE len(toks) >= 1),
      |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
      |cand AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |pairs AS (
      |  SELECT id_a, id_b
      |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
      |  JOIN sh b ON b.doc_id = c.id_b
      |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM pairs
      |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
      |r(src, dst) AS (
      |  SELECT src, dst FROM edges
      |  UNION
      |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
      |comp AS (
      |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src),
      |survivors AS MATERIALIZED (
      |  SELECT * FROM kept
      |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)),
      |csh AS MATERIALIZED (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM corpus)
      |  WHERE len(toks) >= 1),
      |cshx AS (SELECT doc_id, unnest(shingles) AS g FROM csh),
      |xcand AS (
      |  SELECT s.doc_id AS s_id, c.doc_id AS c_id
      |  FROM (SELECT x.* FROM shx x JOIN survivors v USING (doc_id)) s
      |  JOIN cshx c ON s.g = c.g
      |  GROUP BY 1, 2),
      |cross_dup AS (
      |  SELECT DISTINCT x.s_id AS doc_id
      |  FROM xcand x JOIN sh a ON a.doc_id = x.s_id
      |  JOIN csh b ON b.doc_id = x.c_id
      |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |    CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5
      |  UNION
      |  SELECT s.doc_id FROM survivors s
      |  WHERE md5(regexp_replace(lower(s.text), '[^a-z0-9]', '', 'g')) IN (
      |    SELECT DISTINCT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))
      |    FROM corpus))
      |SELECT doc_id, source FROM survivors
      |WHERE doc_id NOT IN (SELECT doc_id FROM cross_dup)
      |ORDER BY doc_id""".stripMargin

  /** Stub-free text→vector ANN: hashing-trick TF vectors (md5-portable
    * token hashes into 256 buckets, kept sparse) + sparse cosine top-k
    * between documents. Every number is exactly replayable in DuckDB —
    * integer counts, integer dots, one final rounded division — so
    * unlike the media-stub path (q60) this featurize→search loop is
    * fully oracle-gated. */
  def q66TextHashAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val vecs = Similarity.sparseTfVectors(Tables.documents(s, dir), dim = 256)
    Similarity.sparseCosineTopK(vecs, col("id") < 10, k = 5)
      .orderBy($"q_id", $"rank")
  }

  val q66Sql: String = {
    val tokHash = graft.operators.Sampling.portableHash48Sql("tok")
    s"""WITH sparse AS (
       |  SELECT doc_id, ($tokHash) % 256 AS idx, CAST(count(*) AS BIGINT) AS cnt
       |  FROM (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok
       |        FROM documents)
       |  GROUP BY 1, 2),
       |norms AS (
       |  SELECT doc_id, sqrt(CAST(SUM(cnt * cnt) AS DOUBLE)) AS nrm
       |  FROM sparse GROUP BY 1),
       |dots AS (
       |  SELECT q.doc_id AS q_id, c.doc_id AS n_id,
       |    CAST(SUM(q.cnt * c.cnt) AS DOUBLE) AS dot
       |  FROM sparse q JOIN sparse c ON q.idx = c.idx
       |  WHERE q.doc_id < 10 AND c.doc_id <> q.doc_id
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.q_id, d.n_id,
       |    round(d.dot / (qn.nrm * cn.nrm), 4) AS score
       |  FROM dots d
       |  JOIN norms qn ON qn.doc_id = d.q_id
       |  JOIN norms cn ON cn.doc_id = d.n_id),
       |ranked AS (
       |  SELECT q_id, n_id, score,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY score DESC, n_id ASC) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, n_id, score FROM ranked
       |WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** q68: benchmark decontamination — the corpus (doc_id % 20 ≠ 0)
    * loses every doc sharing an 8-gram with the "benchmark" slice
    * (doc_id % 20 = 0): the GPT-3-style leakage gate as a first-class
    * operator ([[graft.operators.Dedup.decontaminate]]). The corpus's
    * planted near-dup clusters guarantee real cross-slice collisions,
    * so the query exercises genuine removals, not a no-op. */
  def q68Decontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val survivors = graft.operators.Dedup.decontaminate(
      docs.filter($"doc_id" % 20 =!= 0),
      docs.filter($"doc_id" % 20 === 0), n = 8)
    survivors.select($"doc_id", $"n_chars".cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  /** DuckDB replay: same truncating-slice n-grams as the native
    * shingler (fewer than n tokens → one all-tokens gram), gram
    * equi-join, NOT-EXISTS collapse. */
  val q68Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 7, 1)),
      |    i -> array_to_string(toks[i:i+7], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 20 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 20 <> 0),
      |hit AS (SELECT DISTINCT c.doc_id FROM corp c
      |        JOIN bench b ON c.gram = b.gram)
      |SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS n_chars
      |FROM documents d
      |WHERE d.doc_id % 20 <> 0
      |  AND NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** q70: corpus-global span dedup ([[graft.operators.Dedup.dedupSpans]]
    * — the C4 "repeated span" pass on aligned 10-token chunks): later
    * occurrences of a chunk are cut and each doc's text rebuilt from
    * its surviving chunks. The planted near-dup clusters share long
    * aligned spans, so the pass does real surgery (57 docs change, 4
    * exact-dup docs empty out at sf0.01). */
  def q70SpanDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Dedup.dedupSpans(Tables.documents(s, dir), spanWords = 10)
      .select($"doc_id", $"text".as("clean_text"))
      .orderBy($"doc_id")
  }

  /** DuckDB replay: parallel unnest of (idx, chunk) lists zips
    * positionally; first corpus-wide occurrence by (doc_id, idx) wins;
    * string_agg ordered by idx rebuilds the text. */
  val q70Sql: String =
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
      |  FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS idx,
      |    unnest(list_transform(
      |      generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1),
      |      i -> array_to_string(w[(i*10+1):(i*10+10)], ' '))) AS chunk
      |  FROM toks),
      |kept AS (
      |  SELECT doc_id, idx, chunk,
      |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
      |  FROM chunks),
      |rec AS (
      |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS clean_text
      |  FROM kept WHERE rn = 1 GROUP BY doc_id)
      |SELECT d.doc_id, coalesce(r.clean_text, '') AS clean_text
      |FROM documents d LEFT JOIN rec r ON d.doc_id = r.doc_id
      |ORDER BY d.doc_id""".stripMargin

  /** q71: SemDeDup-style semantic collapse on the embeddings table
    * ([[graft.operators.Similarity.semanticCollapse]]): q29's near-dup
    * graph (hyperplane-LSH pairs at cosine ≥ 0.25) → connected
    * components → cluster-min survivors — the embedding analog of
    * q39's text-corpus dedup. */
  def q71SemanticCollapse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Similarity
      .semanticCollapse(Tables.embeddings(s, dir),
        threshold = 0.25, dim = 64, bits = 6)
      .select($"vec_id")
      .orderBy($"vec_id")
  }

  /** DuckDB replay: q29's pair spec (same hyperplane literals) +
    * recursive-CTE components + cluster-min anti-filter (the q39
    * pattern). */
  val q71Sql: String = {
    val bucketExpr = Similarity.hyperplaneValues(dim = 64, bits = 6)
      .zipWithIndex.map { case (p, h) =>
        val plane = p.map(_.toString).mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(vec, $plane) > 0 THEN ${1L << h} ELSE 0 END)"
      }.mkString("\n      + ")
    s"""WITH RECURSIVE v AS (
       |  SELECT vec_id AS id, embedding::DOUBLE[] AS raw,
       |    sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |  FROM embeddings),
       |n AS (
       |  SELECT id, list_transform(raw, x -> x / nrm) AS vec
       |  FROM v WHERE nrm > 0),
       |b AS (
       |  SELECT id, vec, $bucketExpr AS bucket FROM n),
       |pairs AS (
       |  SELECT a.id AS id_a, c.id AS id_b
       |  FROM b a JOIN b c ON a.bucket = c.bucket AND a.id < c.id
       |  WHERE round(list_dot_product(a.vec, c.vec), 4) >= 0.25),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |r(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src)
       |SELECT vec_id FROM embeddings
       |WHERE vec_id NOT IN (SELECT id FROM comp WHERE comp < id)
       |ORDER BY vec_id""".stripMargin
  }

  /** q69: PII masking ([[TextFunctions.maskPii]]) over documents with
    * deterministic planted PII (email + 3-3-4 phone + 16-digit card
    * derived from doc_id — the raw corpus is synthetic and PII-free,
    * so the plants make every row exercise real replacements). Output
    * is the fully masked text plus per-kind hit flags; the oracle
    * replays the same regex chain with RE2 + 'g'. */
  def q69PiiMask(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pii = concat($"text",
      lit(" contact user"), $"doc_id", lit("@mail.example.com or 555-"),
      lpad(($"doc_id" % 1000).cast("string"), 3, "0"),
      lit("-4321 card 4111111122223333"))
    Tables.documents(s, dir)
      .select($"doc_id", TextFunctions.maskPii(pii).as("masked"))
      .select($"doc_id", $"masked",
        (locate("<EMAIL>", $"masked") > 0).as("has_email"),
        (locate("<PHONE>", $"masked") > 0).as("has_phone"),
        (locate("<NUM>", $"masked") > 0).as("has_num"))
      .orderBy($"doc_id")
  }

  val q69Sql: String =
    s"""WITH pii AS (SELECT doc_id,
       |  text || ' contact user' || CAST(doc_id AS VARCHAR)
       |       || '@mail.example.com or 555-'
       |       || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
       |       || '-4321 card 4111111122223333' AS t
       |  FROM documents),
       |m AS (SELECT doc_id,
       |  regexp_replace(regexp_replace(regexp_replace(t,
       |    '${TextFunctions.EmailRe}', '<EMAIL>', 'g'),
       |    '${TextFunctions.PhoneRe}', '<PHONE>', 'g'),
       |    '${TextFunctions.LongDigitsRe}', '<NUM>', 'g') AS masked
       |  FROM pii)
       |SELECT doc_id, masked,
       |  strpos(masked, '<EMAIL>') > 0 AS has_email,
       |  strpos(masked, '<PHONE>') > 0 AS has_phone,
       |  strpos(masked, '<NUM>') > 0 AS has_num
       |FROM m ORDER BY doc_id""".stripMargin

  /** N-gram repetition scoring (the Gopher/C4-style quality rule:
    * drop documents whose n-grams repeat excessively). Repetition for
    * n = 1 - distinct n-grams / total n-grams — int/int double
    * divisions, deterministic cross-engine. One projection, no
    * shuffle: the 100 TB cost is the scan. */
  def q63Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextFunctions.tokens($"text")
    val nTok = size(toks).cast("long")
    def rep(n: Int): org.apache.spark.sql.Column = {
      val total = (nTok - lit(n - 1)).cast("double")
      lit(1.0) - size(TextFunctions.shingles($"text", n)).cast("double") / total
    }
    Tables.documents(s, dir)
      .filter(nTok >= 3) // guard total>0 for both n (all corpus docs pass)
      .select($"doc_id", nTok.as("n_tokens"),
        rep(2).as("rep2"), rep(3).as("rep3"),
        (rep(3) > 0.2).as("repetitive"))
      .orderBy($"doc_id")
  }

  val q63Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
      |    1.0 - CAST(len(list_distinct(list_transform(
      |        generate_series(1, len(toks) - 1),
      |        i -> toks[i] || ' ' || toks[i+1]))) AS DOUBLE) /
      |      CAST(len(toks) - 1 AS DOUBLE) AS rep2,
      |    1.0 - CAST(len(list_distinct(list_transform(
      |        generate_series(1, len(toks) - 2),
      |        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS DOUBLE) /
      |      CAST(len(toks) - 2 AS DOUBLE) AS rep3
      |  FROM t WHERE len(toks) >= 3)
      |SELECT doc_id, n_tokens, rep2, rep3, rep3 > 0.2 AS repetitive
      |FROM g ORDER BY doc_id""".stripMargin

  /** Per-source quota sampling (domain balancing): cap every source at
    * 10 documents, selected by portable-hash order so the "sample" is
    * uniform, layout-independent, and DuckDB-replayable. The selection
    * runs through the bounded [[graft.functions.BoundedMinIds]]
    * aggregate (O(n) state, map-side combine), NOT a row_number window
    * — the oracle's window form is the semantics, not the plan. */
  def q75DomainQuota(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Sampling.quotaPerKey(
        Tables.documents(s, dir), "source", "doc_id", 10)
      .select($"doc_id", $"source")
      .orderBy($"doc_id")
  }

  val q75Sql: String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source FROM (
       |  SELECT doc_id, source, row_number() OVER (
       |    PARTITION BY source ORDER BY $h, doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 10 ORDER BY doc_id""".stripMargin
  }

  /** Containment near-dup pairs (|A∩B| / min set size — catches a doc
    * embedded in a longer one, which symmetric Jaccard dilutes toward
    * 0). Inverted-index self-join on hashed shingles; the oracle is
    * the all-pairs exact containment (fine at correctness SF — the
    * Spark side is the one that scales). */
  def q76Containment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Dedup.containmentPairs(Tables.documents(s, dir), 0.5)
      .orderBy($"id_a", $"id_b")
  }

  val q76Sql: String =
    """WITH sh AS (
      |  SELECT doc_id,
      |    list_distinct(list_transform(
      |      generate_series(1, greatest(len(toks) - 2, 1)),
      |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents))
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      |  CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |  least(len(a.shingles), len(b.shingles)) AS containment
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      |WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
      |      least(len(a.shingles), len(b.shingles)) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** Quality-weighted domain balancing: keep the 5 HIGHEST-quality
    * documents of every source, quality = distinct-token ratio (the
    * q20 uniqueness metric — an int/int division, bit-identical across
    * engines, so the DESC order and its id tiebreak replay exactly).
    * Selection runs through the bounded
    * [[graft.functions.BoundedMaxByScore]] aggregate (O(k) state,
    * map-side combine), NOT a row_number window — the oracle's window
    * form is the semantics, not the plan (same contract as q75). */
  def q77QualityTopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val toks = TextFunctions.tokens($"text")
    val scored = Tables.documents(s, dir).withColumn("uniq_ratio",
      size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
    graft.operators.Sampling.topKPerKey(
        scored, "source", "doc_id", "uniq_ratio", 5)
      .select($"doc_id", $"source", $"uniq_ratio")
      .orderBy($"doc_id")
  }

  val q77Sql: String =
    """SELECT doc_id, source, uniq_ratio FROM (
      |  SELECT doc_id, source, uniq_ratio, row_number() OVER (
      |    PARTITION BY source ORDER BY uniq_ratio DESC, doc_id) AS rn
      |  FROM (SELECT doc_id, source,
      |          CAST(len(list_distinct(toks)) AS DOUBLE) /
      |          CAST(len(toks) AS DOUBLE) AS uniq_ratio
      |        FROM (SELECT doc_id, source,
      |                string_split_regex(trim(text), '\s+') AS toks
      |              FROM documents))
      |  WHERE uniq_ratio IS NOT NULL)
      |WHERE rn <= 5 ORDER BY doc_id""".stripMargin

  /** Length-WEIGHTED sample per source: keep 8 docs per source with
    * inclusion bias ∝ n_chars — the soft-preference middle ground
    * between q75's uniform quota and q77's strict best-k. Selection
    * is the deterministic exponential-race priority
    * `portableHash48(id) / weight` (one IEEE division — portable,
    * unlike `pow`-based A-ES keys), through the same bounded
    * no-window aggregate plan as q75/q77. */
  def q78WeightedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Sampling.weightedSamplePerKey(
        Tables.documents(s, dir), "source", "doc_id", "n_chars", 8)
      .select($"doc_id", $"source", $"n_chars")
      .orderBy($"doc_id")
  }

  val q78Sql: String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""SELECT doc_id, source, n_chars FROM (
       |  SELECT doc_id, source, n_chars, row_number() OVER (
       |    PARTITION BY source
       |    ORDER BY CAST($h AS DOUBLE) / n_chars, doc_id) AS rn
       |  FROM documents WHERE n_chars > 0)
       |WHERE rn <= 8 ORDER BY doc_id""".stripMargin
  }

  /** Per-source token-distribution drift vs the whole corpus
    * (total-variation distance, exact-integer inner sum — see
    * [[graft.operators.CorpusStats.tokenDivergence]]): the
    * "did this source drift from the mix" QA gate an ingestion
    * pipeline runs before re-weighting. */
  def q79CorpusDivergence(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.CorpusStats.tokenDivergence(
        Tables.documents(s, dir), "source")
      .orderBy($"slice")
  }

  val q79Sql: String =
    """WITH toks AS (
      |  SELECT source AS slice,
      |    unnest(string_split_regex(trim(text), '\s+')) AS token
      |  FROM documents WHERE source IS NOT NULL),
      |per AS (SELECT slice, token, CAST(count(*) AS HUGEINT) AS c_s
      |        FROM toks GROUP BY 1, 2),
      |gtok AS (SELECT token, sum(c_s) AS c_g FROM per GROUP BY 1),
      |tot AS (SELECT slice, sum(c_s) AS n_s FROM per GROUP BY 1),
      |grand AS (SELECT sum(c_s) AS n_tot FROM per)
      |SELECT slice, CAST(n_s AS BIGINT) AS n_tokens,
      |  CAST(vocab AS BIGINT) AS vocab,
      |  CAST(present + (n_tot - cg_present) * n_s AS DOUBLE) /
      |  CAST(2 * n_tot * n_s AS DOUBLE) AS tv_dist
      |FROM (
      |  SELECT p.slice, max(t.n_s) AS n_s, count(*) AS vocab,
      |    max(g2.n_tot) AS n_tot,
      |    sum(abs(p.c_s * g2.n_tot - g.c_g * t.n_s)) AS present,
      |    sum(g.c_g) AS cg_present
      |  FROM per p
      |  JOIN gtok g USING (token)
      |  JOIN tot t ON p.slice = t.slice
      |  CROSS JOIN grand g2
      |  GROUP BY p.slice)
      |ORDER BY slice""".stripMargin

  /** Deterministic weighted REPLICATION (epoch mixing): per-source
    * weights in {0.25, 0.75, …, 3.75} (exact quarters — the
    * fractional-part promotion threshold is exact in binary, so the
    * hash comparison replays bit-identically), materialized into
    * copy counts by [[graft.operators.Sampling.replicateByWeight]].
    * Covers down-sampling (w<1 drops rows) and up-sampling in one
    * narrow no-shuffle op. */
  def q80MixtureReplicate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).withColumn("wt",
      lit(0.25) +
        graft.operators.Sampling.portableBucket($"source", 8).cast("double") *
        lit(0.5))
    graft.operators.Sampling.replicateByWeight(docs, "doc_id", "wt")
      .select($"doc_id", $"source", $"n_copies", $"copy_idx")
      .orderBy($"doc_id", $"copy_idx")
  }

  val q80Sql: String = {
    val hs = graft.operators.Sampling.portableHash48Sql(
      "CAST(source AS VARCHAR)")
    val hd = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""WITH w AS (
       |  SELECT doc_id, source,
       |    CAST(0.25 AS DOUBLE) + ($hs % 8) * CAST(0.5 AS DOUBLE) AS wt,
       |    CAST($hd AS DOUBLE) AS h
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, source,
       |    CAST(floor(wt) AS BIGINT) +
       |      (CASE WHEN h < (wt - floor(wt)) * 281474976710656.0
       |            THEN 1 ELSE 0 END) AS n_copies
       |  FROM w)
       |SELECT doc_id, source, n_copies, CAST(copy_idx AS BIGINT) AS copy_idx
       |FROM (SELECT doc_id, source, n_copies,
       |        unnest(generate_series(1, n_copies)) AS copy_idx
       |      FROM c WHERE n_copies > 0)
       |ORDER BY doc_id, copy_idx""".stripMargin
  }

  /** Cross-source duplication matrix (exact-fingerprint provenance
    * audit): how many of source A's docs appear verbatim in source B,
    * and what fraction of A that is — see
    * [[graft.operators.CorpusStats.duplicationMatrix]]. The corpus is
    * augmented with a deterministic `_mirror` slice (a ~2% portable
    * hash sample re-tagged — hash, not modulo, because doc_id stripes
    * correlate with source) so the matrix is non-degenerate at every
    * SF — the synthetic corpus has no natural cross-source verbatim
    * copies at small scale, and a 0-row gate would prove nothing. */
  def q81DupMatrix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val mirrored = docs.unionByName(
      docs.filter(graft.operators.Sampling.portableBucket($"doc_id", 50) === 0)
        .withColumn("source", lit("_mirror")))
    graft.operators.CorpusStats.duplicationMatrix(mirrored, "source")
      .orderBy($"slice_a", $"slice_b")
  }

  val q81Sql: String = {
    val bucket = graft.operators.Sampling.portableBucketSql("doc_id", 50)
    s"""WITH corpus AS (
      |  SELECT source, text FROM documents WHERE source IS NOT NULL
      |  UNION ALL
      |  SELECT '_mirror' AS source, text FROM documents
      |  WHERE $bucket = 0),
      |per AS (
      |  SELECT md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp,
      |    source AS slice, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM corpus GROUP BY 1, 2),
      |tot AS (SELECT slice, CAST(sum(n_docs) AS BIGINT) AS n_total
      |        FROM per GROUP BY 1)
      |SELECT a.slice AS slice_a, b.slice AS slice_b,
      |  CAST(sum(a.n_docs) AS BIGINT) AS n_dup_docs,
      |  CAST(sum(a.n_docs) AS DOUBLE) / CAST(max(t.n_total) AS DOUBLE)
      |    AS dup_frac
      |FROM per a
      |JOIN per b ON a.fp = b.fp AND a.slice <> b.slice
      |JOIN tot t ON t.slice = a.slice
      |GROUP BY 1, 2
      |ORDER BY slice_a, slice_b""".stripMargin
  }

  /** SOFT dedup (stochastic exact-dedup): instead of dropping
    * duplicates, weight every doc 1/cluster-size and materialize the
    * weights with [[graft.operators.Sampling.replicateByWeight]] —
    * each text's expected surviving frequency is EXACTLY 1
    * (E = n_dup · 1/n_dup), so the corpus keeps its text distribution
    * unbiased while shedding duplicate mass, and which copy survives
    * is a deterministic per-id hash draw (layout/retry/engine-stable).
    * The hard-dedup alternative (q23/q38) keeps the canonical min-id
    * copy; the soft form is what a mixing pipeline uses when
    * provenance diversity matters more than a canonical survivor.
    * Corpus augmented with the q81 `_mirror` slice (offset ids, same
    * texts → clusters of 2) — the synthetic corpus has no natural
    * duplicates at the sf0.01 gate. Mirror ids live at
    * `doc_id + 2⁴⁰` — a high-bit slice, not an additive constant near
    * the data's range — and the query GUARDS that every real id is
    * below 2⁴⁰ (raise_error, distributed, no extra pass): a future
    * testdata generation with larger ids fails loudly instead of
    * silently colliding mirror ids with real ones (which would break
    * id uniqueness and make the doc_id-ordered oracle compare
    * layout-dependent). */
  def q82SoftDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val MirrorOffset = 1099511627776L // 2^40
    val docs = Tables.documents(s, dir)
      .withColumn("doc_id",
        when($"doc_id" < MirrorOffset && $"doc_id" >= 0, $"doc_id")
          .otherwise(raise_error(concat(lit("q82: doc_id "),
            $"doc_id".cast("string"),
            lit(" outside [0, 2^40) — the _mirror id offset would collide")))))
    val corpus = docs.unionByName(
      docs.filter(graft.operators.Sampling.portableBucket($"doc_id", 50) === 0)
        .withColumn("doc_id", $"doc_id" + lit(MirrorOffset))
        .withColumn("source", lit("_mirror")))
    val withFp = corpus.withColumn("fp", TextFunctions.fingerprint($"text"))
    val counts = withFp.groupBy($"fp").agg(count(lit(1)).as("n_dup"))
    val weighted = withFp.join(counts, "fp")
      .withColumn("w", lit(1.0) / $"n_dup".cast("double"))
    graft.operators.Sampling.replicateByWeight(weighted, "doc_id", "w")
      .select($"doc_id", $"source", $"n_dup", $"n_copies")
      .orderBy($"doc_id")
  }

  /** q83: the END-TO-END composed training pipeline as ONE oracle-gated
    * query — [[graft.TrainingPipeline.prepare]] run on a deterministic
    * configuration (quality gate → PII mask → span dedup → token
    * re-floor → language ID → corpus dedup at J ≥ 0.5 → per-source
    * quota 15 → 2048-token packing → 95/5 split), with the WHOLE chain
    * replayed in DuckDB. Every stage is individually oracle-gated
    * elsewhere (q20/q63 quality, q69 mask, q70 spans, q21 langID,
    * q38/q39 dedup, q75 quota, q46 packing, q47 split); this query
    * gates their COMPOSITION — stage ordering, mask-before-fingerprint,
    * span-cut-before-shingling, quota-after-dedup, pack-after-quota —
    * which row-accounting specs alone cannot hash-pin. The reference's
    * own `sparktoELKstream.py:77-127` parse→clean→enrich→dedup→sink
    * chain is the same shape; this is its LLM-scale analog.
    *
    * LSH recall note: the corpus-dedup stage runs banded MinHash-LSH
    * while the oracle replays ALL-PAIRS exact Jaccard — the same
    * adjudication as q39/q64 (threshold 0.5 → (90, 30) banding, recall
    * ≥ 0.98 at the threshold and ≈ 1 for the J ≥ 0.8 pairs the planted
    * clusters hold; pair sets verified identical at sf0.01 AND sf0.1). */
  def q83Pipeline(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.TrainingPipeline.prepare(
        Tables.documents(s, dir),
        budget = 2048L,
        jaccardThreshold = 0.5,
        trainPct = 95,
        spanWords = 10,
        domainQuota = Some(("source", 15)))
      .select($"doc_id", $"source", $"n_tokens".cast("long").as("n_tokens"),
        $"lang_pred", $"pack_id", $"split")
      .orderBy($"doc_id")
  }

  /** DuckDB replay of the WHOLE [[q83Pipeline]] chain, assembled from
    * the per-stage oracle fragments (q20/q63 quality SQL, q69 mask
    * regexes via [[TextFunctions]] constants, q70 span CTEs, q21 langID
    * CASE, q39 dedup recursion, q75 quota window, q46 packing cumsum,
    * q47 split bucket). Guard-free denominators: `greatest(len-2, 1)`
    * matches the Spark side exactly for every row the token floor
    * admits (n ≥ 5 → len-2 ≥ 3) and keeps DuckDB from evaluating a
    * 0-division on rows another conjunct already rejects. Shares the
    * curated chain's replay-cost rewrites (see [[curatedChainCtes]]'s
    * notes): the exact shared-shingle pair prefilter (26 → 3.4 s at
    * sf0.01, pair set verified identical) and `AS MATERIALIZED` on
    * the multiply-referenced CTEs. */
  val q83Sql: String = {
    val h = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""WITH RECURSIVE
       |toks0 AS (
       |  SELECT doc_id, source, text,
       |    string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents),
       |quality AS (
       |  SELECT doc_id, source, text FROM toks0
       |  WHERE len(toks) >= 5
       |    AND CAST(len(list_distinct(toks)) AS DOUBLE) /
       |        greatest(CAST(len(toks) AS DOUBLE), 1.0) > 0.2
       |    AND CAST(length(text) - length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS DOUBLE) /
       |        greatest(CAST(length(text) AS DOUBLE), 1.0) < 0.5
       |    AND 1.0 - CAST(len(list_distinct(list_transform(
       |          generate_series(1, greatest(len(toks) - 2, 1)),
       |          i -> array_to_string(toks[i:i+2], ' ')))) AS DOUBLE) /
       |        CAST(greatest(len(toks) - 2, 1) AS DOUBLE) <= 0.6),
       |masked AS (
       |  SELECT doc_id, source,
       |    regexp_replace(regexp_replace(regexp_replace(text,
       |      '${TextFunctions.EmailRe}', '<EMAIL>', 'g'),
       |      '${TextFunctions.PhoneRe}', '<PHONE>', 'g'),
       |      '${TextFunctions.LongDigitsRe}', '<NUM>', 'g') AS text
       |  FROM quality),
       |mtoks AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM masked),
       |chunks AS (
       |  SELECT doc_id,
       |    unnest(generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1)) AS idx,
       |    unnest(list_transform(
       |      generate_series(0, CAST(ceil(len(w) / 10.0) AS BIGINT) - 1),
       |      i -> array_to_string(w[(i*10+1):(i*10+10)], ' '))) AS chunk
       |  FROM mtoks),
       |ckept AS (
       |  SELECT doc_id, idx, chunk,
       |    row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) AS rn
       |  FROM chunks),
       |rebuilt AS (
       |  SELECT doc_id, string_agg(chunk, ' ' ORDER BY idx) AS text
       |  FROM ckept WHERE rn = 1 GROUP BY doc_id),
       |floored AS (
       |  SELECT r.doc_id, m.source, r.text,
       |    len(string_split_regex(trim(r.text), '\\s+')) AS n_tokens
       |  FROM rebuilt r JOIN masked m USING (doc_id)
       |  WHERE len(string_split_regex(trim(r.text), '\\s+')) >= 5),
       |langed AS (
       |  SELECT doc_id, source, text, n_tokens, CASE
       |      WHEN s_en = m AND s_en > 0 THEN 'en'
       |      WHEN s_de = m AND s_de > 0 THEN 'de'
       |      WHEN s_fr = m AND s_fr > 0 THEN 'fr'
       |      WHEN s_es = m AND s_es > 0 THEN 'es'
       |      ELSE 'und' END AS lang_pred
       |  FROM (
       |    SELECT doc_id, source, text, n_tokens,
       |      s_en, s_de, s_fr, s_es, greatest(s_en, s_de, s_fr, s_es) AS m
       |    FROM (
       |      SELECT doc_id, source, text, n_tokens,
       |        len(list_filter(lt, x -> x IN ('the','a','of','and','is'))) AS s_en,
       |        len(list_filter(lt, x -> x IN ('der','die','das','und','ist'))) AS s_de,
       |        len(list_filter(lt, x -> x IN ('le','la','les','et','est'))) AS s_fr,
       |        len(list_filter(lt, x -> x IN ('el','la','los','y','es'))) AS s_es
       |      FROM (SELECT doc_id, source, text, n_tokens,
       |              string_split_regex(trim(text), '\\s+') AS lt
       |            FROM floored)))),
       |exact_kept AS (
       |  SELECT f.* FROM langed f
       |  JOIN (SELECT min(doc_id) AS doc_id FROM langed
       |        GROUP BY md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))) k
       |  USING (doc_id)),
       |sh AS MATERIALIZED (
       |  SELECT doc_id,
       |    list_distinct(list_transform(
       |      generate_series(1, greatest(len(toks) - 2, 1)),
       |      i -> array_to_string(toks[i:i+2], ' '))) AS shingles
       |  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |        FROM exact_kept)
       |  WHERE len(toks) >= 1),
       |shx AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
       |cand AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b
       |  FROM shx a JOIN shx b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |pairs AS (
       |  SELECT id_a, id_b
       |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
       |  JOIN sh b ON b.doc_id = c.id_b
       |  WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE) /
       |        CAST(len(list_distinct(list_concat(a.shingles, b.shingles))) AS DOUBLE) >= 0.5),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION SELECT id_b AS src, id_a AS dst FROM pairs),
       |r(src, dst) AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS id, least(src, min(dst)) AS comp FROM r GROUP BY src),
       |survivors AS MATERIALIZED (
       |  SELECT * FROM exact_kept
       |  WHERE doc_id NOT IN (SELECT id FROM comp WHERE comp < id)),
       |quota AS (
       |  SELECT doc_id, source, n_tokens, lang_pred FROM (
       |    SELECT doc_id, source, n_tokens, lang_pred, row_number() OVER (
       |      PARTITION BY source ORDER BY $h, doc_id) AS rn
       |    FROM survivors)
       |  WHERE rn <= 15),
       |packed AS (
       |  SELECT doc_id, source, n_tokens, lang_pred,
       |    CAST(FLOOR(CAST(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS UNBOUNDED PRECEDING) - n_tokens AS DOUBLE) / 2048) AS BIGINT) AS pack_id
       |  FROM quota)
       |SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens, lang_pred, pack_id,
       |  CASE WHEN $h % 100 < 95 THEN 'train' ELSE 'test' END AS split
       |FROM packed
       |ORDER BY doc_id""".stripMargin
  }

  /** q84: perceptual-hash IMAGE near-dup
    * ([[graft.sources.Multimodal.imageNearDupPairs]]) — the multimodal
    * twin of text SimHash, completing binary media as a DEDUP-CAPABLE
    * column class (q26/q60 covered decode + ANN): 64-bit aHash over
    * the codec's decoded pixel grid, pigeonhole banding (recall 1.0 at
    * the radius by construction), hot-bucket-guarded bucket join,
    * hamming ≤ 4 verify. The corpus is the documents table's media
    * bytes augmented with the q81-style `_mirror` slice (a ~2%
    * portable-hash sample re-planted under high-bit ids — byte-exact
    * duplicate media at every SF, so the query proves real pair
    * recovery, not a 0-row no-op). [[graft.sources.PortableCodec]]'s
    * integer-domain hash override makes every bit replayable in DuckDB
    * ([[q84Sql]]); real-pixel behavior (recompression/brightness
    * robustness on actual PNGs via [[graft.sources.ImageIoCodec]]) is
    * pinned in MultimodalSpec. */
  def q84ImageNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val MirrorOffset = 1099511627776L // 2^40, same guarded slice as q82
    val docs = Tables.documents(s, dir)
      .withColumn("doc_id",
        when($"doc_id" < MirrorOffset && $"doc_id" >= 0, $"doc_id")
          .otherwise(raise_error(concat(lit("q84: doc_id "),
            $"doc_id".cast("string"),
            lit(" outside [0, 2^40) — the _mirror id offset would collide")))))
    val corpus = docs.unionByName(
      docs.filter(graft.operators.Sampling.portableBucket($"doc_id", 50) === 0)
        .withColumn("doc_id", $"doc_id" + lit(MirrorOffset)))
    Multimodal.imageNearDupPairs(
        Multimodal.mediaFromText(corpus), maxHamming = 4,
        codec = graft.sources.PortableCodec)
      .orderBy($"id_a", $"id_b")
  }

  /** Independent DuckDB replay of the portable aHash-64 pipeline: the
    * media bytes are the UTF-8 of `text` (q60's play), grid cell j =
    * `(md5h48(bytes ++ "|j") % 1000)`, bit j = the INTEGER inequality
    * `64·v_j > Σv` (no floats anywhere), words = bits [0,32) / [32,64)
    * — then the same pigeonhole banding as the Spark side, GENERATED
    * from [[Dedup.simHashBandSpec]] (the q28 discipline: one spec
    * drives both engines, the oracle cannot drift), and the
    * bit_count(xor) hamming verify. */
  val q84Sql: String = {
    val bucket = graft.operators.Sampling.portableBucketSql("doc_id", 50)
    // the same word/straddle split as Dedup.sigChunkExpr, over the two
    // 32-bit perceptual-hash words
    def chunkSql(off: Int, w: Int): String = {
      val mask = (1L << w) - 1
      val i = off / 32
      val r = off % 32
      if (r + w <= 32) s"((sig$i >> $r) & $mask)"
      else s"(((sig0 >> $r) | (sig1 << ${32 - r})) & $mask)"
    }
    val chunkCases = Dedup.simHashBandSpec(64, 4).zipWithIndex
      .map { case ((off, w), b) => s"WHEN $b THEN ${chunkSql(off, w)}" }
      .mkString("\n    ")
    val bandRows = Dedup.simHashBandSpec(64, 4).indices
      .map(b => s"($b)").mkString(", ")
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1099511627776 AS doc_id, text
       |  FROM documents WHERE $bucket = 0),
       |feats AS (
       |  SELECT doc_id, j,
       |    CAST(md5_number_upper(text || '|' || CAST(j AS VARCHAR))
       |         & 281474976710655 AS BIGINT) % 1000 AS v
       |  FROM corpus CROSS JOIN range(0, 64) r(j)),
       |tot AS (SELECT doc_id, SUM(v) AS s FROM feats GROUP BY doc_id),
       |sig AS (
       |  SELECT f.doc_id,
       |    SUM(CASE WHEN 64 * f.v > t.s AND f.j < 32
       |             THEN (CAST(1 AS BIGINT) << f.j) ELSE 0 END) AS sig0,
       |    SUM(CASE WHEN 64 * f.v > t.s AND f.j >= 32
       |             THEN (CAST(1 AS BIGINT) << (f.j - 32)) ELSE 0 END) AS sig1
       |  FROM feats f JOIN tot t USING (doc_id) GROUP BY f.doc_id),
       |banded AS (
       |  SELECT doc_id, sig0, sig1, b.band AS band, CASE b.band
       |    $chunkCases
       |    END AS chunk
       |  FROM sig, (VALUES $bandRows) AS b(band))
       |SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
       |  CAST(bit_count(xor(a.sig0, b.sig0)) +
       |       bit_count(xor(a.sig1, b.sig1)) AS BIGINT) AS hamming
       |FROM banded a JOIN banded b
       |  ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.sig0, b.sig0)) +
       |      bit_count(xor(a.sig1, b.sig1)) <= 4
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** q85: sketched cross-slice overlap matrix — the KMV estimation
    * twin of q81's exact duplication matrix
    * ([[graft.operators.Sketches.kmvOverlapMatrix]]): distinct 3-gram
    * estimates per source slice, pairwise union estimates, and Jaccard
    * overlap, all from one corpus scan that ships ≤ k = 256 hashes per
    * slice. The portable md5-48 gram hash makes the sketch — and hence
    * every estimate — bit-replayable in DuckDB (sort + LIMIT k), the
    * exactness HLL register layouts can't give q34. At both SFs the
    * per-slice 3-gram vocabulary (≈1.3k / ≈10k distinct) exceeds k, so
    * the query exercises the genuine ESTIMATION regime, not the
    * exhaustive-sketch fallback. */
  def q85KmvOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val grams = Tables.documents(s, dir)
      .filter($"source".isNotNull)
      .select($"source", explode(TextFunctions.shingles($"text", 3)).as("gram"))
    graft.operators.Sketches.kmvOverlapMatrix(
        grams, "source",
        graft.operators.Sampling.portableHash48($"gram"), k = 256)
      .orderBy($"slice_a", $"slice_b")
  }

  /** DuckDB replay: same truncating-slice 3-grams as the native
    * shingler, md5-48 hash, per-slice sort + LIMIT 256 = the sketch;
    * union-k via row_number over the two sketches' merged distinct
    * hashes; the (k−1)·2^48 // h₍ₖ₎ estimator in integer division. */
  val q85Sql: String = {
    val k = 256
    val numer = (k - 1).toLong * (1L << 48)
    s"""WITH g AS (
       |  SELECT source AS slice, list_transform(
       |    generate_series(1, greatest(len(toks) - 2, 1)),
       |    i -> array_to_string(toks[i:i+2], ' ')) AS grams
       |  FROM (SELECT source, string_split_regex(trim(text), '\\s+') AS toks
       |        FROM documents WHERE source IS NOT NULL)),
       |h AS (SELECT DISTINCT slice,
       |        CAST(md5_number_upper(gram) & 281474976710655 AS BIGINT) AS h
       |      FROM (SELECT slice, unnest(grams) AS gram FROM g)),
       |rk AS (SELECT slice, h,
       |         row_number() OVER (PARTITION BY slice ORDER BY h) AS rn
       |       FROM h),
       |sk AS (SELECT slice, h FROM rk WHERE rn <= $k),
       |per AS (SELECT slice, count(*) AS n, max(h) AS hk FROM sk GROUP BY 1),
       |est AS (SELECT slice,
       |          CAST(CASE WHEN n < $k THEN n ELSE $numer // hk END AS BIGINT)
       |            AS est
       |        FROM per),
       |pairs AS (SELECT a.slice AS sa, b.slice AS sb
       |          FROM per a, per b WHERE a.slice < b.slice),
       |uni AS (
       |  SELECT p.sa, p.sb, x.h,
       |    bool_or(x.slice = p.sa) AS in_a, bool_or(x.slice = p.sb) AS in_b
       |  FROM pairs p JOIN sk x ON x.slice IN (p.sa, p.sb)
       |  GROUP BY 1, 2, 3),
       |runi AS (SELECT *,
       |           row_number() OVER (PARTITION BY sa, sb ORDER BY h) AS rn,
       |           count(*) OVER (PARTITION BY sa, sb) AS n_union
       |         FROM uni),
       |agg AS (
       |  SELECT sa, sb,
       |    CAST(count(*) AS BIGINT) AS k_eff,
       |    CAST(sum(CASE WHEN in_a AND in_b THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_shared,
       |    max(n_union) AS n_union, max(CASE WHEN rn = $k THEN h END) AS hk
       |  FROM runi WHERE rn <= $k GROUP BY 1, 2)
       |SELECT a.sa AS slice_a, a.sb AS slice_b,
       |  ea.est AS est_a, eb.est AS est_b,
       |  CAST(CASE WHEN a.n_union < $k THEN a.n_union
       |            ELSE $numer // a.hk END AS BIGINT) AS union_est,
       |  a.n_shared, a.k_eff,
       |  CAST(a.n_shared AS DOUBLE) / CAST(a.k_eff AS DOUBLE) AS jaccard_est
       |FROM agg a
       |JOIN est ea ON ea.slice = a.sa
       |JOIN est eb ON eb.slice = a.sb
       |ORDER BY slice_a, slice_b""".stripMargin
  }

  /** q116: contamination FRACTION
    * ([[graft.operators.Dedup.contaminationFraction]]) — the
    * tolerance-threshold decontamination readout: per corpus doc,
    * what share of its distinct 8-grams appear in the q68 benchmark
    * slice. Bloom-pruned exact verify (q86's discipline), so the
    * oracle is the EXACT counting SQL; `frac` is the raw IEEE
    * quotient (un-rounded — see the operator's scaladoc on the
    * 1/32-boundary rounding divergence). */
  def q116ContaminationFraction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    graft.operators.Dedup.contaminationFraction(
        docs.filter($"doc_id" % 20 =!= 0),
        docs.filter($"doc_id" % 20 === 0),
        n = 8, numBits = 1 << 17)
      .orderBy($"doc_id")
  }

  /** DuckDB replay: q68's gram CTE with per-doc hit/total counts —
    * deliberately Bloom-free like q86's oracle. */
  val q116Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 7, 1)),
      |    i -> array_to_string(toks[i:i+7], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 20 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 20 <> 0),
      |tot AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams
      |        FROM g WHERE doc_id % 20 <> 0),
      |hit AS (SELECT c.doc_id, CAST(count(*) AS BIGINT) AS n_hit
      |        FROM corp c JOIN bench b ON c.gram = b.gram
      |        GROUP BY 1)
      |SELECT t.doc_id, t.n_grams,
      |  coalesce(h.n_hit, 0) AS n_hit,
      |  CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
      |    AS frac
      |FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
      |ORDER BY t.doc_id""".stripMargin

  /** q121: decontamination through a PERSISTED sketch artifact — the
    * cross-batch reuse lifecycle ([[graft.operators.SketchStore]]):
    * benchmark grams written as parquet, the Bloom filter written as
    * a stamped artifact, BOTH read back cold, then
    * [[graft.operators.Dedup.decontaminateBloomPrebuilt]] over the
    * loaded pair. The oracle is the EXACT decontamination SQL
    * (mod-7 / 5-gram — dials disjoint from q68/q86/q116, so the
    * artifact path gates independently): a round-trip that changed
    * one bit of the filter or one gram row would surface as a
    * survivor-set diff. */
  def q121SketchArtifactDecontaminate(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val bench = docs.filter($"doc_id" % 7 === 0)
    val corpus = docs.filter($"doc_id" % 7 =!= 0)
    // fixed scratch path, overwritten per invocation — a fresh temp
    // dir per call leaked ~2 artifact dirs per bench pass (and the
    // returned frame reads the path lazily, so eager cleanup would
    // race execution)
    val tmp = "target/scratch/q121_sketch"
    val domain = "xxhash64(5-gram(text))"
    // build ONCE (the nightly job)...
    val grams = Dedup.benchmarkGrams(bench, n = 5)
    grams.write.mode("overwrite").parquet(s"$tmp/grams")
    SketchStore.writeBloom(s,
      graft.operators.Bloom.buildWords(grams, "gram_h", 1 << 17),
      s"$tmp/bloom", domain)
    // ...probe from a COLD read (the per-batch jobs)
    Dedup.decontaminateBloomPrebuilt(corpus,
        s.read.parquet(s"$tmp/grams"),
        SketchStore.readBloom(s, s"$tmp/bloom", domain), n = 5)
      .select($"doc_id", $"source").orderBy($"doc_id")
  }

  /** DuckDB replay: the exact mod-7 / 5-gram decontamination —
    * deliberately artifact- and Bloom-free, proving the persisted
    * sketch path changes nothing but the bytes moved. */
  val q121Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 4, 1)),
      |    i -> array_to_string(toks[i:i+4], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 7 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 7 <> 0),
      |hit AS (SELECT DISTINCT c.doc_id FROM corp c
      |        JOIN bench b ON c.gram = b.gram)
      |SELECT d.doc_id, d.source
      |FROM documents d
      |WHERE d.doc_id % 7 <> 0
      |  AND NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** q86: Bloom-pruned decontamination
    * ([[graft.operators.Dedup.decontaminateBloom]]) — bit-identical
    * output to the exact gram-collision gate (the Bloom only PRUNES
    * before the exact verify join; false positives die there, false
    * negatives don't exist), so the ORACLE IS THE EXACT SQL: the
    * approximation is invisible in the result, only in the bytes
    * broadcast. Different split (mod 10) and gram width (6) than q68,
    * so the two decontamination paths gate independently. */
  def q86BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val survivors = graft.operators.Dedup.decontaminateBloom(
      docs.filter($"doc_id" % 10 =!= 0),
      docs.filter($"doc_id" % 10 === 0),
      n = 6, numBits = 1 << 17)
    survivors.select($"doc_id", $"source").orderBy($"doc_id")
  }

  /** DuckDB replay: the EXACT decontamination semantics (q68's shape
    * at mod-10 / 6-gram) — deliberately Bloom-free, proving the pruned
    * plan changes nothing but the data volume. */
  val q86Sql: String =
    """WITH g AS (
      |  SELECT doc_id, list_distinct(list_transform(
      |    generate_series(1, greatest(len(toks) - 5, 1)),
      |    i -> array_to_string(toks[i:i+5], ' '))) AS grams
      |  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
      |        FROM documents)),
      |bench AS (SELECT DISTINCT unnest(grams) AS gram FROM g
      |          WHERE doc_id % 10 = 0),
      |corp AS (SELECT doc_id, unnest(grams) AS gram FROM g
      |         WHERE doc_id % 10 <> 0),
      |hit AS (SELECT DISTINCT c.doc_id FROM corp c
      |        JOIN bench b ON c.gram = b.gram)
      |SELECT d.doc_id, d.source
      |FROM documents d
      |WHERE d.doc_id % 10 <> 0
      |  AND NOT EXISTS (SELECT 1 FROM hit h WHERE h.doc_id = d.doc_id)
      |ORDER BY d.doc_id""".stripMargin

  /** q87: context-window chunking
    * ([[graft.operators.Chunking.chunkByTokens]]) — every doc becomes
    * overlapping 40-token windows advancing by 30 (25% overlap), the
    * standard context-prep step between cleaning and packing. A purely
    * narrow plan: zero shuffles (plan-gated in ChunkingSpec), output
    * strings replay exactly in DuckDB via list slicing. */
  def q87Chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Chunking.chunkByTokens(
        Tables.documents(s, dir), chunkTokens = 40, stride = 30)
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** DuckDB replay: same window arithmetic (1 + ceil((n−40)/30)
    * windows, exact under double at token magnitudes), 1-based
    * inclusive list slicing. */
  val q87Sql: String =
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks,
      |    CASE WHEN trim(text) = '' THEN 0
      |         ELSE len(string_split_regex(trim(text), '\s+')) END AS nt
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, toks,
      |    CASE WHEN nt <= 40 THEN 1
      |         ELSE 1 + CAST(ceil(CAST(nt - 40 AS DOUBLE) / 30) AS INT)
      |    END AS n_chunks
      |  FROM t WHERE nt > 0)
      |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
      |  array_to_string(toks[i*30+1 : i*30+40], ' ') AS chunk_text,
      |  CAST(len(toks[i*30+1 : i*30+40]) AS BIGINT) AS n_tokens
      |FROM (SELECT doc_id, toks,
      |        unnest(generate_series(0, n_chunks - 1)) AS i
      |      FROM c)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** The q88 query workload: five multi-term lexical queries over the
    * corpus vocabulary — one (query_id, term) row each, shared between
    * the Spark side and the generated VALUES list in [[q88Sql]] so the
    * two engines cannot drift. */
  val Bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "window", 1L -> "agg",
    2L -> "customer", 2L -> "order", 2L -> "line",
    3L -> "hash", 3L -> "join", 3L -> "table",
    4L -> "slow", 4L -> "scan", 4L -> "filter",
    5L -> "data", 5L -> "column", 5L -> "value")

  /** q88: quantized-BM25 lexical retrieval
    * ([[graft.operators.Retrieval.bm25TopK]]) — top-10 docs per query
    * by integer-exact BM25 (tf saturation + length norm at k₁=1.2,
    * b=0.75; log₂-quantized idf via integer bit-length), the lexical
    * twin of the ANN searches. Every score is a 64-bit integer, so the
    * DuckDB replay is hash-exact — no `ln`, no float sums. */
  def q88Bm25(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val queries = Bm25Queries.toDF("query_id", "term")
    graft.operators.Retrieval.bm25TopK(
        Tables.documents(s, dir), queries, k = 10)
      .orderBy($"query_id", $"rank")
  }

  /** DuckDB replay: identical integer formulas (`//` = `div` on
    * non-negative operands), row_number over (score DESC, doc_id) for
    * the rank. */
  val q88Sql: String = {
    val values = Bm25Queries
      .map { case (q, t) => s"($q, '$t')" }.mkString(", ")
    s"""WITH base AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents WHERE trim(text) <> ''),
       |stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n,
       |    CAST((100 * sum(len(toks))) // count(*) AS BIGINT) AS a
       |  FROM base),
       |q(query_id, term) AS (VALUES $values),
       |toks AS (SELECT doc_id, unnest(toks) AS term FROM base),
       |dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM base),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM toks WHERE term IN (SELECT DISTINCT term FROM q)
       |  GROUP BY 1, 2),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |          FROM tf GROUP BY 1),
       |cand AS (
       |  SELECT q.query_id, tf.doc_id,
       |    CAST((22 * tf.tf * s.a * 1000) //
       |         (10 * tf.tf * s.a + 3 * s.a + 9 * dl.dl * 100) AS BIGINT)
       |      AS tfq,
       |    CAST(length(bin(((2 * s.n - 2 * d.df + 1) * 1048576) //
       |                    (2 * d.df + 1))) AS BIGINT) AS idfq
       |  FROM tf
       |  JOIN dfreq d USING (term)
       |  JOIN dl USING (doc_id)
       |  JOIN q ON q.term = tf.term
       |  CROSS JOIN stats s),
       |sc AS (SELECT query_id, doc_id,
       |         CAST(sum(tfq * idfq) AS BIGINT) AS score
       |       FROM cand GROUP BY 1, 2),
       |r AS (SELECT *, row_number() OVER
       |        (PARTITION BY query_id ORDER BY score DESC, doc_id) AS rnk
       |      FROM sc)
       |SELECT CAST(query_id AS BIGINT) AS query_id,
       |  CAST(rnk AS BIGINT) AS rank, doc_id, score
       |FROM r WHERE rnk <= 10
       |ORDER BY query_id, rank""".stripMargin
  }

  val q82Sql: String = {
    val bucket = graft.operators.Sampling.portableBucketSql("doc_id", 50)
    val hd = graft.operators.Sampling.portableHash48Sql(
      "CAST(doc_id AS VARCHAR)")
    s"""WITH corpus AS (
       |  SELECT doc_id, source, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1099511627776 AS doc_id, '_mirror' AS source, text
       |  FROM documents WHERE $bucket = 0),
       |fps AS (
       |  SELECT doc_id, source,
       |    md5(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS fp
       |  FROM corpus),
       |cnt AS (SELECT fp, CAST(count(*) AS BIGINT) AS n_dup
       |        FROM fps GROUP BY 1),
       |wtd AS (
       |  SELECT f.doc_id, f.source, c.n_dup,
       |    CAST(1.0 AS DOUBLE) / c.n_dup AS w,
       |    CAST($hd AS DOUBLE) AS h
       |  FROM fps f JOIN cnt c USING (fp))
       |SELECT doc_id, source, n_dup,
       |  CAST(floor(w) AS BIGINT) +
       |    (CASE WHEN h < (w - floor(w)) * 281474976710656.0
       |          THEN 1 ELSE 0 END) AS n_copies
       |FROM wtd
       |WHERE CAST(floor(w) AS BIGINT) +
       |    (CASE WHEN h < (w - floor(w)) * 281474976710656.0
       |          THEN 1 ELSE 0 END) > 0
       |ORDER BY doc_id""".stripMargin
  }

  /** Shared oracle fragment for the sequence near-dup family: the
    * [[graft.operators.Dedup.sigChunkExpr]] word/straddle split over
    * two 32-bit fingerprint words, generated from the SAME
    * [[Dedup.simHashBandSpec]] that drives the Spark banding (the
    * q84/q28 discipline — one spec, two engines, no drift). */
  private def seqChunkCases(maxHamming: Int): (String, String) = {
    def chunkSql(off: Int, w: Int): String = {
      val mask = (1L << w) - 1
      val i = off / 32
      val r = off % 32
      if (r + w <= 32) s"((sig$i >> $r) & $mask)"
      else s"(((sig0 >> $r) | (sig1 << ${32 - r})) & $mask)"
    }
    val cases = Dedup.simHashBandSpec(64, maxHamming).zipWithIndex
      .map { case ((off, w), b) => s"WHEN $b THEN ${chunkSql(off, w)}" }
      .mkString("\n    ")
    val bands = Dedup.simHashBandSpec(64, maxHamming).indices
      .map(b => s"($b)").mkString(", ")
    (cases, bands)
  }

  /** DuckDB replay of the frame-majority pipeline at (`salt`,
    * `maxHamming`, `majorityPct`, `stride`) — n_frames from the
    * portable decode (`1 + ((md5h48(text) >> 32) % 16)`), per-frame
    * fingerprint cells from `md5(text || '|<salt><f>' || '|' || j) %
    * 1000` (the integer aHash domain, q84's play per frame), banding
    * + hamming verify constrained to the SAME frame ordinal, then the
    * integer majority test against the longer side's sampled count. */
  private def seqNearDupSql(salt: String, maxHamming: Int,
      majorityPct: Int, stride: Int): String = {
    val bucket = graft.operators.Sampling.portableBucketSql("doc_id", 50)
    val (chunkCases, bandRows) = seqChunkCases(maxHamming)
    s"""WITH corpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 1099511627776 AS doc_id, text
       |  FROM documents WHERE $bucket = 0),
       |meta AS (
       |  SELECT doc_id, text,
       |    1 + CAST(((md5_number_upper(text) & 281474976710655) >> 32) % 16
       |      AS INT) AS n_frames
       |  FROM corpus),
       |frames AS (
       |  SELECT doc_id, text, f.f AS frame_idx
       |  FROM meta CROSS JOIN range(0, 16, $stride) f(f)
       |  WHERE f.f < n_frames),
       |nf AS (SELECT doc_id, COUNT(*) AS n_sampled FROM frames GROUP BY doc_id),
       |feats AS (
       |  SELECT doc_id, frame_idx, j,
       |    CAST(md5_number_upper(text || '|$salt' || CAST(frame_idx AS VARCHAR)
       |           || '|' || CAST(j AS VARCHAR))
       |         & 281474976710655 AS BIGINT) % 1000 AS v
       |  FROM frames CROSS JOIN range(0, 64) r(j)),
       |tot AS (SELECT doc_id, frame_idx, SUM(v) AS s
       |        FROM feats GROUP BY doc_id, frame_idx),
       |sig AS (
       |  SELECT f.doc_id, f.frame_idx,
       |    SUM(CASE WHEN 64 * f.v > t.s AND f.j < 32
       |             THEN (CAST(1 AS BIGINT) << f.j) ELSE 0 END) AS sig0,
       |    SUM(CASE WHEN 64 * f.v > t.s AND f.j >= 32
       |             THEN (CAST(1 AS BIGINT) << (f.j - 32)) ELSE 0 END) AS sig1
       |  FROM feats f JOIN tot t USING (doc_id, frame_idx)
       |  GROUP BY f.doc_id, f.frame_idx),
       |banded AS (
       |  SELECT doc_id, frame_idx, sig0, sig1, b.band AS band, CASE b.band
       |    $chunkCases
       |    END AS chunk
       |  FROM sig, (VALUES $bandRows) AS b(band)),
       |fpairs AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.frame_idx
       |  FROM banded a JOIN banded b
       |    ON a.band = b.band AND a.chunk = b.chunk
       |    AND a.frame_idx = b.frame_idx AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.sig0, b.sig0)) +
       |        bit_count(xor(a.sig1, b.sig1)) <= $maxHamming),
       |m AS (SELECT id_a, id_b, CAST(COUNT(*) AS BIGINT) AS n_match
       |      FROM fpairs GROUP BY id_a, id_b)
       |SELECT m.id_a, m.id_b, m.n_match,
       |  CAST(na.n_sampled AS BIGINT) AS n_frames_a,
       |  CAST(nb.n_sampled AS BIGINT) AS n_frames_b
       |FROM m
       |JOIN nf na ON na.doc_id = m.id_a
       |JOIN nf nb ON nb.doc_id = m.id_b
       |WHERE 100 * m.n_match >=
       |  $majorityPct * greatest(na.n_sampled, nb.n_sampled)
       |ORDER BY m.id_a, m.id_b""".stripMargin
  }

  private val SeqMirrorOffset = 1099511627776L // 2^40, the q82/q84 slice

  private def seqCorpus(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
      .withColumn("doc_id",
        when($"doc_id" < SeqMirrorOffset && $"doc_id" >= 0, $"doc_id")
          .otherwise(raise_error(concat(lit("seq near-dup: doc_id "),
            $"doc_id".cast("string"),
            lit(" outside [0, 2^40) — the _mirror id offset would collide")))))
    docs.unionByName(
      docs.filter(graft.operators.Sampling.portableBucket($"doc_id", 50) === 0)
        .withColumn("doc_id", $"doc_id" + lit(SeqMirrorOffset)))
  }

  /** q123: frame-majority VIDEO near-dup
    * ([[graft.sources.Multimodal.videoNearDupPairs]]) — the
    * sequence-media member of the near-dup family: per-frame aHash
    * fingerprints ([[graft.sources.MediaCodec.frameHash]]) ride the
    * SAME pigeonhole banding + hot-bucket machinery as text SimHash
    * and image aHash, with the frame ordinal IN the bucket key, and
    * two videos pair when ≥ 50% of the longer side's frames match at
    * hamming ≤ 4. The corpus is the documents media bytes plus the
    * q84-style byte-exact `_mirror` slice (every mirrored frame
    * matches at hamming 0 → majority 100% — real recovered pairs at
    * every SF). [[graft.sources.PortableCodec]]'s integer md5 domain
    * makes every frame fingerprint replayable in DuckDB. */
  def q123VideoNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.videoNearDupPairs(
        Multimodal.mediaFromText(seqCorpus(s, dir)),
        maxHamming = 4, majorityPct = 50, stride = 1,
        codec = graft.sources.PortableCodec)
      .orderBy($"id_a", $"id_b")
  }

  val q123Sql: String = seqNearDupSql("f", maxHamming = 4,
    majorityPct = 50, stride = 1)

  /** q124: window-majority AUDIO near-dup
    * ([[graft.sources.Multimodal.audioNearDupPairs]]) — the audio
    * twin of q123 on deliberately DIFFERENT dials so the two gate
    * independently: the chroma salt domain (`|a` — identical bytes
    * never cross-match between video frames and audio windows),
    * stride-2 window sampling (the sampled-count majority
    * denominator, not raw n_frames), hamming ≤ 6 (7 pigeonhole
    * bands), and a 60% majority. */
  def q124AudioNearDup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Multimodal.audioNearDupPairs(
        Multimodal.mediaFromText(seqCorpus(s, dir)),
        maxHamming = 6, majorityPct = 60, stride = 2,
        codec = graft.sources.PortableCodec)
      .orderBy($"id_a", $"id_b")
  }

  val q124Sql: String = seqNearDupSql("a", maxHamming = 6,
    majorityPct = 60, stride = 2)
}
