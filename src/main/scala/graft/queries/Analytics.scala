package graft.queries

import graft.Tables
import graft.OracleMath.Dec
import graft.operators.{Funnel, Graph, MaterializedRollup, Retrieval, Sampling}
import graft.sources.Lake
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 analytics surface: bucketed co-located joins, TF-IDF
  * keyword extraction, integer-exact PageRank, and ordered-step funnel
  * analysis. Each query is oracle-backed (DuckDB replays the identical
  * integer/timestamp arithmetic) and each underlying operator carries
  * its own 100 TB scale contract in its scaladoc
  * ([[graft.sources.Lake.writeBucketed]], [[Retrieval.tfIdfTopTerms]],
  * [[graft.operators.Graph.pageRankInt]],
  * [[graft.operators.Funnel.funnelTimes]]).
  */
object Analytics {

  /** The bucketed orders ⋈ lineitem join (pre-aggregate), split out so
    * the spec can plan-gate the exchange-free SortMergeJoin the
    * bucketing buys. Writes both sides as bucketed external tables
    * under `base` and joins them through the catalog. */
  private[graft] def bucketedOrdersItems(s: SparkSession, dir: String,
      tag: String, base: String): DataFrame = {
    import s.implicits._
    val to = s"g90_orders_$tag"
    val tl = s"g90_items_$tag"
    val o = Tables.orders(s, dir).select($"o_orderkey", $"o_orderpriority")
    val l = Tables.lineitem(s, dir).select(
      $"l_orderkey".as("o_orderkey"), $"l_extendedprice", $"l_discount")
    Lake.writeBucketed(o, to, "o_orderkey", 8, path = Some(s"$base/o"))
    Lake.writeBucketed(l, tl, "o_orderkey", 8, path = Some(s"$base/l"))
    // merge hint: the point is the bucketed sort-merge path (exchange-
    // and sort-free join), not a broadcast that happens to fit at test SF
    s.table(to).hint("merge").join(s.table(tl), "o_orderkey")
  }

  /** Bucketed co-located join (SURVEY §2.6 scale path): both join
    * sides pre-hashed into the same 8 sorted buckets on the join key,
    * so the join runs with NO exchange and NO sort — the layout
    * investment that turns every recurring 100 TB fact-fact join into
    * a local zip of sorted bucket files. Correctness gate: revenue per
    * order priority must equal the plain (unbucketed) join's answer. */
  def q90BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tag = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    val base = java.nio.file.Files
      .createTempDirectory("graft_q90_bucketed").toString
    try {
      bucketedOrdersItems(s, dir, tag, base)
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          floor(sum($"l_extendedprice".cast(Dec) *
            (lit(1).cast(Dec) - $"l_discount".cast(Dec))) * 100)
            .cast("long").as("revenue_cents"))
        .orderBy($"o_orderpriority")
        .localCheckpoint()
    } finally {
      for (t <- Seq(s"g90_orders_$tag", s"g90_items_$tag"))
        s.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(base)
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
  }

  val q90Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS n_items,
      |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT)
      |    AS revenue_cents
      |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TF-IDF keyword extraction: top-3 characteristic terms per doc in
    * the shared quantized-integer idf domain of q88's BM25. */
  def q91TfidfTerms(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Retrieval.tfIdfTopTerms(Tables.documents(s, dir), k = 3)
      .orderBy($"doc_id", $"rank")
  }

  val q91Sql: String = {
    val hash = Sampling.portableHash48Sql("term")
    s"""WITH base AS (
       |  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
       |  FROM documents WHERE trim(text) <> ''),
       |consts AS (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
       |tf AS (
       |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, unnest(toks) AS term FROM base)
       |  GROUP BY 1, 2),
       |dfreq AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df,
       |    $hash AS term_id
       |  FROM tf GROUP BY term),
       |scored AS (
       |  SELECT tf.doc_id, tf.term, d.term_id,
       |    tf.tf * CAST(length(bin(((2 * c.n - 2 * d.df + 1) * 1048576)
       |      // (2 * d.df + 1))) AS BIGINT) AS score
       |  FROM tf JOIN dfreq d USING (term) CROSS JOIN consts c),
       |r AS (SELECT *, row_number() OVER
       |        (PARTITION BY doc_id ORDER BY score DESC, term_id) AS rnk
       |      FROM scored)
       |SELECT doc_id, CAST(rnk AS BIGINT) AS rank, term, score
       |FROM r WHERE rnk <= 3
       |ORDER BY doc_id, rank""".stripMargin
  }

  /** q126: positional phrase search — docs containing the contiguous
    * token sequence "table part", with occurrence count and first
    * 1-based position ([[Retrieval.phraseSearch]]: postings pruned to
    * the phrase vocabulary before the one corpus shuffle, contiguity
    * via codegen'd anchor-set intersection — no postings self-join).
    * The oracle replays the positional index as the textbook
    * adjacency join, so the two formulations gate each other. */
  def q126PhraseSearch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Retrieval.phraseSearch(Tables.documents(s, dir),
        Seq("table", "part"))
      .orderBy($"doc_id")
  }

  val q126Sql: String =
    """WITH toks AS (
      |  SELECT doc_id,
      |    unnest(string_split_regex(trim(text), '\s+')) AS tok,
      |    generate_subscripts(string_split_regex(trim(text), '\s+'), 1)
      |      AS pos
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT t0.doc_id, CAST(count(*) AS BIGINT) AS hits,
      |  CAST(min(t0.pos) AS BIGINT) AS first_pos
      |FROM toks t0
      |JOIN toks t1 ON t1.doc_id = t0.doc_id AND t1.pos = t0.pos + 1
      |WHERE t0.tok = 'table' AND t1.tok = 'part'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q127: incremental materialized-rollup maintenance through the
    * FULL lake lifecycle ([[operators.MaterializedRollup.refreshLake]]
    * — r13 maintained the rollup as DataFrames; it now persists via
    * [[graft.sources.Lake.upsertLatest]] keyed on (event_type, day),
    * date-partitioned by the day itself): batch 1 folds history
    * (ts < 2024-01-24) into a fresh lake, batch 2 folds the delta —
    * reading back the batch-1 rows COLD and rewriting only the
    * delta's days — and the result is read from the lake. History is
    * never rescanned, restarts survive (per-key batch stamps make
    * replays idempotent — MaterializedRollupSpec's crash cases). The
    * oracle is the FULL RECOMPUTE over all events, so one wrong merge
    * term, a double-fold, or an upsert losing a day diffs. Scratch
    * lake is a per-invocation temp dir (the q74/q133 pattern). */
  def q127IncrementalRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val cutUs = 1706054400000000L // 2024-01-24T00:00:00Z, epoch µs
    graft.Scratch.withTempDir(s, "graft_q127_rollup") { base =>
      MaterializedRollup.refreshLake(s, s"$base/rollup",
        ev.filter(unix_micros($"ts") < cutUs), batchId = 1L)
      MaterializedRollup.refreshLake(s, s"$base/rollup",
        ev.filter(unix_micros($"ts") >= cutUs), batchId = 2L)
      MaterializedRollup.readout(
          MaterializedRollup.readLake(s, s"$base/rollup"))
        .orderBy($"event_type", $"day")
        .localCheckpoint()
    }
  }

  val q127Sql: String =
    """WITH v AS (
      |  SELECT event_type,
      |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
      |    CAST(floor(CAST(value AS DOUBLE) * 10000.0) AS BIGINT) AS qv
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value))
      |SELECT event_type, day, CAST(count(*) AS BIGINT) AS n,
      |  CAST(SUM(qv) AS BIGINT) AS sum_qv,
      |  CAST(MIN(qv) AS BIGINT) AS min_qv,
      |  CAST(MAX(qv) AS BIGINT) AS max_qv,
      |  CAST(SUM(qv) AS DOUBLE) / (count(*) * 10000.0) AS mean_v
      |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Supplier-node offset separating the two halves of the bipartite
    * customer↔supplier graph (custkeys stay far below it at any SF). */
  private val SuppBase = 1000000000L

  /** Integer-exact PageRank over the bipartite customer↔supplier
    * trade graph (edges = distinct (customer, supplier) pairs through
    * orders⋈lineitem, symmetrized): the top-25 supplier nodes by
    * authority. Every iteration is 64-bit floor arithmetic, so five
    * iterations replay bit-for-bit in DuckDB. */
  def q92PageRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val pairs = Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey".as("cust"), $"l_suppkey".as("supp"))
      .distinct()
    val edges = pairs
      .select($"cust".as("src"), ($"supp" + lit(SuppBase)).as("dst"))
      .union(pairs
        .select(($"supp" + lit(SuppBase)).as("src"), $"cust".as("dst")))
    // pairs is distinct and the two directions live in disjoint id
    // ranges, so the edge list is already duplicate-free
    Graph.pageRankInt(edges, iters = 5, dedupEdges = false)
      .filter($"node" >= SuppBase)
      .orderBy($"rank".desc, $"node")
      .limit(25)
  }

  val q92Sql: String = {
    def iter(k: Int): String =
      s"""it$k AS (
         |  SELECT n.node,
         |    CAST(c.base + (85 * COALESCE(s.contrib, 0)) // 100 AS BIGINT)
         |      AS rank
         |  FROM nodes n CROSS JOIN consts c
         |  LEFT JOIN (
         |    SELECT e.dst AS node,
         |      CAST(SUM(r.rank // d.out_deg) AS BIGINT) AS contrib
         |    FROM e
         |    JOIN deg d ON e.src = d.src
         |    JOIN it${k - 1} r ON r.node = e.src
         |    GROUP BY 1) s ON s.node = n.node)""".stripMargin
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
       |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
       |e AS (
       |  SELECT CAST(cust AS BIGINT) AS src,
       |    CAST($SuppBase + supp AS BIGINT) AS dst FROM pairs
       |  UNION ALL
       |  SELECT CAST($SuppBase + supp AS BIGINT) AS src,
       |    CAST(cust AS BIGINT) AS dst FROM pairs),
       |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS out_deg
       |        FROM e GROUP BY 1),
       |nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |consts AS (
       |  SELECT CAST(1000000000000 // count(*) AS BIGINT) AS init,
       |    CAST((15 * (1000000000000 // count(*))) // 100 AS BIGINT)
       |      AS base
       |  FROM nodes),
       |it0 AS (SELECT node, init AS rank FROM nodes CROSS JOIN consts),
       |${(1 to 5).map(iter).mkString(",\n")}
       |SELECT node, rank FROM it5 WHERE node >= $SuppBase
       |ORDER BY rank DESC, node
       |LIMIT 25""".stripMargin
  }

  /** Product-quantization ANN (q94): corpus compressed to 8 one-byte
    * codes per vector (32× the 64-dim float payload), candidates from
    * the ADC table-lookup scan through the bounded top-pool kernel,
    * exact cosine re-rank on the raw vectors. Run at pool = corpus the
    * result is EXACTLY brute force — the same oracle family as q65's
    * full-probe trained IVF; realistic-pool recall is spec-pinned and
    * ScaleBench-measured. */
  def q94PqAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // one Lloyd step from the deterministic seeds: measured 2.7 s/iter
    // at sf0.1 (the 8-subspace × 16-centroid assignment scan dominates
    // this query); extra iterations sharpen ADC candidate quality but
    // cannot change the full-pool result the oracle gates
    val books = graft.operators.Similarity
      .pqCodebooks(emb, dim = 64, m = 8, nCent = 16, iters = 1)
    graft.operators.Similarity.pqTopK(
        emb.filter($"vec_id" < 5), emb, k = 10, dim = 64, books,
        pool = emb.count().toInt)
      .orderBy($"q_id", $"rank")
  }

  // `fin` mirrors the operator's finite-norm exclusion (the q24Sql
  // stance) — a no-op on the synthetic embeddings, but the oracle
  // must encode the same degenerate-vector contract as the operator
  val q94Sql: String =
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
      |  FROM (SELECT * FROM fin WHERE vec_id < 5) q
      |  JOIN fin c ON q.vec_id <> c.vec_id
      |) WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** IVF-PQ ANN (q150): the faiss-lineage composition of the three
    * index pieces that each shipped alone — q65's trained coarse
    * cells ([[graft.operators.Similarity.kmeansCentroids]]), q94's PQ
    * codes + ADC scoring ([[graft.operators.Similarity.pqCodebooks]]),
    * and the shared exact re-rank tail — via
    * [[graft.operators.Similarity.ivfPqTopK]]: trained cells prune
    * the candidate rows, PQ codes score the survivors by table
    * lookup, exact cosine re-ranks the pool. Gated at FULL probe +
    * pool = corpus, where BOTH the cell partition and the code
    * quantization must be RESULT-INVISIBLE (every (query, corpus)
    * pair survives the cell join exactly once iff the assignment
    * partitions the corpus; the ADC ordering is passed whole at full
    * pool) — the result is exactly brute force, so the oracle is
    * q94's brute-force replay VERBATIM (the q148←q135 pattern).
    * Partial-probe/realistic-pool gains are measured in ScaleBench
    * (ivf_pq_ann vs pq_ann_pool100 vs projected_ivf_trained). */
  def q150IvfPqAnn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, dir)
    // one Lloyd step each from the deterministic distinct-vector
    // seeds (the q94/q148 convention: the train+search composition IS
    // the query; more iterations sharpen candidate quality but cannot
    // change the full-probe/full-pool result the oracle gates)
    val cents = graft.operators.Similarity.kmeansCentroids(
      emb, nCells = 16, iters = 1, dim = 64)
    val books = graft.operators.Similarity
      .pqCodebooks(emb, dim = 64, m = 8, nCent = 16, iters = 1)
    graft.operators.Similarity.ivfPqTopK(
        emb.filter($"vec_id" < 5), emb, k = 10, dim = 64,
        cents, books, nProbe = 16, pool = emb.count().toInt)
      .orderBy($"q_id", $"rank")
  }

  /** Z-order data skipping (q95): lineitem rewritten z-ordered on
    * (l_partkey, l_suppkey), then a two-column box predicate over the
    * clustered copy. The ORACLE runs the same filter on the plain
    * table — a z-order layout must be result-invisible; the actual
    * skipping (row groups pruned by footer stats) is metric-gated in
    * AnalyticsSpec, where the clustered scan decodes a fraction of
    * what a random layout decodes for the same predicate. */
  def q95ZorderSkipping(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withTempDir(s, "graft_q95_zorder") { base =>
      Lake.writeZOrdered(
        Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey",
          $"l_extendedprice", $"l_discount"),
        s"$base/z", Seq("l_partkey", "l_suppkey"), bits = 8, nFiles = 16)
      s.read.parquet(s"$base/z")
        .filter($"l_partkey" < 200 && $"l_suppkey" < 10)
        .groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          floor(sum($"l_extendedprice".cast(Dec) *
            (lit(1).cast(Dec) - $"l_discount".cast(Dec))) * 100)
            .cast("long").as("revenue_cents"))
        .orderBy($"l_suppkey")
        .localCheckpoint()
    }
  }

  val q95Sql: String =
    """SELECT l_suppkey, COUNT(*) AS n_items,
      |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) *
      |    (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT)
      |    AS revenue_cents
      |FROM lineitem
      |WHERE l_partkey < 200 AND l_suppkey < 10
      |GROUP BY l_suppkey
      |ORDER BY l_suppkey""".stripMargin

  /** q133: per-file Bloom data-skipping index
    * ([[Lake.buildBloomIndex]] / [[Lake.readWithBloomIndex]]) — the
    * point-lookup complement to q95's z-order min/max skipping: the
    * lookup key (user_id) is UNCLUSTERED in a multi-file lake copy,
    * so min/max stats prune nothing, while the per-file Bloom reads
    * only the file(s) that might hold the key. The query gates the
    * pruning itself (`require` candidates < files) and the result is
    * the exact filter's — oracle-identical by the no-false-negatives
    * construction. */
  def q133BloomIndexLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Scratch.withTempDir(s, "graft_q133_bloomidx") { base =>
      val ev = Tables.events(s, dir)
      val probe = ev.agg(min($"user_id")).head().getLong(0)
      // hash-partitioned 8-file layout: one user concentrates in one
      // file, but NOTHING tells min/max stats that — the bloom does
      ev.select($"event_id", $"user_id", $"event_type", $"value")
        .repartition(8, $"user_id")
        .write.mode("overwrite").parquet(s"$base/data")
      Lake.buildBloomIndex(s, s"$base/data", "user_id", s"$base/idx")
      val cand = Lake.bloomIndexCandidateFiles(s, s"$base/data",
        s"$base/idx", "user_id", probe)
      val total = s.read.parquet(s"$base/data").inputFiles.length
      require(cand.size < total,
        s"bloom index pruned nothing: ${cand.size}/$total files " +
          "survived — the index is not doing its job")
      Lake.readWithBloomIndex(s, s"$base/data", s"$base/idx",
          "user_id", probe)
        .select($"event_id", $"event_type", $"value")
        .orderBy($"event_id")
        .localCheckpoint()
    }
  }

  val q133Sql: String =
    """SELECT event_id, event_type, value FROM events
      |WHERE user_id = (SELECT min(user_id) FROM events)
      |ORDER BY event_id""".stripMargin

  /** One-pass data profile (q96): per-column row/null/exact-distinct
    * counts and type-aware extremes over the events stream table —
    * the ingestion-gate audit every pipeline runs first. */
  def q96Profile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Profile.profile(Tables.events(s, dir)
        .select($"event_id", $"user_id", $"event_type", $"value", $"props"))
      .orderBy($"col_name")
  }

  val q96Sql: String = {
    def row(c: String, num: Boolean): String =
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_null,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  ${if (num) s"CAST(MIN($c) AS DOUBLE)"
            else "CAST(NULL AS DOUBLE)"} AS min_num,
         |  ${if (num) s"CAST(MAX($c) AS DOUBLE)"
            else "CAST(NULL AS DOUBLE)"} AS max_num,
         |  ${if (!num) s"CAST(MIN(length($c)) AS BIGINT)"
            else "CAST(NULL AS BIGINT)"} AS min_len,
         |  ${if (!num) s"CAST(MAX(length($c)) AS BIGINT)"
            else "CAST(NULL AS BIGINT)"} AS max_len
         |FROM events""".stripMargin
    (Seq("event_id", "user_id", "value").map(row(_, num = true)) ++
      Seq("event_type", "props").map(row(_, num = false)))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** Keyed snapshot diff (q98): the lake-maintenance audit — old vs
    * new table version classified into added / removed / changed over
    * one full-outer join ([[graft.operators.Diff.snapshotDiff]]).
    * Versions are derived deterministically from events: drop every
    * 13th key (removed), double value on every 7th (changed), re-key
    * every 11th into a fresh id range (added). */
  def q98SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"event_id" < 5000)
      .select($"event_id", $"event_type", $"value")
    val next = ev.filter($"event_id" % 13 =!= 0)
      .withColumn("value",
        when($"event_id" % 7 === 0, $"value" * 2).otherwise($"value"))
      .unionByName(ev.filter($"event_id" % 11 === 0)
        .withColumn("event_id", $"event_id" + lit(1000000000L)))
    graft.operators.Diff
      .snapshotDiff(ev, next, Seq("event_id"), Seq("event_type", "value"))
      .orderBy($"event_id", $"change_type")
  }

  val q98Sql: String =
    """WITH ev AS (
      |  SELECT event_id, event_type, value FROM events
      |  WHERE event_id < 5000),
      |n AS (
      |  SELECT event_id, event_type,
      |    CASE WHEN event_id % 7 = 0 THEN value * 2 ELSE value END AS value
      |  FROM ev WHERE event_id % 13 <> 0
      |  UNION ALL
      |  SELECT event_id + 1000000000, event_type, value
      |  FROM ev WHERE event_id % 11 = 0),
      |j AS (
      |  SELECT COALESCE(o.event_id, n.event_id) AS event_id,
      |    o.event_type AS old_event_type, n.event_type AS new_event_type,
      |    o.value AS old_value, n.value AS new_value,
      |    o.event_id IS NULL AS added_f, n.event_id IS NULL AS removed_f
      |  FROM ev o FULL OUTER JOIN n ON o.event_id = n.event_id)
      |SELECT event_id,
      |  CASE WHEN added_f THEN 'added'
      |       WHEN removed_f THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  old_event_type, new_event_type, old_value, new_value
      |FROM j
      |WHERE added_f OR removed_f
      |   OR (old_event_type IS DISTINCT FROM new_event_type)
      |   OR (old_value IS DISTINCT FROM new_value)
      |ORDER BY event_id, change_type""".stripMargin

  /** Histogram-quantile estimation (q99): the one-pass bounded-error
    * quantile path beside q51's exact percentiles — every estimate
    * replays bit-for-bit (exact integer ranks, fixed-parenthesization
    * IEEE binning), which `percentile_approx`'s opaque sketch cannot. */
  def q99HistQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Histogram.quantileEstimates(
        Tables.lineitem(s, dir), "l_extendedprice", nBins = 256,
        pcts = Seq(50, 90, 99))
      .orderBy($"pct")
  }

  val q99Sql: String =
    """WITH v AS (
      |  SELECT CAST(l_extendedprice AS DOUBLE) AS x FROM lineitem
      |  WHERE l_extendedprice IS NOT NULL AND isfinite(l_extendedprice)),
      |c AS (SELECT min(x) AS lo, max(x) - min(x) AS span,
      |        CAST(count(*) AS BIGINT) AS n FROM v),
      |b AS (SELECT CASE WHEN c.span = 0 THEN CAST(0 AS BIGINT)
      |        ELSE LEAST(255,
      |          CAST(FLOOR(((x - c.lo) * 256.0) / c.span) AS BIGINT)) END
      |          AS bin
      |      FROM v CROSS JOIN c),
      |h AS (SELECT bin, count(*) AS cnt FROM b GROUP BY bin),
      |cum AS (SELECT bin, SUM(cnt) OVER (ORDER BY bin) AS cum FROM h),
      |p(pct) AS (VALUES (50), (90), (99)),
      |r AS (SELECT pct, (c.n * pct + 99) // 100 AS rank
      |      FROM p CROSS JOIN c),
      |sel AS (SELECT r.pct, r.rank, MIN(cum.bin) AS bin
      |        FROM r JOIN cum ON cum.cum >= r.rank GROUP BY 1, 2)
      |SELECT CAST(pct AS BIGINT) AS pct, CAST(rank AS BIGINT) AS rank,
      |  bin, c.lo + (CAST(bin AS DOUBLE) * (c.span / 256.0)) AS est
      |FROM sel CROSS JOIN c
      |ORDER BY pct""".stripMargin

  /** Event-rate anomaly z-scores (q100): per-minute counts per type
    * scored against a trailing 30-minute baseline — the monitoring
    * layer over the keyed stream. */
  def q100RateAnomaly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.operators.Anomaly
      .rateZScores(Tables.events(s, dir), "event_type", "ts", trailing = 30)
      .select($"key",
        date_format($"minute_start", "yyyy-MM-dd HH:mm:ss")
          .as("minute_str"),
        $"n", $"z")
      .orderBy($"key", $"minute_str")
  }

  val q100Sql: String =
    """WITH c0 AS (
      |  SELECT event_type AS key, date_trunc('minute', ts) AS m,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |  GROUP BY 1, 2),
      |b AS (SELECT key, min(m) AS lo, max(m) AS hi FROM c0 GROUP BY 1),
      |sp AS (SELECT key,
      |         unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m
      |       FROM b),
      |ser AS (SELECT sp.key, sp.m,
      |          CAST(COALESCE(c0.n, 0) AS BIGINT) AS n
      |        FROM sp LEFT JOIN c0 ON c0.key = sp.key AND c0.m = sp.m),
      |w AS (
      |  SELECT key, m, n,
      |    SUM(CAST(n AS HUGEINT)) OVER win AS s,
      |    SUM(CAST(n AS HUGEINT) * n) OVER win AS ss,
      |    CAST(COUNT(*) OVER win AS BIGINT) AS c
      |  FROM ser
      |  WINDOW win AS (PARTITION BY key ORDER BY m
      |                 ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
      |SELECT key, strftime(m, '%Y-%m-%d %H:%M:%S') AS minute_str, n,
      |  CASE WHEN (CAST(ss AS DOUBLE) -
      |             CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |               CAST(c AS DOUBLE)) /
      |            (CAST(c AS DOUBLE) - 1.0) > 0
      |       THEN round((CAST(n AS DOUBLE) -
      |              CAST(s AS DOUBLE) / CAST(c AS DOUBLE)) /
      |            sqrt((CAST(ss AS DOUBLE) -
      |                  CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
      |                    CAST(c AS DOUBLE)) /
      |                 (CAST(c AS DOUBLE) - 1.0)), 4)
      |       END AS z
      |FROM w WHERE c = 30
      |ORDER BY key, minute_str""".stripMargin

  /** The funnel's step sequence and observation window (the window
    * keeps per-user event counts small enough that stall depths vary
    * at test SF; both engines apply the identical bound). */
  private[queries] val FunnelSteps = Seq("signup", "view", "click", "purchase")
  private[queries] val FunnelEnd = "2024-01-05 00:00:00"

  /** Ordered-step funnel: for each user entering at `signup`, the
    * earliest strictly-increasing completion times through
    * view → click → purchase, plus the reached depth. */
  def q93Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .filter($"ts" < lit(FunnelEnd).cast("timestamp"))
    // epoch-µs output: timestamps hash-compare across engines only up
    // to their parquet physical unit; integers don't care
    Funnel.funnelTimes(ev, "user_id", "ts", "event_type", FunnelSteps)
      .select($"user_id" +: (1 to FunnelSteps.size)
        .map(k => expr(s"unix_micros(t$k)").as(s"t${k}_us")) :+ $"depth": _*)
      .orderBy($"user_id")
  }

  val q93Sql: String = {
    val steps = FunnelSteps
    val chain = (2 to steps.size).map { k =>
      s"""s$k AS (
         |  SELECT e.user_id, min(e.ts) AS t$k
         |  FROM ev e JOIN s${k - 1} ON s${k - 1}.user_id = e.user_id
         |  WHERE e.event_type = '${steps(k - 1)}'
         |    AND e.ts > s${k - 1}.t${k - 1}
         |  GROUP BY 1)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (
       |  SELECT user_id, ts, event_type FROM events
       |  WHERE ts < TIMESTAMP '$FunnelEnd'),
       |s1 AS (
       |  SELECT user_id, min(ts) AS t1 FROM ev
       |  WHERE event_type = '${steps.head}' GROUP BY 1),
       |$chain
       |SELECT s1.user_id,
       |  epoch_us(s1.t1) AS t1_us, epoch_us(s2.t2) AS t2_us,
       |  epoch_us(s3.t3) AS t3_us, epoch_us(s4.t4) AS t4_us,
       |  CAST(CASE WHEN t4 IS NOT NULL THEN 4
       |            WHEN t3 IS NOT NULL THEN 3
       |            WHEN t2 IS NOT NULL THEN 2
       |            ELSE 1 END AS BIGINT) AS depth
       |FROM s1
       |LEFT JOIN s2 USING (user_id)
       |LEFT JOIN s3 USING (user_id)
       |LEFT JOIN s4 USING (user_id)
       |ORDER BY user_id""".stripMargin
  }
}
