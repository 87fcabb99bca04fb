package graft.queries

import graft.Tables
import graft.operators.{Cohort, Collocations, CountMin, Graph, Histogram, Mixture,
  SketchStore, Timeseries, Transitions, Trend, WindowedQuantiles}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Behavioral / statistical analytics surface (q101–q111): per-key
  * distribution estimates + equi-depth binning, cohort retention,
  * Markov transitions, triangle counting, trend regression, PMI
  * collocations, time-weighted averages, as-of interpolation,
  * mixture apportionment, and rolling correlation. Each query is
  * oracle-backed — DuckDB replays the identical integer, fixed-IEEE,
  * or quantized-log arithmetic — and each operator carries its own
  * 100 TB scale contract
  * ([[graft.operators.Histogram.groupQuantileEstimates]],
  * [[graft.operators.Cohort.retention]],
  * [[graft.operators.Transitions.transitionMatrix]],
  * [[graft.operators.Graph.triangleCounts]],
  * [[graft.operators.Trend.groupTrend]],
  * [[graft.operators.Collocations.pmiTopBigrams]],
  * [[graft.operators.Timeseries]], [[graft.operators.Mixture]]).
  */
object Behavior {

  /** Per-event-type quantile estimates of `value` (q101): the fully
    * distributed per-key histogram path beside q99's driver-assisted
    * global one. */
  def q101GroupQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Histogram.groupQuantileEstimates(Tables.events(s, dir),
        "event_type", "value", nBins = 128, pcts = Seq(25, 50, 90, 99))
      .orderBy($"key", $"pct")
  }

  val q101Sql: String =
    """WITH v AS (
      |  SELECT event_type AS key, CAST(value AS DOUBLE) AS x FROM events
      |  WHERE event_type IS NOT NULL AND value IS NOT NULL
      |    AND isfinite(value)),
      |r AS (SELECT key, min(x) AS lo, max(x) - min(x) AS span,
      |        CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |b AS (SELECT v.key,
      |        CASE WHEN r.span = 0 THEN CAST(0 AS BIGINT)
      |             ELSE LEAST(127, CAST(FLOOR(((v.x - r.lo) * 128.0)
      |                                        / r.span) AS BIGINT)) END
      |          AS bin
      |      FROM v JOIN r ON v.key = r.key),
      |h AS (SELECT key, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
      |cum AS (SELECT key, bin,
      |          SUM(cnt) OVER (PARTITION BY key ORDER BY bin) AS cum
      |        FROM h),
      |p(pct) AS (VALUES (25), (50), (90), (99)),
      |rk AS (SELECT r.key, CAST(pct AS BIGINT) AS pct,
      |         (r.n * pct + 99) // 100 AS rank, r.lo, r.span
      |       FROM r CROSS JOIN p),
      |sel AS (SELECT rk.key, rk.pct, rk.rank, rk.lo, rk.span,
      |          MIN(cum.bin) AS bin
      |        FROM rk JOIN cum ON cum.key = rk.key AND cum.cum >= rk.rank
      |        GROUP BY 1, 2, 3, 4, 5)
      |SELECT key, pct, CAST(rank AS BIGINT) AS rank, bin,
      |  lo + (CAST(bin AS DOUBLE) * (span / 128.0)) AS est
      |FROM sel ORDER BY key, pct""".stripMargin

  /** Monthly cohort retention of customers by first order (q102). */
  def q102Retention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Cohort.retention(Tables.orders(s, dir), "o_custkey", "o_orderdate",
        "month")
      .select(date_format($"cohort_period", "yyyy-MM-dd").as("cohort_month"),
        $"offset", $"n_active", $"cohort_size", $"retention")
      .orderBy($"cohort_month", $"offset")
  }

  val q102Sql: String =
    """WITH act AS (
      |  SELECT DISTINCT o_custkey AS entity,
      |    date_trunc('month', o_orderdate) AS period
      |  FROM orders
      |  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
      |f AS (SELECT entity, min(period) AS cohort FROM act GROUP BY 1),
      |o AS (SELECT f.cohort,
      |        date_diff('month', f.cohort, a.period) AS "offset"
      |      FROM act a JOIN f ON a.entity = f.entity),
      |c AS (SELECT cohort, CAST("offset" AS BIGINT) AS "offset",
      |        CAST(count(*) AS BIGINT) AS n_active
      |      FROM o GROUP BY 1, 2),
      |s AS (SELECT cohort, n_active AS cohort_size FROM c
      |      WHERE "offset" = 0)
      |SELECT strftime(c.cohort, '%Y-%m-%d') AS cohort_month, c."offset",
      |  c.n_active, s.cohort_size,
      |  round(CAST(c.n_active AS DOUBLE) / CAST(s.cohort_size AS DOUBLE), 4)
      |    AS retention
      |FROM c JOIN s ON c.cohort = s.cohort
      |ORDER BY cohort_month, c."offset"""".stripMargin

  /** First-order event-type transition matrix per user (q103). */
  def q103Transitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Transitions.transitionMatrix(Tables.events(s, dir), "user_id",
        "event_type", $"ts_ns", $"event_id")
      .orderBy($"from_state", $"to_state")
  }

  val q103Sql: String =
    """WITH p AS (
      |  SELECT lag(event_type)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id) AS f,
      |    event_type AS t
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |    AND ts IS NOT NULL),
      |c AS (SELECT f AS from_state, t AS to_state,
      |        CAST(count(*) AS BIGINT) AS n
      |      FROM p WHERE f IS NOT NULL GROUP BY 1, 2),
      |tt AS (SELECT from_state, CAST(sum(n) AS BIGINT) AS total
      |       FROM c GROUP BY 1)
      |SELECT c.from_state, c.to_state, c.n, tt.total,
      |  round(CAST(c.n AS DOUBLE) / CAST(tt.total AS DOUBLE), 4) AS prob
      |FROM c JOIN tt USING (from_state)
      |ORDER BY from_state, to_state""".stripMargin

  /** Triangle counts on the customer co-order graph (q104): customers
    * chained (not cliqued — the chain keeps the edge count linear in
    * orders, where the all-pairs clique is quadratic in group size)
    * within each (order day, priority) group; triangles then measure
    * repeat co-occurrence across groups. The chain window partitions
    * on (day, priority) — bounded by a day's order book, not by any
    * single key. */
  def q104Triangles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val members = Tables.orders(s, dir)
      .select(to_date(date_trunc("DD", $"o_orderdate")).as("day"),
        $"o_orderpriority".as("prio"), $"o_custkey".as("cust"))
      .filter($"day".isNotNull && $"prio".isNotNull && $"cust".isNotNull)
      .distinct()
    val w = Window.partitionBy($"day", $"prio").orderBy($"cust")
    val edges = members.withColumn("prev", lag($"cust", 1).over(w))
      .filter($"prev".isNotNull)
      .select($"prev".as("src"), $"cust".as("dst"))
    Graph.triangleCounts(edges)
      .orderBy($"triangles".desc, $"node")
      .limit(25)
  }

  val q104Sql: String =
    """WITH m AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS day,
      |    o_orderpriority AS prio, o_custkey AS cust
      |  FROM orders
      |  WHERE o_orderdate IS NOT NULL AND o_orderpriority IS NOT NULL
      |    AND o_custkey IS NOT NULL),
      |ch AS (SELECT lag(cust)
      |           OVER (PARTITION BY day, prio ORDER BY cust) AS prev,
      |         cust
      |       FROM m),
      |und AS (SELECT DISTINCT LEAST(prev, cust) AS u,
      |          GREATEST(prev, cust) AS v
      |        FROM ch WHERE prev IS NOT NULL AND prev <> cust),
      |deg AS (SELECT node, CAST(count(*) AS BIGINT) AS deg
      |        FROM (SELECT u AS node FROM und
      |              UNION ALL SELECT v FROM und)
      |        GROUP BY 1),
      |ann AS (SELECT und.u, und.v, da.deg AS du, db.deg AS dv
      |        FROM und
      |        JOIN deg da ON und.u = da.node
      |        JOIN deg db ON und.v = db.node),
      |ori AS (
      |  SELECT u AS src, v AS dst, dv AS ddeg FROM ann
      |  WHERE du < dv OR (du = dv AND u < v)
      |  UNION ALL
      |  SELECT v AS src, u AS dst, du AS ddeg FROM ann
      |  WHERE dv < du OR (dv = du AND v < u)),
      |wg AS (SELECT e1.src AS p, e1.dst AS x, e2.dst AS y
      |       FROM ori e1 JOIN ori e2 ON e1.src = e2.src
      |       WHERE e1.ddeg < e2.ddeg
      |          OR (e1.ddeg = e2.ddeg AND e1.dst < e2.dst)),
      |tri AS (SELECT p, x, y FROM wg
      |        JOIN ori ON wg.x = ori.src AND wg.y = ori.dst),
      |pn AS (SELECT node, CAST(count(*) AS BIGINT) AS triangles
      |       FROM (SELECT p AS node FROM tri
      |             UNION ALL SELECT x FROM tri
      |             UNION ALL SELECT y FROM tri)
      |       GROUP BY 1)
      |SELECT node, triangles FROM pn
      |ORDER BY triangles DESC, node LIMIT 25""".stripMargin

  /** Per-event-type OLS trend of value over epoch minutes (q105). */
  def q105Trend(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Trend.groupTrend(Tables.events(s, dir), "event_type",
        expr("ts_ns div 60000000000"), $"value")
      .orderBy($"key")
  }

  val q105Sql: String =
    """WITH r AS (
      |  SELECT event_type AS key,
      |    CAST(epoch_us(ts) // 60000000 AS HUGEINT) AS xd,
      |    CAST(FLOOR(value * 10000.0) AS HUGEINT) AS yd
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)),
      |m AS (SELECT key, CAST(count(*) AS HUGEINT) AS n,
      |        sum(xd) AS sx, sum(yd) AS sy,
      |        sum(xd * yd) AS sxy, sum(xd * xd) AS sxx
      |      FROM r GROUP BY 1)
      |SELECT key, CAST(n AS BIGINT) AS n,
      |  CASE WHEN n * sxx - sx * sx > 0 THEN
      |    round(CAST(n * sxy - sx * sy AS DOUBLE)
      |          / CAST((n * sxx - sx * sx) * 10000 AS DOUBLE), 6)
      |  END AS slope,
      |  CASE WHEN n * sxx - sx * sx > 0 THEN
      |    round(CAST(sy * sxx - sx * sxy AS DOUBLE)
      |          / CAST((n * sxx - sx * sx) * 10000 AS DOUBLE), 6)
      |  END AS intercept
      |FROM m ORDER BY key""".stripMargin

  /** Top PMI bigram collocations over the document corpus (q106). */
  def q106Collocations(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Collocations.pmiTopBigrams(Tables.documents(s, dir), "text",
        minCount = 5L, k = 50)
      .orderBy($"qpmi".desc, $"n_ab".desc, $"a", $"b")
  }

  val q106Sql: String =
    """WITH tk AS (
      |  SELECT string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents WHERE text IS NOT NULL),
      |uni AS (SELECT t, CAST(count(*) AS BIGINT) AS n_t
      |        FROM (SELECT unnest(toks) AS t FROM tk) GROUP BY 1),
      |tot AS (SELECT CAST(sum(n_t) AS BIGINT) AS n_total FROM uni),
      |bi0 AS (SELECT toks,
      |          unnest(generate_series(1, len(toks) - 1)) AS i
      |        FROM tk),
      |bi AS (SELECT toks[i] AS a, toks[i + 1] AS b FROM bi0),
      |bc AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab
      |       FROM bi GROUP BY 1, 2 HAVING count(*) >= 5),
      |j AS (SELECT bc.a, bc.b, bc.n_ab, ua.n_t AS n_a, ub.n_t AS n_b,
      |        (CAST(bc.n_ab AS HUGEINT) * t.n_total)
      |          // (CAST(ua.n_t AS HUGEINT) * ub.n_t) AS q
      |      FROM bc
      |      JOIN uni ua ON bc.a = ua.t
      |      JOIN uni ub ON bc.b = ub.t
      |      CROSS JOIN tot t)
      |SELECT a, b, n_ab, n_a, n_b,
      |  CAST(length(bin(CAST(q AS BIGINT))) - 1 AS BIGINT) AS qpmi
      |FROM j WHERE q >= 1
      |ORDER BY qpmi DESC, n_ab DESC, a, b LIMIT 50""".stripMargin

  /** Time-weighted average of value per event type (q107): duration-
    * weighted, not count-weighted — the honest mean for an
    * irregularly sampled series. */
  def q107Twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Timeseries.timeWeightedAvg(Tables.events(s, dir), "event_type",
        "ts_ns", "value")
      .orderBy($"key")
  }

  val q107Sql: String =
    """WITH s0 AS (
      |  SELECT event_type AS key, epoch_ns(ts) AS t,
      |    CAST(value AS DOUBLE) AS v
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)),
      |s AS (SELECT key, t, min(v) AS v FROM s0 GROUP BY 1, 2),
      |p AS (SELECT key, CAST(FLOOR(v * 10000.0) AS HUGEINT) AS vq,
      |        lead(t) OVER (PARTITION BY key ORDER BY t) - t AS dur
      |      FROM s),
      |m AS (SELECT key, CAST(count(*) AS BIGINT) AS n,
      |        CAST(sum(dur) AS BIGINT) AS span_ns,
      |        sum(vq * CAST(dur AS HUGEINT)) AS num
      |      FROM p GROUP BY 1)
      |SELECT key, n, span_ns,
      |  CASE WHEN span_ns > 0 THEN
      |    round(CAST(num AS DOUBLE)
      |          / CAST(CAST(span_ns AS HUGEINT) * 10000 AS DOUBLE), 6)
      |  END AS twap
      |FROM m ORDER BY key""".stripMargin

  /** As-of linear interpolation onto the minute grid (q108): both
    * brackets come from the library's own custom as-of physical
    * operator, composed back-to-back. */
  def q108Interpolate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Timeseries.interpolateMinutes(Tables.events(s, dir), "event_type",
        "ts_ns", "value")
      .select($"key",
        date_format($"minute_start", "yyyy-MM-dd HH:mm:ss")
          .as("minute_str"),
        $"est")
      .orderBy($"key", $"minute_str")
  }

  val q108Sql: String =
    """WITH s0 AS (
      |  SELECT event_type AS key, epoch_ns(ts) AS t,
      |    CAST(value AS DOUBLE) AS v
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)),
      |s AS (SELECT key, t, min(v) AS v FROM s0 GROUP BY 1, 2),
      |b AS (SELECT key,
      |        date_trunc('minute', make_timestamp(min(t) // 1000)) AS lo,
      |        date_trunc('minute', make_timestamp(max(t) // 1000)) AS hi
      |      FROM s GROUP BY 1),
      |g AS (SELECT key,
      |        unnest(generate_series(lo, hi, INTERVAL 1 MINUTE)) AS m
      |      FROM b),
      |g2 AS (SELECT key, m, epoch_ns(m) AS gt FROM g),
      |bk AS (SELECT g2.key, g2.m, g2.gt, s.t AS t0, s.v AS v0
      |       FROM g2 ASOF LEFT JOIN s
      |         ON g2.key = s.key AND s.t <= g2.gt),
      |fw AS (SELECT bk.key, bk.m, bk.gt, bk.t0, bk.v0,
      |         s.t AS t1, s.v AS v1
      |       FROM bk ASOF LEFT JOIN s
      |         ON bk.key = s.key AND s.t >= bk.gt)
      |SELECT key, strftime(m, '%Y-%m-%d %H:%M:%S') AS minute_str,
      |  CASE WHEN t1 = t0 THEN round(v0, 4)
      |       ELSE round(v0 + (v1 - v0) *
      |              (CAST(gt - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE)),
      |            4) END AS est
      |FROM fw WHERE v0 IS NOT NULL AND v1 IS NOT NULL
      |ORDER BY key, minute_str""".stripMargin

  /** Equi-depth decile binning of lineitem prices (q110): per-bucket
    * row counts + exact value ranges. */
  def q110Discretize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Histogram.discretize(Tables.lineitem(s, dir), "l_extendedprice",
        nBuckets = 10, nBins = 256)
      // pin the oracle contract: null/non-finite prices get a null
      // bucket, which the oracle's isfinite() WHERE excludes — and
      // null GROUP/ORDER position differs between engines anyway
      .filter($"bucket".isNotNull)
      .groupBy($"bucket").agg(count(lit(1)).as("n"),
        min($"l_extendedprice").as("lo"), max($"l_extendedprice").as("hi"))
      .orderBy($"bucket")
  }

  val q110Sql: String =
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
      |p(pct) AS (VALUES (10), (20), (30), (40), (50), (60), (70),
      |                  (80), (90)),
      |rkk AS (SELECT pct, (c.n * pct + 99) // 100 AS rank
      |        FROM p CROSS JOIN c),
      |sel AS (SELECT rkk.pct, MIN(cum.bin) AS bin
      |        FROM rkk JOIN cum ON cum.cum >= rkk.rank GROUP BY 1),
      |e AS (SELECT c.lo + (CAST(bin AS DOUBLE) * (c.span / 256.0))
      |        AS edge
      |      FROM sel CROSS JOIN c),
      |bk AS (SELECT x,
      |         (SELECT CAST(count(*) AS BIGINT) FROM e
      |          WHERE e.edge <= v.x) AS bucket
      |       FROM v)
      |SELECT bucket, CAST(count(*) AS BIGINT) AS n,
      |  min(x) AS lo, max(x) AS hi
      |FROM bk GROUP BY 1 ORDER BY 1""".stripMargin

  /** Rolling purchase↔error value correlation per hour (q111) — the
    * hourly grain keeps the joint series dense at every test SF. */
  def q111RollingCorr(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Timeseries.rollingCorrelation(Tables.events(s, dir), "event_type",
        "ts", "value", "purchase", "error", trailing = 6,
        grain = "hour")
      .select(date_format($"period_start", "yyyy-MM-dd HH:mm:ss")
          .as("hour_str"), $"r")
      .orderBy($"hour_str")
  }

  val q111Sql: String =
    """WITH am AS (
      |  SELECT date_trunc('hour', ts) AS m,
      |    sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS HUGEINT))
      |      AS au
      |  FROM events
      |  WHERE event_type = 'purchase' AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)
      |  GROUP BY 1),
      |bm AS (
      |  SELECT date_trunc('hour', ts) AS m,
      |    sum(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS HUGEINT))
      |      AS bu
      |  FROM events
      |  WHERE event_type = 'error' AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)
      |  GROUP BY 1),
      |j AS (SELECT am.m, CAST(am.m AS DATE) AS d, au, bu
      |      FROM am JOIN bm ON am.m = bm.m),
      |w AS (SELECT m,
      |        CAST(COUNT(*) OVER win AS HUGEINT) AS c,
      |        SUM(au) OVER win AS sa, SUM(bu) OVER win AS sb,
      |        SUM(au * bu) OVER win AS sab,
      |        SUM(au * au) OVER win AS saa,
      |        SUM(bu * bu) OVER win AS sbb
      |      FROM j
      |      WINDOW win AS (PARTITION BY d ORDER BY m
      |                     ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
      |SELECT strftime(m, '%Y-%m-%d %H:%M:%S') AS hour_str,
      |  CASE WHEN c * saa - sa * sa > 0 AND c * sbb - sb * sb > 0 THEN
      |    round(CAST(c * sab - sa * sb AS DOUBLE)
      |          / (sqrt(CAST(c * saa - sa * sa AS DOUBLE))
      |             * sqrt(CAST(c * sbb - sb * sb AS DOUBLE))), 4)
      |  END AS r
      |FROM w WHERE c = 6
      |ORDER BY hour_str""".stripMargin

  /** Transition dwell-time statistics (q113): how long users sit in
    * each state before each next state — the timing layer over q103's
    * transition counts. */
  def q113DwellTimes(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Transitions.dwellTimes(Tables.events(s, dir), "user_id",
        "event_type", $"ts_ns", $"event_id")
      .orderBy($"from_state", $"to_state")
  }

  val q113Sql: String =
    """WITH p AS (
      |  SELECT user_id,
      |    lag(event_type) OVER win AS from_state,
      |    event_type AS to_state,
      |    epoch_ns(ts) - lag(epoch_ns(ts)) OVER win AS dwell
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |    AND ts IS NOT NULL
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT from_state, to_state, CAST(count(*) AS BIGINT) AS n,
      |  round(CAST(sum(CAST(dwell AS HUGEINT)) AS DOUBLE)
      |        / CAST(CAST(count(*) AS HUGEINT) * 1000000000 AS DOUBLE),
      |      4) AS mean_sec,
      |  round(CAST(min(dwell) AS DOUBLE) / 1000000000.0, 4) AS min_sec,
      |  round(CAST(max(dwell) AS DOUBLE) / 1000000000.0, 4) AS max_sec
      |FROM p WHERE from_state IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Dwell-time QUANTILES per transition (q114): the composition
    * q113's scaladoc promises — [[Transitions.dwellGaps]]' exact
    * integer-ns gaps fed to [[Histogram.groupQuantileEstimates]]
    * keyed by the (from,to) pair. This is the p50/p95 time-in-state
    * readout a funnel team actually uses: q113's mean/min/max hide
    * the bimodal "most convert in minutes, a tail stalls for days"
    * shape; the histogram estimator surfaces it with its documented
    * ≤ one-bin-width error, fully distributed (per-pair windows are
    * nBins-bounded BY CONSTRUCTION, never by traffic). The pair key
    * is a single `from>to` string so the histogram's broadcast-range
    * contract (one row per distinct key — states², calendar-class)
    * holds by the same argument as the transition matrix. */
  def q114DwellQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Transitions.dwellQuantiles(Tables.events(s, dir), "user_id",
        "event_type", $"ts_ns", $"event_id")
      .orderBy($"key", $"pct")
  }

  val q114Sql: String =
    """WITH g AS (
      |  SELECT lag(event_type) OVER win || '>' || event_type AS key,
      |    CAST(epoch_ns(ts) - lag(epoch_ns(ts)) OVER win AS DOUBLE) AS x
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IS NOT NULL
      |    AND ts IS NOT NULL
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |v AS (SELECT key, x FROM g WHERE key IS NOT NULL),
      |r AS (SELECT key, min(x) AS lo, max(x) - min(x) AS span,
      |        CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
      |b AS (SELECT v.key,
      |        CASE WHEN r.span = 0 THEN CAST(0 AS BIGINT)
      |             ELSE LEAST(127, CAST(FLOOR(((v.x - r.lo) * 128.0)
      |                                        / r.span) AS BIGINT)) END
      |          AS bin
      |      FROM v JOIN r ON v.key = r.key),
      |h AS (SELECT key, bin, count(*) AS cnt FROM b GROUP BY 1, 2),
      |cum AS (SELECT key, bin,
      |          SUM(cnt) OVER (PARTITION BY key ORDER BY bin) AS cum
      |        FROM h),
      |p(pct) AS (VALUES (50), (95)),
      |rk AS (SELECT r.key, CAST(pct AS BIGINT) AS pct,
      |         (r.n * pct + 99) // 100 AS rank, r.lo, r.span
      |       FROM r CROSS JOIN p),
      |sel AS (SELECT rk.key, rk.pct, rk.rank, rk.lo, rk.span,
      |          MIN(cum.bin) AS bin
      |        FROM rk JOIN cum ON cum.key = rk.key AND cum.cum >= rk.rank
      |        GROUP BY 1, 2, 3, 4, 5)
      |SELECT key, pct, CAST(rank AS BIGINT) AS rank, bin,
      |  lo + (CAST(bin AS DOUBLE) * (span / 128.0)) AS est
      |FROM sel ORDER BY key, pct""".stripMargin

  /** Heavy hitters via Count-Min prune-then-verify (q115): the most
    * active users (≥ 70 events) found by pruning the exact count's
    * shuffle input through a depth-4 × width-1024 sketch — small
    * enough that sf0.1's 1500 users genuinely collide (the
    * false-positive path is exercised, then verified away). The
    * oracle is the EXACT heavy-hitter SQL: CMS one-sidedness makes
    * the sketch provably invisible in the result (q86's Bloom
    * discipline, one level up — membership → frequency). */
  def q115HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    CountMin.heavyHitters(Tables.events(s, dir), "user_id",
        threshold = 70L, depth = 4, width = 1024)
      .orderBy($"user_id")
  }

  val q115Sql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 HAVING count(*) >= 70
      |ORDER BY user_id""".stripMargin

  /** q122: heavy hitters through a PERSISTED Count-Min artifact —
    * q115's prune-then-verify, but the sketch is written as a stamped
    * parquet artifact ([[graft.operators.SketchStore.writeCms]]) and
    * read back COLD before probing
    * ([[CountMin.heavyHittersWith]]) — the build-once / probe-many
    * lifecycle. Different dials than q115 (threshold 50, depth 3 ×
    * width 512 — more collisions, so the verified-away false-positive
    * path works harder) and the oracle is the EXACT SQL: a round-trip
    * that changed one grid cell would push a key across the prune
    * line and surface as a diff. */
  def q122CmsArtifactHeavyHitters(s: SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val events = Tables.events(s, dir)
    val keyed = events.select($"user_id")
      .filter($"user_id".isNotNull)
      .withColumn("__h", xxhash64($"user_id"))
    // fixed scratch path, overwritten per invocation (the q121
    // stance: per-call temp dirs leaked across bench passes)
    val tmp = "target/scratch/q122_cms"
    SketchStore.writeCms(s,
      CountMin.buildWords(keyed, "__h", depth = 3, width = 512),
      s"$tmp/cms", "xxhash64(events.user_id)")
    CountMin.heavyHittersWith(events, "user_id", 50L,
        SketchStore.readCms(s, s"$tmp/cms", "xxhash64(events.user_id)"))
      .orderBy($"user_id")
  }

  val q122Sql: String =
    """SELECT user_id, CAST(count(*) AS BIGINT) AS n
      |FROM events WHERE user_id IS NOT NULL
      |GROUP BY 1 HAVING count(*) >= 50
      |ORDER BY user_id""".stripMargin

  /** Exact windowed value quantiles (q117): p50/p95 of `value` per
    * (event_type, hour) by exact rank selection over the quantized
    * domain ([[WindowedQuantiles]]) — no sketch, no bin error;
    * replays bit-for-bit. */
  def q117WindowedQuantiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    WindowedQuantiles.quantiles(Tables.events(s, dir), "event_type",
        "ts", "value", grain = "hour", pcts = Seq(50, 95))
      .select($"key",
        date_format($"window_start", "yyyy-MM-dd HH:mm:ss").as("hour_str"),
        $"pct", $"n", $"est")
      .orderBy($"key", $"hour_str", $"pct")
  }

  val q117Sql: String =
    """WITH v AS (
      |  SELECT event_type AS key, date_trunc('hour', ts) AS w,
      |    CAST(floor(CAST(value AS DOUBLE) * 10000.0) AS BIGINT) AS qv
      |  FROM events
      |  WHERE event_type IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL AND NOT isnan(value)),
      |c AS (SELECT key, w, qv, count(*) AS cnt FROM v GROUP BY 1, 2, 3),
      |x AS (SELECT key, w, qv,
      |        SUM(cnt) OVER (PARTITION BY key, w ORDER BY qv) AS cum,
      |        SUM(cnt) OVER (PARTITION BY key, w) AS n
      |      FROM c),
      |p(pct) AS (VALUES (50), (95)),
      |sel AS (SELECT x.key, x.w, p.pct, x.n, MIN(x.qv) AS qv
      |        FROM x CROSS JOIN p
      |        WHERE x.cum >= (x.n * p.pct + 99) // 100
      |        GROUP BY 1, 2, 3, 4)
      |SELECT key, strftime(w, '%Y-%m-%d %H:%M:%S') AS hour_str,
      |  CAST(pct AS BIGINT) AS pct, CAST(n AS BIGINT) AS n,
      |  CAST(qv AS DOUBLE) / 10000.0 AS est
      |FROM sel ORDER BY key, hour_str, pct""".stripMargin

  /** Largest-remainder mixture apportionment (q109): a 999,983-unit
    * budget split across sources proportionally to their character
    * mass; Σ quota = budget exactly. */
  def q109Apportion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val weights = Tables.documents(s, dir)
      .groupBy($"source").agg(sum($"n_chars").as("w"))
    Mixture.apportion(weights, "source", "w", budget = 999983L)
      .orderBy($"key")
  }

  val q109Sql: String =
    """WITH pk AS (SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS w
      |            FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(w) AS HUGEINT) AS tw FROM pk),
      |a AS (SELECT key, w,
      |        (CAST(999983 AS HUGEINT) * w) // t.tw AS base,
      |        (CAST(999983 AS HUGEINT) * w) % t.tw AS rem
      |      FROM pk CROSS JOIN t),
      |l AS (SELECT 999983 - sum(base) AS leftover FROM a),
      |rk AS (SELECT key, w, base, rem,
      |         row_number() OVER (ORDER BY rem DESC, key) AS rnk
      |       FROM a)
      |SELECT key, w,
      |  CAST(base + CASE WHEN rnk <= l.leftover THEN 1 ELSE 0 END
      |    AS BIGINT) AS quota
      |FROM rk CROSS JOIN l ORDER BY key""".stripMargin
}
