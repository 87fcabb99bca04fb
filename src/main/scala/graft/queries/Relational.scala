package graft.queries

import graft.{OracleMath, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational operator surface (SURVEY.md §2.2–§2.7) expressed
  * Spark-first over the driver tables. Each query has an ANSI-SQL
  * oracle in [[graft.SparkEntry.oracleSql]] with an identical column
  * list and deterministic ORDER BY.
  *
  * Scale notes (100 TB thinking):
  *  - filters/projections are declared on the scan so Catalyst pushes
  *    them into parquet (`PushedFilters`/`ReadSchema`);
  *  - dimension joins (`region`,`nation`) are explicit `broadcast`s —
  *    at any scale those tables are tiny;
  *  - aggregations are partial (map-side combine) by construction via
  *    `groupBy.agg`;
  *  - exact-decimal aggregation keeps results hash-stable across
  *    engines AND across partition orderings, so the same query is
  *    deterministic on a 1000-executor cluster.
  */
object Relational {
  import OracleMath._

  /** TPC-H Q1-style pricing summary (SURVEY §2.3 A1-A4 composite).
    * Ref behavior: sparktoELKstream.py:194-239 computes per-column
    * descriptive stats; here the same agg surface as one hash agg. */
  def q01PricingSummary(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity").as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        // product sums carry scale 8 → the scaled integer passes 2^53
        // at sf≥0.1 and decimal→double conversion diverges between
        // engines by 1 ulp; exact integer cents (floor is tie-free)
        // sidestep the conversion entirely
        floor(sum($"l_extendedprice".cast(Dec) *
          (lit(1).cast(Dec) - $"l_discount".cast(Dec))) * 100)
          .cast(LongType).as("sum_disc_cents"),
        (sum($"l_quantity".cast(Dec)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_qty"),
        (sum($"l_discount".cast(Dec)).cast(DoubleType) /
          count(lit(1)).cast(DoubleType)).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT) AS sum_disc_cents,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Filter + projection pushdown (SURVEY §2.2 O4/O10): both the
    * predicate and the 4-column projection must reach the parquet scan. */
  def q02FilterPushdown(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter($"l_shipdate" >= lit("1995-01-01").cast(TimestampType) &&
        $"l_shipdate" < lit("1995-04-01").cast(TimestampType) &&
        $"l_returnflag" === "R" && $"l_quantity" >= 45)
      .select($"l_orderkey", $"l_linenumber", $"l_quantity", $"l_extendedprice")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  val q02Sql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1995-04-01 00:00:00'
      |  AND l_returnflag = 'R' AND l_quantity >= 45
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Star join with broadcast dimensions (SURVEY §2.6): revenue per
    * region. customer⨝nation⨝region are broadcast; the big fact join
    * (orders⨝customer) shuffles on the key. */
  def q03RegionRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"r_name")
    Tables.orders(s, dir)
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"r_name")
      .agg(dsum($"o_totalprice").as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy($"r_name")
  }

  val q03Sql: String =
    """SELECT r_name,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** Group-by count (SURVEY §2.3 A3 — ref sparktoELKstream.py:297-316
    * does groupBy(fault_line)→mapValues(len); here one hash agg). */
  def q04GroupbyCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), dsum($"value").as("sum_value"))
      .orderBy($"event_type")
  }

  val q04Sql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Global min/max/count (SURVEY §2.3 A2/A4 — ref reduce(max)/reduce(min)
    * at sparktoELKstream.py:318-324 becomes one agg pass). */
  def q05MinMax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir).agg(
      min($"l_quantity").as("min_qty"),
      max($"l_quantity").as("max_qty"),
      min($"l_extendedprice").as("min_price"),
      max($"l_extendedprice").as("max_price"),
      count(lit(1)).as("n_rows"))
  }

  val q05Sql: String =
    """SELECT min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
      |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
      |  COUNT(*) AS n_rows
      |FROM lineitem""".stripMargin

  /** Distinct values of a column under a predicate (SURVEY §2.3 A5 —
    * ref: provinces per region via rdd.map(...).distinct().collect()). */
  def q06DistinctValues(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .filter($"value" >= 150.0)
      .select($"event_type").distinct()
      .orderBy($"event_type")
  }

  val q06Sql: String =
    """SELECT DISTINCT event_type FROM events
      |WHERE value >= 150.0 ORDER BY event_type""".stripMargin

  /** Bag union of disjoint filtered slices then re-aggregate (SURVEY
    * §2.4 U1 — ref unions 4 region slices at sparktoELKstream.py:284-292).
    * Spark `union` is bag semantics = RDD union. */
  def q07UnionSlices(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val hi  = ev.filter($"event_type" === "purchase" && $"value" >= 100.0)
    val mid = ev.filter($"event_type" === "click" && $"value" >= 100.0)
    val lo  = ev.filter($"event_type" === "error" && $"value" >= 100.0)
    hi.union(mid).union(lo)
      .groupBy($"event_type").agg(count(lit(1)).as("n"))
      .orderBy($"event_type")
  }

  val q07Sql: String =
    """SELECT event_type, COUNT(*) AS n FROM (
      |  SELECT * FROM events WHERE event_type = 'purchase' AND value >= 100.0
      |  UNION ALL
      |  SELECT * FROM events WHERE event_type = 'click' AND value >= 100.0
      |  UNION ALL
      |  SELECT * FROM events WHERE event_type = 'error' AND value >= 100.0
      |) GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Multi-column descriptive statistics in ONE pass (SURVEY §2.3 A1 —
    * ref uses mllib Statistics.colStats; sample variance). Variance is
    * derived from exact decimal sums with an explicit IEEE expression
    * tree so both engines produce bit-identical doubles. */
  def q08DescriptiveStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    def statsFor(colName: String): DataFrame = {
      val c = col(colName)
      li.agg(
        count(lit(1)).as("n"),
        sum(c.cast(Dec)).cast(DoubleType).as("s1"),
        // (19,4)×(18,4) → (38,8): exact in Spark (≤38 digits) AND forces
        // DuckDB into int128 math (symmetric (18,4)² overflows its int64
        // path). FLOOR to an integer before the double conversion —
        // scale-8 sums pass 2^53 scaled and decimal→double rounding
        // diverges between engines; the floored value (exact, tie-free)
        // converts identically, and the ≤1 unit loss on a ~1e15 sum
        // shifts the variance by ~1e-15 relative on BOTH sides equally.
        floor(sum(c.cast(DecimalType(19, 4)) * c.cast(Dec)))
          .cast(DoubleType).as("s2"),
        min(c).as("min_v"),
        max(c).as("max_v"))
        .select(
          lit(colName).as("feature"),
          $"n",
          ($"s1" / $"n".cast(DoubleType)).as("mean_v"),
          (($"s2" - $"s1" * $"s1" / $"n".cast(DoubleType)) /
            ($"n".cast(DoubleType) - lit(1.0).cast(DoubleType))).as("var_samp_v"),
          $"min_v", $"max_v", $"s1".as("sum_v"))
    }
    statsFor("l_quantity")
      .union(statsFor("l_extendedprice"))
      .union(statsFor("l_discount"))
      .orderBy($"feature")
  }

  val q08Sql: String = {
    def one(c: String) =
      s"""SELECT '$c' AS feature, COUNT(*) AS n,
         |  CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_v,
         |  (CAST(FLOOR(SUM(CAST($c AS DECIMAL(19,4)) * CAST($c AS DECIMAL(18,4)))) AS DOUBLE)
         |    - CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) * CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
         |   / (CAST(COUNT(*) AS DOUBLE) - 1.0) AS var_samp_v,
         |  min($c) AS min_v, max($c) AS max_v,
         |  CAST(SUM(CAST($c AS DECIMAL(18,4))) AS DOUBLE) AS sum_v
         |FROM lineitem""".stripMargin
    Seq("l_quantity", "l_extendedprice", "l_discount").map(one)
      .mkString("", "\nUNION ALL\n", "\nORDER BY feature")
  }

  /** Date normalization + bucketing (SURVEY §2.2 O5 — ref
    * date_format(date, "yyyy-MM-dd'T'HH:mm")): monthly order buckets.
    * Output is a STRING month key — raw timestamps are never emitted
    * (Spark µs vs DuckDB ns precision would break the hash compare). */
  def q09DateBuckets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .withColumn("month", date_format($"o_orderdate", "yyyy-MM"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .orderBy($"month")
  }

  val q09Sql: String =
    """SELECT strftime(o_orderdate, '%Y-%m') AS month, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY 1 ORDER BY month""".stripMargin

  /** JSON field extraction (SURVEY §2.2 O2 — ref from_json on Kafka
    * values; here get_json_object on the events.props payload). */
  def q10JsonExtract(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast(IntegerType))
      .filter($"k" >= 50)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"))
      .orderBy($"event_type")
  }

  val q10Sql: String =
    """SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k FROM (
      |  SELECT event_type, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |  FROM events
      |) WHERE k >= 50 GROUP BY event_type ORDER BY event_type""".stripMargin

  /** CASE/isin bucketing (SURVEY §2.2 O8 — ref group_city: province →
    * fault-line region via hard-coded lists; here nation → trade bloc). */
  def q11CaseBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val americas = Seq("UNITED STATES", "CANADA", "BRAZIL", "ARGENTINA", "PERU")
    val asia = Seq("CHINA", "JAPAN", "INDIA", "INDONESIA", "VIETNAM")
    val bucket = when($"n_name".isin(americas: _*), "AMERICAS")
      .when($"n_name".isin(asia: _*), "ASIA")
      .otherwise("")
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .withColumn("bloc", bucket)
      .groupBy($"bloc")
      .agg(count(lit(1)).as("n_customers"), dsum($"c_acctbal").as("total_bal"))
      .orderBy($"bloc")
  }

  val q11Sql: String =
    """SELECT CASE
      |    WHEN n_name IN ('UNITED STATES','CANADA','BRAZIL','ARGENTINA','PERU') THEN 'AMERICAS'
      |    WHEN n_name IN ('CHINA','JAPAN','INDIA','INDONESIA','VIETNAM') THEN 'ASIA'
      |    ELSE '' END AS bloc,
      |  COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY 1 ORDER BY bloc""".stripMargin

  /** Whole-row distinct (SURVEY §2.2 O9 — ref .distinct() twice). */
  def q12DedupDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .select($"user_id", $"event_type")
      .distinct()
      .orderBy($"user_id", $"event_type")
  }

  val q12Sql: String =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  /** Latest-per-key via window row_number (SURVEY §2.7 — the principled
    * version of the ref's whole-row dedup: latest update per eventID).
    * Note: ordering is by (ts, event_id); ts is emitted only truncated
    * to the second, never raw. */
  def q13LatestPerKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Latest-per-key as ONE hash aggregate (max_by over a (ts_ns,
    // event_id) ordering struct) instead of window row_number: no sort,
    // map-side partial aggregation, and at 100 TB the state per key is
    // a single struct rather than a sorted partition. Tie-break on
    // event_id matches the previous window ordering exactly.
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(max_by(
        struct($"event_id", $"event_type",
          date_format($"ts", "yyyy-MM-dd HH:mm:ss").as("ts_sec")),
        struct($"ts_ns", $"event_id")).as("latest"))
      .select($"user_id", $"latest.event_id".as("event_id"),
        $"latest.event_type".as("event_type"), $"latest.ts_sec".as("ts_sec"))
      .orderBy($"user_id")
  }

  val q13Sql: String =
    """SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_sec
      |FROM (
      |  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events
      |) WHERE rn = 1 ORDER BY user_id""".stripMargin

  /** Event-time interval join (SURVEY §2.6 — the eq⟷electric
    * correlation the reference promises but never implements): for each
    * signup, count same-user events in the following hour. Equi key
    * (user_id) + range predicate ⇒ shuffles once on user_id; the range
    * filter is applied post-join. At 100 TB the equi key keeps this a
    * standard shuffled join, not an O(n²) cross. */
  def q14IntervalJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("s_event_id"), $"user_id".as("s_user_id"), $"ts_ns".as("s_ns"))
    val follow = ev.select($"user_id".as("f_user_id"), $"ts_ns".as("f_ns"))
    signups.join(follow,
        $"s_user_id" === $"f_user_id" &&
        $"f_ns" > $"s_ns" &&
        $"f_ns" <= $"s_ns" + lit(3600L * 1000000000L), "left")
      .groupBy($"s_event_id", $"s_user_id")
      .agg(count($"f_user_id").as("n_followups"))
      .orderBy($"s_event_id")
  }

  val q14Sql: String =
    """SELECT s.event_id AS s_event_id, s.user_id AS s_user_id,
      |  COUNT(f.user_id) AS n_followups
      |FROM (SELECT * FROM events WHERE event_type = 'signup') s
      |LEFT JOIN events f
      |  ON s.user_id = f.user_id
      | AND f.ts > s.ts AND f.ts <= s.ts + INTERVAL 1 HOUR
      |GROUP BY 1, 2 ORDER BY s_event_id""".stripMargin

  /** Top-k with deterministic tie-break (SURVEY §2.5 — the reference
    * only has take(n); a real engine needs ordered top-k). */
  def q15TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .limit(25)
  }

  val q15Sql: String =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  /** Semi/anti joins (engine completeness; Catalyst-native): customers
    * with no order over 400k, counted per nation. The filter on the
    * right side is pushed below the anti join by Catalyst. */
  def q16AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter($"o_totalprice" > 400000.0),
        $"c_custkey" === $"o_custkey", "left_anti")
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_no_order_customers"))
      .orderBy($"n_name")
  }

  val q16Sql: String =
    """SELECT n_name, COUNT(*) AS n_no_order_customers
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** ROLLUP aggregation (engine completeness — hierarchical totals). */
  def q17Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n"), dsum($"l_quantity").as("sum_qty"))
      .orderBy($"l_returnflag".asc_nulls_first, $"l_linestatus".asc_nulls_first)
  }

  val q17Sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  /** Native as-of join ([[graft.plans.AsOfJoin]] — custom LogicalPlan
    * + Strategy + merge-scan SparkPlan): for each purchase, the latest
    * signup of the same user at or before it. One shuffle+sort per
    * side, O(n+m) merge — vs the range-join+window rewrite that
    * shuffles the full match product. Oracle: DuckDB's native ASOF. */
  def q31AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id".as("p_event"), $"user_id", $"ts_ns")
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("s_event"), $"user_id".as("s_user"), $"ts_ns".as("s_ns"))
    graft.plans.AsOf.join(purchases, signups,
        purchases("user_id"), signups("s_user"),
        purchases("ts_ns"), signups("s_ns"))
      .select($"p_event", $"user_id", $"s_event")
      .orderBy($"p_event")
  }

  val q31Sql: String =
    """SELECT l.event_id AS p_event, l.user_id AS user_id, r.event_id AS s_event
      |FROM (SELECT * FROM events WHERE event_type='purchase') l
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='signup') r
      |  ON l.user_id = r.user_id AND r.ts <= l.ts
      |ORDER BY p_event""".stripMargin

  /** Derived concat column (SURVEY §2.2 O7 — ref pointLocation =
    * "lat,lon" string for the geo sink). */
  def q18ConcatKey(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("lang_source", concat_ws("|", $"lang", $"source"))
      .groupBy($"lang_source")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("total_chars"))
      .orderBy($"lang_source")
  }

  val q18Sql: String =
    """SELECT lang || '|' || source AS lang_source, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents GROUP BY 1 ORDER BY lang_source""".stripMargin
}
