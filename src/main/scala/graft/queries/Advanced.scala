package graft.queries

import graft.{OracleMath, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Advanced analytics surface: sessionization (the batch form of the
  * streaming mapGroupsWithState pattern), a wide scalar-function
  * parity sweep, and sketch aggregates.
  */
object Advanced {

  /** Sessionization: per-user sessions split at 30-minute gaps —
    * lag → new-session flag → running sum (session id) → per-session
    * aggregates. One shuffle (partitionBy user). The streaming
    * equivalent lives in streaming/Sessionize. ts ordering/durations
    * use exact int64 nanoseconds (ts_ns) for oracle stability. */
  def q32Sessionization(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // µs granularity on both sides: DuckDB's parquet reader surfaces
    // these ns timestamps at µs precision, so ns math would mismatch
    val gapUs = 30L * 60 * 1000000L
    val w = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("prev_us", lag($"ts_us", 1).over(w))
      .withColumn("new_sess",
        when($"prev_us".isNull || $"ts_us" - $"prev_us" > gapUs, 1L).otherwise(0L))
      .withColumn("sess_id", sum($"new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        (max($"ts_us") - min($"ts_us")).as("duration_us"),
        OracleMath.dsum($"value").as("sum_value"))
      .orderBy($"user_id", $"sess_id")
  }

  val q32Sql: String =
    """SELECT user_id, sess_id, COUNT(*) AS n_events,
      |  max(ts_us) - min(ts_us) AS duration_us,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT user_id, value, ts_us,
      |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      |  FROM (
      |    SELECT *, CASE WHEN prev_us IS NULL
      |        OR ts_us - prev_us > 1800000000
      |      THEN 1 ELSE 0 END AS new_sess
      |    FROM (SELECT user_id, value, event_id, epoch_us(ts) AS ts_us,
      |            lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |              ORDER BY epoch_us(ts), event_id) AS prev_us FROM events)))
      |GROUP BY user_id, sess_id ORDER BY user_id, sess_id""".stripMargin

  /** Scalar-function surface sweep (SURVEY §2.8 and beyond): string,
    * date, math and conditional builtins in one projection, checked
    * value-exact against DuckDB. Engine-semantics notes inline (e.g.
    * Spark dayofweek is 1=Sunday, DuckDB 0=Sunday). */
  def q33ScalarSurface(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select(
      $"o_orderkey",
      upper($"o_orderpriority").as("up"),
      lower($"o_orderpriority").as("low"),
      substring($"o_orderpriority", 3, 4).as("sub"),
      lpad($"o_custkey".cast(StringType), 8, "0").as("pad"),
      regexp_replace($"o_orderpriority", "[0-9]-", "").as("rex"),
      instr($"o_orderpriority", "-").cast(LongType).as("pos"),
      reverse($"o_orderstatus").as("rev"),
      concat_ws("/", $"o_orderstatus", $"o_orderpriority").as("cat"),
      year($"o_orderdate").cast(LongType).as("yr"),
      month($"o_orderdate").cast(LongType).as("mo"),
      dayofmonth($"o_orderdate").cast(LongType).as("dy"),
      (dayofweek($"o_orderdate") - 1).cast(LongType).as("dow"), // align to DuckDB 0=Sunday
      date_format(date_add($"o_orderdate", 30), "yyyy-MM-dd").as("plus30"),
      datediff($"o_orderdate", lit("1995-01-01").cast(DateType)).cast(LongType).as("dd"),
      date_format(last_day($"o_orderdate"), "yyyy-MM-dd").as("lastd"),
      pmod($"o_orderkey", lit(7)).as("m7"),
      greatest($"o_totalprice", lit(100000.0)).as("gr"),
      least($"o_totalprice", lit(100000.0)).as("le"),
      coalesce(nullif($"o_orderstatus", lit("O")), lit("open")).as("co"),
      ceil($"o_totalprice").cast(LongType).as("ce"),
      floor($"o_totalprice").cast(LongType).as("fl"),
      abs($"o_totalprice" - 250000.0).as("ab"))
      .orderBy($"o_orderkey")
  }

  val q33Sql: String =
    """SELECT o_orderkey,
      |  upper(o_orderpriority) AS up, lower(o_orderpriority) AS low,
      |  substring(o_orderpriority, 3, 4) AS sub,
      |  lpad(CAST(o_custkey AS VARCHAR), 8, '0') AS pad,
      |  regexp_replace(o_orderpriority, '[0-9]-', '', 'g') AS rex,
      |  instr(o_orderpriority, '-') AS pos,
      |  reverse(o_orderstatus) AS rev,
      |  o_orderstatus || '/' || o_orderpriority AS cat,
      |  year(o_orderdate) AS yr, month(o_orderdate) AS mo,
      |  dayofmonth(o_orderdate) AS dy, dayofweek(o_orderdate) AS dow,
      |  strftime((o_orderdate + INTERVAL 30 DAY), '%Y-%m-%d') AS plus30,
      |  date_diff('day', DATE '1995-01-01', o_orderdate) AS dd,
      |  strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS lastd,
      |  mod(o_orderkey, 7) AS m7,
      |  greatest(o_totalprice, 100000.0) AS gr,
      |  least(o_totalprice, 100000.0) AS le,
      |  coalesce(nullif(o_orderstatus, 'O'), 'open') AS co,
      |  CAST(ceil(o_totalprice) AS BIGINT) AS ce,
      |  CAST(floor(o_totalprice) AS BIGINT) AS fl,
      |  abs(o_totalprice - 250000.0) AS ab
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** Window-function suite (SURVEY §2.7 — absent in the reference; a
    * complete engine needs ranking/analytic/frame specs): rank,
    * dense_rank, lag/lead, and a moving frame aggregate, all with
    * deterministic tie-breaks and decimal-exact sums. */
  def q35WindowSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val byCust = Window.partitionBy($"o_custkey")
      .orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, dir)
      .filter($"o_custkey" < 200)
      .select(
        $"o_custkey", $"o_orderkey",
        rank().over(Window.partitionBy($"o_custkey")
          .orderBy($"o_totalprice".desc, $"o_orderkey")).cast(LongType).as("price_rank"),
        dense_rank().over(Window.partitionBy($"o_custkey")
          .orderBy($"o_orderpriority")).cast(LongType).as("prio_rank"),
        lag($"o_orderkey", 1).over(byCust).as("prev_order"),
        lead($"o_orderkey", 1).over(byCust).as("next_order"),
        sum($"o_totalprice".cast(OracleMath.Dec))
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"),
        (count(lit(1)).over(Window.partitionBy($"o_custkey"))).as("n_orders"))
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q35Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS price_rank,
      |  dense_rank() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS prio_rank,
      |  lag(o_orderkey, 1) OVER w AS prev_order,
      |  lead(o_orderkey, 1) OVER w AS next_order,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
      |  count(*) OVER (PARTITION BY o_custkey) AS n_orders
      |FROM orders WHERE o_custkey < 200
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** Pivot (conditional aggregation — the deterministic form of
    * `groupBy.pivot`): event counts and value sums per user × type. */
  def q36Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.flatMap { t =>
      Seq(sum(when($"event_type" === t, 1L).otherwise(0L)).as(s"n_$t"),
        OracleMath.dsum(when($"event_type" === t, $"value").otherwise(0.0))
          .as(s"val_$t"))
    }
    Tables.events(s, dir)
      .groupBy($"user_id")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy($"user_id")
  }

  val q36Sql: String = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val cols = types.flatMap { t =>
      Seq(s"CAST(SUM(CASE WHEN event_type = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS n_$t",
        s"CAST(SUM(CAST(CASE WHEN event_type = '$t' THEN value ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS val_$t")
    }
    s"""SELECT user_id, ${cols.mkString(",\n  ")}
       |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin
  }

  /** Set operations (intersect / except — SURVEY §2.4 notes the
    * reference lacks them; engine completeness): customers appearing
    * in both high-value and urgent order sets, and the difference. */
  def q37SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    val highValue = o.filter($"o_totalprice" > 300000.0).select($"o_custkey")
    val urgent = o.filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val both = highValue.intersect(urgent)
      .withColumn("set_kind", lit("both"))
    val highOnly = highValue.except(urgent)
      .withColumn("set_kind", lit("high_only"))
    both.union(highOnly)
      .groupBy($"set_kind").agg(count(lit(1)).as("n_customers"))
      .orderBy($"set_kind")
  }

  val q37Sql: String =
    """SELECT set_kind, COUNT(*) AS n_customers FROM (
      |  SELECT o_custkey, 'both' AS set_kind FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000.0
      |    INTERSECT
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |  UNION ALL
      |  SELECT o_custkey, 'high_only' AS set_kind FROM (
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_totalprice > 300000.0
      |    EXCEPT
      |    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'))
      |GROUP BY set_kind ORDER BY set_kind""".stripMargin

  /** Generator + array functions (explode with position): per-dimension
    * stats over the embedding vectors' first 8 components. The explode
    * is a generator (no shuffle); the per-dim agg is one hash
    * aggregate. */
  def q40ExplodeDims(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select(posexplode($"embedding").as(Seq("pos", "val")))
      .filter($"pos" < 8)
      .select(($"pos" + 1).cast(LongType).as("dim"), $"val".cast(DoubleType).as("v"))
      .groupBy($"dim")
      .agg(count(lit(1)).as("n"),
        // scale 4, not 10: double→decimal rounding at fine scales hits
        // engine-dependent boundary behavior on full-precision floats
        sum($"v".cast(DecimalType(20, 4))).cast(DoubleType).as("sum_v"),
        min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"dim")
  }

  val q40Sql: String =
    """SELECT dim, COUNT(*) AS n,
      |  CAST(SUM(CAST(v AS DECIMAL(20,4))) AS DOUBLE) AS sum_v,
      |  min(v) AS min_v, max(v) AS max_v
      |FROM (
      |  SELECT gs.i AS dim, CAST(embedding[gs.i] AS DOUBLE) AS v
      |  FROM embeddings, generate_series(1, 8) AS gs(i)
      |) GROUP BY dim ORDER BY dim""".stripMargin

  /** Sketch aggregates, bound-gated: HLL distinct counts via the
    * mergeable Datasketches aggregate, plus t-digest style approximate
    * percentiles — the 100 TB answers to COUNT(DISTINCT) and exact
    * medians (constant memory, one pass, mergeable across partitions).
    *
    * Oracle design: exact distinct counts are computed in BOTH engines
    * (hash-compared); each sketch estimate is compared Spark-side
    * against the exact value computed in the same pass and emitted as
    * a within-bound boolean that the oracle pins to TRUE — a sketch
    * drifting past its published error bound flips the boolean and
    * fails the driver's hash compare. The estimates themselves are
    * engine-specific and deliberately not in the output. */
  def q34Sketches(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_orderkey").as("exact_orders"),
        countDistinct($"l_partkey").as("exact_parts"),
        expr("hll_sketch_estimate(hll_sketch_agg(l_orderkey))").as("__hll"),
        approx_count_distinct($"l_partkey").as("__acd"),
        percentile_approx($"l_extendedprice", lit(0.5), lit(1000)).as("__p50a"),
        percentile_approx($"l_extendedprice", lit(0.95), lit(1000)).as("__p95a"),
        expr("percentile(l_extendedprice, 0.5)").as("__p50e"),
        expr("percentile(l_extendedprice, 0.95)").as("__p95e"))
      .select($"l_returnflag", $"exact_orders", $"exact_parts",
        (abs($"__hll" - $"exact_orders") <= $"exact_orders" * 0.02).as("hll_ok"),
        (abs($"__acd" - $"exact_parts") <= $"exact_parts" * 0.05).as("approx_parts_ok"),
        (abs($"__p50a" - $"__p50e") <= abs($"__p50e") * 0.01).as("p50_ok"),
        (abs($"__p95a" - $"__p95e") <= abs($"__p95e") * 0.01).as("p95_ok"))
      .orderBy($"l_returnflag")
  }

  val q34Sql: String =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |  TRUE AS hll_ok, TRUE AS approx_parts_ok,
      |  TRUE AS p50_ok, TRUE AS p95_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin
}
