package graft.queries

import graft.{OracleMath, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Second relational batch: subqueries (Catalyst decorrelation), semi
  * joins, deep join chains, HAVING, ordered string aggregation. q41
  * deliberately goes through `spark.sql` — the SQL surface is part of
  * the engine contract, and the oracle runs the IDENTICAL statement in
  * DuckDB (decimal-exact avg keeps the correlated comparison
  * deterministic across engines).
  */
object MoreRelational {
  import OracleMath._

  /** Correlated scalar subquery: customers above their nation's mean
    * balance. Catalyst decorrelates to an aggregate + join — no
    * per-row subquery execution. */
  val q41Sql: String =
    """SELECT c_custkey, c_nationkey, c_acctbal
      |FROM customer c
      |WHERE c_acctbal > (
      |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
      |         / CAST(COUNT(*) AS DOUBLE)
      |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |ORDER BY c_custkey""".stripMargin

  def q41CorrelatedSubquery(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(q41Sql)
  }

  /** Left-semi join (EXISTS): customers having at least one urgent
    * order above a price floor. */
  def q42SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
          .filter($"o_orderpriority" === "1-URGENT" && $"o_totalprice" > 250000.0),
        $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      .orderBy($"c_custkey")
  }

  val q42Sql: String =
    """SELECT c_custkey, c_nationkey, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
      |    AND o_totalprice > 250000.0)
      |ORDER BY c_custkey""".stripMargin

  /** TPC-H Q5-shaped 5-way join: revenue per nation for one region and
    * order-date year; dims broadcast, facts shuffle on their keys —
    * the join-order / broadcast showcase. */
  def q43FiveWayJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val o = Tables.orders(s, dir)
      .filter($"o_orderdate" >= lit("1996-01-01").cast(TimestampType) &&
        $"o_orderdate" < lit("1997-01-01").cast(TimestampType))
    val dims = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
    li.join(o, $"l_orderkey" === $"o_orderkey")
      .join(dims, $"o_custkey" === $"c_custkey")
      .groupBy($"n_name")
      .agg(floor(sum($"l_extendedprice".cast(Dec) *
        (lit(1).cast(Dec) - $"l_discount".cast(Dec))) * 100)
        .cast(LongType).as("revenue_cents"),
        count(lit(1)).as("n_items"))
      .orderBy($"n_name")
  }

  val q43Sql: String =
    """SELECT n_name,
      |  CAST(FLOOR(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) * 100) AS BIGINT) AS revenue_cents,
      |  COUNT(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** GROUP BY + HAVING on an aggregate expression. */
  def q44Having(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), dsum($"o_totalprice").as("total"))
      .filter($"n_orders" >= 15)
      .orderBy($"o_custkey")
  }

  val q44Sql: String =
    """SELECT o_custkey, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
      |ORDER BY o_custkey""".stripMargin

  /** Ordered string aggregation (listagg): deterministic via
    * sort-before-join on both engines. */
  def q45StringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .filter($"c_custkey" <= 60)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(array_join(array_sort(collect_list($"c_name")), ",").as("customers"),
        count(lit(1)).as("n"))
      .orderBy($"n_name")
  }

  val q45Sql: String =
    """SELECT n_name,
      |  string_agg(c_name, ',' ORDER BY c_name) AS customers,
      |  COUNT(*) AS n
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE c_custkey <= 60
      |GROUP BY n_name ORDER BY n_name""".stripMargin
}
