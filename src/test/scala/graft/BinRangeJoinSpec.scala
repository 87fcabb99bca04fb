package graft

import graft.plans.BinRangeJoin
import org.apache.spark.sql.functions._

class BinRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def rangeJoin() = {
    val l = Seq((1L, 1000L), (2L, 5000L), (3L, 9000L)).toDF("lid", "lt")
    val r = Seq((10L, 900L), (11L, 1200L), (12L, 5400L), (13L, 20000L))
      .toDF("rid", "rt")
    l.join(r, $"rt" >= $"lt" - 300L && $"rt" <= $"lt" + 500L)
      .select($"lid", $"rid")
  }

  test("rule rewrites pure range join to binned equi-join, same results") {
    // other suites (q59 via PlanQualitySpec) install the rule on the
    // shared session — strip it so the "before" baseline is genuine
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations
        .filterNot(_ == graft.plans.BinRangeJoinRule)
    // without the rule: nested-loop plan
    val before = rangeJoin()
    val expected = before.as[(Long, Long)].collect().toSet
    before.collect()
    val planBefore = before.queryExecution.executedPlan.toString
    assert(planBefore.contains("NestedLoop") || planBefore.contains("Cartesian"),
      planBefore)

    BinRangeJoin.install(spark)
    try {
      val after = rangeJoin()
      val got = after.as[(Long, Long)].collect().toSet
      assert(got === expected)
      assert(got === Set((1L, 10L), (1L, 11L), (2L, 12L)))
      val planAfter = after.queryExecution.executedPlan.toString
      assert(!planAfter.contains("NestedLoop") && !planAfter.contains("Cartesian"),
        planAfter)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BinRangeJoinRule)
    }
  }

  test("rule result parity on real data (events self-join ±1h)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .select($"event_id", $"ts_ns").limit(200)
    def q = {
      val l = ev.select($"event_id".as("le"), $"ts_ns".as("lt"))
      val r = ev.select($"event_id".as("re"), $"ts_ns".as("rt"))
      l.join(r, $"rt" >= $"lt" - 3600000000000L && $"rt" <= $"lt" + 3600000000000L)
        .select($"le", $"re")
    }
    val plain = q.as[(Long, Long)].collect().toSet
    BinRangeJoin.install(spark)
    try {
      val binned = q.as[(Long, Long)].collect().toSet
      assert(binned === plain)
      assert(binned.nonEmpty)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == graft.plans.BinRangeJoinRule)
    }
  }
}
