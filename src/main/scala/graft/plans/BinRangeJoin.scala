package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a pure time-range join into a binned
  * equi-join (SURVEY §4's "custom Catalyst work" candidate).
  *
  * A join whose ONLY condition is `r BETWEEN l − a AND l + b` (long
  * event-time columns, e.g. ns/µs epochs) has no equi predicate, so
  * Spark plans BroadcastNestedLoopJoin / CartesianProduct — O(n·m) and
  * a driver OOM at scale. For any row pair satisfying the range, with
  * bin width W = a + b: floor(r/W) ∈ { floor((l−a)/W), floor((l−a)/W)+1 }.
  * So: explode the left side to those two bin keys, key the right side
  * by floor(r/W), join on the bin equi-key, keep the original range
  * condition as the residual filter. Constant 2× left fan-out buys a
  * shuffled hash join — the O(n+m) plan.
  *
  * Injected via [[GraftExtensions]]
  * (`.withExtensions(new GraftExtensions)`) or
  * `BinRangeJoin.install(spark)` on a live session.
  */
object BinRangeJoinRule extends Rule[LogicalPlan] {

  /** Matches `rAttr >= lAttr - a && rAttr <= lAttr + b` (either
    * operand order), both attributes LongType from opposite sides. */
  private case class RangeCond(lAttr: AttributeReference,
      rAttr: AttributeReference, a: Long, b: Long)

  private def asBound(e: Expression): Option[(AttributeReference, AttributeReference, Long, Boolean)] =
    e match {
      // r >= l - a  /  r <= l + b
      case GreaterThanOrEqual(r: AttributeReference,
          Subtract(l: AttributeReference, Literal(c: Long, LongType), _)) =>
        Some((l, r, c, true))
      case LessThanOrEqual(r: AttributeReference,
          Add(l: AttributeReference, Literal(c: Long, LongType), _)) =>
        Some((l, r, c, false))
      // mirrored forms: l - a <= r  /  l + b >= r
      case LessThanOrEqual(Subtract(l: AttributeReference, Literal(c: Long, LongType), _),
          r: AttributeReference) => Some((l, r, c, true))
      case GreaterThanOrEqual(Add(l: AttributeReference, Literal(c: Long, LongType), _),
          r: AttributeReference) => Some((l, r, c, false))
      case _ => None
    }

  private def extractRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[RangeCond] = cond match {
    case And(x, y) =>
      (asBound(x), asBound(y)) match {
        case (Some((l1, r1, a, true)), Some((l2, r2, b, false)))
            if l1.semanticEquals(l2) && r1.semanticEquals(r2) &&
              left.outputSet.contains(l1) && right.outputSet.contains(r1) =>
          Some(RangeCond(l1, r1, a, b))
        case (Some((l1, r1, b, false)), Some((l2, r2, a, true)))
            if l1.semanticEquals(l2) && r1.semanticEquals(r2) &&
              left.outputSet.contains(l1) && right.outputSet.contains(r1) =>
          Some(RangeCond(l1, r1, a, b))
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _) =>
      extractRange(cond, left, right) match {
        case Some(RangeCond(lAttr, rAttr, a, b)) if a + b > 0 =>
          val w = a + b
          // left: explode [bin, bin+1] of floor((l - a) / W)
          val lBase = FloorDiv(Subtract(lAttr, Literal(a)), Literal(w))
          val lBinAttr = AttributeReference("__l_bin", LongType, nullable = true)()
          val gen = Generate(
            Explode(CreateArray(Seq(lBase, Add(lBase, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(lBinAttr), child = left)
          // right: project bin = floor(r / W)
          val rBinAttr = Alias(FloorDiv(rAttr, Literal(w)), "__r_bin")()
          val rProj = Project(right.output :+ rBinAttr, right)
          val newCond = And(EqualTo(lBinAttr, rBinAttr.toAttribute), cond)
          Project(j.output,
            Join(gen, rProj, Inner, Some(newCond), JoinHint.NONE))
        case _ => j
      }
  }
}

/** FloorDiv helper as an expression alias (pmod-safe floor division
  * for the positive epoch domain). */
object FloorDiv {
  def apply(x: Expression, y: Expression): Expression = IntegralDivide(x, y)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BinRangeJoinRule)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // SQL-name surface for the custom kernels (bounded aggregates, KMV
    // sketch, shingles/signatures, vector dot) — pure-SQL consumers
    // get the same scale-shaped plans as the Column API
    graft.functions.SqlRegistry.descriptions.foreach(e.injectFunction)
  }
}

object BinRangeJoin {
  /** Install on a live session (extensions need builder time; the
    * experimental hooks work at runtime). */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraOptimizations.contains(BinRangeJoinRule))
      exp.extraOptimizations = exp.extraOptimizations :+ BinRangeJoinRule
  }
}
