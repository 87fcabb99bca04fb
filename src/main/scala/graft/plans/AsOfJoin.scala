package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftShims
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, SortOrder, UnsafeProjection, Ascending, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join (SURVEY §2.6): for each left row, the latest
  * right row with the same key and `rightTime <= leftTime` (optionally
  * within `tolerance`); with `forward = true`, the EARLIEST right row
  * with `rightTime >= leftTime` instead (pandas merge_asof / DuckDB
  * ASOF direction semantics). This is the operator behind the reference's
  * *promised* earthquake⟷electric-field correlation (README.md:17,27
  * — never implemented there), and the one operator Spark's built-ins
  * can't express without an O(rows·matches) range join + window.
  *
  * Physical execution: both sides hash-partitioned on the key and
  * sorted by (key, time) — Catalyst's EnsureRequirements inserts the
  * exchanges/sorts from the declared requirements — then a single
  * O(n+m) forward merge per partition with one-row state. At 100 TB
  * this is the minimal plan: one shuffle per side, no buffering, no
  * per-key materialization (contrast: the equivalent
  * join+row_number shuffles the full match *product*).
  */
case class AsOfJoin(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    forward: Boolean = false) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    tolerance: Option[Long],
    forward: Boolean,
    output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val tol = tolerance
    val isForward = forward
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val keyType = lKey.dataType

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // everything non-serializable (projections, orderings) is built
      // here, executor-side; the closure captures only expressions
      val keyOrdering = TypeUtils.getInterpretedOrdering(keyType)
      // right side must be declared nullable here or the generated
      // projection skips null checks and reads 0.0 from the null row
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rOut.map(_.withNullability(true)))
      val lKeyEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lKey, lOut)
      val rKeyEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rKey, rOut)
      val lTimeEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(lTime, lOut)
      val rTimeEval = org.apache.spark.sql.catalyst.expressions.BindReferences
        .bindReference(rTime, rOut)

      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var rCurr: InternalRow = _
        private var rKeyVal: Any = _
        private var rTimeVal: Long = 0L
        private var matched: InternalRow = _
        private var matchedKey: Any = _
        private var matchedTime: Long = 0L
        advanceRight()

        // Null discipline (SQL join equality): a right row with a null
        // key or null time can never match any left row — skip it here
        // so the merge below never feeds null into the interpreted
        // ordering (NPE for primitive key types) or silently unboxes a
        // null time to 0L. Nulls sort FIRST under Ascending, so the
        // skipped rows are a prefix — the merge invariants hold.
        private def advanceRight(): Unit = {
          rCurr = null
          while (rCurr == null && rIter.hasNext) {
            val c = rIter.next()
            val k = rKeyEval.eval(c)
            val t = rTimeEval.eval(c)
            if (k != null && t != null) {
              rCurr = c
              rKeyVal = k
              rTimeVal = t.asInstanceOf[Long]
            }
          }
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow =
          if (isForward) nextForward() else nextBackward()

        private def nextBackward(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyEval.eval(l)
          val ltRaw = lTimeEval.eval(l)
          // null left key/time never matches (SQL equality); nulls sort
          // first, so emitting without consuming right keeps the merge
          // aligned for the non-null suffix
          if (lk == null || ltRaw == null) return outProj(joined(l, nullRight))
          val lt = ltRaw.asInstanceOf[Long]
          // consume right rows at or before (lk, lt); remember the last
          // one whose key equals lk — that's the as-of match candidate
          var continue = rCurr != null
          while (continue) {
            val c = keyOrdering.compare(rKeyVal.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef])
            if (c < 0 || (c == 0 && rTimeVal <= lt)) {
              if (c == 0) {
                matched = rCurr.copy()
                matchedKey = rKeyVal
                matchedTime = rTimeVal
              }
              advanceRight()
              continue = rCurr != null
            } else continue = false
          }
          val ok = matched != null &&
            keyOrdering.compare(matchedKey.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef]) == 0 &&
            matchedTime <= lt &&
            tol.forall(t => lt - matchedTime <= t)
          outProj(joined(l, if (ok) matched else nullRight))
        }

        private def nextForward(): InternalRow = {
          val l = lIter.next()
          val lk = lKeyEval.eval(l)
          val ltRaw = lTimeEval.eval(l)
          if (lk == null || ltRaw == null) return outProj(joined(l, nullRight))
          val lt = ltRaw.asInstanceOf[Long]
          // skip right rows strictly before (lk, lt); the first
          // remaining same-key row is the earliest at-or-after match.
          // Skipped rows can never match later left rows (left times
          // ascend), and the match is NOT consumed — the next left row
          // may share it.
          var continue = rCurr != null
          while (continue) {
            val c = keyOrdering.compare(rKeyVal.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef])
            if (c < 0 || (c == 0 && rTimeVal < lt)) {
              advanceRight()
              continue = rCurr != null
            } else continue = false
          }
          val ok = rCurr != null &&
            keyOrdering.compare(rKeyVal.asInstanceOf[AnyRef],
              lk.asInstanceOf[AnyRef]) == 0 &&
            rTimeVal >= lt &&
            tol.forall(t => rTimeVal - lt <= t)
          outProj(joined(l, if (ok) rCurr else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for [[AsOfJoin]] — injectable via
  * `SparkSessionExtensions.injectPlannerStrategy` or (runtime)
  * `spark.experimental.extraStrategies`. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd,
        plan.output) :: Nil
    case _ => Nil
  }
}

object AsOf {
  /** DataFrame API: as-of join `left` with `right` on equal `key`,
    * latest `rightTime <= leftTime` (within tolerance if given), or —
    * with `direction = "forward"` — earliest `rightTime >= leftTime`.
    * Right columns come back nullable. Registers the strategy on the
    * session idempotently. */
  def join(left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column,
      tolerance: Option[Long] = None,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"unknown as-of direction: $direction")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lp = GraftShims.logicalPlan(left)
    val rp = GraftShims.logicalPlan(right)
    val resolve = (p: LogicalPlan, c: Column) => {
      val e = GraftShims.expression(c)
      e.transformUp {
        case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          p.output.find(a => a.name == u.name)
            .getOrElse(sys.error(s"column ${u.name} not found"))
      }
    }
    GraftShims.ofRows(spark, AsOfJoin(lp, rp,
      resolve(lp, leftKey), resolve(rp, rightKey),
      resolve(lp, leftTime), resolve(rp, rightTime), tolerance,
      direction == "forward"))
  }
}
