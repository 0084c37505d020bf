package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.Strategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Native as-of join (SURVEY §2.3 J2 / §4 "custom Catalyst work"):
  * for every left row (key, t) attach the LATEST right row with the same
  * key and right.ts ∈ [t - tolerance, t], or nulls when none exists.
  *
  * Why a custom operator: the composable formulation (range join +
  * per-(key,t) row_number = 1) materializes every (left, right) pair inside
  * the tolerance window and then shuffles/sorts again to keep one winner —
  * at 100 TB a hot key's window can hold thousands of rows, so the
  * intermediate blowup dominates. This exec asks the planner for hash
  * co-partitioning on the key and (key, ts) ordering on both sides
  * (EnsureRequirements inserts the exchanges/sorts), then streams each
  * partition once with a two-pointer merge that buffers only the current
  * key's right rows: one shuffle per side, no pair blowup.
  *
  * Keys and event times are evaluated as longs (callers cast timestamps to
  * microseconds); tolerance is in the same unit.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Long)
  extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  // every child column passes through to the output, so none may be pruned
  // beneath this (optimizer-opaque) node
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(left.output ++ right.output)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    tolerance: Long,
    output: Seq[Attribute])
  extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val tol = tolerance
    val lOut = left.output
    val rOut = right.output
    val outAttrs = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTs, rightTs)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyEval = BindReferences.bindReference(lk, lOut)
      val rKeyEval = BindReferences.bindReference(rk, rOut)
      val lTsEval = BindReferences.bindReference(lt, lOut)
      val rTsEval = BindReferences.bindReference(rt, rOut)
      val nullRight = new GenericInternalRow(rOut.size)
      val joined = new JoinedRow
      // bind against NULLABLE right attrs: the as-of miss row is all-null,
      // and a non-nullable binding would read primitives as 0/0.0
      val outProj = UnsafeProjection.create(
        outAttrs, lOut ++ rOut.map(_.withNullability(true)))

      val rBuf = rIter.buffered
      // (ts, row) window for the current key, ts-ascending
      val window = new scala.collection.mutable.ArrayBuffer[(Long, InternalRow)]()
      var curKey: Long = Long.MinValue
      var haveKey = false

      lIter.map { lRow =>
        val k = lKeyEval.eval(lRow).asInstanceOf[Long]
        if (!haveKey || k != curKey) {
          window.clear()
          // skip right rows with smaller keys, buffer rows of key k
          while (rBuf.hasNext && rKeyEval.eval(rBuf.head).asInstanceOf[Long] < k)
            rBuf.next()
          while (rBuf.hasNext && rKeyEval.eval(rBuf.head).asInstanceOf[Long] == k) {
            val r = rBuf.next().copy()
            window += ((rTsEval.eval(r).asInstanceOf[Long], r))
          }
          curKey = k
          haveKey = true
        }
        val t = lTsEval.eval(lRow).asInstanceOf[Long]
        // binary search: last window entry with ts <= t
        var lo = 0
        var hi = window.length - 1
        var idx = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (window(mid)._1 <= t) { idx = mid; lo = mid + 1 } else hi = mid - 1
        }
        val best =
          if (idx >= 0 && window(idx)._1 >= t - tol) window(idx)._2 else nullRight
        outProj(joined(lRow, best))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy for the as-of node. */
object AsOfJoinStrategy extends Strategy {
  def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTs, j.rightTs, j.tolerance, j.output) :: Nil
    case _ => Nil
  }
}

/** User-facing constructor: builds the logical node from two DataFrames and
  * installs the strategy on the session (idempotent). */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame,
            leftKey: String, rightKey: String,
            leftTs: String, rightTs: String,
            tolerance: Long): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    val lPlan = org.apache.spark.sql.graft.ColumnBridge.logicalPlan(left)
    val rPlan = org.apache.spark.sql.graft.ColumnBridge.logicalPlan(right)
    def resolve(p: LogicalPlan, n: String): Expression =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    org.apache.spark.sql.graft.ColumnBridge.ofRows(spark,
      AsOfJoinPlan(lPlan, rPlan,
        resolve(lPlan, leftKey), resolve(rPlan, rightKey),
        resolve(lPlan, leftTs), resolve(rPlan, rightTs),
        tolerance))
  }
}
