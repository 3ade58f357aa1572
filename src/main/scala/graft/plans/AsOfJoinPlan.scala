package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** As-of join as a FULL custom operator — logical node + planner
  * strategy + physical sort-merge exec — the extension path for
  * semantics Spark's built-ins can't plan optimally
  * (SparkSessionExtensions / experimental strategies; see
  * AsOfJoin.scala for the compose-built-ins formulation this
  * one-passes).
  *
  * Why a physical operator beats the union+window composition: the
  * composed plan shuffles the tagged UNION once on the key, sorts it,
  * runs a window pass, then needs a SECOND shuffle to join matches
  * back to the full left rows. This exec declares
  * `ClusteredDistribution(key)` on both children and per-child sort
  * orders, so Catalyst plans one exchange+sort per side; a single
  * streaming merge pass then emits each left row with its as-of value
  * attached — no join-back, no tag columns, full left row carried
  * natively.
  *
  * Semantics (identical to AsOfJoin.asof, proved by the shared oracle
  * and a property test): for each left row, the right row with the
  * greatest (ts, tieBreak) such that right.ts <= left.ts on the same
  * key; null when none. Right rows timestamped exactly at the event
  * ARE visible.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightVal: Expression, rightTie: Expression,
    // the output attribute is a constructor member, NOT a val: tree
    // copies (withNewChildrenInternal) must preserve its exprId or
    // every parent reference dangles
    asofValue: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ asofValue
  // asof_value is PRODUCED here, not read from a child — without this
  // CheckAnalysis rejects it as a dangling reference
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofValue)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinPlan {
  def apply(left: LogicalPlan, right: LogicalPlan,
            leftKey: Expression, rightKey: Expression,
            leftTs: Expression, rightTs: Expression,
            rightVal: Expression, rightTie: Expression): AsOfJoinPlan =
    AsOfJoinPlan(left, right, leftKey, rightKey, leftTs, rightTs,
      rightVal, rightTie,
      AttributeReference("asof_value", rightVal.dataType, nullable = true)())
}

object AsOfJoinStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: AsOfJoinPlan =>
      AsOfJoinExec(planLater(p.left), planLater(p.right),
        p.leftKey, p.rightKey, p.leftTs, p.rightTs,
        p.rightVal, p.rightTie, p.asofValue) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    rightVal: Expression, rightTie: Expression,
    asofValue: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ asofValue
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(asofValue)

  // one hash exchange per side on the join key...
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // ...and one sort per side; the merge itself is then a single pass
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  // rows stream out in the left child's partitioning and order —
  // declaring it lets downstream keyed operators skip their own
  // exchange/sort
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): org.apache.spark.rdd.RDD[InternalRow] = {
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rValB = BindReferences.bindReference(rightVal, right.output)
    // NULLS FIRST to match the child SortOrder
    def cmpKey(a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else keyOrd.compare(a, b)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(output, left.output :+ asofValue)
      val valueRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      // state: last right value seen for `curKey`, maintained as the
      // merge advances — right rows are consumed at most once total
      var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
      var lastKey: Any = null
      var lastVal: Any = null
      var hasVal = false
      lIter.map { lRow =>
        val lKey = lKeyB.eval(lRow)
        val lTs = lTsB.eval(lRow)
        var advance = rRow != null
        while (advance) {
          val rKey = rKeyB.eval(rRow)
          val c = cmpKey(rKey, lKey)
          // a null right ts sorts NULLS FIRST — like the composed
          // window formulation it counts as "before every event" and
          // MUST be consumed here, or the right stream stalls on it
          // and later valid rows of the key are never seen
          val visible = c < 0 ||
            (c == 0 && {
              val rTs = rTsB.eval(rRow)
              rTs == null || (lTs != null && tsOrd.compare(rTs, lTs) <= 0)
            })
          if (visible) {
            if (c == 0) {
              // rights sort by (ts, tie) asc, so the LAST consumed
              // visible row is the greatest (ts, tie) — keep it.
              // Both values are copied: eval results of non-primitive
              // types point into the reused UnsafeRow buffer.
              lastKey = InternalRow.copyValue(rKey)
              lastVal = InternalRow.copyValue(rValB.eval(rRow))
              hasVal = true
            }
            rRow = if (rIter.hasNext) rIter.next() else null
            advance = rRow != null
          } else advance = false
        }
        val v = if (hasVal && cmpKey(lastKey, lKey) == 0) lastVal else null
        valueRow.update(0, v)
        project(joined(lRow, valueRow))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
