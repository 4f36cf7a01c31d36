package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Tier-(c) custom operator: a native as-of join planned end-to-end —
  * logical node → planner Strategy → physical sort-merge exec.
  *
  * Why a dedicated exec beats the union+window composition
  * (graft.operators.AsOfJoin): the composition materializes every right
  * column through a `last(ignoreNulls)` window (state per column per
  * frame) and doubles the row count through the union. This operator
  * asks Catalyst for hash-clustered, (key, time)-sorted children —
  * EXACTLY the layout SortMergeJoin uses, so Exchanges are reused/
  * aligned — and then streams one two-pointer merge per partition:
  * O(1) state (the last right row per key), zero extra rows.
  *
  * Registered at runtime via `spark.experimental.extraStrategies` — no
  * session-constructor requirement.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, rk, lt, rt, rv) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, rv) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTime: Attribute, rightTime: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val rValExprs = rightVals
    val keyTypes = leftKeys.map(_.dataType)
    val nRightVals = rightVals.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rOut)
      val rValProj = UnsafeProjection.create(rValExprs, rOut)
      // bind against NULLABLE right attrs — the no-match row carries
      // nulls, and a nullable=false BoundReference would read garbage
      val outProj = UnsafeProjection.create(outAttrs,
        lOut ++ rValExprs.map(_.withNullability(true)))
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val nullRight = InternalRow.fromSeq(Seq.fill(nRightVals)(null))
      val joiner = new JoinedRow

      new Iterator[InternalRow] {
        private var rRow: InternalRow = _
        private var rKey: UnsafeRow = _
        private var rTime: Long = 0L
        private var rHas = false
        // the match candidate: last right row (its vals) at or before
        // the current left time, for the current key
        private var matchKey: UnsafeRow = _
        private var matchVals: InternalRow = nullRight
        advanceRight()

        private def advanceRight(): Unit = {
          if (rIter.hasNext) {
            rRow = rIter.next()
            rKey = rKeyProj(rRow).copy()
            rTime = rTimeProj(rRow).getLong(0)
            rHas = true
          } else rHas = false
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val lRow = lIter.next()
          val lKey = lKeyProj(lRow)
          val lTime = lTimeProj(lRow).getLong(0)
          // consume right rows with (key < lKey) or
          // (key == lKey && time <= lTime); the LAST one with equal key
          // becomes the match candidate
          var cont = rHas
          while (cont) {
            val c = keyOrd.compare(rKey, lKey)
            if (c < 0 || (c == 0 && rTime <= lTime)) {
              if (c == 0) {
                matchKey = rKey
                matchVals = rValProj(rRow).copy()
              }
              advanceRight()
              cont = rHas
            } else cont = false
          }
          val vals =
            if (matchKey != null && keyOrd.compare(matchKey, lKey) == 0) matchVals
            else nullRight
          outProj(joiner(lRow, vals))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** User-facing builder: resolves attributes from the analyzed children,
  * ensures the strategy is registered, and returns the joined frame.
  * Right-side output columns are surfaced as `r_<name>` (matching
  * operators.AsOfJoin). Time columns must be LongType (epoch units). */
object AsOfJoinNative {
  import org.apache.spark.sql.functions.col

  def asof(leftDf: DataFrame, rightDf: DataFrame, keyCols: Seq[String],
      leftTime: String, rightTime: String, rightVals: Seq[String]): DataFrame = {
    val spark = leftDf.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfStrategy
    // fresh aliases on the right side → fresh exprIds, so self-joins
    // from the same source relation cannot collide
    val rAliased = rightDf.select(
      keyCols.map(k => col(k).as(s"__rk_$k")) ++
        Seq(col(rightTime).as("__rt")) ++
        rightVals.map(v => col(v).as(s"r_$v")): _*)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rAliased.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    val node = AsOfJoinNode(lPlan, rPlan,
      keyCols.map(attr(lPlan, _)),
      keyCols.map(k => attr(rPlan, s"__rk_$k")),
      attr(lPlan, leftTime), attr(rPlan, "__rt"),
      rightVals.map(v => attr(rPlan, s"r_$v")))
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark, node)
  }
}
