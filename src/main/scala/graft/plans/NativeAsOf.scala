package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graftshim.DatasetShim

/** Whole-operator as-of join: the one reference operator family whose
  * semantics Spark's built-ins only reach by detours (N containment theta
  * joins, or the union + last-non-null window fill of `Scd2Join.asOfFill`)
  * gets the full custom-operator treatment the engine architecture
  * reserves for exactly this case — a logical node, a planner strategy,
  * and a physical `BinaryExecNode` that merge-joins two co-partitioned
  * (key, ts)-sorted streams in ONE pass per partition.
  *
  * Semantics: for every left row, the single right row with equal keys
  * (null-safe, matching the SCD engine's `<=>` key convention — both
  * streams sort nulls first, so null keys align) and the LARGEST right ts
  * ≤ left ts; no match → right side null. On a gapless SCD2 timeline this
  * is exactly point-in-time containment.
  *
  * Scale shape: requiredChildDistribution co-partitions both sides on the
  * join keys and requiredChildOrdering demands (keys, ts) sort — i.e. the
  * standard SMJ exchange layout, reused across stages like any shuffle
  * join; the merge itself is streaming, O(1) state (one buffered right
  * row), no per-key buffering of versions, no window state.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTs: Expression, rightTs: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; inject via
  * `spark.experimental.extraStrategies` ([[NativeAsOf.ensureRegistered]]).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKeys: Seq[Expression],
                        rightKeys: Seq[Expression],
                        leftTs: Expression, rightTs: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // The SMJ layout: co-partition on keys, sort each side by (keys, ts).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val ltsExpr = leftTs
    val rtsExpr = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTs = UnsafeProjection.create(Seq(ltsExpr), leftOut)
      val rTs = UnsafeProjection.create(Seq(rtsExpr), rightOut)
      val keyOrd =
        RowOrdering.createNaturalAscendingOrdering(lKeyExprs.map(_.dataType))
      val tsOrd =
        RowOrdering.createNaturalAscendingOrdering(Seq(ltsExpr.dataType))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(outAttrs, outAttrs)

      new Iterator[InternalRow] {
        // O(1) merge state: the right cursor + the last right row whose
        // (key, ts) qualified for the CURRENT left key. Rows are copied
        // out of the iterators' reused buffers.
        private var rHead: InternalRow = _
        private var rHeadKey: UnsafeRow = _
        private var rHeadTs: UnsafeRow = _
        private var lastMatch: InternalRow = _
        private var lastMatchKey: UnsafeRow = _
        advanceRight()

        private def advanceRight(): Unit =
          if (rIter.hasNext) {
            rHead = rIter.next().copy()
            rHeadKey = rKey(rHead).copy()
            rHeadTs = rTs(rHead).copy()
          } else rHead = null

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val lk = lKey(l)
          // Skip right rows of keys before the current left key; a stale
          // lastMatch is disqualified by the key-equality check below.
          while (rHead != null && keyOrd.compare(rHeadKey, lk) < 0)
            advanceRight()
          val lt = lTs(l)
          while (rHead != null && keyOrd.compare(rHeadKey, lk) == 0 &&
                   tsOrd.compare(rHeadTs, lt) <= 0) {
            lastMatch = rHead
            lastMatchKey = rHeadKey
            advanceRight()
          }
          val matched =
            lastMatch != null && keyOrd.compare(lastMatchKey, lk) == 0
          resultProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }
}

/** Public face of the native as-of join. */
object NativeAsOf {

  /** Idempotently install the planner strategy on this session. */
  def ensureRegistered(spark: org.apache.spark.sql.SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** As-of join `left` to `right` on equal `keys` (name pairs), picking
    * per left row the right row with the largest `rightTsCol` ≤
    * `leftTsCol`; unmatched left rows carry nulls. Column names must not
    * collide across sides (rename the right side first).
    */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           keys: Seq[(String, String)],
           leftTsCol: String, rightTsCol: String): DataFrame = {
    val spark = leftDf.sparkSession
    ensureRegistered(spark)
    val lPlan = leftDf.queryExecution.analyzed
    val rPlan = rightDf.queryExecution.analyzed
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name.equalsIgnoreCase(name)).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name)}"))
    require(leftDf.columns.map(_.toLowerCase).toSet
              .intersect(rightDf.columns.map(_.toLowerCase).toSet).isEmpty,
            "as-of join requires disjoint column names; rename first")
    DatasetShim.ofRows(spark, AsOfJoin(
      lPlan, rPlan,
      keys.map(k => attr(lPlan, k._1)), keys.map(k => attr(rPlan, k._2)),
      attr(lPlan, leftTsCol), attr(rPlan, rightTsCol)))
  }
}
