package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Physical as-of join: a single forward merge over two co-partitioned,
  * (key, time)-sorted children.
  *
  * Scale posture (the reason this is an operator and not a window
  * trick): the required distribution/ordering lets EnsureRequirements
  * plan one hash exchange + one sort per side — identical shuffle cost
  * to a sort-merge equi-join — after which each partition is merged in
  * one pass with O(1) state (the last eligible right row). The
  * composed window twin pays the same shuffle but buffers both sides
  * through a single unioned window frame; the operator streams them.
  * Neither side is ever broadcast or materialized per-key, so the plan
  * survives arbitrarily large both-sides inputs as long as key groups
  * hash-balance — the same contract as SortMergeJoin.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext,
      "number of rows with an as-of match"))

  /** Co-partition both children on the join keys — EnsureRequirements
    * inserts compatible hash exchanges exactly as for SortMergeJoin. */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  /** Sort each side by (keys..., time) so the merge is a single
    * forward pass. The right side additionally sorts by its remaining
    * orderable payload columns: "keep the last eligible row" then has a
    * DETERMINISTIC winner among equal (key, time) rows — the
    * lexicographically greatest payload — instead of a
    * partition-order-dependent one, with no pre-aggregation pass. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val keyAndTime = (rightKeys :+ rightTime).map(_.references).reduce(_ ++ _)
    val tiebreak = right.output.filterNot(keyAndTime.contains)
      .filter(a => RowOrdering.isOrderable(a.dataType))
    Seq(
      leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
      (rightKeys.map(SortOrder(_, Ascending)) :+
        SortOrder(rightTime, Ascending)) ++
        tiebreak.map(SortOrder(_, Ascending)))
  }

  /** The merge is left-driven and order-preserving. */
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending)

  protected override def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    val lAttrs = left.output
    val rAttrs = right.output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    val outAttrs = output
    val keyTypes = leftKeys.map(_.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) are projected, not eval'd: UnsafeProjection is
      // runtime-codegen'd and `getLong`/`isNullAt` stay primitive,
      // where interpreted BoundReference.eval boxes every value.
      val lKeyProj = UnsafeProjection.create(lKeyExprs, lAttrs)
      val rKeyProj = UnsafeProjection.create(rKeyExprs, rAttrs)
      val lTimeProj = UnsafeProjection.create(Seq(lTimeExpr), lAttrs)
      val rTimeProj = UnsafeProjection.create(Seq(rTimeExpr), rAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      // single-long-key fast path: primitive comparisons instead of the
      // interpreted row ordering. Null keys compare equal to each other
      // (matching the window twin's PARTITION BY, which groups nulls).
      val singleLongKey = keyTypes == Seq(LongType)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rAttrs.length)
      val rBuf = rIter.buffered

      // O(1) merge state: the latest right row whose (key, time) is
      // <= the current left (key, time), plus its key for group-change
      // invalidation. Copies are required — child iterators reuse row
      // buffers.
      var matched: InternalRow = null
      var matchedKey: UnsafeRow = null
      var matchedKeyNull = false
      var matchedKeyLong = 0L

      def sameKeyAsMatched(lKey: UnsafeRow): Boolean =
        if (singleLongKey) {
          val ln = lKey.isNullAt(0)
          (ln && matchedKeyNull) ||
            (!ln && !matchedKeyNull && lKey.getLong(0) == matchedKeyLong)
        } else keyOrd.compare(matchedKey, lKey) == 0

      def cmpKeys(rKey: UnsafeRow, lKey: UnsafeRow): Int =
        if (singleLongKey) {
          val rn = rKey.isNullAt(0)
          val ln = lKey.isNullAt(0)
          if (rn && ln) 0
          else if (rn) -1 // NULLS FIRST
          else if (ln) 1
          else java.lang.Long.compare(rKey.getLong(0), lKey.getLong(0))
        } else keyOrd.compare(rKey, lKey)

      lIter.map { lRow =>
        val lKey = lKeyProj(lRow)
        val lT = lTimeProj(lRow)
        val lTimeNull = lT.isNullAt(0)
        val lTime = if (lTimeNull) 0L else lT.getLong(0)
        if (matched != null && !sameKeyAsMatched(lKey)) {
          matched = null
          matchedKey = null
        }
        if (!lTimeNull) {
          var advance = true
          while (advance && rBuf.hasNext) {
            val head = rBuf.head
            val rKey = rKeyProj(head)
            val cmp = cmpKeys(rKey, lKey)
            if (cmp > 0) advance = false
            else {
              val rT = rTimeProj(head)
              val rTimeNull = rT.isNullAt(0)
              if (cmp == 0 && !rTimeNull && rT.getLong(0) > lTime) {
                advance = false
              } else {
                // behind the current left position: consume; remember
                // it as the candidate only when keys match and time is
                // non-null. Null-time rows sort NULLS FIRST within the
                // key and MUST be consumed here — stopping on them
                // would block every later eligible row for the key.
                val row = rBuf.next()
                if (cmp == 0 && !rTimeNull) {
                  matched = row.copy()
                  if (singleLongKey) {
                    matchedKeyNull = rKey.isNullAt(0)
                    matchedKeyLong =
                      if (matchedKeyNull) 0L else rKey.getLong(0)
                  } else matchedKey = rKey.copy()
                }
              }
            }
          }
        }
        numOutputRows += 1
        // a null left time is incomparable: no match by definition
        // (matched survives for subsequent non-null rows of the key)
        if (matched != null && !lTimeNull) {
          numMatchedRows += 1
          outProj(joiner(lRow, matched))
        } else {
          outProj(joiner(lRow, nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical as-of join to its exec node —
  * registered via `SparkSessionExtensions.injectPlannerStrategy` (or
  * per-session through `spark.experimental.extraStrategies`). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}
