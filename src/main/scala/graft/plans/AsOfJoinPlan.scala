package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.types.LongType

/** Logical as-of join (the SURVEY decision-table "custom LogicalPlan +
  * SparkStrategy + SparkPlan" slot — the whole-operator route for
  * semantics Spark's built-in operators don't express directly).
  *
  * Semantics: for every left row, attach the right row with the
  * greatest `rightTime <= leftTime` within the same key group (the
  * classic point-in-time / "most recent fact as of" join). Left rows
  * with no eligible right row keep null right columns — i.e. a LEFT
  * OUTER as-of join, matching the composed window-function twin in
  * [[graft.operators.Events.asofJoin]].
  *
  * Determinism contract: among right rows with equal (key, time) the
  * operator keeps the lexicographically greatest remaining payload —
  * the physical plan sorts the right side by (keys, time, remaining
  * orderable columns), so the merge's "last eligible row" is a
  * well-defined winner with no pre-aggregation pass. This matches the
  * composed twin's max-payload tie rule, EXCEPT that a null payload at
  * the winning time counts as a match here (the window twin's
  * `last(ignoreNulls)` would fall back to an earlier non-null row).
  *
  * The node is constructed from already-analyzed children with
  * resolved attributes, so it passes CheckAnalysis untouched and is
  * opaque to the optimizer (no rule rewrites an unknown node); it is
  * planned by [[AsOfJoinStrategy]].
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
    "as-of join needs matching, non-empty key lists")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == LongType && rightTime.dataType == LongType,
    "as-of join times must be LongType (e.g. unix_micros) — cast first")

  /** Left columns as-is; right columns become nullable (no-match rows
    * emit nulls on the right). */
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}
