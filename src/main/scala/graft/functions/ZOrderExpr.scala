package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Native Catalyst Morton (Z-order) interleave of two long columns —
  * the multi-dimensional clustering key behind z-ordered table layout
  * (the public technique used by lakehouse OPTIMIZE ZORDER: interleave
  * the bits of several dimensions so one range partitioning localizes
  * box queries on all of them at once).
  *
  * Contract: the low 16 bits of each input are interleaved (x on even
  * bit positions, y on odd) into a 32-bit key; higher input bits are
  * masked off — callers quantize/clamp first if a dimension exceeds
  * 2^16. Null in, null out. The bit math is pure integer arithmetic,
  * so the DuckDB oracle reproduces it exactly with a shift/mask fold.
  *
  * Codegen emits the standard mask-spread bit hack (5 shift/mask steps
  * per dimension, no loop, no allocation) straight into whole-stage
  * codegen; `nullSafeEval` is the interpreted twin for non-codegen
  * paths and must stay in lockstep.
  */
case class ZOrderExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_zorder"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (bigint, bigint), got " +
          s"${left.dataType.simpleString}, ${right.dataType.simpleString}")

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrderExpr.morton16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val zx = ctx.freshName("zx")
      val zy = ctx.freshName("zy")
      s"""
         |long $zx = $a & 0xFFFFL;
         |$zx = ($zx | ($zx << 8)) & 0x00FF00FFL;
         |$zx = ($zx | ($zx << 4)) & 0x0F0F0F0FL;
         |$zx = ($zx | ($zx << 2)) & 0x33333333L;
         |$zx = ($zx | ($zx << 1)) & 0x55555555L;
         |long $zy = $b & 0xFFFFL;
         |$zy = ($zy | ($zy << 8)) & 0x00FF00FFL;
         |$zy = ($zy | ($zy << 4)) & 0x0F0F0F0FL;
         |$zy = ($zy | ($zy << 2)) & 0x33333333L;
         |$zy = ($zy | ($zy << 1)) & 0x55555555L;
         |${ev.value} = $zx | ($zy << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}

object ZOrderExpr {
  /** Interpreted twin of the codegen bit-spread — keep identical. */
  def morton16(x: Long, y: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(x) | (spread(y) << 1)
  }
}
