package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Z-order (Morton) interleave of two dimension keys — the multi-dimension
  * clustering primitive: sorting by the interleaved code places rows close
  * in BOTH dimensions close on disk, so min/max file statistics prune scans
  * for predicates on either dimension (the layout trick behind Delta/Iceberg
  * OPTIMIZE ZORDER, here as a plain expression over two keys).
  *
  * Native Catalyst expression with `doGenCode` so the bit-spreading stays
  * inside whole-stage codegen. Uses the lower 32 bits of each input.
  */
object ZOrder {
  /** Spread the lower 32 bits of v to the even bit positions of a long. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton code: bit 2i is a's bit i, bit 2i+1 is b's bit i. */
  def interleave(a: Long, b: Long): Long = spread(a) | (spread(b) << 1)

  /** Register `graft_zorder` so SQL / `call_function` can use it. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_zorder",
      exprs => {
        require(exprs.length == 2,
          s"graft_zorder expects exactly 2 arguments, got ${exprs.length}")
        ZOrderExpr(exprs.head, exprs(1))
      },
      "built-in")
}

case class ZOrderExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_zorder"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e =>
      e.dataType == LongType || e.dataType == IntegerType)
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_zorder requires integral arguments, got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Number].longValue(),
      b.asInstanceOf[Number].longValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave((long)($a), (long)($b))")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrderExpr =
    copy(left = newLeft, right = newRight)
}
