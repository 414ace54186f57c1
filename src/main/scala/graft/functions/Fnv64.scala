package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** FNV-1a 64-bit hash — the engine's document-fingerprint primitive
  * (SURVEY §7.2 extensions: "document fingerprinting (rolling hash)").
  *
  * Implemented as a native Catalyst `Expression` with `doGenCode` so it
  * stays inside whole-stage codegen (no UDF serialization, no boxing in
  * the hot path). Deterministic across the cluster: pure function of the
  * UTF-8 bytes. Used directly as the fingerprint and as the token-hash
  * primitive for SimHash/MinHash (graft.text).
  */
object Fnv64 {
  final val Offset = 0xcbf29ce484222325L
  final val Prime  = 0x100000001b3L

  def hashBytes(bytes: Array[Byte]): Long = {
    var h = Offset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= Prime; i += 1 }
    h
  }

  def hashString(s: String): Long = hashBytes(s.getBytes("UTF-8"))

  /** Register `graft_fnv64` in the session so SQL and
    * `functions.call_function("graft_fnv64", c)` can use the expression. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_fnv64",
      exprs => {
        require(exprs.length == 1,
          s"graft_fnv64 expects exactly 1 argument, got ${exprs.length}")
        Fnv64Expr(exprs.head)
      },
      "built-in")
}

case class Fnv64Expr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_fnv64"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[org.apache.spark.sql.types.StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_fnv64 requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    Fnv64.hashBytes(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fnv64.hashBytes($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Fnv64Expr =
    copy(child = newChild)
}
