package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst `Expression` — the text
  * canonicalization step every multilingual corpus pipeline runs before
  * hashing or dedup (decomposed "e"+U+0301 and precomposed U+00E9 must
  * fingerprint identically, or near-dup recall silently drops on any
  * corpus that mixes normalization forms — common when sources differ in
  * OCR/keyboard/export toolchains).
  *
  * `doGenCode` keeps it inside whole-stage codegen; the body delegates to
  * `java.text.Normalizer` (ICU-grade tables shipped with the JDK).
  * DuckDB's `nfc_normalize` implements the same Unicode 15 NFC mapping,
  * which is what makes the c13 oracle an exact cross-engine check.
  */
object NfcNormalize {

  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: NFC-normalized already (true for most real text) — skip
    // the allocation; isNormalized is a table lookup scan
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }

  /** Register `graft_nfc` in the session for SQL / `call_function` use. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc",
      exprs => {
        require(exprs.length == 1,
          s"graft_nfc expects exactly 1 argument, got ${exprs.length}")
        NfcNormalizeExpr(exprs.head)
      },
      "built-in")
}

case class NfcNormalizeExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_nfc requires a string argument, got ${child.dataType.sql}")

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalizeExpr =
    copy(child = newChild)
}
