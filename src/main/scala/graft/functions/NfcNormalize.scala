package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Unicode NFC normalization of a string
  * column — the canonicalization step a text pipeline runs BEFORE any
  * hashing/dedup/tokenization, so that `café` (precomposed U+00E9) and
  * `cafe` + U+0301 (combining acute) — byte-different, render-identical
  * — fingerprint, shingle and deduplicate as the same text. Skipping
  * this step silently halves near-dup recall on web text, where both
  * encodings of the same word are common.
  *
  * Fast path: real-world corpora are overwhelmingly already NFC, so the
  * expression first runs `Normalizer.isNormalized` (a scan, no
  * allocation) and returns the input buffer untouched when it passes —
  * the normalize-and-copy only runs on the rare denormalized row.
  *
  * Extension tier (b) of SURVEY.md §2.10's preference order: there is
  * no `org.apache.spark.sql.functions` builtin for Unicode
  * normalization (only case/trim mappings), and a Scala UDF would pay
  * serialization + break codegen; this expression stays inside the
  * whole-stage-generated loop via a plain JDK call.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"nfc_normalize expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = child.dataType

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.normalize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // plain JDK static calls — nothing captured, nothing serialized,
    // identical code in the interpreted path above (asserted in spec)
    nullSafeCodeGen(ctx, ev, c => {
      val j = ctx.freshName("jstr")
      s"""
         |String $j = $c.toString();
         |${ev.value} =
         |  java.text.Normalizer.isNormalized($j,
         |      java.text.Normalizer.Form.NFC)
         |    ? $c
         |    : org.apache.spark.unsafe.types.UTF8String.fromString(
         |        java.text.Normalizer.normalize($j,
         |          java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): NfcNormalize = copy(child = newChild)
}

object NfcNormalize {

  /** Shared by the interpreted path and tests; the codegen path inlines
    * the same two JDK calls.
    */
  def normalize(s: UTF8String): UTF8String = {
    val j = s.toString
    if (java.text.Normalizer.isNormalized(j, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(j, java.text.Normalizer.Form.NFC))
  }

  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point. */
  def nfc_normalize(c: Column): Column =
    GraftColumnBridge.column(NfcNormalize(GraftColumnBridge.expression(c)))

  /** Arity-checked SQL builder. */
  val fromExprs: Seq[Expression] => NfcNormalize = { exprs =>
    require(exprs.length == 1,
      s"nfc_normalize expects exactly 1 argument, got ${exprs.length}")
    NfcNormalize(exprs.head)
  }

  /** SQL registration: `SELECT nfc_normalize(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "nfc_normalize", fromExprs, "scala_udf")
}
