package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's portable 60-bit base hash
  * (`graft.ext.Hashing.base60`) computed straight from the md5 digest
  * bytes.
  *
  * The composable form — `conv(substr(md5(s),1,15),16,10)` — pays for
  * a 32-char hex string it immediately throws away, a substring copy,
  * and `conv`'s per-character base-16 parse loop; measured at sf0.1
  * that chain costs 2.8× a raw hash pass over the token stream, with
  * `substr`+`conv` alone ≈60% on top of md5. This expression produces
  * the IDENTICAL value (the top 15 hex chars of an md5 are the top 60
  * bits of its digest: big-endian first 8 bytes >>> 4) with one digest
  * call and integer shifts — no hex string, no parse, and it stays
  * inside whole-stage codegen.
  *
  * Every base-hash consumer (shingle minhash, simhash, band keys,
  * splits, shuffle/cap sampling) inherits the speedup; the DuckDB
  * oracles keep the hex-arithmetic form ([[graft.ext.Hashing
  * .base60Sql]]), which is exactly the cross-engine check that the two
  * formulations agree (plus the bit-parity spec on the Spark side).
  *
  * Extension tier (b) of SURVEY.md §2.10's preference order: composed
  * builtins express the semantics but wastefully; a native expression
  * removes the waste without leaving codegen.
  */
case class Base60HashExpr(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"base60_hash expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    Base60Hash.hash60(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    // one static call — nothing captured, nothing serialized; identical
    // code to the interpreted path above (asserted in spec)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Base60Hash.hash60($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Base60HashExpr = copy(child = newChild)
}

object Base60Hash {

  // MessageDigest is stateful; one per thread, reset per call. The
  // digest(byte[]) call resets implicitly after completing.
  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by the interpreted path, the codegen path, and tests.
    * Value contract: equals `conv(substr(md5(s),1,15),16,10)` cast to
    * long — 15 hex chars = 60 bits = first 8 digest bytes big-endian,
    * unsigned-shifted right 4 (always non-negative).
    */
  def hash60(s: UTF8String): Long = {
    val dig = localMd5.get().digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }

  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point. */
  def base60_hash(c: Column): Column =
    GraftColumnBridge.column(Base60HashExpr(GraftColumnBridge.expression(c)))

  /** Arity-checked SQL builder. */
  val fromExprs: Seq[Expression] => Base60HashExpr = { exprs =>
    require(exprs.length == 1,
      s"base60_hash expects exactly 1 argument, got ${exprs.length}")
    Base60HashExpr(exprs.head)
  }

  /** SQL registration: `SELECT base60_hash(s)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "base60_hash", fromExprs, "scala_udf")
}
