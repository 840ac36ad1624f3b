package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: squared L2 distance of two
  * `array<double>` columns in one codegen'd loop — the PQ codebook
  * assignment metric (s07 evaluates it corpus·m·ksub times per
  * training pass, the hot inner loop of quantizer training).
  *
  * The composed form (`aggregate(zip_with(a, b, (x,y) => (x-y)²),
  * 0.0, _+_)`) runs as interpreted lambdas (higher-order functions
  * never enter whole-stage codegen) and allocates an intermediate
  * array per evaluation; this expression reads both `ArrayData`
  * buffers once, accumulating in a register. Summation order is the
  * same strict left-to-right as the HOF form, so results are
  * bit-identical (asserted in spec) — a performance form, not a new
  * semantic, exactly like [[CosineSimilarity]].
  */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2_squared expects array<double>, got " +
        s"${left.dataType.simpleString}, ${right.dataType.simpleString}")
  }

  override def dataType: DataType = DoubleType

  // Null semantics match the composed HOF form: length mismatch and
  // null elements both yield NULL there — and therefore here.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getDouble(i) - y.getDouble(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = $a.getDouble($i) - $b.getDouble($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2Squared =
    copy(left = newLeft, right = newRight)
}

object L2Squared {
  import org.apache.spark.sql.GraftColumnBridge

  /** Column-API entry point (Spark 4: the Column↔Expression bridge is
    * private[sql] — see GraftColumnBridge).
    */
  def l2_squared(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Squared(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Arity-checked SQL builder. */
  val fromExprs: Seq[Expression] => L2Squared = { exprs =>
    require(exprs.length == 2,
      s"l2_squared expects exactly 2 arguments, got ${exprs.length}")
    L2Squared(exprs.head, exprs(1))
  }

  /** SQL registration: `SELECT l2_squared(a, b)`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "l2_squared", fromExprs, "scala_udf")
}
