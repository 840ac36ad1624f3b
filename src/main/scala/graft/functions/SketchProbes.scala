package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Native codegen probes for the broadcast sketches — the UDF
  * replacements the round-7 verdict recorded ("no builtin probes a
  * broadcast sketch"): a Scala UDF boxes its input, breaks the
  * whole-stage pipeline at an eval boundary, and hides the probe from
  * codegen; these expressions keep the e10/x21 scan → probe → filter
  * path inside one generated loop. The sketch object rides in the
  * plan's reference array (`ctx.addReferenceObj`) — distributed with
  * the task binary's broadcast exactly like the UDF's captured
  * broadcast handle, minus the indirection.
  *
  * Extension tier (b) of SURVEY.md §2.10's preference order, same as
  * [[CosineSimilarity]]/[[Base60Hash]].
  */
object SketchProbes {

  /** The Bloom probe body shared by interpreted eval and generated
    * code (the Base60Hash.hash60 discipline — one implementation,
    * both paths).
    */
  def bloomMight(words: Array[Long], h: Long, k: Int, m: Int): Boolean = {
    var i = 0
    var ok = true
    while (ok && i < k) {
      val pos = graft.engine.Sketches.bloomPos(i, h, m)
      ok = (words(pos >>> 6) & (1L << (pos & 63))) != 0
      i += 1
    }
    ok
  }

  /** CMS estimate body — UTF8String boundary handled here so the
    * generated call site stays one static invocation.
    */
  def cmsEstimate(cms: CountMinSketch, s: UTF8String): Long =
    cms.estimateCount(s.toString)

  /** Above this many bytes a sketch stops riding `addReferenceObj`
    * (which serializes it INTO every task binary — fine at KB-scale
    * sketches, where it broadcasts once per stage with the closure)
    * and ships as an explicit TorrentBroadcast instead: chunked,
    * fetched once per EXECUTOR, reused across stages, and the task
    * binary stays small. The gate is in the factories, so call sites
    * never choose wrong as sketches grow. 1 MiB (r12, down from
    * 4 MiB): x21's eps=1e-4 CMS is a 1.12 MB table — riding the
    * reference array re-serialized it into every task binary of BOTH
    * its stages (the bench tail's 1.1 MiB task-binary warnings);
    * Spark itself warns at 1000 KiB, which is the right line — below
    * it inline wins (no per-executor fetch round-trip), above it the
    * broadcast does.
    */
  val InlineSketchMaxBytes: Long = 1L << 20

  def bloom_might_contain(h: Column, words: Array[Long], k: Int,
                          m: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val e = GraftColumnBridge.expression(h)
    GraftColumnBridge.column(
      if (words.length.toLong * 8 <= InlineSketchMaxBytes)
        BloomMightContain(e, words, k, m)
      else BloomMightContainBroadcast(e,
        org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(words), k, m))
  }

  def cms_estimate(token: Column, cms: CountMinSketch): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val e = GraftColumnBridge.expression(token)
    GraftColumnBridge.column(
      if (cms.depth.toLong * cms.width * 8 <= InlineSketchMaxBytes)
        CmsEstimate(e, cms)
      else CmsEstimateBroadcast(e,
        org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(cms)))
  }
}

/** `might_contain` over a driver-built portable Bloom bitmap. NULL
  * hashes probe as non-members (false, never NULL) — the same
  * semantics the UDF form encoded with its `h != null &&` gate, and
  * what the integrity check wants: an absent key is a definite "not
  * in the export", not an unknown.
  */
case class BloomMightContain(child: Expression, words: Array[Long],
                             k: Int, m: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects the bigint base60 hash, got " +
          dt.simpleString)
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null &&
      SketchProbes.bloomMight(words, v.asInstanceOf[Long], k, m)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("bloomWords", words, "long[]")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = !${c.isNull} &&
        graft.functions.SketchProbes.bloomMight($w, ${c.value}, $k, $m);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}

/** [[BloomMightContain]] over an explicit TorrentBroadcast handle —
  * the >[[SketchProbes.InlineSketchMaxBytes]] form the factory picks:
  * only the handle rides the task binary; the bitmap is fetched once
  * per executor and hoisted into generated-class state (one `.value`
  * per task, not per row). Semantics identical: NULL probes false.
  */
case class BloomMightContainBroadcast(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[Array[Long]],
    k: Int, m: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain expects the bigint base60 hash, got " +
          dt.simpleString)
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    v != null &&
      SketchProbes.bloomMight(bc.value, v.asInstanceOf[Long], k, m)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val w = ctx.addMutableState("long[]", "bloomWords",
      v => s"$v = (long[]) $bcRef.value();")
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = !${c.isNull} &&
        graft.functions.SketchProbes.bloomMight($w, ${c.value}, $k, $m);
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContainBroadcast =
    copy(child = newChild)
}

/** `estimate_count` against a driver-built CountMinSketch. Standard
  * null propagation (the UDF's callers pre-filtered nulls; the
  * expression doesn't need them to).
  */
case class CmsEstimate(child: Expression, cms: CountMinSketch)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    SketchProbes.cmsEstimate(cms, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val sketch = ctx.addReferenceObj("cms", cms,
      classOf[CountMinSketch].getName)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchProbes.cmsEstimate($sketch, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimate = copy(child = newChild)
}

/** [[CmsEstimate]] over an explicit TorrentBroadcast handle — the
  * >[[SketchProbes.InlineSketchMaxBytes]] form (depth·width·8 bytes):
  * handle in the task binary, sketch fetched once per executor and
  * hoisted into generated-class state.
  */
case class CmsEstimateBroadcast(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[CountMinSketch])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"cms_estimate expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = LongType

  override def nullSafeEval(s: Any): Any =
    SketchProbes.cmsEstimate(bc.value, s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("cmsBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val sketch = ctx.addMutableState(classOf[CountMinSketch].getName,
      "cmsSketch",
      v => s"$v = (${classOf[CountMinSketch].getName}) $bcRef.value();")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchProbes.cmsEstimate($sketch, $c)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): CmsEstimateBroadcast = copy(child = newChild)
}
