package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-pattern substring matching via the Aho–Corasick automaton
  * (Aho & Corasick 1975, public) — the blocklist/taxonomy tagging
  * primitive a crawl-cleaning pipeline runs over every document
  * (UT1-style URL/phrase blocklists, PII keyword nets, topic
  * lexicons). One automaton walk matches ALL patterns in O(|text| +
  * hits): at 100 TB the alternative — one `contains`/regexp pass per
  * pattern — multiplies the corpus scan by |patterns|, and a single
  * alternation regex backtracks without the fail-link sharing that
  * makes AC linear.
  *
  * Same extension tier as [[SketchProbes]] (§2.10 tier b): a native
  * codegen expression, the automaton riding the plan's reference
  * array below [[SketchProbes.InlineSketchMaxBytes]] (estimated) and
  * an explicit TorrentBroadcast above it — large blocklists fetch
  * once per executor, not once per task binary.
  */
object KeywordMatch {

  /** Matched patterns of `ac` in `s`, lexicographically sorted,
    * distinct — the body shared by interpreted eval and generated
    * code (the Base60Hash.hash60 discipline). NULL text matches
    * nothing (empty array, never NULL) — a blocklist verdict on an
    * absent document is a definite "clean", mirroring
    * BloomMightContain's absent-key semantics.
    */
  def matches(ac: AhoCorasick, s: UTF8String): ArrayData = {
    if (s == null) return AhoCorasick.EmptyResult
    val hit = ac.matchedMask(s.toString)
    var n = 0
    var i = 0
    while (i < hit.length) { if (hit(i)) n += 1; i += 1 }
    if (n == 0) return AhoCorasick.EmptyResult
    val out = new Array[Any](n)
    var j = 0
    i = 0
    while (i < hit.length) {
      if (hit(i)) { out(j) = ac.patternUtf8(i); j += 1 }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Rough in-task footprint of the automaton: ~48 bytes per trie
    * node (map entry + fail + output slack); nodes ≤ Σ|pattern|.
    * Same role as the sketch factories' byte gates — call sites never
    * choose the shipping mode themselves.
    */
  private def estimatedBytes(patterns: Seq[String]): Long =
    patterns.iterator.map(_.length.toLong).sum * 48

  def keyword_matches(text: Column, patterns: Seq[String]): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    val ac = AhoCorasick(patterns)
    val e = GraftColumnBridge.expression(text)
    GraftColumnBridge.column(
      if (estimatedBytes(patterns) <= SketchProbes.InlineSketchMaxBytes)
        KeywordMatches(e, ac)
      else KeywordMatchesBroadcast(e,
        org.apache.spark.sql.SparkSession.active.sparkContext
          .broadcast(ac)))
  }
}

/** Serializable Aho–Corasick automaton over UTF-16 chars (the same
  * units `String.contains` compares, so the matched SET equals
  * per-pattern `contains` — the property the DuckDB oracle replays).
  * Patterns are deduplicated and lexicographically sorted at
  * construction; match output is reported in that order.
  */
final class AhoCorasick private (
    val patterns: Array[String],
    trans: Array[Map[Char, Int]],
    fail: Array[Int],
    out: Array[Array[Int]]) extends Serializable {

  @transient private lazy val utf8: Array[UTF8String] =
    patterns.map(UTF8String.fromString)

  private[functions] def patternUtf8(i: Int): UTF8String = utf8(i)

  /** One automaton walk; `mask(i)` = pattern i occurs in `s`. Output
    * closure is precomputed (each node's list already includes its
    * fail-chain's outputs), so the inner loop is array appends only.
    */
  def matchedMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](patterns.length)
    var st = 0
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      var cur = st
      var nxt = -1
      while (nxt < 0) {
        trans(cur).get(ch) match {
          case Some(n) => nxt = n
          case None => if (cur == 0) nxt = 0 else cur = fail(cur)
        }
      }
      st = nxt
      val o = out(st)
      var j = 0
      while (j < o.length) { mask(o(j)) = true; j += 1 }
      i += 1
    }
    mask
  }

  /** Matched patterns as plain strings (spec/driver convenience). */
  def matchedPatterns(s: String): Seq[String] = {
    val m = matchedMask(s)
    patterns.indices.collect { case i if m(i) => patterns(i) }
  }
}

object AhoCorasick {

  private[functions] val EmptyResult: ArrayData =
    new GenericArrayData(Array.empty[Any])

  /** Build goto/fail/output via the textbook BFS. Determinism note:
    * trie node NUMBERING depends on map iteration order, but the
    * accepted language and the (sorted) output indices don't — the
    * automaton is semantically canonical for a given pattern set.
    */
  def apply(pats: Seq[String]): AhoCorasick = {
    val patterns = pats.distinct.sorted.toArray
    require(patterns.nonEmpty, "keyword_matches needs >= 1 pattern")
    require(patterns.forall(_.nonEmpty),
      "keyword_matches patterns must be non-empty")
    val trans = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val outB = mutable.ArrayBuffer(mutable.ArrayBuffer.empty[Int])
    for ((p, idx) <- patterns.zipWithIndex) {
      var st = 0
      for (ch <- p) {
        st = trans(st).getOrElseUpdate(ch, {
          trans += mutable.Map.empty[Char, Int]
          outB += mutable.ArrayBuffer.empty[Int]
          trans.length - 1
        })
      }
      outB(st) += idx
    }
    val n = trans.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    trans(0).valuesIterator.foreach { s => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      trans(u).foreach { case (ch, v) =>
        queue += v
        var f = fail(u)
        while (f != 0 && !trans(f).contains(ch)) f = fail(f)
        fail(v) = trans(f).getOrElse(ch, 0)
        // BFS order: fail(v) is shallower, its closure is complete
        outB(v) ++= outB(fail(v))
      }
    }
    new AhoCorasick(patterns,
      trans.iterator.map(_.toMap).toArray, fail,
      outB.iterator.map(_.distinct.sorted.toArray).toArray)
  }
}

/** `keyword_matches` over an in-plan automaton: sorted-distinct
  * matched patterns as `array<string>`, empty (never NULL) on no
  * match or NULL text.
  */
case class KeywordMatches(child: Expression, ac: AhoCorasick)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"keyword_matches expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    KeywordMatch.matches(ac, child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val acRef = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AhoCorasick].getName)
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${c.code}
      $arrCls ${ev.value} = graft.functions.KeywordMatch.matches(
        $acRef, ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): KeywordMatches = copy(child = newChild)
}

/** [[KeywordMatches]] over an explicit TorrentBroadcast handle — the
  * large-blocklist form: only the handle rides the task binary; the
  * automaton is fetched once per executor and hoisted into
  * generated-class state.
  */
case class KeywordMatchesBroadcast(
    child: Expression,
    bc: org.apache.spark.broadcast.Broadcast[AhoCorasick])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: StringType => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"keyword_matches expects string, got ${dt.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  override def eval(input: InternalRow): Any =
    KeywordMatch.matches(bc.value,
      child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("acBc", bc,
      classOf[org.apache.spark.broadcast.Broadcast[_]].getName)
    val acCls = classOf[AhoCorasick].getName
    val acState = ctx.addMutableState(acCls, "acAutomaton",
      v => s"$v = ($acCls) $bcRef.value();")
    val c = child.genCode(ctx)
    val arrCls = classOf[ArrayData].getName
    ev.copy(code = code"""
      ${c.code}
      $arrCls ${ev.value} = graft.functions.KeywordMatch.matches(
        $acState, ${c.isNull} ? null : ${c.value});
    """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(
      newChild: Expression): KeywordMatchesBroadcast =
    copy(child = newChild)
}
