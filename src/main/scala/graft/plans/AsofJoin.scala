package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.functions.col

/** As-of join as a WHOLE-OPERATOR extension — tier (c) of SURVEY.md
  * §2.10's preference order: a custom `LogicalPlan` + `SparkStrategy`
  * + `SparkPlan`, planned into the session like any built-in join.
  *
  * Semantics (left-outer, the common event-enrichment form): every
  * left row is joined to the right row with the LARGEST right-time ≤
  * the left row's time among rows sharing its key, or nulls when no
  * such row exists. Null keys and null times never match (SQL join
  * semantics). When several right rows tie on (key, time), the last
  * one in the right side's sort order wins — callers that need a
  * deterministic payload under ties should fold the tiebreak into the
  * time column.
  *
  * Why a custom operator when ev05 composes the same semantics from a
  * union + running-max window (tier (a))? The composed form carries
  * the WHOLE left payload through the window shuffle and can only
  * produce the right side's time column (any other right column needs
  * a second join back). The operator needs one exchange per side —
  * exactly the join keys, nothing widened — and streams each sorted
  * partition pair once, emitting the full right payload as it goes:
  * the merge is O(|L| + |R|) per partition with O(1) state (one
  * retained match row), so it scales to 100 TB exactly like a
  * sort-merge join — both sides hash-partitioned on the key,
  * per-partition work linear, no buffering of either side.
  *
  * Catalyst integration: [[AsofJoinPlan]] declares co-clustered
  * distribution and (key, time) ordering requirements, so
  * EnsureRequirements plans the exchanges/sorts (and AQE sizes them)
  * like it would for a shuffled join — nothing here hand-schedules.
  */
final case class AsofJoinPlan(left: LogicalPlan, right: LogicalPlan,
                              leftKeys: Seq[Expression],
                              rightKeys: Seq[Expression],
                              leftTime: Expression, rightTime: Expression)
    extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // the SQL path builds this node from UnresolvedAttributes that the
  // analyzer resolves generically — gate `resolved` on the type
  // contract too, so a key/time type mismatch surfaces as an analysis
  // error instead of a ClassCastException inside the merge (the Scala
  // API pre-checks the same thing with a friendlier message)
  override lazy val resolved: Boolean =
    expressions.forall(_.resolved) && childrenResolved &&
      leftKeys.zip(rightKeys).forall { case (a, b) =>
        a.dataType == b.dataType } &&
      leftTime.dataType == rightTime.dataType

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: requires both children clustered on their keys
  * and sorted by (keys, time); merges each co-partition pair in one
  * forward pass.
  */
final case class AsofJoinExec(leftKeys: Seq[Expression],
                              rightKeys: Seq[Expression],
                              leftTime: Expression, rightTime: Expression,
                              left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // built-in joins surface numOutputRows in the SQL UI; a custom
  // operator that doesn't is invisible in exactly the tool an engineer
  // debugs a slow 100 TB join with. numMatchedRows additionally
  // separates "joined" from "left row passed through with nulls" — the
  // match-rate is the first question an as-of enrichment audit asks.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext,
      "number of output rows"),
    "numMatchedRows" -> SQLMetrics.createMetric(sparkContext,
      "number of matched left rows"))

  // co-clustering contract, verbatim from ShuffledJoin: two
  // ClusteredDistributions that EnsureRequirements reconciles into
  // compatible HashPartitionings (and AQE may re-plan)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // NULLS FIRST (ascending default) is load-bearing for the merge:
  // null-key/null-time right rows sort before every real candidate of
  // their group, so the single forward pointer can consume-and-ignore
  // them without ever stepping past a live match
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // left rows pass through in their sorted order
  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val numOutputRows = longMetric("numOutputRows")
    val numMatchedRows = longMetric("numMatchedRows")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(leftKeys, left.output)
      val rKeyProj = UnsafeProjection.create(rightKeys, right.output)
      val lTimeProj = UnsafeProjection.create(Seq(leftTime), left.output)
      val rTimeProj = UnsafeProjection.create(Seq(rightTime), right.output)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      val resultProj = UnsafeProjection.create(output, output)
      val rBuf = rIter.buffered
      // O(1) merge state: the best match seen so far and its key
      var lastMatch: InternalRow = null
      var lastMatchKey: UnsafeRow = null
      lIter.map { l =>
        numOutputRows += 1
        val lk = lKeyProj(l)
        val lt = lTimeProj(l)
        if (lk.anyNull || lt.isNullAt(0)) resultProj(joined(l, nullRight))
        else {
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val c = keyOrd.compare(rk, lk)
            val consume = c < 0 || (c == 0 && {
              val rt = rTimeProj(rBuf.head)
              // null time sorts first within the key group: consume
              // (it can never match) instead of blocking the pointer
              rt.isNullAt(0) || timeOrd.compare(rt, lt) <= 0
            })
            if (consume) {
              val r = rBuf.next()
              val rk2 = rKeyProj(r)
              if (c == 0 && !rk2.anyNull && !rTimeProj(r).isNullAt(0)) {
                // rows are reused buffers — copy the one we retain
                lastMatch = r.copy()
                lastMatchKey = rk2.copy()
              }
            } else advancing = false
          }
          val matched = lastMatch != null &&
            keyOrd.compare(lastMatchKey, lk) == 0
          if (matched) numMatchedRows += 1
          resultProj(joined(l, if (matched) lastMatch else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsofJoinPlan]] — the optimizer-rule leg of
  * the extension (`injectOptimizerRule`). Catalyst's own ColumnPruning
  * only understands built-in operators, so a custom node is a pruning
  * BARRIER: `Asof.join(wideTable, …).select(two columns)` would read
  * every column of both scans. This rule narrows each child to the
  * columns the parent projection references plus the join keys/times;
  * the inserted Projects then collapse into the children and reach the
  * file-source `ReadSchema` like any built-in join's would (asserted
  * in AsofJoinSpec). Without it the operator is correct but pays full
  * row width in I/O and shuffle — at 100 TB that is the difference
  * between scanning two columns and scanning fifty.
  */
object AsofJoinPruning
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(projectList,
        aj @ AsofJoinPlan(l, r, lk, rk, lt, rt)) =>
      val required = AttributeSet(projectList.flatMap(_.references)) ++
        AttributeSet((lk ++ rk) :+ lt :+ rt)
      def prune(child: LogicalPlan): LogicalPlan = {
        val keep = child.output.filter(required.contains)
        if (keep.length == child.output.length) child
        else Project(keep, child)
      }
      val (nl, nr) = (prune(l), prune(r))
      // fixed-point safe: once nothing prunes, the original node is
      // returned unchanged
      if ((nl eq l) && (nr eq r)) p
      else Project(projectList, aj.copy(left = nl, right = nr))
  }
}

/** Plans [[AsofJoinPlan]] → [[AsofJoinExec]]; injected via
  * [[graft.GraftExtensions]] (cluster deployment) or
  * `experimental.extraStrategies` ([[Asof.join]] self-registers for
  * plain sessions).
  */
class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

object Asof {

  import org.apache.spark.sql.GraftColumnBridge

  /** SQL surface: build [[AsofJoinPlan]] from `asof_join(...)` table-
    * function arguments — six string literals naming the two tables
    * (or views), the key column(s) (comma-separated for multi-key),
    * and the time columns:
    * {{{
    * SELECT * FROM asof_join('purchases', 'quotes',
    *                         'user_id', 'user_id', 'ts', 'ts')
    * }}}
    * Each side is wrapped in a fixed-name SubqueryAlias and its
    * key/time columns referenced through that qualifier, so the
    * analyzer's generic resolution binds them unambiguously even when
    * both sides share column names. Registered by
    * [[graft.GraftExtensions]] via `injectTableFunction` — SQL-only
    * users reach the custom operator without any Scala.
    */
  def fromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias
    import org.apache.spark.sql.types.StringType
    val usage = "asof_join(left_table, right_table, left_keys, " +
      "right_keys, left_time, right_time) — six string literals; " +
      "keys may be comma-separated lists"
    require(args.length == 6, s"wrong argument count: $usage")
    def str(e: Expression, what: String): String = e match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"asof_join: $what must be a string literal, got $other; $usage")
    }
    val names = Seq("left_table", "right_table", "left_keys",
      "right_keys", "left_time", "right_time")
    val Seq(lTab, rTab, lKeys, rKeys, lTime, rTime) =
      args.zip(names).map { case (a, n) => str(a, n) }
    val (lq, rq) = ("__graft_asof_l", "__graft_asof_r")
    def keys(csv: String, what: String): Seq[String] = {
      val ks = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      require(ks.nonEmpty, s"asof_join: $what is empty; $usage")
      ks
    }
    val (lks, rks) = (keys(lKeys, "left_keys"), keys(rKeys, "right_keys"))
    require(lks.length == rks.length,
      s"asof_join: key lists differ in length ($lks vs $rks)")
    AsofJoinPlan(
      SubqueryAlias(lq, UnresolvedRelation(lTab.split('.').toSeq)),
      SubqueryAlias(rq, UnresolvedRelation(rTab.split('.').toSeq)),
      lks.map(k => UnresolvedAttribute(Seq(lq, k))),
      rks.map(k => UnresolvedAttribute(Seq(rq, k))),
      UnresolvedAttribute(Seq(lq, lTime)),
      UnresolvedAttribute(Seq(rq, rTime)))
  }

  /** Ensure the planner knows the operator on sessions built without
    * [[graft.GraftExtensions]]; idempotent.
    */
  def ensureStrategy(spark: SparkSession): Unit = synchronized {
    val es = spark.experimental.extraStrategies
    if (!es.exists(_.isInstanceOf[AsofJoinStrategy]))
      spark.experimental.extraStrategies = es :+ new AsofJoinStrategy
    val eo = spark.experimental.extraOptimizations
    if (!eo.contains(AsofJoinPruning))
      spark.experimental.extraOptimizations = eo :+ AsofJoinPruning
  }

  /** `left ASOF JOIN right ON leftKeys = rightKeys AND rightTime <=
    * leftTime` (latest match, left-outer). Output = all left columns
    * then all right columns (nullable); rename collisions away before
    * joining — both sides' names survive as-is.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      s"asof join needs matching non-empty key lists, " +
        s"got $leftKeys vs $rightKeys")
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    // a branched DataFrame (both sides from one plan) would duplicate
    // attribute ids across the two children; re-alias the right side's
    // columns (fresh exprIds) in that case, as the analyzer's
    // DeduplicateRelations does for built-in joins
    val rightDeduped =
      if (left.queryExecution.analyzed.outputSet
            .intersect(right.queryExecution.analyzed.outputSet).nonEmpty)
        right.select(right.columns.map(c => col(c).as(c)).toIndexedSeq: _*)
      else right
    val rPlan = rightDeduped.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String, side: String): Attribute =
      plan.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"asof join: no column '$n' on the $side side " +
            s"(has ${plan.output.map(_.name).mkString(", ")})")
        case many => throw new IllegalArgumentException(
          // silently binding the first duplicate could join on the
          // WRONG side's column — reject like Spark's own resolver
          s"asof join: column '$n' is ambiguous on the $side side " +
            s"(${many.size} columns share the name)")
      }
    val lks = leftKeys.map(attr(lPlan, _, "left"))
    val rks = rightKeys.map(attr(rPlan, _, "right"))
    lks.zip(rks).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"asof key type mismatch: ${a.name}:${a.dataType.simpleString} vs " +
          s"${b.name}:${b.dataType.simpleString}")
    }
    val lt = attr(lPlan, leftTime, "left")
    val rt = attr(rPlan, rightTime, "right")
    require(lt.dataType == rt.dataType,
      s"asof time type mismatch: ${lt.dataType.simpleString} vs " +
        s"${rt.dataType.simpleString}")
    GraftColumnBridge.ofRows(spark,
      AsofJoinPlan(lPlan, rPlan, lks, rks, lt, rt))
  }
}
