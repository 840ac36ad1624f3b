package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL table-function surface for the dedup operators, injected by
  * [[graft.GraftExtensions]] — the same bridge `asof_join` has, so
  * SQL-only users on a shared cluster reach winnowing and span
  * decontamination without any Scala:
  *
  *   SELECT * FROM winnow('docs_v')                  -- d15 shape
  *   SELECT * FROM despan_decontaminate('train_v', 'eval_v')  -- x24
  *
  * Each builder resolves its table-name arguments against the ACTIVE
  * session (table functions are expanded during analysis, which always
  * runs on a session thread) and returns the untouched logical plan of
  * the ordinary DataFrame operator — one implementation, two surfaces;
  * the SQL form cannot drift from the Scala form.
  */
object DedupSql {

  private def strLit(e: Expression, what: String, usage: String): String =
    e match {
      case Literal(s, StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"$what must be a string literal, got $other; $usage")
    }

  private def intLit(e: Expression, what: String, usage: String): Int =
    e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other; $usage")
    }

  /** `winnow(docs_table[, n[, w]])` — winnowed fingerprints (d15) of a
    * table/view with (doc_id, text).
    */
  def winnowFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "winnow(docs_table[, n[, w]]) — table name as a string " +
      "literal, optional shingle size n (default 3) and window w " +
      "(default 4) as integer literals"
    require(args.nonEmpty && args.length <= 3,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "winnow: docs_table", usage)
    val n = if (args.length > 1) intLit(args(1), "winnow: n", usage) else 3
    val w = if (args.length > 2) intLit(args(2), "winnow: w", usage) else 4
    val spark = SparkSession.active
    Dedup.winnow(spark.table(table), n, w).queryExecution.logical
  }

  /** `despan_decontaminate(corpus_table, eval_table[, n])` —
    * span-level decontamination (x24): cut only the spans of corpus
    * docs overlapping the eval split's n-grams, keep the rest.
    */
  def despanFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "despan_decontaminate(corpus_table, eval_table[, n]) — " +
      "table names as string literals, optional shingle size n " +
      "(default 5) as an integer literal"
    require(args.length == 2 || args.length == 3,
      s"wrong argument count: $usage")
    val corpus = strLit(args(0), "despan_decontaminate: corpus_table", usage)
    val eval_ = strLit(args(1), "despan_decontaminate: eval_table", usage)
    val n =
      if (args.length > 2) intLit(args(2), "despan_decontaminate: n", usage)
      else 5
    val spark = SparkSession.active
    Dedup.despanContaminated(
      spark.table(corpus), spark.table(eval_), n).queryExecution.logical
  }
}
