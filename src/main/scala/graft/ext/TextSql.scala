package graft.ext

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{IntegerType, StringType}

/** SQL table-function surface for the corpus-quality operators,
  * injected by [[graft.GraftExtensions]] — the same bridge
  * `asof_join`/`winnow`/`despan_decontaminate` use, so SQL-only users
  * on a shared cluster reach the quality gates without any Scala:
  *
  *   SELECT * FROM gopher_quality('docs_v')          -- x27 shape
  *   SELECT * FROM c4_clean('docs_v')                -- x28 shape
  *   SELECT * FROM c4_clean('docs_v', 5, 3)
  *
  * Each builder resolves its table-name argument against the ACTIVE
  * session (table functions are expanded during analysis, which always
  * runs on a session thread) and returns the untouched logical plan of
  * the ordinary DataFrame operator — one implementation, two surfaces;
  * the SQL form cannot drift from the Scala form.
  */
object TextSql {

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

  /** `gopher_quality(docs_table)` — the Gopher word-level quality
    * features + keep verdict (x27) of a table/view with
    * (doc_id, source, text).
    */
  def gopherFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage =
      "gopher_quality(docs_table) — table name as a string literal"
    require(args.length == 1, s"wrong argument count: $usage")
    val table = strLit(args(0), "gopher_quality: docs_table", usage)
    val spark = SparkSession.active
    TextAnalysis.gopherQuality(spark.table(table))
      .queryExecution.logical
  }

  /** `c4_clean(docs_table[, min_line_words[, min_kept_lines]])` — C4
    * line-level cleaning (x28) of a table/view with (doc_id, text).
    */
  def c4FromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "c4_clean(docs_table[, min_line_words[, " +
      "min_kept_lines]]) — table name as a string literal, optional " +
      "thresholds (defaults 5, 3) as integer literals"
    require(args.nonEmpty && args.length <= 3,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "c4_clean: docs_table", usage)
    val minWords =
      if (args.length > 1) intLit(args(1), "c4_clean: min_line_words", usage)
      else 5
    val minKept =
      if (args.length > 2) intLit(args(2), "c4_clean: min_kept_lines", usage)
      else 3
    val spark = SparkSession.active
    TextAnalysis.c4Clean(spark.table(table),
      minLineWords = minWords, minKeptLines = minKept)
      .queryExecution.logical
  }

  /** `dedup_lines(docs_table)` — intra-document repeated-line removal
    * (x32) of a table/view with (doc_id, text).
    */
  def dedupLinesFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage =
      "dedup_lines(docs_table) — table name as a string literal"
    require(args.length == 1, s"wrong argument count: $usage")
    val table = strLit(args(0), "dedup_lines: docs_table", usage)
    val spark = SparkSession.active
    TextAnalysis.dedupLines(spark.table(table))
      .queryExecution.logical
  }

  /** `epoch_budget(docs_table)` — data-constrained epoch budgeting
    * (x33) of a table/view with (source, text): per-domain token
    * supply → √-temperature weights → capped allocation.
    */
  def epochBudgetFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage =
      "epoch_budget(docs_table) — table name as a string literal"
    require(args.length == 1, s"wrong argument count: $usage")
    val table = strLit(args(0), "epoch_budget: docs_table", usage)
    val spark = SparkSession.active
    TextAnalysis.epochBudget(spark.table(table))
      .queryExecution.logical
  }

  /** `quality_probe(docs_table, target_source[, epochs])` — trainable
    * quality probe (x35) over a table/view with (doc_id, source,
    * text): train a linear scorer against the docs whose `source`
    * equals `target_source` (deterministic full-batch GD, default 3
    * epochs), then score the WHOLE table. Training runs EAGERLY at
    * plan time (the pqTrainOn discipline — KB-scale gradient collects;
    * the feature cache is released before this returns, so the SQL
    * surface leaks nothing).
    */
  def qualityProbeFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "quality_probe(docs_table, target_source[, epochs]) — " +
      "table and target source as string literals, optional epochs " +
      "(default 3) as an integer literal"
    require(args.length == 2 || args.length == 3,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "quality_probe: docs_table", usage)
    val target = strLit(args(1), "quality_probe: target_source", usage)
    val epochs =
      if (args.length > 2) intLit(args(2), "quality_probe: epochs", usage)
      else 3
    val spark = SparkSession.active
    val docs = spark.table(table)
    TextAnalysis.qualityProbeScore(docs,
      TextAnalysis.qualityProbeModel(docs,
        org.apache.spark.sql.functions.col("source") === target,
        epochs = epochs))
      .queryExecution.logical
  }

  /** `dsir_resample(docs_table, target_source[, k])` — DSIR importance
    * resampling (x31) of a table/view with (doc_id, source, text):
    * documents whose `source` equals `target_source` define the target
    * distribution; the k best-matching OTHER documents are returned.
    */
  def dsirFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "dsir_resample(docs_table, target_source[, k]) — " +
      "table and target source as string literals, optional k " +
      "(default 100) as an integer literal"
    require(args.length == 2 || args.length == 3,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "dsir_resample: docs_table", usage)
    val target = strLit(args(1), "dsir_resample: target_source", usage)
    val k =
      if (args.length > 2) intLit(args(2), "dsir_resample: k", usage)
      else 100
    val spark = SparkSession.active
    // materialize=false: a table function has no release hook, so the
    // persisted feature table would leak a cache entry per invocation
    // for the session lifetime (Scala callers pair the default
    // materialized path with dsirRelease instead)
    TextAnalysis.dsirResample(spark.table(table),
      org.apache.spark.sql.functions.col("source") === target, k = k,
      materialize = false)
      .queryExecution.logical
  }

  /** `weighted_sample(docs_table[, k])` — exact-k-per-stratum
    * weighted sampling without replacement (x34) of a table/view with
    * (doc_id, source, text).
    */
  def weightedSampleFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "weighted_sample(docs_table[, k]) — table name as a " +
      "string literal, optional k (default 5) as an integer literal"
    require(args.nonEmpty && args.length <= 2,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "weighted_sample: docs_table", usage)
    val k =
      if (args.length > 1) intLit(args(1), "weighted_sample: k", usage)
      else 5
    val spark = SparkSession.active
    TextAnalysis.weightedSample(spark.table(table), k = k)
      .queryExecution.logical
  }

  /** `bm25_topk(docs_table, terms[, k])` — Okapi BM25 lexical top-k
    * (s09) of a table/view with (doc_id, text); `terms` is a
    * space-separated bag of query terms.
    */
  /** `bpe_merges(docs_table[, n_merges])` — BPE merge training (x36)
    * over a table/view with (doc_id, text); returns the display-form
    * merge table. EAGER: training runs while the function expands
    * (analysis time) — the qualityProbe/dsir model discipline, the
    * artifact is KB-scale by construction.
    */
  def bpeMergesFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "bpe_merges(docs_table[, n_merges]) — table name as " +
      "a string literal, optional merge budget (default 8) as an " +
      "integer literal"
    require(args.nonEmpty && args.length <= 2,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "bpe_merges: docs_table", usage)
    val n =
      if (args.length > 1) intLit(args(1), "bpe_merges: n_merges", usage)
      else 8
    require(n >= 1, s"n_merges must be positive; $usage")
    val spark = SparkSession.active
    TextAnalysis.bpeMerges(spark.table(table), n)
      .queryExecution.logical
  }

  /** `perplexity_buckets(docs_table[, n_buckets])` — CCNet
    * head/middle/tail bucketing (x38) of a table/view with
    * (doc_id, text). EAGER: the cutoff artifact (≤ n_buckets−1
    * values) is collected while the function expands.
    */
  def perplexityBucketsFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "perplexity_buckets(docs_table[, n_buckets]) — table " +
      "name as a string literal, optional bucket count (default 3) " +
      "as an integer literal"
    require(args.nonEmpty && args.length <= 2,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "perplexity_buckets: docs_table", usage)
    val n =
      if (args.length > 1)
        intLit(args(1), "perplexity_buckets: n_buckets", usage)
      else 3
    require(n >= 2, s"n_buckets must be at least 2; $usage")
    val spark = SparkSession.active
    TextAnalysis.perplexityBuckets(spark.table(table), n)
      .queryExecution.logical
  }

  /** `keyword_tags(docs_table, patterns_csv)` — Aho–Corasick
    * blocklist tagging (x40) of a table/view with (doc_id, text);
    * `patterns_csv` is a comma-separated pattern list (whitespace
    * around commas trimmed). One automaton walk per document.
    */
  def keywordTagsFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "keyword_tags(docs_table, patterns_csv) — table name " +
      "and a comma-separated pattern list as string literals"
    require(args.length == 2, s"wrong argument count: $usage")
    val table = strLit(args(0), "keyword_tags: docs_table", usage)
    val pats = strLit(args(1), "keyword_tags: patterns_csv", usage)
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(pats.nonEmpty, s"empty pattern list; $usage")
    val spark = SparkSession.active
    TextAnalysis.keywordTags(spark.table(table), pats)
      .queryExecution.logical
  }

  /** `bigram_loglik(docs_table)` — add-½ smoothed bigram-LM scoring
    * (x39) of a table/view with (doc_id, text).
    */
  def bigramLogLikFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage =
      "bigram_loglik(docs_table) — table name as a string literal"
    require(args.length == 1, s"wrong argument count: $usage")
    val table = strLit(args(0), "bigram_loglik: docs_table", usage)
    val spark = SparkSession.active
    TextAnalysis.bigramLogLik(spark.table(table))
      .queryExecution.logical
  }

  def bm25FromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "bm25_topk(docs_table, terms[, k]) — table name and " +
      "space-separated query terms as string literals, optional k " +
      "(default 10) as an integer literal"
    require(args.length == 2 || args.length == 3,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "bm25_topk: docs_table", usage)
    val terms = strLit(args(1), "bm25_topk: terms", usage)
      .split("\\s+").filter(_.nonEmpty).toSeq
    require(terms.nonEmpty, s"empty query-term bag; $usage")
    val k =
      if (args.length > 2) intLit(args(2), "bm25_topk: k", usage)
      else 10
    val spark = SparkSession.active
    Retrieval.bm25TopK(spark.table(table), terms, k = k)
      .queryExecution.logical
  }

  /** `pca_project(emb_table[, iters])` — the s13 shape: train the top
    * principal component over a table/view with (vec_id, embedding)
    * and project every vector onto it. Training is EAGER at analysis
    * time (the quality_probe precedent); the collected model is
    * KB-scale by construction.
    */
  def pcaFromSqlArgs(args: Seq[Expression]): LogicalPlan = {
    val usage = "pca_project(emb_table[, iters]) — table as a string " +
      "literal, optional power-iteration count (default 4) as an " +
      "integer literal"
    require(args.length == 1 || args.length == 2,
      s"wrong argument count: $usage")
    val table = strLit(args(0), "pca_project: emb_table", usage)
    val iters =
      if (args.length > 1) intLit(args(1), "pca_project: iters", usage)
      else 4
    val spark = SparkSession.active
    Pca.pcaProject(spark.table(table), iters).queryExecution.logical
  }
}
