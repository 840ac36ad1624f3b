package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions registration exposes cosine_similarity to SQL") {
    // extensions apply only when a NEW SparkSession is constructed:
    // clear the default session (keeping the shared SparkContext
    // alive for the other suites), build one with the extensions,
    // then restore the previous default.
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val r = spark.sql(
        "SELECT cosine_similarity(array(3.0d, 4.0d), array(3.0d, 4.0d)) AS c")
        .first().getDouble(0)
      assert(r == 1.0)
      // NULL path through the SQL registration too
      assert(spark.sql(
        "SELECT cosine_similarity(array(1.0d), array(1.0d, 2.0d))")
        .first().isNullAt(0))
      // nfc_normalize rides the same extension
      assert(spark.sql("SELECT nfc_normalize('cafe\\u0301')")
        .first().getString(0) == "café")
      // base60_hash too, and it matches the composed-builtin form
      val Array(native, composed) = spark.sql(
        "SELECT base60_hash('probe'), " +
          "CAST(conv(substr(md5('probe'), 1, 15), 16, 10) AS BIGINT)")
        .first().toSeq.map(_.asInstanceOf[Long]).toArray
      assert(native == composed)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("asof_join table function runs the ev07 shape through pure SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-asof-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions._
      val ev = Tables.eventsTs(spark, "/root/testdata/sf0.001")
        .withColumn("ts_us", expr("ts_ns div 1000"))
        .filter(col("event_type").isin("purchase", "view"))
      ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("ts_us").as("purchase_us"))
        .createOrReplaceTempView("purchases_v")
      ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts_us").as("view_us"))
        .createOrReplaceTempView("views_v")
      val got = spark.sql(
        """SELECT user_id, purchase_id, purchase_us,
          |       view_us AS last_view_us
          |FROM asof_join('purchases_v', 'views_v',
          |               'user_id', 'v_user', 'purchase_us', 'view_us')
          |""".stripMargin)
      val expected = graft.queries.EventQueries
        .defs("ev07_asof_custom")(spark, "/root/testdata/sf0.001")
      assert(got.count() == expected.count())
      assert(got.except(expected).isEmpty && expected.except(got).isEmpty,
        "SQL asof_join diverged from the Scala-API operator")
      // the custom exec is actually in the SQL plan (not some fallback)
      assert(got.queryExecution.executedPlan.toString.contains("AsofJoin"),
        got.queryExecution.executedPlan.toString)
      // misuse fails with the usage message, not an obscure crash
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM asof_join('purchases_v', 'views_v')")
          .collect()
      }
      assert(err.getMessage.contains("asof_join"), err.getMessage)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("winnow and despan_decontaminate table functions run the d15/x24 " +
    "shapes through pure SQL") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .appName("graft-ext-dedup-test")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      import org.apache.spark.sql.functions._
      val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      docs.createOrReplaceTempView("docs_v")
      docs.filter(col("source") =!= "src0")
        .createOrReplaceTempView("train_v")
      docs.filter(col("source") === "src0")
        .createOrReplaceTempView("eval_v")

      // d15 via SQL == the Scala operator
      val gotW = spark.sql("SELECT * FROM winnow('docs_v')")
      val expW = graft.ext.Dedup.winnow(docs)
      assert(gotW.except(expW).isEmpty && expW.except(gotW).isEmpty,
        "SQL winnow diverged from the Scala-API operator")
      // explicit n/w arguments reach the operator
      val gotW25 = spark.sql("SELECT * FROM winnow('docs_v', 2, 5)")
      val expW25 = graft.ext.Dedup.winnow(docs, n = 2, w = 5)
      assert(gotW25.except(expW25).isEmpty && expW25.except(gotW25).isEmpty)

      // x24 via SQL == the Scala operator
      val gotD = spark.sql(
        "SELECT * FROM despan_decontaminate('train_v', 'eval_v')")
      val expD = graft.ext.Dedup.despanContaminated(
        docs.filter(col("source") =!= "src0"),
        docs.filter(col("source") === "src0"))
      assert(gotD.except(expD).isEmpty && expD.except(gotD).isEmpty,
        "SQL despan_decontaminate diverged from the Scala-API operator")

      // misuse fails with the usage message, not an obscure crash
      val err = intercept[Exception] {
        spark.sql("SELECT * FROM despan_decontaminate('train_v')").collect()
      }
      assert(err.getMessage.contains("despan_decontaminate"), err.getMessage)

      // x27/x28 quality gates via SQL == the Scala operators
      val gotG = spark.sql("SELECT * FROM gopher_quality('docs_v')")
      val expG = graft.ext.TextAnalysis.gopherQuality(docs)
      assert(gotG.except(expG).isEmpty && expG.except(gotG).isEmpty,
        "SQL gopher_quality diverged from the Scala-API operator")
      val gotC = spark.sql("SELECT * FROM c4_clean('docs_v', 4, 2)")
      val expC = graft.ext.TextAnalysis.c4Clean(docs,
        minLineWords = 4, minKeptLines = 2)
      assert(gotC.except(expC).isEmpty && expC.except(gotC).isEmpty,
        "SQL c4_clean diverged from the Scala-API operator")
      val errG = intercept[Exception] {
        spark.sql("SELECT * FROM gopher_quality('docs_v', 1)").collect()
      }
      assert(errG.getMessage.contains("gopher_quality"), errG.getMessage)

      // x32 via SQL == the Scala operator
      val gotL = spark.sql("SELECT * FROM dedup_lines('docs_v')")
      val expL = graft.ext.TextAnalysis.dedupLines(docs)
      assert(gotL.except(expL).isEmpty && expL.except(gotL).isEmpty,
        "SQL dedup_lines diverged from the Scala-API operator")

      // x31 via SQL == the Scala operator (k reaches the selection)
      val gotS = spark.sql(
        "SELECT * FROM dsir_resample('docs_v', 'src0', 3)")
      val expS = graft.ext.TextAnalysis.dsirResample(docs,
        col("source") === "src0", k = 3)
      assert(gotS.except(expS).isEmpty && expS.except(gotS).isEmpty,
        "SQL dsir_resample diverged from the Scala-API operator")
      val errS = intercept[Exception] {
        spark.sql("SELECT * FROM dsir_resample('docs_v')").collect()
      }
      assert(errS.getMessage.contains("dsir_resample"), errS.getMessage)

      // l2_squared scalar through the extension registration
      val l2 = spark.sql(
        "SELECT l2_squared(array(3.0d, 0.0d), array(0.0d, 4.0d))")
        .first().getDouble(0)
      assert(l2 == 25.0, s"l2_squared via extensions: $l2")

      // x35 via SQL == the Scala operator (training replayed at plan
      // time; 2 epochs to pin the optional-arg path)
      val gotQ = spark.sql(
        "SELECT * FROM quality_probe('docs_v', 'src0', 2)")
      val expQ = graft.ext.TextAnalysis.qualityProbeScore(docs,
        graft.ext.TextAnalysis.qualityProbeModel(docs,
          col("source") === "src0", epochs = 2))
      assert(gotQ.except(expQ).isEmpty && expQ.except(gotQ).isEmpty,
        "SQL quality_probe diverged from the Scala-API operator")
      val errQ = intercept[Exception] {
        spark.sql("SELECT * FROM quality_probe('docs_v')").collect()
      }
      assert(errQ.getMessage.contains("quality_probe"), errQ.getMessage)

      // x33 via SQL == the Scala operator
      val gotE = spark.sql("SELECT * FROM epoch_budget('docs_v')")
      val expE = graft.ext.TextAnalysis.epochBudget(docs)
      assert(gotE.except(expE).isEmpty && expE.except(gotE).isEmpty,
        "SQL epoch_budget diverged from the Scala-API operator")
      val errE = intercept[Exception] {
        spark.sql("SELECT * FROM epoch_budget('docs_v', 1)").collect()
      }
      assert(errE.getMessage.contains("epoch_budget"), errE.getMessage)

      // x34 via SQL == the Scala operator (k reaches the selection)
      val gotWs = spark.sql("SELECT * FROM weighted_sample('docs_v', 2)")
      val expWs = graft.ext.TextAnalysis.weightedSample(docs, k = 2)
      assert(gotWs.except(expWs).isEmpty && expWs.except(gotWs).isEmpty,
        "SQL weighted_sample diverged from the Scala-API operator")

      // s09 via SQL == the Scala operator (terms bag + k reach it)
      val gotB = spark.sql(
        "SELECT * FROM bm25_topk('docs_v', 'dup merge spark', 5)")
      val expB = graft.ext.Retrieval.bm25TopK(docs,
        Seq("dup", "merge", "spark"), k = 5)
      assert(gotB.except(expB).isEmpty && expB.except(gotB).isEmpty,
        "SQL bm25_topk diverged from the Scala-API operator")
      val errB = intercept[Exception] {
        spark.sql("SELECT * FROM bm25_topk('docs_v')").collect()
      }
      assert(errB.getMessage.contains("bm25_topk"), errB.getMessage)

      // x36 via SQL == the Scala operator (n_merges reaches training)
      val gotM = spark.sql("SELECT * FROM bpe_merges('docs_v', 4)")
      val expM = graft.ext.TextAnalysis.bpeMerges(docs, 4)
      assert(gotM.except(expM).isEmpty && expM.except(gotM).isEmpty,
        "SQL bpe_merges diverged from the Scala-API operator")
      val errM = intercept[Exception] {
        spark.sql("SELECT * FROM bpe_merges('docs_v', 0)").collect()
      }
      assert(errM.getMessage.contains("n_merges"), errM.getMessage)

      // x38 via SQL == the Scala operator
      val gotP = spark.sql("SELECT * FROM perplexity_buckets('docs_v')")
      val expP = graft.ext.TextAnalysis.perplexityBuckets(docs, 3)
      assert(gotP.except(expP).isEmpty && expP.except(gotP).isEmpty,
        "SQL perplexity_buckets diverged from the Scala-API operator")
      val errP = intercept[Exception] {
        spark.sql("SELECT * FROM perplexity_buckets('docs_v', 1)")
          .collect()
      }
      assert(errP.getMessage.contains("n_buckets"), errP.getMessage)

      // x40 via SQL == the Scala operator (patterns reach the automaton)
      val gotK = spark.sql(
        "SELECT * FROM keyword_tags('docs_v', 'able, spark,fast merge')")
      val expK = graft.ext.TextAnalysis.keywordTags(docs,
        Seq("able", "spark", "fast merge"))
      assert(gotK.except(expK).isEmpty && expK.except(gotK).isEmpty,
        "SQL keyword_tags diverged from the Scala-API operator")
      val errK = intercept[Exception] {
        spark.sql("SELECT * FROM keyword_tags('docs_v', ' , ')").collect()
      }
      assert(errK.getMessage.contains("pattern"), errK.getMessage)

      // x39 via SQL == the Scala operator
      val gotBg = spark.sql("SELECT * FROM bigram_loglik('docs_v')")
      val expBg = graft.ext.TextAnalysis.bigramLogLik(docs)
      assert(gotBg.except(expBg).isEmpty && expBg.except(gotBg).isEmpty,
        "SQL bigram_loglik diverged from the Scala-API operator")

      // s13 via SQL == the Scala operator (training replayed at plan
      // time; 2 iterations to pin the optional-arg path)
      Tables.embeddings(spark, "/root/testdata/sf0.001")
        .createOrReplaceTempView("emb_v")
      val gotPc = spark.sql("SELECT * FROM pca_project('emb_v', 2)")
      val expPc = graft.ext.Pca.pcaProject(
        Tables.embeddings(spark, "/root/testdata/sf0.001"), iters = 2)
      assert(gotPc.except(expPc).isEmpty && expPc.except(gotPc).isEmpty,
        "SQL pca_project diverged from the Scala-API operator")
      val errPc = intercept[Exception] {
        spark.sql("SELECT * FROM pca_project('emb_v', 2, 3)").collect()
      }
      assert(errPc.getMessage.contains("pca_project"), errPc.getMessage)
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
