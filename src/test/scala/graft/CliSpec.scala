package graft

import graft.Cli.CliError

/** The three commands end-to-end plus the reference's exact option
  * validations (cli.rb:150-154 export, :259 import).
  */
class CliSpec extends SparkTestBase {

  private val now = 1704067200000L // 2024-01-01T00:00:00Z

  test("export --tables runs end-to-end and records the session") {
    val dest = tmpDir("cli-bk")
    val out = Cli.run(spark, Seq("export",
      "--source-dir", sf0001, "--dest-root", dest,
      "--tables", "region,nation", "--session-name", "s1"), now)
    assert(out.contains("region: exported rows=5"))
    assert(out.contains("nation: exported rows=25"))
    assert(out.contains("session s1: 2 tables, 0 failed"))
    // data landed in the reference's namespace, catalog alongside
    assert(spark.read.parquet(s"$dest/s1/region").count() == 5)
    val cat = new catalog.BackupCatalog(spark, s"$dest/_catalog")
    assert(cat.exists("export", "nation", "s1"))
  }

  test("export --all discovers every table in the source dir") {
    val dest = tmpDir("cli-bk-all")
    // a private source dir with a known table set (sf dirs have 10)
    val src = tmpDir("cli-src")
    Tables.region(spark, sf0001).write.parquet(s"$src/region.parquet")
    Tables.nation(spark, sf0001).write.parquet(s"$src/nation.parquet")
    val out = Cli.run(spark, Seq("export",
      "--source-dir", src, "--dest-root", dest, "--all",
      "--session-name", "s2"), now)
    assert(out.contains("session s2: 2 tables, 0 failed"))
  }

  test("import restores an exported session into the target root") {
    val dest = tmpDir("cli-bk2")
    val target = tmpDir("cli-restore")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region,nation",
      "--session-name", "s1"), now)
    val out = Cli.run(spark, Seq("import", "--source-root", dest,
      "--session-name", "s1", "--target-root", target,
      "--tables", "region"), now)
    assert(out.contains("region: imported rows=5"))
    assert(spark.read.parquet(s"$target/region").count() == 5)
  }

  test("import --pattern narrows by SQL wildcard") {
    val dest = tmpDir("cli-bk3")
    val target = tmpDir("cli-restore3")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region,nation",
      "--session-name", "s1"), now)
    val out = Cli.run(spark, Seq("import", "--source-root", dest,
      "--session-name", "s1", "--target-root", target,
      "--pattern", "reg%"), now)
    assert(out.contains("region: imported"))
    assert(!out.contains("nation: imported"))
  }

  test("db prints sessions and (with --table-name) their table rows") {
    val dest = tmpDir("cli-bk4")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region,nation",
      "--session-name", "20240101_000000"), now)
    val sessionsOnly = Cli.run(spark, Seq("db",
      "--catalog-root", s"$dest/_catalog",
      "--session-name", "20240101_%"), now)
    assert(sessionsOnly.startsWith("20240101_000000:"))
    assert(!sessionsOnly.contains("  region:"))
    val withTables = Cli.run(spark, Seq("db",
      "--catalog-root", s"$dest/_catalog",
      "--session-name", "20240101_%", "--table-name", "%"), now)
    assert(withTables.contains("  region:") && withTables.contains("  nation:"))
    assert(withTables.contains("row_count: 5"))
    val none = Cli.run(spark, Seq("db",
      "--catalog-root", s"$dest/_catalog", "--session-name", "1999%"), now)
    assert(none.contains("no export sessions match"))
  }

  test("db --diff-with compares two sessions per table") {
    val dest = tmpDir("cli-bk-diff")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region,nation",
      "--session-name", "20240101_000000"), now)
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region",
      "--session-name", "20240201_000000"), now)
    val diff = Cli.run(spark, Seq("db",
      "--catalog-root", s"$dest/_catalog",
      "--session-name", "20240101_000000",
      "--diff-with", "20240201_000000"), now)
    assert(diff.contains("region") && diff.contains("unchanged"), diff)
    assert(diff.contains("nation") && diff.contains("only_in_a"), diff)
    val err = intercept[CliError] {
      Cli.run(spark, Seq("db", "--catalog-root", s"$dest/_catalog",
        "--session-name", "2024%", "--diff-with", "x"), now)
    }
    assert(err.message.contains("exact session names"))
  }

  test("export without --ts-col records a sane watermark, not a sentinel") {
    val dest = tmpDir("cli-bk-wm")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region",
      "--session-name", "s1"), now)
    val cat = new catalog.BackupCatalog(spark, s"$dest/_catalog")
    // Long.MaxValue here would poison every later incremental window
    // (start > end) — the recorded end must be the hot-tail guard
    assert(cat.lastEndTime("export", "region") ==
      now - graft.incremental.Incremental.HotTailGuardMs)
  }

  test("import matching nothing fails loudly instead of restoring 0 tables") {
    val dest = tmpDir("cli-bk-miss")
    val target = tmpDir("cli-restore-miss")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region",
      "--session-name", "s1"), now)
    val e = intercept[CliError] {
      Cli.run(spark, Seq("import", "--source-root", dest,
        "--session-name", "s1-typo", "--target-root", target), now)
    }
    assert(e.getMessage.contains("nothing to restore"))
    val e2 = intercept[CliError] {
      Cli.run(spark, Seq("import", "--source-root", dest,
        "--session-name", "s1", "--target-root", target,
        "--pattern", "zzz%"), now)
    }
    assert(e2.getMessage.contains("zzz%"))
  }

  test("--format orc round-trips export then import; unknown format fails at parse") {
    val dest = tmpDir("cli-bk-orc")
    val target = tmpDir("cli-restore-orc")
    Cli.run(spark, Seq("export", "--source-dir", sf0001,
      "--dest-root", dest, "--tables", "region",
      "--session-name", "s1", "--format", "orc"), now)
    assert(spark.read.orc(s"$dest/s1/region").count() == 5)
    val out = Cli.run(spark, Seq("import", "--source-root", dest,
      "--session-name", "s1", "--target-root", target,
      "--tables", "region", "--format", "orc"), now)
    assert(out.contains("region: imported rows=5"))
    assert(spark.read.parquet(s"$target/region").count() == 5)
    val e = intercept[CliError] {
      Cli.run(spark, Seq("export", "--source-dir", sf0001,
        "--dest-root", dest, "--tables", "region",
        "--format", "avro"), now)
    }
    assert(e.getMessage.contains("unknown --format"))
  }

  test("compact rewrites a fragmented session table and reports a no-op twice") {
    val dest = tmpDir("cli-compact")
    Cli.run(spark, Seq("export",
      "--source-dir", sf0001, "--dest-root", dest,
      "--tables", "lineitem", "--session-name", "s9"), now)
    // fragment the destination the way many incremental sessions would
    val dir = s"$dest/s9/lineitem"
    val df = spark.read.parquet(dir)
    val nRows = df.count()
    df.repartition(16).write.mode("overwrite").parquet(dir + "__frag")
    val f = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    f.delete(new org.apache.hadoop.fs.Path(dir), true)
    f.rename(new org.apache.hadoop.fs.Path(dir + "__frag"),
      new org.apache.hadoop.fs.Path(dir))

    val out = Cli.run(spark, Seq("compact",
      "--dest-root", dest, "--session-name", "s9"), now)
    assert(out.contains("lineitem: compacted 16 -> 1 files"), out)
    val again = Cli.run(spark, Seq("compact",
      "--dest-root", dest, "--session-name", "s9"), now)
    assert(again.contains("lineitem: already compact"), again)
    assert(spark.read.parquet(dir).count() == nRows)
  }

  test("zonemap builds then incrementally updates a session's sidecars") {
    val dest = tmpDir("cli-zm")
    Cli.run(spark, Seq("export",
      "--source-dir", sf0001, "--dest-root", dest,
      "--tables", "region,nation", "--session-name", "s1"), now)
    val out = Cli.run(spark, Seq("zonemap",
      "--dest-root", dest, "--session-name", "s1",
      "--cols", "r_regionkey,n_regionkey"), now)
    assert(out.contains("region: updated") && out.contains("nation: updated"),
      out)
    assert(spark.read.parquet(s"$dest/s1/region/_zonemap").count() > 0)
    // second run is the O(delta) no-op path, same entry count
    val n1 = spark.read.parquet(s"$dest/s1/nation/_zonemap").count()
    Cli.run(spark, Seq("zonemap", "--dest-root", dest,
      "--session-name", "s1", "--cols", "r_regionkey,n_regionkey"), now)
    assert(spark.read.parquet(s"$dest/s1/nation/_zonemap").count() == n1)
    // --rebuild forces the from-scratch path; --cols is required
    val out2 = Cli.run(spark, Seq("zonemap", "--dest-root", dest,
      "--session-name", "s1", "--tables", "region",
      "--cols", "r_regionkey", "--rebuild"), now)
    assert(out2.contains("region: rebuilt"), out2)
    intercept[CliError] {
      Cli.run(spark, Seq("zonemap", "--dest-root", dest,
        "--session-name", "s1"), now)
    }
  }

  test("dedup initializes a signature store, then updates with a delta") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val store = tmpDir("cli-sigs") + "/store"
    val base = tmpDir("cli-docs-base")
    val delta = tmpDir("cli-docs-delta")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    docs.filter(col("doc_id") < 200).write.mode("overwrite").parquet(base)
    // delta = the rest plus a planted near-copy of a base doc, so the
    // update path genuinely finds a cross-boundary pair
    docs.filter(col("doc_id") >= 200)
      .unionByName(docs.filter(col("doc_id") === 7L)
        .select((col("doc_id") + 100000L).as("doc_id"),
          concat(col("text"), lit(" tail")).as("text")))
      .write.mode("overwrite").parquet(delta)

    // update before init fails loudly (a silent fresh store would lose
    // every old-vs-new pair)
    val e = intercept[CliError](Cli.run(spark,
      Seq("dedup", "--docs", delta, "--store", store), now))
    assert(e.message.contains("--init"))

    val init = Cli.run(spark,
      Seq("dedup", "--docs", base, "--store", store, "--init"), now)
    assert(init.contains("signatures"))
    val out = tmpDir("cli-pairs") + "/pairs"
    val upd = Cli.run(spark, Seq("dedup",
      "--docs", delta, "--store", store, "--out", out), now)
    assert(upd.contains("new candidate pairs"))
    val pairs = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((7L, 100007L)),
      s"planted cross-boundary pair missing from ${pairs.take(5)}")

    // jaccard mode over the same corpora: exact pairs with values
    val jstore = tmpDir("cli-jsigs") + "/store"
    assert(intercept[CliError](Cli.run(spark, Seq("dedup",
      "--mode", "jaccard", "--docs", delta, "--store", jstore), now))
      .message.contains("--init"))
    Cli.run(spark, Seq("dedup", "--mode", "jaccard",
      "--docs", base, "--store", jstore, "--init"), now)
    val jout = tmpDir("cli-jpairs") + "/pairs"
    val jupd = Cli.run(spark, Seq("dedup", "--mode", "jaccard",
      "--docs", delta, "--store", jstore, "--threshold", "0.3",
      "--out", jout), now)
    assert(jupd.contains("new jaccard pairs"))
    val jrows = spark.read.parquet(jout).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(jrows.keys.exists { case (a, b) => b - a == 100000L },
      s"planted jaccard pair missing from ${jrows.keys.take(5)}")
    assert(jrows.values.forall(j => j >= 0.3 && j <= 1.0))

    // unknown mode fails at parse
    assert(intercept[CliError](Cli.run(spark, Seq("dedup",
      "--mode", "simhash", "--docs", base, "--store", jstore), now))
      .message.contains("minhash|jaccard"))

    // s27 drift advisory: store-fed report after the delta drain;
    // flag hygiene mirrors the index command's
    assert(intercept[CliError](Cli.run(spark, Seq("dedup", "--store",
      store, "--drift", "--drift-stats"), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("dedup", "--store",
      store, "--drift-stats", "--docs", base), now))
      .message.contains("drop --docs"))
    assert(intercept[CliError](Cli.run(spark, Seq("dedup", "--store",
      store, "--drift-stats", "--init", "--docs", base), now))
      .message.contains("standalone report"))
    val rep = Cli.run(spark, Seq("dedup", "--store", store,
      "--drift-stats"), now)
    assert(rep.contains("signature drift report") &&
      rep.contains("n_ratio="), rep)
    // the corpus-scan twin over the base corpus reads fresh
    val repScan = Cli.run(spark, Seq("dedup", "--store", store,
      "--drift", "--docs", base), now)
    assert(repScan.contains("corpus-scan") && repScan.contains("fresh"),
      repScan)
  }

  test("despan cleans duplicated spans; --eval switches to " +
    "decontamination with the cover-all cut") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val para = (0 until 12).map(i => s"shared$i").mkString(" ")
    val corpusDir = tmpDir("cli-despan-docs")
    val evalDir = tmpDir("cli-despan-eval")
    Seq(
      (1L, "alpha beta gamma " + para + " delta epsilon"),
      (2L, "one two three four five " + para),
      (3L, "totally unrelated text with no duplicate windows at all"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(corpusDir)
    Seq((100L, para)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(evalDir)

    // intra-corpus dedup: doc 1 owns the para (min id), doc 2 loses
    // its interior
    val out1 = tmpDir("cli-despan-out1")
    val msg1 = Cli.run(spark, Seq("despan",
      "--docs", corpusDir, "--out", out1), now)
    assert(msg1.contains("despanned 3 docs") &&
      msg1.contains("10 tokens cut"), msg1)
    val d2 = spark.read.parquet(out1).filter(col("doc_id") === 2L)
      .select("text").head().getString(0)
    assert(d2 == "one two three four five shared0 shared1", d2)

    // decontamination: BOTH docs holding the eval para lose it whole
    // (no min-id owner exemption, no ragged leftovers)
    val out2 = tmpDir("cli-despan-out2")
    val msg2 = Cli.run(spark, Seq("despan",
      "--docs", corpusDir, "--out", out2, "--eval", evalDir, "--n", "3"),
      now)
    assert(msg2.contains("decontaminated 3 docs") &&
      msg2.contains("24 tokens cut"), msg2)
    val texts = spark.read.parquet(out2).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(texts(1L) == "alpha beta gamma delta epsilon", texts(1L))
    assert(texts(2L) == "one two three four five", texts(2L))

    // validations: schema and missing options fail loudly
    val bad = tmpDir("cli-despan-bad")
    Seq((1L, "x")).toDF("id", "body").write.mode("overwrite").parquet(bad)
    assert(intercept[CliError](Cli.run(spark, Seq("despan",
      "--docs", bad, "--out", out1), now)).message.contains("doc_id"))
    assert(intercept[CliError](Cli.run(spark, Seq("despan",
      "--docs", corpusDir), now)).message.contains("--out"))
  }

  test("index initializes a BM25 store, updates with a delta, and " +
    "answers ranked queries from the store alone") {
    import org.apache.spark.sql.functions.col
    val store = tmpDir("cli-bm25") + "/idx"
    val base = tmpDir("cli-idx-base")
    val delta = tmpDir("cli-idx-delta")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    docs.filter(col("doc_id") < 200).write.mode("overwrite").parquet(base)
    docs.filter(col("doc_id") >= 200).write.mode("overwrite").parquet(delta)

    // update or query before init fails loudly
    val e = intercept[CliError](Cli.run(spark,
      Seq("index", "--docs", delta, "--store", store), now))
    assert(e.message.contains("--init"))
    val eq = intercept[CliError](Cli.run(spark,
      Seq("index", "--store", store, "--query", "dup"), now))
    assert(eq.message.contains("--init"))

    val init = Cli.run(spark,
      Seq("index", "--docs", base, "--store", store, "--init"), now)
    assert(init.contains("initialized") && init.contains("documents"))
    // double-init refused: it would re-tokenize the world
    val e2 = intercept[CliError](Cli.run(spark,
      Seq("index", "--docs", base, "--store", store, "--init"), now))
    assert(e2.message.contains("already exists"))

    val upd = Cli.run(spark,
      Seq("index", "--docs", delta, "--store", store), now)
    assert(upd.contains("updated"))

    // ranked query from the store == the corpus-scan ranker
    val out = tmpDir("cli-idx-hits") + "/hits"
    val q = Cli.run(spark, Seq("index", "--store", store,
      "--query", "dup merge spark", "--k", "7", "--out", out), now)
    assert(q.contains("7 hits"))
    val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
    val exp = graft.ext.Retrieval.bm25TopK(docs,
      Seq("dup", "merge", "spark"), k = 7).collect().map(_.toSeq).toSet
    assert(got == exp,
      "CLI index query diverged from the corpus-scan ranker")
    // stdout mode prints a ranked table
    val txt = Cli.run(spark, Seq("index", "--store", store,
      "--query", "dup", "--k", "2"), now)
    assert(txt.contains("doc_id") && txt.linesIterator.size == 3, txt)
    // mixed update+query is refused, not silently half-executed
    val em = intercept[CliError](Cli.run(spark, Seq("index",
      "--store", store, "--docs", delta, "--query", "dup"), now))
    assert(em.message.contains("cannot combine"))

    // a crash-interrupted rebuild swap (root gone, __old holds the
    // truth): every CLI probe recovers the store instead of reporting
    // "no index store (run --init first)"
    val dir = new java.io.File(store).getParentFile
    assert(new java.io.File(dir, "idx")
      .renameTo(new java.io.File(dir, "idx__old")))
    val q2 = Cli.run(spark, Seq("index", "--store", store,
      "--query", "dup", "--k", "2"), now)
    assert(q2.contains("doc_id"),
      "CLI query did not recover a crash-swapped store")
    assert(new java.io.File(dir, "idx").exists(), "recovery did not run")
  }

  test("option hygiene: malformed --init and non-numeric --k fail at " +
    "parse time, not by silent fallthrough or a raw exception") {
    val store = tmpDir("cli-bm25-hygiene") + "/idx"
    val base = tmpDir("cli-idx-hyg")
    Tables.documents(spark, sf0001).select("doc_id", "text")
      .limit(20).write.mode("overwrite").parquet(base)
    // `--init yes` must NOT silently parse as false and take the
    // delta-append path (the full-corpus-retokenize hazard the
    // init/exists guard refuses)
    val ei = intercept[CliError](Cli.run(spark, Seq("index",
      "--docs", base, "--store", store, "--init", "yes"), now))
    assert(ei.message.contains("--init") && ei.message.contains("yes"))
    Cli.run(spark,
      Seq("index", "--docs", base, "--store", store, "--init"), now)
    // non-numeric --k is a CliError, per the --format parse contract
    val ek = intercept[CliError](Cli.run(spark, Seq("index",
      "--store", store, "--query", "dup", "--k", "lots"), now))
    assert(ek.message.contains("--k") && ek.message.contains("lots"))
    // same contract for the despan command's numeric knob
    val en = intercept[CliError](Cli.run(spark, Seq("despan",
      "--docs", base, "--out", tmpDir("cli-despan-hyg") + "/o",
      "--n", "three"), now))
    assert(en.message.contains("--n") && en.message.contains("three"))
  }

  test("bm25 command: ad-hoc corpus ranking matches the library ranker") {
    val base = tmpDir("cli-bm25adhoc")
    val docs = Tables.documents(spark, sf0001)
    docs.select("doc_id", "text").write.mode("overwrite").parquet(base)
    val out = tmpDir("cli-bm25adhoc-hits") + "/hits"
    val msg = Cli.run(spark, Seq("bm25", "--docs", base,
      "--query", "dup merge spark", "--k", "7", "--out", out), now)
    assert(msg.contains("7 hits"))
    val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
    val exp = graft.ext.Retrieval.bm25TopK(
      docs.select("doc_id", "text"), Seq("dup", "merge", "spark"), 7)
      .collect().map(_.toSeq).toSet
    assert(got == exp, "CLI bm25 diverged from Retrieval.bm25TopK")
    // stdout mode prints a ranked table
    val txt = Cli.run(spark, Seq("bm25", "--docs", base,
      "--query", "dup", "--k", "2"), now)
    assert(txt.contains("doc_id") && txt.linesIterator.size == 3, txt)
    assert(intercept[CliError](Cli.run(spark, Seq("bm25",
      "--docs", base, "--query", "  "), now))
      .message.contains("at least one term"))
  }

  test("tag command: csv and file pattern sources agree with the " +
    "library tagger; audit lists zero-hit patterns; loud failures") {
    val base = tmpDir("cli-tag")
    val docs = Tables.documents(spark, sf0001)
    docs.select("doc_id", "text").write.mode("overwrite").parquet(base)
    val out = tmpDir("cli-tag-out") + "/tags"
    val msg = Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns", "able, spark,fast merge", "--out", out), now)
    assert(msg.contains("docs tagged") && msg.contains("hit"), msg)
    val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
    val exp = graft.ext.TextAnalysis.keywordTags(docs,
      Seq("able", "spark", "fast merge")).collect().map(_.toSeq).toSet
    assert(got == exp, "CLI tag diverged from TextAnalysis.keywordTags")
    // file form (blanks + comments skipped) == csv form
    val pf = tmpDir("cli-tag-pats") + "/block.txt"
    java.nio.file.Files.write(java.nio.file.Paths.get(pf),
      "# blocklist\nable\n\nspark\nfast merge\n".getBytes("UTF-8"))
    val out2 = tmpDir("cli-tag-out2") + "/tags"
    Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns-file", pf, "--out", out2), now)
    assert(spark.read.parquet(out2).collect().map(_.toSeq).toSet == got,
      "pattern-file form diverged from the csv form")
    // audit mode: every pattern listed, zero-hit ones included
    val audit = Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns", "spark,zz-never-matches"), now)
    assert(audit.contains("zz-never-matches") &&
      audit.linesIterator.exists(l =>
        l.trim.startsWith("0") && l.contains("zz-never-matches")), audit)
    // loud failures: neither source, both sources, empty list, bad file
    assert(intercept[CliError](Cli.run(spark,
      Seq("tag", "--docs", base), now)).message.contains("--patterns"))
    assert(intercept[CliError](Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns", "a", "--patterns-file", pf), now))
      .message.contains("mutually exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns", " , "), now)).message.contains("empty pattern"))
    assert(intercept[CliError](Cli.run(spark, Seq("tag", "--docs", base,
      "--patterns-file", pf + ".missing"), now))
      .message.contains("not found"))
  }

  test("dsir command: train writes the bucket model, score round-trips " +
    "it through the narrow-map scorer, malformed invocations refused") {
    import org.apache.spark.sql.functions.{col, expr}
    val base = tmpDir("cli-dsir-docs")
    val docs = Tables.documents(spark, sf0001)
    docs.write.mode("overwrite").parquet(base)
    val model = tmpDir("cli-dsir") + "/model"
    // score before train fails loudly
    assert(intercept[CliError](Cli.run(spark, Seq("dsir",
      "--docs", base, "--model", model,
      "--out", tmpDir("cli-dsir-pre") + "/o"), now))
      .message.contains("no dsir model"))
    // non-boolean / non-resolving target expressions are usage errors
    assert(intercept[CliError](Cli.run(spark, Seq("dsir", "--docs", base,
      "--model", model, "--target-expr", "n_chars + 1"), now))
      .message.contains("boolean"))
    assert(intercept[CliError](Cli.run(spark, Seq("dsir", "--docs", base,
      "--model", model, "--target-expr", "ghost_col = 1"), now))
      .message.contains("resolve"))
    // train against a real slice
    val tr = Cli.run(spark, Seq("dsir", "--docs", base,
      "--target-expr", "source = 'src1'", "--model", model), now)
    assert(tr.contains("256 buckets"))
    // the written model IS dsirRatios
    val stored = spark.read.parquet(model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = graft.ext.TextAnalysis
      .dsirRatios(docs, expr("source = 'src1'"))
    assert(stored == direct, "stored model diverged from dsirRatios")
    // score: the narrow-map scorer over the stored model
    val out = tmpDir("cli-dsir-scored") + "/o"
    val sc = Cli.run(spark, Seq("dsir", "--docs", base,
      "--model", model, "--out", out), now)
    assert(sc.contains("scored") && sc.contains("256-bucket"))
    val scored = spark.read.parquet(out)
      .select(col("doc_id"), col("logw")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = graft.ext.TextAnalysis.dsirScore(docs, direct)
      .select(col("doc_id"), col("logw")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored == want, "CLI score diverged from dsirScore")
    assert(scored.size == docs.count())
  }

  test("probe command: train writes the weight table, score " +
    "round-trips it, malformed invocations refused") {
    import org.apache.spark.sql.functions.{col, expr}
    val base = tmpDir("cli-probe-docs")
    val docs = Tables.documents(spark, sf0001)
    docs.write.mode("overwrite").parquet(base)
    val model = tmpDir("cli-probe") + "/model"
    // score before train fails loudly
    assert(intercept[CliError](Cli.run(spark, Seq("probe",
      "--docs", base, "--model", model,
      "--out", tmpDir("cli-probe-pre") + "/o"), now))
      .message.contains("no probe model"))
    // train against a real slice with explicit epochs
    val tr = Cli.run(spark, Seq("probe", "--docs", base,
      "--target-expr", "source = 'src1'", "--model", model,
      "--epochs", "2"), now)
    assert(tr.contains("256 buckets") && tr.contains("2 epochs"))
    // the written model IS qualityProbeModel
    val stored = spark.read.parquet(model).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val direct = graft.ext.TextAnalysis.qualityProbeModel(docs,
      expr("source = 'src1'"), epochs = 2)
    assert(stored == direct, "stored model diverged from training")
    // score: margins/predictions match the library scorer
    val out = tmpDir("cli-probe-scored") + "/o"
    val sc = Cli.run(spark, Seq("probe", "--docs", base,
      "--model", model, "--out", out), now)
    assert(sc.contains("scored") && sc.contains("256-bucket"))
    val scored = spark.read.parquet(out)
      .select(col("doc_id"), col("margin"), col("predicted")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val want = graft.ext.TextAnalysis.qualityProbeScore(docs, direct)
      .select(col("doc_id"), col("margin"), col("predicted")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(scored == want, "CLI score diverged from qualityProbeScore")
    // bad epochs fails at parse time; mixed train+score refused
    assert(intercept[CliError](Cli.run(spark, Seq("probe",
      "--docs", base, "--target-expr", "source = 'src1'",
      "--model", model, "--epochs", "0"), now))
      .message.contains("--epochs"))
    assert(intercept[CliError](Cli.run(spark, Seq("probe",
      "--docs", base, "--target-expr", "source = 'src1'",
      "--model", model, "--out", out), now))
      .message.contains("SCORE option"))
  }

  test("epoch-budget command: allocation invariants hold, bad knobs " +
    "fail at parse time") {
    val base = tmpDir("cli-epoch-docs")
    Tables.documents(spark, sf0001).write.mode("overwrite").parquet(base)
    val out = tmpDir("cli-epoch") + "/alloc"
    val msg = Cli.run(spark, Seq("epoch-budget", "--docs", base,
      "--budget-frac", "0.5", "--max-epochs", "0.8",
      "--out", out), now)
    assert(msg.contains("20 domains"))
    val rows = spark.read.parquet(out).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("allocated_tokens") <=
        r.getAs[Long]("requested_tokens"))
      assert(r.getAs[Double]("epochs") <= 0.8 + 1e-9)
    }
    // printed form carries every domain
    val txt = Cli.run(spark,
      Seq("epoch-budget", "--docs", base), now)
    assert(txt.linesIterator.size == 21 && txt.contains("src1"), txt)
    assert(intercept[CliError](Cli.run(spark, Seq("epoch-budget",
      "--docs", base, "--budget-frac", "1.5"), now))
      .message.contains("budget-frac"))
    assert(intercept[CliError](Cli.run(spark, Seq("epoch-budget",
      "--docs", base, "--max-epochs", "-1"), now))
      .message.contains("max-epochs"))
    // a corpus without source cannot be budgeted by domain
    val noSrc = tmpDir("cli-epoch-nosrc")
    Tables.documents(spark, sf0001).select("doc_id", "text")
      .write.mode("overwrite").parquet(noSrc)
    assert(intercept[CliError](Cli.run(spark, Seq("epoch-budget",
      "--docs", noSrc), now)).message.contains("source"))
  }

  test("compact validation: a missing session dir fails loudly") {
    val e = intercept[CliError](Cli.run(spark, Seq("compact",
      "--dest-root", tmpDir("cli-ghost"), "--session-name", "nope"), now))
    assert(e.message.contains("no such session dir"))
  }

  test("export validation: --all and --tables are exclusive (cli.rb:150-154)") {
    val e = intercept[CliError] {
      Cli.run(spark, Seq("export", "--source-dir", sf0001,
        "--dest-root", "/tmp/x", "--all", "--tables", "region"), now)
    }
    assert(e.message == "Can only choose one of --all or --tables")
  }

  test("export validation: neither --all nor --tables is an error") {
    val e = intercept[CliError] {
      Cli.run(spark, Seq("export", "--source-dir", sf0001,
        "--dest-root", "/tmp/x"), now)
    }
    assert(e.message.startsWith("Invalid option combination"))
  }

  test("import validation: --tables and --pattern are exclusive (cli.rb:259)") {
    val e = intercept[CliError] {
      Cli.run(spark, Seq("import", "--source-root", "/tmp/x",
        "--session-name", "s1", "--target-root", "/tmp/y",
        "--tables", "a", "--pattern", "%"), now)
    }
    assert(e.message == "Can not set both --tables and --pattern")
  }

  test("missing required options and unknown commands fail loudly") {
    assert(intercept[CliError] {
      Cli.run(spark, Seq("export", "--tables", "region"), now)
    }.message.contains("--source-dir"))
    assert(intercept[CliError] {
      Cli.run(spark, Seq("frobnicate"), now)
    }.message.contains("unknown command"))
    assert(intercept[CliError] { Cli.run(spark, Seq.empty, now) }
      .message.contains("usage"))
  }

  test("option parser: = form, kebab/snake equivalence, flags") {
    val o = Cli.parseOpts(Seq("--dest-root=/x", "--session_name", "s",
      "--all"))
    assert(o == Map("dest_root" -> "/x", "session_name" -> "s",
      "all" -> "true"))
    assert(Cli.defaultSessionName(now) == "20240101_000000")
  }

  test("bpe command: train writes the merge table, count round-trips " +
    "it through the narrow-map encoder, malformed invocations refused") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("cli-bpe-docs")
    val docs = Tables.documents(spark, sf0001)
    docs.write.mode("overwrite").parquet(base)
    val model = tmpDir("cli-bpe") + "/model"
    // count before train fails loudly
    assert(intercept[CliError](Cli.run(spark, Seq("bpe",
      "--docs", base, "--model", model,
      "--out", tmpDir("cli-bpe-pre") + "/o"), now))
      .message.contains("no bpe model"))
    // bad merge budget fails at parse time; mixed train+count refused
    assert(intercept[CliError](Cli.run(spark, Seq("bpe", "--docs", base,
      "--model", model, "--n-merges", "0"), now))
      .message.contains("--n-merges"))
    assert(intercept[CliError](Cli.run(spark, Seq("bpe", "--docs", base,
      "--model", model, "--n-merges", "4",
      "--out", tmpDir("cli-bpe-mixed") + "/o"), now))
      .message.contains("COUNT option"))
    // --local trains the driver-side loop to the IDENTICAL model
    val localModel = tmpDir("cli-bpe-local") + "/model"
    Cli.run(spark, Seq("bpe", "--docs", base, "--n-merges", "4",
      "--model", localModel, "--local"), now)
    // train: the written table IS bpeMerges
    val tr = Cli.run(spark, Seq("bpe", "--docs", base,
      "--n-merges", "4", "--model", model), now)
    assert(tr.contains("4 merges"), tr)
    assert(spark.read.parquet(localModel).collect().map(_.toSeq).toSet
      == spark.read.parquet(model).collect().map(_.toSeq).toSet,
      "--local wrote a different merge table")
    val direct = graft.ext.TextAnalysis.bpeTrain(docs, 4)
    val stored = spark.read.parquet(model).collect()
      .map(r => graft.ext.TextAnalysis.bpeMergeOf(
        r.getAs[Long]("merge_rank").toInt, r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[Long]("freq")))
      .sortBy(_.rank).toSeq
    assert(stored == direct, "stored model diverged from bpeTrain")
    // count: the narrow-map encoder over the stored model
    val out = tmpDir("cli-bpe-counted") + "/o"
    val sc = Cli.run(spark, Seq("bpe", "--docs", base,
      "--model", model, "--out", out), now)
    assert(sc.contains("counted") && sc.contains("4-merge"), sc)
    val counted = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = graft.ext.TextAnalysis.bpeTokenCounts(docs, direct)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counted == want, "CLI count diverged from bpeTokenCounts")
    assert(counted.size == docs.count())
    // a truncated model (missing rank 1) is refused, not under-merged
    val bad = tmpDir("cli-bpe-bad") + "/model"
    spark.read.parquet(model)
      .filter(col("merge_rank") =!= 1L)
      .write.mode("overwrite").parquet(bad)
    assert(intercept[CliError](Cli.run(spark, Seq("bpe", "--docs", base,
      "--model", bad, "--out", tmpDir("cli-bpe-bad-out") + "/o"), now))
      .message.contains("not contiguous"))
    // a parquet that is not a merge table at all is refused by schema
    assert(intercept[CliError](Cli.run(spark, Seq("bpe", "--docs", base,
      "--model", base, "--out", tmpDir("cli-bpe-bad2-out") + "/o"), now))
      .message.contains("not a bpe model"))
  }

  test("pca command: train writes the component model, score " +
    "round-trips it through the narrow-map scorer, malformed " +
    "invocations refused") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("cli-pca-emb")
    val emb = Tables.embeddings(spark, sf0001)
    emb.write.mode("overwrite").parquet(base)
    val model = tmpDir("cli-pca") + "/model"
    // score before train fails loudly
    assert(intercept[CliError](Cli.run(spark, Seq("pca",
      "--embeddings", base, "--model", model,
      "--out", tmpDir("cli-pca-pre") + "/o"), now))
      .message.contains("no pca model"))
    // --out during training, bad --iters, bad --train values refused
    assert(intercept[CliError](Cli.run(spark, Seq("pca", "--train",
      "--embeddings", base, "--model", model, "--out", "x"), now))
      .message.contains("SCORE option"))
    assert(intercept[CliError](Cli.run(spark, Seq("pca", "--train",
      "--embeddings", base, "--model", model, "--iters", "0"), now))
      .message.contains("--iters"))
    assert(intercept[CliError](Cli.run(spark, Seq("pca", "--train", "yes",
      "--embeddings", base, "--model", model), now))
      .message.contains("--train"))
    // a corpus without the embedding contract is refused
    val docsPath = tmpDir("cli-pca-docs")
    Tables.documents(spark, sf0001).write.mode("overwrite").parquet(docsPath)
    assert(intercept[CliError](Cli.run(spark, Seq("pca", "--train",
      "--embeddings", docsPath, "--model", model), now))
      .message.contains("--embeddings needs"))
    // train
    val tr = Cli.run(spark, Seq("pca", "--train", "--embeddings", base,
      "--model", model, "--iters", "2"), now)
    assert(tr.contains("dim 64"), tr)
    // the written model IS pcaModel
    val direct = graft.ext.Pca.pcaModel(emb, iters = 2)
    val stored = spark.read.parquet(model).collect()
      .map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(stored == direct.mu.indices
      .map(i => i -> (direct.mu(i), direct.v(i))).toMap,
      "stored model diverged from pcaModel")
    // score: the narrow-map scorer over the stored model
    val out = tmpDir("cli-pca-scored") + "/o"
    val sc = Cli.run(spark, Seq("pca", "--embeddings", base,
      "--model", model, "--out", out), now)
    assert(sc.contains("projected") && sc.contains("dim-64"), sc)
    val scored = spark.read.parquet(out).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val want = graft.ext.Pca.pcaScoreMap(emb, direct).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored == want, "CLI score diverged from pcaScoreMap")
    assert(scored.size == emb.count())
    // a truncated model (missing dim 0) is refused
    val bad = tmpDir("cli-pca-bad") + "/model"
    spark.read.parquet(model).filter(col("i") =!= 0)
      .write.mode("overwrite").parquet(bad)
    assert(intercept[CliError](Cli.run(spark, Seq("pca",
      "--embeddings", base, "--model", bad,
      "--out", tmpDir("cli-pca-bad-out") + "/o"), now))
      .message.contains("not contiguous"))
    // a parquet that is not a component table is refused by schema
    assert(intercept[CliError](Cli.run(spark, Seq("pca",
      "--embeddings", base, "--model", base,
      "--out", tmpDir("cli-pca-bad2-out") + "/o"), now))
      .message.contains("not a pca model"))
  }

  test("ann command: exact and diversified rankings match the library, " +
    "malformed invocations refused") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("cli-ann-emb")
    val emb = Tables.embeddings(spark, sf0001)
    emb.write.mode("overwrite").parquet(base)
    // probes required, exclusivity, numeric validation
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--k", "3"), now))
      .message.contains("name the probes"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "0", "--queries", base), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "a,b"), now))
      .message.contains("--query-ids"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "0", "--k", "0"), now))
      .message.contains("--k"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "0", "--diversify",
      "--lambda", "1.5"), now)).message.contains("--lambda"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "0", "--k", "5",
      "--diversify", "--pool", "3"), now)).message.contains("--pool"))
    // exact == cosineTopK (ids parse with spaces)
    val out = tmpDir("cli-ann-out") + "/o"
    val msg = Cli.run(spark, Seq("ann", "--embeddings", base,
      "--query-ids", "0, 1", "--k", "3", "--out", out), now)
    assert(msg.contains("6 neighbors"), msg)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = graft.ext.Similarity.cosineTopK(emb,
      emb.filter(col("vec_id") < 2), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want, "CLI exact ranking diverged from cosineTopK")
    // diversified == mmrTopK over the same knobs
    val out2 = tmpDir("cli-ann-out2") + "/o"
    val msg2 = Cli.run(spark, Seq("ann", "--embeddings", base,
      "--query-ids", "0", "--k", "2", "--diversify",
      "--pool", "8", "--lambda", "0.5", "--out", out2), now)
    assert(msg2.contains("2 neighbors"), msg2)
    val got2 = spark.read.parquet(out2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want2 = graft.ext.Similarity.mmrTopK(emb,
      emb.filter(col("vec_id") === 0L), 2, 8, 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got2 == want2, "CLI diversified ranking diverged from mmrTopK")
    // without --out a small ranking prints (header + k rows)
    val printed = Cli.run(spark, Seq("ann", "--embeddings", base,
      "--query-ids", "0", "--k", "2"), now)
    assert(printed.contains("sim") && printed.linesIterator.size == 3,
      printed)
    // a typo'd probe id fails loudly naming the missing ids
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--embeddings", base, "--query-ids", "0,999999"), now))
      .message.contains("999999"))
  }

  test("ann --index: init/update/query lifecycle end-to-end, loud " +
    "failure modes") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("cli-vidx-emb")
    val emb = Tables.embeddings(spark, sf0001)
    emb.filter(col("vec_id") < 400).write.mode("overwrite").parquet(base)
    val store = tmpDir("cli-vidx") + "/idx"
    // query/update before init fail loudly
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--query-ids", "0", "--embeddings", base), now))
      .message.contains("no vector index store"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--update", "--embeddings", base), now))
      .message.contains("no vector index store"))
    // init validates knobs and refuses maintenance+query mixing
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--init", "--embeddings", base,
      "--dim", "64", "--m", "7"), now))
      .message.contains("not divisible"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--init", "--update",
      "--embeddings", base), now)).message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--init", "--embeddings", base,
      "--query-ids", "0"), now))
      .message.contains("cannot combine"))
    val initMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--init", "--embeddings", base, "--coarse-iters", "2"), now)
    assert(initMsg.contains("400 vectors indexed"), initMsg)
    // double init refused
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--init", "--embeddings", base), now))
      .message.contains("already exists"))
    // update with the delta, then query from the store == library
    val deltaDir = tmpDir("cli-vidx-delta")
    emb.filter(col("vec_id") >= 400).write.mode("overwrite")
      .parquet(deltaDir)
    val updMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--update", "--embeddings", deltaDir), now)
    assert(updMsg.contains("500 vectors indexed"), updMsg)
    val out = tmpDir("cli-vidx-out") + "/o"
    val fullDir = tmpDir("cli-vidx-full")
    emb.write.mode("overwrite").parquet(fullDir)
    val qMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--query-ids", "0,1", "--embeddings", fullDir, "--k", "3",
      "--out", out), now)
    assert(qMsg.contains("6 neighbors"), qMsg)
    val got = spark.read.parquet(out).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    val want = graft.ext.VectorIndex.query(spark, store,
      emb.filter(col("vec_id") < 2), 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(got == want, "CLI index query diverged from the library")
    // printed form: header + |Q|·k rows
    val printed = Cli.run(spark, Seq("ann", "--index", store,
      "--query-ids", "0", "--embeddings", fullDir, "--k", "2"), now)
    assert(printed.contains("approx_ip") &&
      printed.linesIterator.size == 3, printed)
    // --diversify: store-fed MMR == diversifiedQuery over the same
    // knobs; knob validation fails loudly
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--query-ids", "0", "--embeddings", fullDir,
      "--diversify", "--lambda", "1.5"), now))
      .message.contains("--lambda"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", store, "--query-ids", "0", "--embeddings", fullDir,
      "--k", "5", "--diversify", "--pool", "3"), now))
      .message.contains("--pool"))
    val out3 = tmpDir("cli-vidx-out3") + "/o"
    val dMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--query-ids", "0,1", "--embeddings", fullDir, "--k", "3",
      "--diversify", "--pool", "9", "--lambda", "0.5",
      "--out", out3), now)
    assert(dMsg.contains("6 neighbors"), dMsg)
    val gotD = spark.read.parquet(out3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wantD = graft.ext.VectorIndex.diversifiedQuery(spark, store,
        emb.filter(col("vec_id") < 2), k = 3, poolSize = 9,
        lambda = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotD == wantD,
      "CLI store-fed diversified ranking diverged from the library")
    // printed diversified form: pick_rank header + |Q|·k rows
    val printedD = Cli.run(spark, Seq("ann", "--index", store,
      "--query-ids", "0", "--embeddings", fullDir, "--k", "2",
      "--diversify"), now)
    assert(printedD.contains("pick_rank") &&
      printedD.linesIterator.size == 3, printedD)
    // loud no-store failure for a diversified query
    assert(intercept[CliError](Cli.run(spark, Seq("ann",
      "--index", tmpDir("cli-vidx-none") + "/missing",
      "--query-ids", "0", "--embeddings", fullDir,
      "--diversify"), now)).message.contains("no vector index store"))
    // --diversify --exact: the s24 two-stage tail == library, and
    // --exact without --diversify is refused
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--query-ids", "0", "--embeddings", fullDir,
      "--exact"), now))
      .message.contains("--exact is a --diversify option"))
    val outE = tmpDir("cli-vidx-oute") + "/o"
    val eMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--query-ids", "0,1", "--embeddings", fullDir, "--k", "3",
      "--diversify", "--exact", "--pool", "9", "--lambda", "0.5",
      "--out", outE), now)
    assert(eMsg.contains("6 neighbors"), eMsg)
    val gotE = spark.read.parquet(outE).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val wantE = graft.ext.VectorIndex.diversifiedQueryRerank(spark,
        store, emb, emb.filter(col("vec_id") < 2), k = 3,
        poolSize = 9, lambda = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(gotE == wantE,
      "CLI exact diversified ranking diverged from the library")
  }

  test("ann --index --drift/--drift-stats: reports == the library's, " +
    "a planted delta trips the stats-fed advisory, exclusive/ " +
    "malformed flags refused") {
    import org.apache.spark.sql.functions.{col, lit, transform, when}
    val emb = Tables.embeddings(spark, sf0001)
    val baseDir = tmpDir("cli-drift-emb")
    emb.filter(col("vec_id").cast("long") % 4 =!= 3)
      .write.mode("overwrite").parquet(baseDir)
    val store = tmpDir("cli-drift") + "/idx"
    // flag validation fails before any store/spark work
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--drift", "--drift-stats"), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--drift", "--init", "--embeddings", baseDir), now))
      .message.contains("standalone report"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--drift-stats", "--embeddings", baseDir), now))
      .message.contains("drop --embeddings"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--drift-stats"), now))
      .message.contains("no vector index store"))
    Cli.run(spark, Seq("ann", "--index", store, "--init",
      "--embeddings", baseDir, "--coarse-iters", "2"), now)
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--drift-stats", "--tol-mean", "-1"), now))
      .message.contains("--tol-mean"))
    // self-report: fresh through both paths, and the printed
    // components match the library's report
    val self = Cli.run(spark, Seq("ann", "--index", store,
      "--drift", "--embeddings", baseDir), now)
    assert(self.contains("corpus-scan") && self.contains("fresh") &&
      self.contains("n_ratio=1.000000") &&
      self.contains("mean_shift=0.000000"), self)
    val selfStats = Cli.run(spark, Seq("ann", "--index", store,
      "--drift-stats"), now)
    assert(selfStats.contains("stats-fed") && selfStats.contains("fresh"),
      selfStats)
    // admit a dim-0-shifted delta, then the stats-fed advisory trips
    val deltaDir = tmpDir("cli-drift-delta")
    emb.filter(col("vec_id").cast("long") % 4 === 3)
      .select(col("vec_id"),
        transform(col("embedding").cast("array<double>"),
          (x, i) => when(i === 0, x + lit(0.05)).otherwise(x))
          .as("embedding"))
      .write.mode("overwrite").parquet(deltaDir)
    Cli.run(spark, Seq("ann", "--index", store, "--update",
      "--embeddings", deltaDir), now)
    val tripped = Cli.run(spark, Seq("ann", "--index", store,
      "--drift-stats"), now)
    assert(tripped.contains("STALE") && tripped.contains("reindex"),
      tripped)
    val want = graft.ext.VectorIndex
      .driftReportFromStats(spark, store).collect()(0)
    assert(tripped.contains(
      f"mean_shift=${want.getAs[Double]("mean_shift")}%.6f"),
      s"printed components diverged from the library: $tripped")
    // a loosened tolerance flips the same stats back to fresh
    val loose = Cli.run(spark, Seq("ann", "--index", store,
      "--drift-stats", "--tol-mean", "0.5", "--tol-axis", "0.5",
      "--tol-norm", "0.5"), now)
    assert(loose.contains("fresh"), loose)
  }

  test("ann --index --delete/--compact: tombstoned ids leave the CLI " +
    "ranking, compaction is result-invisible, malformed invocations " +
    "refused") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf0001)
    val corpus = tmpDir("cli-vdel-emb")
    emb.write.mode("overwrite").parquet(corpus)
    val store = tmpDir("cli-vdel") + "/idx"
    // lifecycle flags fail loudly before a store exists / on misuse
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--delete", "--vec-ids", "1"), now))
      .message.contains("no vector index store"))
    Cli.run(spark, Seq("ann", "--index", store, "--init",
      "--embeddings", corpus, "--coarse-iters", "2"), now)
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--delete", "--compact"), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--delete", "--vec-ids", "1", "--update",
      "--embeddings", corpus), now))
      .message.contains("standalone maintenance"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--vec-ids", "1"), now))
      .message.contains("--vec-ids is a --delete option"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--delete"), now)).message.contains("--vec-ids"))
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      store, "--delete", "--vec-ids", "1,x"), now))
      .message.contains("integers"))
    // the takedown: probe 0's CURRENT top hit vanishes from the ranking
    val before = graft.ext.VectorIndex.query(spark, store,
      emb.filter(col("vec_id") < 1), k = 3).collect()
    assert(before.nonEmpty, "need a ranked neighbor to take down")
    val victim = before.minBy(_.getInt(3)).getLong(1)
    val dMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--delete", "--vec-ids", victim.toString), now)
    assert(dMsg.contains("tombstoned 1 ids"), dMsg)
    val after = graft.ext.VectorIndex.query(spark, store,
      emb.filter(col("vec_id") < 1), k = 3).collect()
      .map(_.getLong(1)).toSet
    assert(!after.contains(victim),
      "tombstoned id still ranked via CLI path")
    // compaction: physical rows drop, the ranking is unchanged
    val rowsBefore = spark.read.parquet(s"$store/codes").count()
    val cMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--compact"), now)
    assert(cMsg.contains("compacted"), cMsg)
    assert(spark.read.parquet(s"$store/codes").count() < rowsBefore,
      "compaction dropped no dead rows")
    val afterCompact = graft.ext.VectorIndex.query(spark, store,
      emb.filter(col("vec_id") < 1), k = 3).collect()
      .map(_.getLong(1)).toSet
    assert(afterCompact == after, "compaction changed query results")
    // --delete --embeddings: the reconciling form — the stats-fed
    // drift report then matches the SURVIVORS' corpus scan exactly
    val rMsg = Cli.run(spark, Seq("ann", "--index", store,
      "--delete", "--vec-ids", "3,5", "--embeddings", corpus), now)
    assert(rMsg.contains("reconciliation"), rMsg)
    // only the RECONCILED deletes subtract (the earlier vectors-free
    // delete of `victim` stays counted, as documented)
    assert(graft.ext.VectorIndex.driftReportFromStats(spark, store)
        .collect()(0).getAs[Long]("n_current") == emb.count() - 2,
      "CLI reconciling delete did not subtract the deleted rows")
  }

  test("index --delete/--compact: tombstoned docs leave the CLI " +
    "ranking, compaction is result-invisible, malformed invocations " +
    "refused") {
    val store = tmpDir("cli-bdel") + "/idx"
    val corpus = tmpDir("cli-bdel-docs")
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    docs.write.mode("overwrite").parquet(corpus)
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--delete", "--doc-ids", "1"), now))
      .message.contains("no index store"))
    Cli.run(spark, Seq("index", "--docs", corpus, "--store", store,
      "--init"), now)
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--delete", "--compact"), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--delete", "--doc-ids", "1", "--query", "dup"), now))
      .message.contains("standalone maintenance"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--doc-ids", "1"), now))
      .message.contains("--doc-ids is a --delete option"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--delete", "--doc-ids", " , "), now))
      .message.contains("at least one"))
    // take down the top hit for a term; it must leave the ranking
    val hits = graft.ext.Retrieval.queryIndex(spark, store,
      Seq("dup"), 3).collect()
    assert(hits.nonEmpty, "need a ranked doc to take down")
    val top = hits(0).getLong(0)
    val dMsg = Cli.run(spark, Seq("index", "--store", store,
      "--delete", "--doc-ids", top.toString), now)
    assert(dMsg.contains("tombstoned 1 docs"), dMsg)
    val after = graft.ext.Retrieval.queryIndex(spark, store,
      Seq("dup"), 3).collect().map(_.getLong(0)).toSet
    assert(!after.contains(top), "tombstoned doc still ranked")
    // compaction drops the dead postings; ranking unchanged
    val rowsBefore = spark.read.parquet(s"$store/postings").count()
    val cMsg = Cli.run(spark, Seq("index", "--store", store,
      "--compact"), now)
    assert(cMsg.contains("compacted"), cMsg)
    assert(spark.read.parquet(s"$store/postings").count() < rowsBefore,
      "compaction dropped no dead postings")
    val afterCompact = graft.ext.Retrieval.queryIndex(spark, store,
      Seq("dup"), 3).collect().map(_.getLong(0)).toSet
    assert(afterCompact == after, "compaction changed query results")
  }

  test("hybrid command: store-fed fused ranking == the library (approx " +
    "and --exact tails), loud failure modes, drift-stats caveat on " +
    "vectors-free deletes") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val emb = Tables.embeddings(spark, sf0001)
    val embPath = tmpDir("cli-hyb-emb")
    emb.write.mode("overwrite").parquet(embPath)
    val bmStore = tmpDir("cli-hyb-bm") + "/idx"
    val vStore = tmpDir("cli-hyb-v") + "/idx"
    // missing stores fail loudly BEFORE any ranking work
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid",
      "--index", bmStore, "--vector-index", vStore, "--query", "dup",
      "--query-id", "0", "--embeddings", embPath), now))
      .message.contains("no index store"))
    graft.ext.Retrieval.initIndexIfStale(docs, bmStore)
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid",
      "--index", bmStore, "--vector-index", vStore, "--query", "dup",
      "--query-id", "0", "--embeddings", embPath), now))
      .message.contains("no vector index store"))
    graft.ext.VectorIndex.init(emb, vStore, coarseIters = 2)
    // knob and probe validation
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid",
      "--index", bmStore, "--vector-index", vStore, "--query", "  ",
      "--query-id", "0", "--embeddings", embPath), now))
      .message.contains("at least one term"))
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid",
      "--index", bmStore, "--vector-index", vStore, "--query", "dup",
      "--query-id", "999999", "--embeddings", embPath), now))
      .message.contains("999999"))
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid",
      "--index", bmStore, "--vector-index", vStore, "--query", "dup",
      "--query-id", "0", "--embeddings", embPath, "--k", "10",
      "--depth", "5"), now)).message.contains("--depth"))
    // e2e == library, both tails
    val qVecs = emb.filter(col("vec_id") === 0L)
      .select(col("vec_id").cast("long"),
        col("embedding").cast("array<double>"))
      .as[(Long, Array[Double])].collect().toSeq
      .map { case (id, e) => (id, e.toSeq) }.toDF("vec_id", "embedding")
    val out = tmpDir("cli-hyb-out") + "/o"
    val msg = Cli.run(spark, Seq("hybrid", "--index", bmStore,
      "--vector-index", vStore, "--query", "dup merge", "--query-id",
      "0", "--embeddings", embPath, "--out", out), now)
    assert(msg.contains("fused hits"), msg)
    val got = spark.read.parquet(out).collect().map(_.toSeq).toSet
    val want = graft.ext.Retrieval.hybridQueryStores(spark, bmStore,
      vStore, Seq(0L -> Seq("dup", "merge")), qVecs, k = 10, depth = 20)
      .collect().map(_.toSeq).toSet
    assert(got == want, "CLI hybrid ranking diverged from the library")
    val outX = tmpDir("cli-hyb-outx") + "/o"
    Cli.run(spark, Seq("hybrid", "--index", bmStore, "--vector-index",
      vStore, "--query", "dup merge", "--query-id", "0", "--embeddings",
      embPath, "--exact", "--out", outX), now)
    val gotX = spark.read.parquet(outX).collect().map(_.toSeq).toSet
    val wantX = graft.ext.Retrieval.hybridQueryStoresRerank(spark,
      bmStore, vStore, emb, Seq(0L -> Seq("dup", "merge")), qVecs,
      k = 10, depth = 20).collect().map(_.toSeq).toSet
    assert(gotX == wantX, "CLI --exact hybrid diverged from the library")
    // without --out a ranking prints (header + k rows)
    val printed = Cli.run(spark, Seq("hybrid", "--index", bmStore,
      "--vector-index", vStore, "--query", "dup merge", "--query-id",
      "0", "--embeddings", embPath), now)
    assert(printed.contains("fused") && printed.linesIterator.size == 11,
      printed)
    // --diversify (s28): picks == the library's MMR tail; flag hygiene
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid", "--index",
      bmStore, "--vector-index", vStore, "--query", "dup merge",
      "--query-id", "0", "--embeddings", embPath, "--diversify",
      "--exact"), now)).message.contains("drop --exact"))
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid", "--index",
      bmStore, "--vector-index", vStore, "--query", "dup merge",
      "--query-id", "0", "--embeddings", embPath, "--lambda", "0.5"),
      now)).message.contains("--diversify options"))
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid", "--index",
      bmStore, "--vector-index", vStore, "--query", "dup merge",
      "--query-id", "0", "--embeddings", embPath, "--diversify",
      "--lambda", "1.5"), now)).message.contains("--lambda"))
    val outD = tmpDir("cli-hyb-outd") + "/o"
    val msgD = Cli.run(spark, Seq("hybrid", "--index", bmStore,
      "--vector-index", vStore, "--query", "dup merge", "--query-id",
      "0", "--embeddings", embPath, "--diversify", "--k", "4",
      "--pool", "12", "--out", outD), now)
    assert(msgD.contains("diversified hits"), msgD)
    val gotD = spark.read.parquet(outD).collect().map(_.toSeq).toSet
    val wantD = graft.ext.Retrieval.hybridQueryStoresDiversify(spark,
      bmStore, vStore, emb, Seq(0L -> Seq("dup", "merge")), qVecs,
      k = 4, poolSize = 12, depth = 20).collect().map(_.toSeq).toSet
    assert(gotD == wantD, "CLI --diversify diverged from the library")
    val printedD = Cli.run(spark, Seq("hybrid", "--index", bmStore,
      "--vector-index", vStore, "--query", "dup merge", "--query-id",
      "0", "--embeddings", embPath, "--diversify", "--k", "4"), now)
    assert(printedD.contains("pick_rank") &&
      printedD.linesIterator.size == 5, printedD)
    // the r13 ADVICE crash: the DEFAULT --diversify invocation (k=10
    // -> uncapped pool 30 > depth 20 threw an uncaught require) must
    // work — the default pool caps at depth
    val printedDef = Cli.run(spark, Seq("hybrid", "--index", bmStore,
      "--vector-index", vStore, "--query", "dup merge", "--query-id",
      "0", "--embeddings", embPath, "--diversify"), now)
    assert(printedDef.contains("pick_rank") &&
      printedDef.linesIterator.size == 11, printedDef)
    // a user-supplied pool beyond depth is a CliError, not a crash
    assert(intercept[CliError](Cli.run(spark, Seq("hybrid", "--index",
      bmStore, "--vector-index", vStore, "--query", "dup merge",
      "--query-id", "0", "--embeddings", embPath, "--diversify",
      "--pool", "25"), now)).message.contains("--depth"))
    // the ADVICE caveat: a vectors-free delete leaves the stats
    // counting the appended corpus — --drift-stats must SAY so; a
    // reconciling re-init clears it
    val clean = Cli.run(spark, Seq("ann", "--index", vStore,
      "--drift-stats"), now)
    assert(!clean.contains("CAVEAT"), clean)
    Cli.run(spark, Seq("ann", "--index", vStore, "--delete",
      "--vec-ids", "3,4"), now)
    val caveated = Cli.run(spark, Seq("ann", "--index", vStore,
      "--drift-stats"), now)
    assert(caveated.contains("CAVEAT") && caveated.contains("2"),
      s"vectors-free delete not caveated:\n$caveated")
  }

  test("index --drift/--drift-stats: reports == the library's, " +
    "exclusivity and missing-store guards") {
    import org.apache.spark.sql.functions.{col, concat, lit}
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val docsPath = tmpDir("cli-lexdrift-docs")
    docs.write.mode("overwrite").parquet(docsPath)
    val store = tmpDir("cli-lexdrift") + "/idx"
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--drift-stats"), now))
      .message.contains("no index store"))
    graft.ext.Retrieval.initIndexIfStale(docs, store)
    // exclusivity guards
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--drift", "--drift-stats"), now))
      .message.contains("exclusive"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--drift-stats", "--docs", docsPath), now))
      .message.contains("drop --docs"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--drift-stats", "--query", "dup"), now))
      .message.contains("standalone report"))
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      store, "--drift-stats", "--tol-df", "-1"), now))
      .message.contains("--tol-df"))
    // fresh store: fresh verdict, values mirror the library report
    val fresh = Cli.run(spark, Seq("index", "--store", store,
      "--drift-stats"), now)
    assert(fresh.contains("fresh") && fresh.contains("n_ratio=1.000000"),
      fresh)
    // a crash-interrupted rebuild swap: the report recovers the store
    // instead of erroring ("no index store" / "predates drift
    // baselines" are both wrong — __old holds a complete baseline)
    val sd = new java.io.File(store).getParentFile
    assert(new java.io.File(sd, "idx")
      .renameTo(new java.io.File(sd, "idx__old")))
    val recovered = Cli.run(spark, Seq("index", "--store", store,
      "--drift-stats"), now)
    assert(recovered.contains("fresh"),
      s"--drift-stats did not recover a crash-swapped store:\n$recovered")
    // drain an OOV-planted delta: the store-fed report trips
    graft.ext.Retrieval.updateIndex(docs.select(
      (col("doc_id") + lit(5000000L)).as("doc_id"),
      concat(col("text"),
        lit(" qqcli qqcli qqcli qqcli qqcli qqcli")).as("text")), store)
    val stale = Cli.run(spark, Seq("index", "--store", store,
      "--drift-stats"), now)
    assert(stale.contains("STALE"), stale)
    // the corpus-scan twin agrees over the original docs (no drift)
    val scan = Cli.run(spark, Seq("index", "--store", store,
      "--drift", "--docs", docsPath), now)
    assert(scan.contains("corpus-scan") && scan.contains("fresh"), scan)
  }

  test("ann/index --rebuild: atomic re-init via the CLI — result == a " +
    "fresh init, guards refuse mixing and missing stores") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, sf0001)
    val embPath = tmpDir("cli-rb-emb")
    emb.write.mode("overwrite").parquet(embPath)
    val halfPath = tmpDir("cli-rb-emb-half")
    emb.filter(col("vec_id") < 300).write.mode("overwrite")
      .parquet(halfPath)
    val vStore = tmpDir("cli-rb-v") + "/idx"
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      vStore, "--rebuild", "--embeddings", embPath), now))
      .message.contains("bootstrap with --init"))
    Cli.run(spark, Seq("ann", "--index", vStore, "--init",
      "--embeddings", halfPath), now)
    assert(intercept[CliError](Cli.run(spark, Seq("ann", "--index",
      vStore, "--rebuild", "--init", "--embeddings", embPath), now))
      .message.contains("standalone maintenance"))
    val msg = Cli.run(spark, Seq("ann", "--index", vStore, "--rebuild",
      "--embeddings", embPath), now)
    assert(msg.contains("rebuilt") && msg.contains("500 vectors"), msg)
    val ref = tmpDir("cli-rb-vref") + "/idx"
    graft.ext.VectorIndex.init(emb, ref, coarseIters = 2)
    val probes = emb.filter(col("vec_id") < 3)
    assert(graft.ext.VectorIndex.query(spark, vStore, probes, 3)
      .collect().map(_.toSeq).toSet ==
      graft.ext.VectorIndex.query(spark, ref, probes, 3)
        .collect().map(_.toSeq).toSet,
      "CLI-rebuilt vector store diverged from a fresh init")
    // the lexical twin
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val docsPath = tmpDir("cli-rb-docs")
    docs.write.mode("overwrite").parquet(docsPath)
    val bmStore = tmpDir("cli-rb-bm") + "/idx"
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      bmStore, "--rebuild", "--docs", docsPath), now))
      .message.contains("bootstrap with --init"))
    Cli.run(spark, Seq("index", "--store", bmStore, "--init",
      "--docs", docsPath), now)
    val msg2 = Cli.run(spark, Seq("index", "--store", bmStore,
      "--rebuild", "--docs", docsPath), now)
    assert(msg2.contains("rebuilt") && msg2.contains("500 documents"),
      msg2)
    assert(intercept[CliError](Cli.run(spark, Seq("index", "--store",
      bmStore, "--rebuild", "--docs", docsPath, "--query", "dup"), now))
      .message.contains("standalone maintenance"))
  }

  test("db --purge-session: the session vanishes from db listings, " +
    "--compact makes it physical, guards refuse patterns and typos") {
    val root = tmpDir("cli-purge-cat")
    val cat = new graft.catalog.BackupCatalog(spark, root)
    val s1 = graft.catalog.BackupSession("export", "c", "20240101_000000",
      "file:///bk/", 0L, 1000L, 5000L, 6000L, error = false, "")
    cat.startInfo(s1)
    cat.startInfo(s1.copy(session_name = "20240201_000000"))
    cat.exportedTableInfo(graft.catalog.TableRecord("export", "lineitem",
      "20240101_000000", 0L, 1000L, 100000L, empty = false,
      error = false, "", 42L), Nil)
    // guards
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "2024%"), now))
      .message.contains("exact session name"))
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--mode", "bogus"), now)).message.contains("unknown --mode"))
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--session-name", "x"), now))
      .message.contains("standalone maintenance"))
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "nope"), now))
      .message.contains("no export session"))
    // purge + physical compaction in one invocation
    val msg = Cli.run(spark, Seq("db", "--catalog-root", root,
      "--purge-session", "20240101_000000", "--compact"), now)
    assert(msg.contains("purged export session") &&
      msg.contains("dropped physically"), msg)
    val listing = Cli.run(spark, Seq("db", "--catalog-root", root), now)
    assert(!listing.contains("20240101_000000") &&
      listing.contains("20240201_000000"), listing)
    assert(spark.read.parquet(s"$root/tables").count() == 0,
      "purged table rows survived --compact")
  }

  test("db --purge-session --purge-data: the session is gone from the " +
    "catalog AND disk, replays harmless, guards wire the flag pair") {
    val root = tmpDir("cli-purgedata-cat")
    val destRoot = tmpDir("cli-purgedata-dest")
    val cat = new graft.catalog.BackupCatalog(spark, root)
    val s1 = graft.catalog.BackupSession("export", "c", "20240101_000000",
      s"file://$destRoot/", 0L, 1000L, 5000L, 6000L, error = false, "")
    cat.startInfo(s1)
    cat.startInfo(s1.copy(session_name = "20240201_000000"))
    // the payload trees the takedown must (and must not) remove
    for ((sess, t) <- Seq(("20240101_000000", "lineitem"),
        ("20240101_000000", "orders"), ("20240201_000000", "lineitem"))) {
      val d = new java.io.File(s"$destRoot/$sess/$t")
      assert(d.mkdirs())
      java.nio.file.Files.writeString(
        new java.io.File(d, "part-0.parquet").toPath, "x")
    }
    // flag hygiene: --purge-data without --dest-root; --dest-root
    // without --purge-data; import mode
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--purge-data"), now)).message.contains("--dest-root"))
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--dest-root", destRoot), now))
      .message.contains("--purge-data option"))
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--mode", "import", "--purge-data", "--dest-root", destRoot), now))
      .message.contains("export sessions"))
    // a typo'd --dest-root refuses BEFORE touching catalog or disk:
    // the session row records the real destination (r14)
    val wrongRoot = tmpDir("cli-purgedata-wrong")
    assert(new java.io.File(s"$wrongRoot/20240101_000000").mkdirs())
    assert(intercept[CliError](Cli.run(spark, Seq("db",
      "--catalog-root", root, "--purge-session", "20240101_000000",
      "--purge-data", "--dest-root", wrongRoot), now))
      .message.contains("recorded destination"))
    assert(new java.io.File(s"$wrongRoot/20240101_000000").exists(),
      "refused purge still deleted the mismatched tree")
    val stillThere = Cli.run(spark, Seq("db", "--catalog-root", root), now)
    assert(stillThere.contains("20240101_000000"),
      "refused purge still forgot the session from the catalog")
    // the takedown: catalog forgets AND the export tree is deleted
    val msg = Cli.run(spark, Seq("db", "--catalog-root", root,
      "--purge-session", "20240101_000000", "--purge-data",
      "--dest-root", destRoot, "--compact"), now)
    assert(msg.contains("purged export session") &&
      msg.contains("payload deleted"), msg)
    assert(!new java.io.File(s"$destRoot/20240101_000000").exists(),
      "purged session's export dirs survived")
    assert(new java.io.File(s"$destRoot/20240201_000000/lineitem").exists(),
      "payload purge leaked onto another session")
    val listing = Cli.run(spark, Seq("db", "--catalog-root", root), now)
    assert(!listing.contains("20240101_000000") &&
      listing.contains("20240201_000000"), listing)
    // replay (rows compacted away, disk already clean): harmless
    val again = Cli.run(spark, Seq("db", "--catalog-root", root,
      "--purge-session", "20240101_000000", "--purge-data",
      "--dest-root", destRoot), now)
    assert(again.contains("already gone"), again)
  }

  test("warc command: walk/extract/index agree with the library " +
    "operators; index refuses plain archives; loud failures") {
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    val plainDir = tmpDir("cli-warc-plain")
    val gzDir = tmpDir("cli-warc-gz")
    graft.ext.Warc.asWarcArchives(spark, docs)
      .write.mode("overwrite").parquet(plainDir)
    graft.ext.Warc.asWarcGzArchives(spark, docs)
      .write.mode("overwrite").parquet(gzDir)
    // walk: plain and gz agree with the library walk (and each other)
    val wOut = tmpDir("cli-warc-out") + "/facts"
    val msg = Cli.run(spark, Seq("warc", "--archives", plainDir,
      "--mode", "walk", "--out", wOut), now)
    assert(msg.contains("records"), msg)
    val got = spark.read.parquet(wOut).collect().map(_.toSeq).toSet
    val exp = graft.ext.Warc.recordFacts(spark,
      spark.read.parquet(plainDir)).toDF().collect().map(_.toSeq).toSet
    assert(got == exp, "CLI walk diverged from Warc.recordFacts")
    val wgzOut = tmpDir("cli-warc-out") + "/facts_gz"
    Cli.run(spark, Seq("warc", "--archives", gzDir, "--mode", "walk",
      "--gz", "--out", wgzOut), now)
    assert(spark.read.parquet(wgzOut).collect().map(_.toSeq).toSet
      == got, "gz walk diverged from the plain walk")
    // extract with the status gate + html extraction chain
    val eOut = tmpDir("cli-warc-out") + "/pages"
    val emsg = Cli.run(spark, Seq("warc", "--archives", gzDir,
      "--mode", "extract", "--gz", "--status", "200",
      "--out", eOut), now)
    assert(emsg.contains("pages"), emsg)
    val pages = spark.read.parquet(eOut)
    assert(pages.count() > 0 &&
      pages.filter(org.apache.spark.sql.functions
        .col("http_status") =!= 200).count() == 0)
    val hDir = tmpDir("cli-warc-html")
    graft.ext.Warc.asHtmlWarcGzArchives(spark, docs)
      .write.mode("overwrite").parquet(hDir)
    val hOut = tmpDir("cli-warc-out") + "/extracted"
    Cli.run(spark, Seq("warc", "--archives", hDir, "--mode", "extract",
      "--gz", "--status", "200", "--html-extract",
      "--out", hOut), now)
    val one = spark.read.parquet(hOut)
      .filter(org.apache.spark.sql.functions.col("target_uri")
        .endsWith("/1")).collect()
    assert(one.length == 1 &&
      one(0).getAs[String]("text").startsWith("Doc 1\n"),
      "html extraction did not run through the CLI chain")
    // index over gz; plain refused; fetch-check wired
    val iOut = tmpDir("cli-warc-out") + "/cdx"
    val imsg = Cli.run(spark, Seq("warc", "--archives", gzDir,
      "--mode", "index", "--gz", "--out", iOut), now)
    assert(imsg.contains("index rows"), imsg)
    assert(spark.read.parquet(iOut).count() ==
      graft.ext.Warc.cdxIndex(spark,
        spark.read.parquet(gzDir)).count())
    val refuse = intercept[Cli.CliError](Cli.run(spark,
      Seq("warc", "--archives", gzDir, "--mode", "index"), now))
    assert(refuse.getMessage.contains("--gz"), refuse.getMessage)
    // loud failures: wrong columns, bad mode, bad status
    val junkDir = tmpDir("cli-warc-junk")
    docs.write.mode("overwrite").parquet(junkDir)
    val eCols = intercept[Cli.CliError](Cli.run(spark,
      Seq("warc", "--archives", junkDir), now))
    assert(eCols.getMessage.contains("payload"), eCols.getMessage)
    val eMode = intercept[Cli.CliError](Cli.run(spark,
      Seq("warc", "--archives", plainDir, "--mode", "fly"), now))
    assert(eMode.getMessage.contains("unknown --mode"), eMode.getMessage)
    val eStat = intercept[Cli.CliError](Cli.run(spark,
      Seq("warc", "--archives", plainDir, "--mode", "extract",
        "--status", "ok"), now))
    assert(eStat.getMessage.contains("--status"), eStat.getMessage)
  }
}
