package graft

import org.apache.spark.sql.types._

/** Drift guard for the driver-provided corpus (TESTDATA.md).
  *
  * Round 6 ended red because a silent testdata refresh changed
  * events.ts from TIMESTAMP(NANOS) to timestamp[us] and the first
  * symptom was 18 opaque AnalysisExceptions deep in the driver's bench.
  * This spec pins the contract — column names in order, plus an
  * ACCEPTED SET of Spark types per column — so the next refresh costs
  * one readable failure naming the drifted column instead.
  *
  * Accepted sets are deliberately wide where the engine is genuinely
  * agnostic (Tables.eventsTs dispatches on LongType vs timestamp;
  * integer key widths don't matter to joins) and exact where a silent
  * widening would corrupt results (doubles, strings, embedding arrays).
  */
class CorpusContractSpec extends SparkTestBase {

  private val intLike: Set[DataType] = Set(IntegerType, LongType)
  private val tsLike: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType) // LongType = legacy nanos
  private def exact(t: DataType): Set[DataType] = Set(t)

  private val contract: Map[String, Seq[(String, Set[DataType])]] = Map(
    "region" -> Seq(
      "r_regionkey" -> intLike, "r_name" -> exact(StringType)),
    "nation" -> Seq(
      "n_nationkey" -> intLike, "n_name" -> exact(StringType),
      "n_regionkey" -> intLike),
    "customer" -> Seq(
      "c_custkey" -> intLike, "c_name" -> exact(StringType),
      "c_nationkey" -> intLike, "c_acctbal" -> exact(DoubleType),
      "c_mktsegment" -> exact(StringType)),
    "supplier" -> Seq(
      "s_suppkey" -> intLike, "s_name" -> exact(StringType),
      "s_nationkey" -> intLike, "s_acctbal" -> exact(DoubleType)),
    "part" -> Seq(
      "p_partkey" -> intLike, "p_name" -> exact(StringType),
      "p_brand" -> exact(StringType), "p_type" -> exact(StringType),
      "p_size" -> intLike, "p_retailprice" -> exact(DoubleType)),
    "orders" -> Seq(
      "o_orderkey" -> intLike, "o_custkey" -> intLike,
      "o_orderstatus" -> exact(StringType),
      "o_totalprice" -> exact(DoubleType),
      "o_orderdate" -> tsLike, "o_orderpriority" -> exact(StringType)),
    "lineitem" -> Seq(
      "l_orderkey" -> intLike, "l_partkey" -> intLike,
      "l_suppkey" -> intLike, "l_linenumber" -> intLike,
      "l_quantity" -> exact(DoubleType),
      "l_extendedprice" -> exact(DoubleType),
      "l_discount" -> exact(DoubleType), "l_tax" -> exact(DoubleType),
      "l_returnflag" -> exact(StringType),
      "l_linestatus" -> exact(StringType), "l_shipdate" -> tsLike),
    "events" -> Seq(
      "event_id" -> intLike, "ts" -> tsLike, "user_id" -> intLike,
      "event_type" -> exact(StringType), "value" -> exact(DoubleType),
      "props" -> exact(StringType)),
    "documents" -> Seq(
      "doc_id" -> intLike, "text" -> exact(StringType),
      "lang" -> exact(StringType), "source" -> exact(StringType),
      "n_chars" -> intLike),
    "embeddings" -> Seq(
      "vec_id" -> intLike,
      "embedding" -> Set[DataType](ArrayType(FloatType, containsNull = true),
        ArrayType(FloatType, containsNull = false)),
      "label" -> intLike)
  )

  test("all 10 tables match the pinned corpus contract at sf0.001") {
    // nanosAsLong must be on for a legacy TIMESTAMP(NANOS) events file to
    // be readable at all; harmless for the current corpus
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val drifted = Tables.names.flatMap { t =>
      val fields = Tables.load(spark, sf0001, t).schema.fields
      val want = contract(t)
      val nameDrift =
        if (fields.map(_.name).toSeq != want.map(_._1))
          Seq(s"$t: columns are ${fields.map(_.name).mkString(",")}, " +
            s"contract pins ${want.map(_._1).mkString(",")}")
        else Nil
      val typeDrift = fields.flatMap { f =>
        want.collectFirst { case (f.name, accepted) => accepted } match {
          case Some(accepted) if !accepted.contains(f.dataType) =>
            Some(s"$t.${f.name}: type ${f.dataType.simpleString} not in " +
              s"accepted {${accepted.map(_.simpleString).mkString(", ")}} — " +
              "the corpus drifted; update Tables/queries AND this contract")
          case _ => None
        }
      }
      nameDrift ++ typeDrift
    }
    assert(drifted.isEmpty, "\n" + drifted.mkString("\n"))
  }

  test("eventsTs normalizes either ts encoding to (ts_ns long, ts timestamp)") {
    val ev = Tables.eventsTs(spark, sf0001)
    assert(ev.schema("ts_ns").dataType == LongType)
    assert(ev.schema("ts").dataType == TimestampType)
    // the two encodings must agree: ts_ns is exactly micros*1000
    val bad = ev.filter(
      org.apache.spark.sql.functions.expr("unix_micros(ts) * 1000 != ts_ns"))
    assert(bad.isEmpty, "ts_ns and ts disagree")
  }

  test("eventsTs refuses a non-UTC session on the NTZ encoding instead " +
    "of silently shifting timestamps") {
    // only meaningful when the corpus is on the timestamp[us] encoding
    // (the NTZ->TZ cast is TZ-sensitive; the legacy nanos branch is not)
    val isNtz = spark.read.parquet(Tables.path(sf0001, "events"))
      .schema("ts").dataType != LongType
    assume(isNtz, "corpus is on the legacy nanos encoding")
    val prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Europe/Berlin")
    try {
      val e = intercept[IllegalArgumentException] {
        Tables.eventsTs(spark, sf0001)
      }
      assert(e.getMessage.contains("session.timeZone"))
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
