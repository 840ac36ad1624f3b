package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class NfcNormalizeSpec extends SparkTestBase {

  import NfcNormalize.nfc_normalize

  // decomposed: e + COMBINING ACUTE, A + COMBINING RING, o + DIAERESIS
  private val decomposed = "cafe\u0301 A\u030Angstro\u0308m"
  private val precomposed = "caf\u00e9 \u00c5ngstr\u00f6m"

  test("codegen path normalizes combining marks to precomposed NFC") {
    import spark.implicits._
    val got = Seq(decomposed).toDF("s")
      .select(nfc_normalize(col("s")).as("n"),
        length(col("s")).as("raw_cp"), length(nfc_normalize(col("s"))).as("nfc_cp"))
      .first()
    assert(got.getString(0) == precomposed)
    assert(got.getInt(1) == precomposed.length + 3) // 3 combining marks
    assert(got.getInt(2) == precomposed.length)
  }

  test("interpreted eval agrees with codegen and with java.text.Normalizer") {
    val viaEval = NfcNormalize.normalize(UTF8String.fromString(decomposed))
      .toString
    val viaJdk = java.text.Normalizer.normalize(
      decomposed, java.text.Normalizer.Form.NFC)
    import spark.implicits._
    val viaCodegen = Seq(decomposed).toDF("s")
      .select(nfc_normalize(col("s"))).first().getString(0)
    assert(viaEval == viaJdk)
    assert(viaCodegen == viaJdk)
  }

  test("already-NFC input takes the no-allocation fast path") {
    val in = UTF8String.fromString(precomposed)
    // reference equality: the input buffer is returned untouched
    assert(NfcNormalize.normalize(in) eq in)
  }

  test("NFC is idempotent and ASCII is a fixpoint") {
    import spark.implicits._
    val df = Seq(decomposed, precomposed, "plain ascii text", "")
      .toDF("s")
    val twice = df.select(nfc_normalize(col("s")).as("once"))
      .select(nfc_normalize(col("once")).as("twice"), col("once"))
      .filter(col("twice") =!= col("once"))
    assert(twice.isEmpty)
    val ascii = df.filter(col("s") === "plain ascii text")
      .select(nfc_normalize(col("s")).as("n")).first().getString(0)
    assert(ascii == "plain ascii text")
  }

  test("null propagates; non-string input is a type error") {
    import spark.implicits._
    val n = Seq[Option[String]](None).toDF("s")
      .select(nfc_normalize(col("s"))).first()
    assert(n.isNullAt(0))
    val e = intercept[Exception] {
      Seq(1).toDF("i").select(nfc_normalize(col("i"))).collect()
    }
    assert(e.getMessage.contains("nfc_normalize"))
  }

  test("SQL registration exposes nfc_normalize") {
    NfcNormalize.register(spark)
    // Spark's chr() is ASCII-only (mod 256) unlike DuckDB's — build the
    // combining mark with a SQL-level unicode escape instead
    val got = spark.sql(
      "SELECT nfc_normalize('cafe\\u0301') AS n").first().getString(0)
    assert(got == "café")
  }
}
