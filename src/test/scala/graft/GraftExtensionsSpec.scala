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
    } finally {
      SparkSession.clearDefaultSession()
      SparkSession.clearActiveSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
