package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TopKAggregatorSpec extends SparkTestBase {

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("g", "v", "id")
  }

  private def aggTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    import spark.implicits._
    df.select(col("g"), col("v"), col("id")).as[(String, Double, Long)]
      .groupByKey(_._1)
      .mapValues(t => (t._2, t._3, ""))
      .agg(TopKAggregator.topK(k).toColumn)
      .flatMap { case (g, items) => items.map(e => (g, e._1, e._2)) }
      .toDF("g", "v", "id")
  }

  test("aggregator equals the window form, including ties, under " +
    "any partitioning") {
    import spark.implicits._
    // values with deliberate duplicates so tiebreaks matter
    val rows = (1L to 500L).map(i =>
      (s"g${i % 7}", (i % 13).toDouble, i))
    for (parts <- Seq(1, 4, 13)) {
      val df = rows.toDF("g", "v", "id").repartition(parts)
      val a = aggTopK(df, 5)
      val w = windowTopK(df, 5)
      assert(a.except(w).isEmpty && w.except(a).isEmpty,
        s"mismatch at $parts partitions")
    }
  }

  test("groups smaller than k return all their rows in order") {
    import spark.implicits._
    val df = Seq(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L))
      .toDF("g", "v", "id")
    val got = aggTopK(df, 10).as[(String, Double, Long)].collect().toSet
    assert(got == Set(("a", 1.0, 1L), ("a", 2.0, 2L), ("b", 9.0, 3L)))
  }

  test("partial buffers are k-bounded (the map-side reduction claim)") {
    val buf = (1 to 100).foldLeft(List.empty[TopKAggregator.Elem]) {
      (b, i) => TopKAggregator.topK(3) match {
        case a => a.reduce(b, (i.toDouble, i.toLong, ""))
      }
    }
    assert(buf.length == 3, s"buffer grew past k: ${buf.length}")
    assert(buf.map(_._1) == List(98.0, 99.0, 100.0),
      "buffer must keep the k strongest, weakest-first")
  }
}
