package graft

import org.apache.spark.sql.SparkSession

/** Throwaway dev probe (not part of the library surface): prints the
  * formatted plan and warm timing of the query named in args(0) at the
  * sf dir in args(1).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q01_pricing_summary"
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).count()
      println(f"TIMER $name run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    SparkEntry.queries(name)(spark, d).explain("formatted")
    spark.stop()
  }
}
