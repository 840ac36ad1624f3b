package graft

import org.apache.spark.sql.SparkSession

/** Throwaway probe main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    def t0 = System.nanoTime()
    for (i <- 1 to 3) {
      var t = t0
      val df = SparkEntry.queries("q05_region_revenue")(spark, d)
      println(f"TIMER build$i ${(t0 - t) / 1e9}%.2f")
      t = t0
      df.queryExecution.executedPlan // force analysis+optimization+planning
      println(f"TIMER plan$i  ${(t0 - t) / 1e9}%.2f")
      t = t0
      df.count()
      println(f"TIMER exec$i  ${(t0 - t) / 1e9}%.2f")
    }
    spark.stop()
  }
}
