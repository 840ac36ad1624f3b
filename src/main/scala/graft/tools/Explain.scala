package graft.tools

/** Plan-audit helper: print the formatted physical plan of named
  * contract queries (`java … graft.tools.Explain <sfDir> <q1,q2,…>`).
  * The dev-loop companion to PlanSpec — PlanSpec pins the plan
  * properties that must hold; this prints the whole plan while
  * iterating on one.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names: Seq[String] =
      if (args.length > 1) args(1).split(',').toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
