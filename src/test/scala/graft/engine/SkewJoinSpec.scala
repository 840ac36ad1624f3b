package graft.engine

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkTestBase {

  test("salted join equals the plain equi-join on a skewed key") {
    import spark.implicits._
    // 90% of rows share one hot key — the pathological shape
    val skewed = (1 to 5000).map { i =>
      (if (i % 10 == 0) i.toLong % 7 else 0L, s"payload$i")
    }.toDF("k", "v")
    val dim = (0L to 6L).map(k => (k, s"dim$k")).toDF("k", "d")

    val plain = skewed.join(dim, Seq("k"))
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, Seq("k"), salts = 8)
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join spreads the hot key across partitions") {
    import spark.implicits._
    val skewed = (1 to 2000).map(i => (0L, i)).toDF("k", "v")
    val dim = Seq((0L, "d")).toDF("k", "d")
    val salted = SkewJoin.saltedEquiJoin(skewed, dim, Seq("k"), salts = 4)
    // before the final drop, rows of the single hot key carry >1
    // distinct salt, i.e. they hash to >1 reducer
    val saltCount = skewed.withColumn("__graft_salt",
        pmod(xxhash64(skewed.columns.map(col): _*), lit(4)))
      .select(countDistinct(col("__graft_salt"))).first().getLong(0)
    assert(saltCount > 1)
    assert(salted.count() == 2000)
  }
}
