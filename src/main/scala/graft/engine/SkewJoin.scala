package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join utility: salt the skewed (large) side, explode
  * the dimension side across the salt space, join on (keys + salt).
  *
  * AQE's skew-join handles most cases at runtime; explicit salting
  * remains the tool when a single hot key exceeds what AQE's partition
  * splitting can rebalance (splitting a partition doesn't split one
  * key's hash bucket across reducers for a join). Output equals the
  * plain equi-join exactly — the salt is derived from the large side's
  * full row (deterministic), and the dimension replication covers
  * every salt value.
  */
object SkewJoin {

  def saltedEquiJoin(skewed: DataFrame, dim: DataFrame,
                     keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0)
    val saltedLarge = skewed.withColumn("__graft_salt",
      pmod(xxhash64(skewed.columns.map(col): _*), lit(salts)))
    val explodedDim = dim.withColumn("__graft_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    saltedLarge.join(explodedDim, keys :+ "__graft_salt")
      .drop("__graft_salt")
  }
}
