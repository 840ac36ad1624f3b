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

  /** The salt column as applied to the skewed side — exposed so tests
    * pin the implementation's own derivation, not a copy of it.
    *
    * A per-row ordinal (monotonically_increasing_id) rather than a
    * row-content hash: content hashing gives *identical* rows
    * identical salts, which re-collapses exactly the duplicate-heavy
    * hot keys the salt exists to spread — and it breaks on MapType
    * columns. The ordinal varies across runs, but salt values never
    * reach the output (dropped after the join), so result equality
    * with the plain join is unconditional.
    */
  def withSalt(skewed: DataFrame, salts: Int): DataFrame =
    skewed.withColumn("__graft_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))

  def saltedEquiJoin(skewed: DataFrame, dim: DataFrame,
                     keys: Seq[String], salts: Int): DataFrame = {
    require(salts > 0)
    val explodedDim = dim.withColumn("__graft_salt",
      explode(array((0 until salts).map(s => lit(s.toLong)): _*)))
    withSalt(skewed, salts).join(explodedDim, keys :+ "__graft_salt")
      .drop("__graft_salt")
  }
}
