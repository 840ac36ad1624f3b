package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Idempotent persist for the DESIGNED long-lived shared-subplan
  * caches — the shingle/signature/window tables ([[Dedup.release]]
  * frees them), the exploded-token table ([[TextAnalysis.release]]),
  * the DSIR feature table. These deliberately stay cached across
  * query invocations in a session so repeated queries reuse the
  * materialization; a bare `.persist` on the second invocation then
  * logs `CacheManager: Asked to cache already cached data` — the
  * re-persist is a no-op, but the noise masks a REAL double-cache
  * when one appears. `Dataset.storageLevel` consults the
  * CacheManager by canonical plan, so this is exactly "persist unless
  * this plan is already cached", and the release() plan-rederivation
  * contract is untouched.
  */
private[graft] object SharedCache {
  def persistShared(df: DataFrame): DataFrame =
    if (df.storageLevel == StorageLevel.NONE)
      df.persist(StorageLevel.MEMORY_AND_DISK)
    else df
}
