package org.apache.spark.sql.graft

import org.apache.spark.sql.classic.SparkSession

/** Test-only bridge into the private[sql] CacheManager: asserts the
  * "operators leak no persisted frames" contract (r11 ADVICE — an
  * operator that `persist()`s an intermediate and returns without
  * unpersisting parks cached partitions in the session's CacheManager
  * for its whole lifetime; `Checkpoints.materialize` storage, by
  * contrast, is RDD-level and reclaimed by the ContextCleaner once the
  * plan is dropped, so it never registers here). */
object CacheProbe {
  /** True iff no Dataset-level persist() registration is live. */
  def noCachedPlans(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.asInstanceOf[SparkSession].sharedState.cacheManager.isEmpty
}
