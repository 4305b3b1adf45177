package org.apache.spark.rdd.graftshim

import org.apache.spark.rdd.RDD

/** Private-API shim (package-placed for `private[spark]` access, same
  * technique as [[org.apache.spark.sql.graftshim.StatsReset]]): exposes
  * whether a cached RDD is a localCheckpoint generation, so Bench can free
  * leftover iteration states between queries without touching DataFrame
  * caches.
  */
object RddIntrospect {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
