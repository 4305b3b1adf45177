package org.apache.spark.sql.graftshim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => CDataset, SparkSession => CSparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** Private-API shim (hence the org.apache.spark.sql subpackage — same
  * technique as other Spark extensions; no Spark internals are modified).
  *
  * `Dataset.localCheckpoint(eager = true)` produces a `LogicalRDD` that
  * CARRIES the origin plan's `Statistics`. For iterative dataflows that is
  * poison: the size-only stats estimator multiplies child sizes across
  * joins, each iteration's estimate therefore multiplies the previous
  * iteration's (already inflated) estimate, and after a handful of
  * iterations `sizeInBytes` is a BigInteger millions of bits wide — join
  * planning then spends minutes inside BigInteger.multiply (observed before
  * this fix: a 200-node PLM run stuck >20 min in Toom-Cook multiplication).
  *
  * The fix: rebuild the checkpointed leaf with `originStats = None`, so it
  * falls back to `spark.sql.defaultSizeInBytes` like any opaque relation.
  */
object StatsReset {

  def stripOriginStats(df: DataFrame): DataFrame =
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        val session = df.sparkSession.asInstanceOf[CSparkSession]
        val clean = new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
          l.outputOrdering, l.isStreaming, l.stream)(session, None, None)
        CDataset.ofRows(session, clean)
      case _ => df
    }
}
