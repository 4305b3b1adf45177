package graft.core

import org.apache.spark.sql.DataFrame

/** The one sanctioned way to materialize iteration state: eager
  * localCheckpoint (flat `LogicalRDD` plan, data pinned in the block
  * manager) + origin-stats strip (see
  * `org.apache.spark.sql.graftshim.StatsReset` — without the strip,
  * per-iteration size statistics compound multiplicatively and join
  * planning cost explodes after a few iterations).
  */
object Materialize {

  def checkpoint(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.StatsReset.stripOriginStats(
      df.localCheckpoint(true))

  /** Free the block-manager copy behind a checkpointed DataFrame. */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
