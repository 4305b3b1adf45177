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

  /** Lazy variant: truncates the logical plan to a flat `LogicalRDD` NOW
    * (so composing k hops inside one job keeps per-hop planning O(1)
    * instead of doubling the tree per hop) but runs no job — the RDD
    * materializes, caches, and drops its lineage when the first downstream
    * action touches it. Use for intermediate states inside a multi-hop
    * unrolled job; `free` it once the enclosing job has completed.
    */
  def checkpointLazy(df: DataFrame): DataFrame =
    org.apache.spark.sql.graftshim.StatsReset.stripOriginStats(
      df.localCheckpoint(false))

  /** Free the block-manager copy behind a checkpointed DataFrame. */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
