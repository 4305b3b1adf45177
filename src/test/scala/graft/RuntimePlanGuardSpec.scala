package graft

import org.apache.spark.sql.execution.{QueryExecution, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Runtime complement of [[PlanGuardSpec]]: the static walk excludes every
  * loop-running query (constructing one executes its convergence loop), so
  * a scale-killer INSIDE an iteration body could hide from it — and the
  * benign bounded global windows (DenseId `_pid` offsets, event timelines)
  * are indistinguishable from a real single-task window in the driver logs.
  * This spec registers a QueryExecutionListener during one bounded run of
  * each iterative operator and asserts over every EXECUTED plan:
  *
  *  - no CartesianProduct / BroadcastNestedLoopJoin whose inputs exceed a
  *    handful of rows (single-row scalar-aggregate combines are sanctioned);
  *  - no partition-less WindowExec above a bounded row count — the
  *    engine's sanctioned global windows all carry ≤ #partitions or
  *    #timestep rows, while a node- or edge-scale single-task window on the
  *    20k-node fixture trips the threshold immediately.
  */
class RuntimePlanGuardSpec extends SparkTestBase {

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p +: p.children.flatMap(collectAll)
    p match {
      case a: AdaptiveSparkPlanExec => here ++ collectAll(a.executedPlan)
      case _ => here ++ p.subqueries.flatMap(collectAll)
    }
  }

  /** numOutputRows of `p`, falling back down the child chain (WindowExec and
    * SortExec don't publish the metric themselves).
    */
  private def outputRows(p: SparkPlan): Long =
    p.metrics.get("numOutputRows").map(_.value)
      .getOrElse(p.children.headOption.map(outputRows).getOrElse(0L))

  private val maxGlobalWindowRows = 1000L
  private val maxScalarJoinRows = 64L

  test("iterative bodies: no cartesian joins, no unbounded global windows") {
    val offenders = scala.collection.mutable.Buffer.empty[String]
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit = {
        collectAll(qe.executedPlan).foreach {
          case j: CartesianProductExec
              if j.children.exists(outputRows(_) > maxScalarJoinRows) =>
            offenders.synchronized {
              offenders += s"CartesianProduct over >$maxScalarJoinRows rows ($funcName)"
            }
          case j: BroadcastNestedLoopJoinExec
              if j.children.exists(outputRows(_) > maxScalarJoinRows) =>
            offenders.synchronized {
              offenders += s"BroadcastNestedLoopJoin over >$maxScalarJoinRows rows ($funcName)"
            }
          case w: WindowExec if w.partitionSpec.isEmpty &&
              outputRows(w) > maxGlobalWindowRows =>
            offenders.synchronized {
              offenders += s"partition-less WindowExec with ${outputRows(w)} rows ($funcName)"
            }
          case _ => ()
        }
      }
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }

    val edges = graft.ingest.PageGen
      .edges(spark, 20000L, seed = 11, numPartitions = 4)
      .persist()
    edges.count()
    val nodes = graft.core.GraphOps.nodes(edges).persist()
    nodes.count()

    spark.listenerManager.register(listener)
    try {
      import graft.algo._
      val s = spark
      import s.implicits._
      PageRank.run(spark, edges, nodes, PageRank.Config(tol = 0.0, maxIter = 2))
        .scores.agg(sum("score")).head()
      PLP.run(spark, edges, cfg = PLP.Config(maxIter = 2)).labels.count()
      Centrality.coreDecomposition(spark, edges).agg(max("coreness")).head()
      StronglyConnectedComponents.run(spark, edges, maxOuter = 1).count()
      SSSP.bfs(spark, edges, Seq(0L).toDF("id"), maxDepth = 3).count()
      PLM.run(spark, edges, PLM.Config(maxMovePasses = 2, maxLevels = 1))
        .labels.count()
      // round-4 iterative additions, bounded: UMSF weight-group loop,
      // CG Laplacian solve, push-relabel rounds, kPath walk steps
      val tied = graft.core.GraphOps.canonicalizeUnweighted(
          edges.where(col("src") =!= col("dst")))
        .withColumn("weight",
          pmod(xxhash64(col("src"), col("dst")), lit(3L)).cast("double") + 1)
      SpanningForest.unionMaximumSpanningForest(spark, tied, maxLevels = 8)
        .count()
      Resistance.pairResistance(spark, tied,
        Seq((0L, 1L)).toDF("u", "v"), maxIter = 4).count()
      Flow.maxFlow(spark, edgeDF(Seq((0L, 1L, 2.0), (1L, 2L, 1.0),
        (0L, 3L, 1.0), (3L, 2L, 3.0))), 0L, 2L)
      Centrality.kPath(spark, edges, k = 3, samples = 64).count()
    } finally {
      org.apache.spark.graftshim.ListenerDrain.drain(spark.sparkContext)
      spark.listenerManager.unregister(listener)
      edges.unpersist(blocking = false)
      nodes.unpersist(blocking = false)
    }
    assert(offenders.isEmpty, offenders.distinct.mkString("\n"))
  }
}
