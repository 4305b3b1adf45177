package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.storage.StorageLevel
import graft.core.GraphOps
import graft.iterate.{IterConfig, IterationDriver}

/** Non-PageRank centralities (SURVEY.md §2.4), all sharing the SpMV
  * join-agg skeleton or plain aggregations.
  */
object Centrality {

  /** Degree centrality (`centrality/DegreeCentrality.cpp`): out-degree per
    * node, optionally normalized by (n-1). Pass the symmetrized view for
    * undirected semantics.
    */
  def degree(spark: SparkSession, edges: DataFrame,
             normalized: Boolean = false): DataFrame = {
    val nodes = GraphOps.nodes(edges)
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
    val joined = nodes.join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
    if (!normalized) joined.withColumnRenamed("d", "score")
    else {
      val n = nodes.count()
      joined.select(col("id"), (col("d") / (n - 1.0)).as("score"))
    }
  }

  /** Eigenvector centrality (`centrality/EigenvectorCentrality.cpp`): power
    * iteration `x' = A·x`, 2-norm normalized each step, L2 stop (tol 1e-9
    * default like the reference).
    */
  def eigenvector(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
                  tol: Double = 1e-9, maxIter: Int = 500): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val adj = edges.select("src", "dst", "weight")
      .repartition(parts, col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val init = nodes.select(col("id"), lit(1.0 / math.sqrt(n.toDouble)).as("score"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      // x'[u] = Σ_{(v,u)} w(v,u)·x[v]  (gather over in-edges)
      val raw = adj.join(state.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("weight") * col("score")).as("s"))
      val full = nodes.join(raw, Seq("id"), "left")
        .select(col("id"), coalesce(col("s"), lit(0.0)).as("s"))
      val norm = math.sqrt(full.agg(sum(col("s") * col("s"))).head().getDouble(0))
      full.select(col("id"), (col("s") / (if (norm == 0.0) 1.0 else norm)).as("score"))
    }

    def l2(prev: DataFrame, next: DataFrame): Double =
      math.sqrt(prev.withColumnRenamed("score", "p").join(next, "id")
        .agg(sum(pow(col("score") - col("p"), 2))).head().getDouble(0))

    val res = IterationDriver.run(spark, init, step, l2,
      IterConfig(tol, maxIter))
    adj.unpersist()
    res.state
  }

  /** Katz centrality (`centrality/KatzCentrality.cpp`): iterate
    * `x' = α·Aᵀx + β` to fixpoint, report L2-normalized scores.
    */
  def katz(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
           alpha: Double = 0.1, beta: Double = 1.0,
           tol: Double = 1e-9, maxIter: Int = 500): DataFrame = {
    val init = nodes.select(col("id"), lit(0.0).as("score"))
    def step(state: DataFrame, iter: Int): DataFrame = {
      val raw = edges.join(state.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("weight") * col("score")).as("s"))
      nodes.join(raw, Seq("id"), "left")
        .select(col("id"),
          (lit(alpha) * coalesce(col("s"), lit(0.0)) + lit(beta)).as("score"))
    }
    def l2(prev: DataFrame, next: DataFrame): Double =
      math.sqrt(prev.withColumnRenamed("score", "p").join(next, "id")
        .agg(sum(pow(col("score") - col("p"), 2))).head().getDouble(0))
    val res = IterationDriver.run(spark, init, step, l2, IterConfig(tol, maxIter))
    val norm = math.sqrt(res.state.agg(sum(col("score") * col("score")))
      .head().getDouble(0))
    res.state.select(col("id"), (col("score") / norm).as("score"))
  }

  /** Ranking surface (`centrality/Centrality.cpp:25-33`): sort desc by
    * score, ties by ascending id; `limit(k)` for top-k.
    */
  def ranking(scores: DataFrame, k: Int = 0): DataFrame = {
    val sorted = scores.orderBy(desc("score"), asc("id"))
    if (k > 0) sorted.limit(k) else sorted
  }

  /** Core decomposition / coreness (`centrality/CoreDecomposition.cpp`,
    * ParK level-synchronous peeling :25-31): iteratively remove nodes of
    * degree ≤ k, assigning them coreness k; k increases when no node is
    * below the threshold. The Spark shape is the classic peel loop —
    * each round is a degree filter + semi-join shrink of the live subgraph.
    */
  def coreDecomposition(spark: SparkSession, edges: DataFrame): DataFrame = {
    val simple = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    // eager localCheckpoint per round: flat plans, one live generation
    // (see IterationDriver on iterative-lineage blowup)
    var live = GraphOps.symmetrize(simple.withColumn("weight", lit(1.0)))
      .select("src", "dst").transform(graft.core.Materialize.checkpoint)
    var liveNodes = GraphOps.nodes(simple.withColumn("weight", lit(1.0)))
      .transform(graft.core.Materialize.checkpoint)
    val results = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 0L
    var remaining = liveNodes.count()
    while (remaining > 0) {
      val deg = live.groupBy(col("src").as("id")).agg(count(lit(1)).as("d"))
      val degAll = liveNodes.join(deg, Seq("id"), "left")
        .select(col("id"), coalesce(col("d"), lit(0L)).as("d"))
      val peel = degAll.where(col("d") <= k).select("id").transform(graft.core.Materialize.checkpoint)
      val nPeel = peel.count()
      if (nPeel == 0) {
        k += 1
      } else {
        results += peel.select(col("id"), lit(k).as("coreness"))
        liveNodes = liveNodes.join(peel, Seq("id"), "left_anti")
          .transform(graft.core.Materialize.checkpoint)
        live = live
          .join(peel.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
          .join(peel.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
          .select("src", "dst").transform(graft.core.Materialize.checkpoint)
        remaining -= nPeel
      }
    }
    results.reduce(_ unionByName _)
  }
}
