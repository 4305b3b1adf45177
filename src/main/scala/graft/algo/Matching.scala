package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** Matching primitives (`matching/LocalMaxMatcher.cpp` semantics,
  * determinized) and matching-based coarsening
  * (`coarsening/MatchingCoarsening.cpp`).
  *
  * LocalMaxMatcher: repeatedly add every edge that is the strictly
  * heaviest incident edge at BOTH endpoints (locally dominant — ties
  * broken by a total order on (weight, src, dst), so "strictly" is
  * well-defined), then drop matched nodes and repeat. Each round is two
  * aggregations + one join; power-law graphs converge in O(log n) rounds.
  * The result is a maximal matching with the local-max guarantee (≥ 1/2
  * the maximum weight matching).
  */
object Matching {

  /** Matched pairs `(u, v)` with u < v. */
  def localMax(spark: SparkSession, edges: DataFrame,
               maxIter: Int = 100): DataFrame = {
    var live = GraphOps.canonicalize(edges.where(col("src") =!= col("dst")))
      .transform(Materialize.checkpoint)
    var matched = live.select(col("src").as("u"), col("dst").as("v")).limit(0)
      .transform(Materialize.checkpoint)
    var iter = 0
    var m = live.count()
    while (m > 0 && iter < maxIter) {
      iter += 1
      // total-order key: heaviest first, then (src, dst) for determinism
      val keyed = live.select(col("src"), col("dst"),
        struct(col("weight"), col("src"), col("dst")).as("k"))
      val sym = keyed.select(col("src").as("id"), col("k"))
        .unionByName(keyed.select(col("dst").as("id"), col("k")))
      val best = sym.groupBy("id").agg(max("k").as("bk"))
      val dominant = keyed
        .join(best.select(col("id").as("src"), col("bk").as("bs")), "src")
        .join(best.select(col("id").as("dst"), col("bk").as("bd")), "dst")
        .where(col("k") === col("bs") && col("k") === col("bd"))
        .select(col("src").as("u"), col("dst").as("v"))
        .transform(Materialize.checkpoint)
      matched = matched.unionByName(dominant)
        .transform(Materialize.checkpoint)
      val used = dominant.select(col("u").as("id"))
        .unionByName(dominant.select(col("v").as("id"))).distinct()
      live = live
        .join(used.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(used.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select("src", "dst", "weight")
        .transform(Materialize.checkpoint)
      m = live.count()
    }
    // Maximality (and with it the ≥1/2-optimal weight guarantee) requires
    // the live set to have emptied; a maxIter truncation on adversarial
    // (e.g. weight-monotone path) inputs would silently drop it.
    if (m > 0)
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"Matching.localMax stopped at maxIter=$maxIter with " +
        s"$m live edges — result is a matching but may not be maximal; " +
        "raise maxIter for the 1/2-optimality guarantee")
    matched
  }

  /** Fine→coarse node map from a matching: matched pairs collapse to the
    * pair's min id, unmatched nodes map to themselves (the
    * `MatchingCoarsening.cpp` supernode rule). Returns `(id, coarse)`.
    */
  def coarseMap(nodes: DataFrame, matching: DataFrame): DataFrame = {
    val pairMap = matching.select(col("u").as("id"), col("u").as("coarse"))
      .unionByName(matching.select(col("v").as("id"), col("u").as("coarse")))
    nodes.select("id").join(pairMap, Seq("id"), "left")
      .select(col("id"), coalesce(col("coarse"), col("id")).as("coarse"))
  }

  /** Contract the graph through a matching: one coarsening level of a
    * multilevel stack (`coarsening/MatchingCoarsening.cpp` run()).
    */
  def coarsen(spark: SparkSession, edges: DataFrame,
              matching: DataFrame): DataFrame = {
    val nodes = GraphOps.nodes(edges)
    val fc = coarseMap(nodes, matching)
      .select(col("id"), col("coarse").as("label"))
    Coarsening.byPartition(edges, fc)
  }

  /** ClusteringProjector (`coarsening/ClusteringProjector.cpp`
    * projectBack): lift coarse-graph labels to the fine graph through the
    * fine→coarse map `(id, coarse)`.
    */
  def projectBack(fineToCoarse: DataFrame,
                  coarseLabels: DataFrame): DataFrame =
    fineToCoarse
      .join(coarseLabels.withColumnRenamed("id", "coarse"), "coarse")
      .select(col("id"), col("label"))
}
