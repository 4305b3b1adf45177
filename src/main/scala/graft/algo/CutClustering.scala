package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** CutClustering (`community/CutClustering.cpp:16-80`, Flake-Tarjan cut
  * clustering): augment the graph with a sink `t` connected to every node
  * by an edge of weight `alpha`; walk nodes in descending degree order
  * (ties by ascending id — the reference's stable bucket sort); for each
  * node not yet clustered, the source side of a minimum u-t cut becomes
  * u's cluster, overwriting any previous labels it absorbs.
  *
  * The reference declares exactly this loop over its sequential
  * Edmonds-Karp; here each cut is one distributed [[Flow.maxFlow]] run
  * (synchronous push-relabel — same optimum, see Flow's scaladoc), and
  * the loop is control-plane only: one 1-row collect per cluster
  * representative picks the next unclustered node. The number of flow
  * runs equals the number of cluster representatives, NOT n — the nesting
  * property (a clustered node's source side stays inside its cluster)
  * means every run either founds a cluster or absorbs smaller ones, and
  * the descending-degree order makes big clusters found first. The node
  * universe is the edge table's endpoints (isolated nodes have no edges
  * to cut — the reference labels each a singleton, which callers get by
  * unioning their id as its own label).
  *
  * `maxClusters` bounds the driver loop and fails loudly (the GCE
  * contract): at web scale a fine-grained alpha would found millions of
  * clusters and this operator — sequential in the reference too — is the
  * wrong tool; pick alpha from the cluster-hierarchy regime instead.
  */
object CutClustering {

  def run(spark: SparkSession, edges: DataFrame, alpha: Double,
          maxClusters: Int = 256, flowMaxRounds: Int = 10000): DataFrame = {
    require(alpha > 0, "alpha must be positive")
    val canon = GraphOps.canonicalize(edges.where(col("src") =!= col("dst")))
      .transform(Materialize.checkpoint)
    val deg = GraphOps.degrees(GraphOps.symmetrize(canon))
    val sink = GraphOps.nodes(canon).agg(max("id")).head().getLong(0) + 1L
    val aug = canon.unionByName(
      GraphOps.nodes(canon).select(col("id").as("src"),
        lit(sink).as("dst"), lit(alpha).as("weight")))

    // degree-0 nodes of the INPUT universe never appear in canon; callers
    // pass an edge table, so the universe is canon's nodes (all degree>=1)
    var labels = deg.select(col("id"), col("degree"),
        lit(null).cast("long").as("label"))
      .transform(Materialize.checkpoint)
    var reps = 0
    var next = labels.where(col("label").isNull)
      .orderBy(desc("degree"), asc("id")).limit(1).collect()
    while (next.nonEmpty) {
      reps += 1
      require(reps <= maxClusters,
        s"CutClustering: more than $maxClusters clusters; this operator " +
          "is one distributed max-flow per cluster (sequential in the " +
          "reference too) - raise maxClusters or use PLM/PLP at this alpha")
      val u = next.head.getLong(0)
      val side = Flow.maxFlow(spark, aug, u, sink, flowMaxRounds).sourceSide
      val relab = labels
        .join(side.select(col("id"), lit(1).as("hit")), Seq("id"), "left")
        .select(col("id"), col("degree"),
          when(col("hit").isNotNull, lit(u)).otherwise(col("label"))
            .as("label"))
        .transform(Materialize.checkpoint)
      Materialize.free(labels)
      labels = relab
      next = labels.where(col("label").isNull)
        .orderBy(desc("degree"), asc("id")).limit(1).collect()
    }
    labels.select(col("id"), col("label"))
  }
}
