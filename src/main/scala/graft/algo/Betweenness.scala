package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** Sampled betweenness centrality — Brandes' algorithm
  * (`centrality/Betweenness.cpp`, sampled variant `ApproxBetweenness2.cpp`:
  * run Brandes from a source sample, scale by n/|S|) re-shaped for Spark:
  * ALL sampled sources advance together through the same frontier jobs
  * (batching amortizes per-level job overhead), and the dependency
  * accumulation runs level-synchronously backwards over the BFS DAG —
  * per level one join + one aggregation, no per-node recursion.
  *
  * Forward: level-synchronous BFS accumulating shortest-path counts
  * `sigma(s,v)` (sum over predecessor sigmas). Backward: for levels
  * d = depth..1, `delta(v) += Σ_{w: succ} sigma(v)/sigma(w)·(1+delta(w))`.
  * Betweenness(v) = Σ_s delta(s,v), halved for undirected graphs, scaled
  * by n/|S| when sampling.
  */
object Betweenness {

  /** Brandes from a deterministic hash-chosen source sample
    * (`ApproxBetweenness2.cpp` shape).
    */
  def sampled(spark: SparkSession, edges: DataFrame, nSources: Int,
              seed: Long = 42, directed: Boolean = false,
              maxDepth: Int = 100, normalized: Boolean = false): DataFrame = {
    val nodes = GraphOps.nodes(edges.where(col("src") =!= col("dst"))
      .select("src", "dst").withColumn("weight", lit(1.0)))
    val sources = nodes
      .orderBy(xxhash64(col("id"), lit(seed)), col("id"))
      .limit(nSources)
      .select("id")
    forSources(spark, edges, sources, directed, maxDepth, normalized,
      scaleToFullGraph = true)
  }

  /** Brandes from an explicit source set; `scaleToFullGraph` multiplies the
    * dependency sums by n/|S| (the sampling estimator).
    */
  def forSources(spark: SparkSession, edges: DataFrame, sourceIds: DataFrame,
                 directed: Boolean = false, maxDepth: Int = 100,
                 normalized: Boolean = false,
                 scaleToFullGraph: Boolean = true): DataFrame = {
    val base = edges.where(col("src") =!= col("dst"))
    val adj = (if (directed) base.select("src", "dst").distinct()
      else GraphOps.symmetrize(GraphOps.canonicalizeUnweighted(base))
        .select("src", "dst"))
      .transform(Materialize.checkpoint)
    val nodes = GraphOps.nodes(base.select("src", "dst")
      .withColumn("weight", lit(1.0)))
    val n = nodes.count()
    val nSources = sourceIds.count()
    val sources = sourceIds.select(col("id").as("source"))

    // ---- forward: (source, id, dist, sigma) --------------------------
    var frontier = sources.select(col("source"), col("source").as("id"),
      lit(0).as("dist"), lit(1.0).as("sigma"))
      .transform(Materialize.checkpoint)
    var paths = frontier
    var depth = 0
    while (frontier.take(1).nonEmpty && depth < maxDepth) {
      depth += 1
      val expanded = adj
        .join(frontier.select(col("source"), col("id").as("src"), col("sigma")), "src")
        .groupBy(col("source"), col("dst").as("id"))
        .agg(sum("sigma").as("sigma"))
      frontier = expanded
        .join(paths.select("source", "id"), Seq("source", "id"), "left_anti")
        .withColumn("dist", lit(depth))
        .select("source", "id", "dist", "sigma")
        .transform(Materialize.checkpoint)
      if (frontier.take(1).nonEmpty)
        paths = paths.unionByName(frontier).transform(Materialize.checkpoint)
    }

    // ---- backward: level-synchronous dependency accumulation ---------
    val maxLevel = paths.agg(max("dist")).head().getInt(0)
    // delta per (source, id); start all-zero implicitly (left joins)
    var delta = paths.select(col("source"), col("id"), lit(0.0).as("delta"))
      .transform(Materialize.checkpoint)
    var level = maxLevel
    while (level >= 1) {
      val wNodes = paths.where(col("dist") === level)
        .join(delta, Seq("source", "id"))
        .select(col("source"), col("id").as("w"), col("sigma").as("sigw"),
          col("delta").as("deltaw"))
      val vNodes = paths.where(col("dist") === level - 1)
        .select(col("source"), col("id").as("v"), col("sigma").as("sigv"))
      // predecessor pairs: edge v→w with dist(v)=level-1, dist(w)=level
      val contrib = adj.select(col("src").as("v"), col("dst").as("w"))
        .join(wNodes, "w")
        .join(vNodes, Seq("source", "v"))
        .groupBy(col("source"), col("v").as("id"))
        .agg(sum(col("sigv") / col("sigw") * (col("deltaw") + 1.0)).as("add"))
      delta = delta.join(contrib, Seq("source", "id"), "left")
        .select(col("source"), col("id"),
          (col("delta") + coalesce(col("add"), lit(0.0))).as("delta"))
        .transform(Materialize.checkpoint)
      level -= 1
    }

    val scale0 = if (directed) 1.0 else 2.0
    val sampleScale =
      if (scaleToFullGraph) n.toDouble / math.min(nSources, n).toDouble
      else 1.0
    val raw = delta.where(col("source") =!= col("id"))
      .groupBy("id").agg((sum("delta") / scale0 * sampleScale).as("score"))
    val full = nodes.join(raw, Seq("id"), "left")
      .select(col("id"), coalesce(col("score"), lit(0.0)).as("score"))
    if (!normalized) full
    else full.select(col("id"),
      (col("score") / ((n - 1.0) * (n - 2.0) / (if (directed) 1.0 else 2.0)))
        .as("score"))
  }
}
