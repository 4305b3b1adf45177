package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.GraphOps
import graft.iterate.{IterConfig, IterationDriver}

/** Shortest-path operators (SURVEY.md §2.8): distributed frontier BFS and
  * Bellman-Ford-style weighted SSSP — the Spark counterparts of the
  * reference's `graph/BFS.cpp` / `Dijkstra.cpp` (priority queues don't
  * distribute; iterative relaxation does).
  */
object SSSP {

  /** Relax-round unroll factor for the fused weighted-SSSP loop;
    * env-overridable for A/B and plain-loop-fallback debugging
    * (`SPARK_GRAFT_SSSP_UNROLL=1`), mirroring SPARK_GRAFT_PR_UNROLL.
    */
  val defaultUnroll: Int =
    graft.iterate.IterationDriver.envUnroll("SPARK_GRAFT_SSSP_UNROLL", 4)

  /** Multi-source BFS: `sources(id)` → `(source, id, dist)` hop counts for
    * all reachable nodes. One frontier join per level; all sources advance
    * in the same jobs (batching amortizes per-iteration overhead — this is
    * how APSP/diameter-ish workloads should run on Spark, not n separate
    * BFS jobs).
    */
  def bfs(spark: SparkSession, edges: DataFrame, sources: DataFrame,
          directed: Boolean = false, maxDepth: Int = 1000,
          compactEvery: Int = 8, prebuiltAdj: Boolean = false): DataFrame = {
    // `prebuiltAdj`: the caller hands an adjacency table that is ALREADY in
    // traversal orientation (symmetric for undirected graphs), already
    // src-partitioned + sorted + persisted, and owns its lifecycle. Callers
    // that run several BFS passes over one graph (Diameter: pivot pass,
    // double sweep, every fringe batch) build that cache ONCE instead of
    // paying a re-symmetrize (which would double an already-symmetric
    // table) plus a full shuffle + sort + cache build per call.
    val adj =
      if (prebuiltAdj) edges.select("src", "dst")
      else {
        val adj0 = if (directed) edges else GraphOps.symmetrize(edges)
        // src-partitioned once: per-level frontier joins reshuffle only the
        // frontier, never the cached edge table
        // sorted within partitions: InMemoryRelation preserves
        // outputOrdering, so the per-level sort-merge frontier join skips
        // re-sorting the cached edge side (multi-source frontiers aren't
        // node-bounded, so these joins stay SMJ — the sort was paid once
        // per LEVEL otherwise)
        adj0.select("src", "dst").repartition(col("src"))
          .sortWithinPartitions("src")
          .persist(StorageLevel.MEMORY_AND_DISK)
      }

    // Frontier-accumulating loop: only the CURRENT level materializes per
    // sweep; settled levels stay as already-checkpointed leaves and the
    // visited set used by the dedup anti-join is their plain union. The
    // alternative — carrying one (source,id,dist,frontier) state table and
    // rewriting it every level — re-materializes O(reached) rows × O(depth)
    // times, which dominated multi-source runs (diameter fringe batches).
    // The leaf list is COMPACTED into one checkpointed `settled` table
    // every `compactEvery` levels: web-diameter runs (~20 levels) behave as
    // before, while high-diameter graphs (chains, meshes) keep the per-level
    // union plan at ≤ compactEvery+1 leaves instead of O(depth) — the
    // amortized rewrite is O(reached/compactEvery) rows per level.
    var frontier = sources.select(col("id").as("source"), col("id"),
      lit(0L).as("dist")).transform(graft.core.Materialize.checkpoint)
    var settled = frontier // compacted prefix of finished levels
    val recent = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    // the live frontier at compaction time: its DATA is merged into
    // `settled`, but the next level's expansion join still reads the old
    // checkpoint — freeing it there races the join (observed
    // CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND), so the free is deferred until the
    // next frontier has materialized
    var pendingFree: Option[DataFrame] = None
    var fSize = frontier.count()
    var depth = 0
    while (fSize > 0 && depth < maxDepth) {
      depth += 1
      val visited = (settled +: recent.toSeq)
        .map(_.select("source", "id")).reduce(_ unionByName _)
      val expanded = adj.join(frontier.select(col("source"),
          col("id").as("src"), col("dist")), "src")
        .select(col("source"), col("dst").as("id"), (col("dist") + 1).as("dist"))
        .groupBy("source", "id").agg(min("dist").as("dist"))
      frontier = expanded.join(visited, Seq("source", "id"), "left_anti")
        .transform(graft.core.Materialize.checkpoint)
      fSize = frontier.count()
      pendingFree.foreach(graft.core.Materialize.free)
      pendingFree = None
      if (fSize > 0) recent += frontier
      if (recent.length >= compactEvery) {
        val newSettled = (settled +: recent.toSeq)
          .map(_.select("source", "id", "dist")).reduce(_ unionByName _)
          .transform(graft.core.Materialize.checkpoint)
        graft.core.Materialize.free(settled)
        recent.dropRight(1).foreach(graft.core.Materialize.free)
        pendingFree = Some(recent.last)
        recent.clear()
        settled = newSettled
      }
    }
    if (!prebuiltAdj) adj.unpersist()
    pendingFree.foreach(graft.core.Materialize.free)
    (settled +: recent.toSeq).map(_.select("source", "id", "dist"))
      .reduce(_ unionByName _)
  }

  /** Weighted SSSP via iterative relaxation (Bellman-Ford / the hash-min
    * family): dist'[v] = min(dist[v], min over in-edges dist[u]+w).
    * Converges in ≤ diameter iterations on non-negative weights.
    */
  def weighted(spark: SparkSession, edges: DataFrame, source: Long,
               directed: Boolean = false, maxIter: Int = 1000,
               unroll: Int = SSSP.defaultUnroll): DataFrame = {
    val adj0 = if (directed) edges else GraphOps.symmetrize(edges)
    val adj = adj0.repartition(col("src")).sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val init = GraphOps.nodes(adj)
      .select(col("id"),
        when(col("id") === source, 0.0).otherwise(Double.PositiveInfinity).as("dist"),
        (col("id") === source).as("changed"))

    def step(state: DataFrame, iter: Int): DataFrame = {
      val frontier = state.where(col("changed"))
        .select(col("id").as("src"), col("dist"))
      val relax = adj.join(frontier, "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("dist") + col("weight")).as("prop"))
      state.select("id", "dist").join(relax, Seq("id"), "left")
        .select(col("id"),
          least(col("dist"), coalesce(col("prop"), col("dist"))).as("dist"),
          (col("prop").isNotNull && col("prop") < col("dist")).as("changed"))
    }

    // next-only metric → fused unrolled driver (IterationDriver.runFused):
    // relax rounds compose into one chain job with a single metric read.
    // Weighted SSSP's worst case is exactly where this pays most — a
    // high-diameter graph needs one relax round per hop, and the plain
    // loop's 2 driver round-trips per round are the dominant fixed cost.
    def changedAgg(next: DataFrame): DataFrame =
      next.agg(sum(when(col("changed"), 1L).otherwise(0L)).as("m"))

    val res = IterationDriver.runFused(spark, init, step, changedAgg,
      IterConfig(tol = 0.0, maxIter = maxIter), unroll = unroll)
    adj.unpersist()
    res.state.where(!col("dist").isNaN && col("dist") =!= Double.PositiveInfinity)
      .select("id", "dist")
  }

  /** Eccentricity of the given sources (max BFS distance), and from it the
    * exact diameter when `sources` = all nodes (`distance/Diameter.cpp`
    * exact path — at scale use a sampled source set).
    */
  def eccentricity(spark: SparkSession, edges: DataFrame,
                   sources: DataFrame, maxDepth: Int = 1000): DataFrame =
    bfs(spark, edges, sources, maxDepth = maxDepth)
      .groupBy(col("source").as("id")).agg(max("dist").as("eccentricity"))

  /** APSP (`distance/APSP.cpp` surface): all-pairs hop distances — the
    * batched multi-source BFS with every node a source. Θ(n·m) work and an
    * n²-row result by definition; at web scale use [[bfs]] with a
    * restricted source set (the reference's APSP is likewise an all-source
    * convenience over per-source traversals, not a smarter algorithm).
    */
  def apsp(spark: SparkSession, edges: DataFrame,
           directed: Boolean = false): DataFrame =
    bfs(spark, edges, GraphOps.nodes(edges).select("id"), directed)
      .select("source", "id", "dist")
}

/** Graph contraction by partition (`coarsening/ParallelPartitionCoarsening
  * .cpp:20-70`): supernode per community; parallel edges merge by weight
  * sum; intra-community edges become self-loops. Pure relational — the
  * exact op PLM/PLP-style multilevel algorithms share.
  */
object Coarsening {
  def byPartition(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.withColumnRenamed("id", "src")
        .withColumnRenamed("label", "csrc"), "src")
      .join(labels.withColumnRenamed("id", "dst")
        .withColumnRenamed("label", "cdst"), "dst")
      .select(least(col("csrc"), col("cdst")).as("src"),
        greatest(col("csrc"), col("cdst")).as("dst"), col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))
}
