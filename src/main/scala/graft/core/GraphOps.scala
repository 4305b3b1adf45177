package graft.core

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical edge row of the one universal graph table.
  *
  * Mirrors the reference data model (`networkit/cpp/graph/Graph.h:79`:
  * adjacency-list store over dense uint64 node ids with double weights,
  * `Globals.h:20-29`) re-expressed as a columnar edge relation — the natural
  * Spark-native representation: all graph algorithms below are joins and
  * aggregations over this table.
  */
case class Edge(src: Long, dst: Long, weight: Double)

/** Graph-level flags (reference: `Graph.h:97-98` `weighted`, `directed`). */
case class GraphMeta(weighted: Boolean, directed: Boolean)

/** Core graph construction / transform / stats operators ("DDL/DML" of the
  * engine). Every function is a pure DataFrame → DataFrame mapping so
  * Catalyst sees the whole plan (predicate pushdown, column pruning, AQE).
  *
  * Column conventions: edge tables are `(src BIGINT, dst BIGINT, weight
  * DOUBLE)`; node state tables are `(id BIGINT, <value>)`.
  */
object GraphOps {

  /** Per-partition build-slice size (rows) below which a node-sized join
    * side in an iterative loop is hinted `shuffle_hash`. Both loop-join
    * sides are co-partitioned on the join key by construction, so
    * sort-merge's only contribution is a re-sort of both sides every sweep
    * — but the hash alternative builds a per-partition map every sweep,
    * and which wins depends on the slice size. Measured (2M-node / 9.66M-
    * edge PageRank): at 64 partitions (31k rows ≈ 0.7 MB map, cache-
    * resident) hash wins 16%; at 2-8 partitions (0.25-1M rows ≈ 6-24 MB
    * map) the per-sweep build churns the heap and LOSES 15-25% with 3×
    * the run-to-run variance. 2^17 rows ≈ 3 MB of map — comfortably
    * L3-resident — splits the two regimes; production partition counts put
    * node-state slices far below it.
    */
  val hashBuildMaxSliceRows: Long = 131072L

  /** Hint `df` as a shuffle-hash build side iff its ~`rows`/`parts` slice
    * is small enough that the per-sweep hash map stays cache-friendly
    * (see [[hashBuildMaxSliceRows]]); otherwise leave the planner's
    * sort-merge choice.
    */
  def hashBuildHint(df: DataFrame, rows: Long, parts: Int): DataFrame =
    if (parts > 0 && rows / parts <= hashBuildMaxSliceRows)
      df.hint("shuffle_hash")
    else df

  /** Symmetrized directed view of an undirected graph: every stored edge
    * {u,v} appears as both (u,v) and (v,u), matching the reference's
    * double-stored undirected adjacency (`Graph.cpp:596-647` addEdge inserts
    * into both endpoints' vectors). Self-loops are kept once (stored once in
    * the reference, `Graph.cpp:625`).
    */
  def symmetrize(edges: DataFrame): DataFrame = {
    val fwd = edges.select(col("src"), col("dst"), col("weight"))
    val rev = edges.where(col("src") =!= col("dst"))
      .select(col("dst").as("src"), col("src").as("dst"), col("weight"))
    fwd.unionByName(rev)
  }

  /** Canonical undirected edge list: one row per undirected edge with
    * `src <= dst` (the reference's `u >= v` visit-once guard,
    * `Graph.h:172-179`), duplicates collapsed by summing weight.
    */
  def canonicalize(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"),
      col("weight"))
      .groupBy("src", "dst").agg(sum("weight").as("weight"))

  /** Distinct canonical undirected edges, weight forced to 1.0
    * (`toUnweighted`, reference `Graph.h:485-551`).
    */
  def canonicalizeUnweighted(edges: DataFrame): DataFrame =
    edges.select(
      least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))

  /** Directed reverse (`transpose`; the reference keeps an `inEdges` mirror,
    * `Graph.h:108` — here it is a projection, not a copy).
    */
  def transpose(edges: DataFrame): DataFrame =
    edges.select(col("dst").as("src"), col("src").as("dst"), col("weight"))

  /** All node ids that occur in the edge table. */
  def nodes(edges: DataFrame): DataFrame =
    edges.select(col("src").as("id"))
      .unionByName(edges.select(col("dst").as("id")))
      .distinct()

  /** Out-degree per node (reference `Graph.h:567` degree / degreeOut).
    * For undirected semantics pass the symmetrized view.
    */
  def degrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("degree"))

  /** Weighted out-degree (`Graph.cpp:532-541`: self-loop weight counted
    * once). Pass the symmetrized view for undirected graphs.
    */
  def weightedDegrees(edges: DataFrame): DataFrame =
    edges.groupBy(col("src").as("id")).agg(sum("weight").as("wdegree"))

  /** Induced subgraph on a node set (`Graph.cpp:991` subgraphFromNodes):
    * keep edges whose BOTH endpoints are in `keep(id)`. Two semi-joins —
    * Catalyst broadcasts `keep` when small.
    */
  def subgraph(edges: DataFrame, keep: DataFrame): DataFrame =
    edges
      .join(keep.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(keep.select(col("id").as("dst")), Seq("dst"), "left_semi")
      .select("src", "dst", "weight")

  /** Remove self-loops (`Graph.h:644` removeSelfLoops). */
  def removeSelfLoops(edges: DataFrame): DataFrame =
    edges.where(col("src") =!= col("dst"))

  /** swapEdge (`Graph.h:661`, `Graph.cpp` swapEdge): rewire the edges
    * {s1,t1} and {s2,t2} into {s1,t2} and {s2,t1} — the degree-preserving
    * double-edge swap. Batched: `swaps` is a table of `(s1,t1,s2,t2)` rows
    * applied in one pass (one anti-join + two equi-joins; no per-swap
    * driver round-trips). Each rewired edge keeps the weight of the
    * half-edge whose SOURCE it preserves, matching the reference's
    * in-place target overwrite of the adjacency slot. Contract (same as
    * the reference, which indexes straight into the adjacency arrays):
    * every removed (s_i,t_i) pair must exist in `edges` with the exact
    * row orientation given, and the removed pairs must be pairwise
    * distinct across the batch.
    */
  def swapEdges(edges: DataFrame, swaps: DataFrame): DataFrame = {
    val removed = swaps.select(col("s1").as("src"), col("t1").as("dst"))
      .unionByName(swaps.select(col("s2").as("src"), col("t2").as("dst")))
    val kept = edges.join(removed, Seq("src", "dst"), "left_anti")
    val e1 = edges.select(col("src").as("s1"), col("dst").as("t1"),
      col("weight"))
    val e2 = edges.select(col("src").as("s2"), col("dst").as("t2"),
      col("weight"))
    val n1 = swaps.join(e1, Seq("s1", "t1"))
      .select(col("s1").as("src"), col("t2").as("dst"), col("weight"))
    val n2 = swaps.join(e2, Seq("s2", "t2"))
      .select(col("s2").as("src"), col("t1").as("dst"), col("weight"))
    kept.unionByName(n1).unionByName(n2)
  }

  /** Graph scalar stats in one aggregate pass: n, m, self-loops, total edge
    * weight, density (reference accessors `Graph.h:567-745`,
    * `numberOfSelfLoops` `Graph.cpp:859`). `edges` must be the canonical
    * (visit-once) undirected table or the directed table.
    */
  def stats(edges: DataFrame, directed: Boolean): DataFrame = {
    val n = nodes(edges).agg(count(lit(1)).as("n"))
    val m = edges.agg(
      count(lit(1)).as("m"),
      sum(when(col("src") === col("dst"), 1L).otherwise(0L)).as("self_loops"),
      sum("weight").as("total_weight"))
    val pairs =
      if (directed) col("n") * (col("n") - 1)
      else col("n") * (col("n") - 1) / 2
    n.crossJoin(m).select(
      col("n"), col("m"), col("self_loops"), col("total_weight"),
      (col("m").cast("double") / pairs.cast("double")).as("density"))
  }

  /** indexEdges (`Graph.h:403` / `Graph.cpp` indexEdges): assign each
    * canonical undirected edge a dense 0-based BIGINT edge id in (src, dst)
    * order. The reference's edge-score vectors are keyed by these ids; here
    * scores key by the canonical pair internally, and this op materializes
    * the explicit id surface for interop (two-phase range-partitioned
    * assignment — no global window).
    */
  def indexEdges(edges: DataFrame): DataFrame =
    graft.core.DenseId.assign(
      canonicalizeUnweighted(removeSelfLoops(edges)).select("src", "dst"),
      "edge_id", Seq("src", "dst"))
}
