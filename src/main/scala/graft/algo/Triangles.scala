package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.GraphOps

/** Triangle counting with degree-ordered edge orientation — the same
  * physical idea as the reference's `TriangleEdgeScore`
  * (`edgescores/TriangleEdgeScore.cpp:18-110`): each undirected edge is
  * oriented from its lower-(degree, id) endpoint to its higher one
  * (the reference's `isOutEdge(u,v) = deg(u)>deg(v) or (deg equal and u<v)`,
  * `:24-26`, mirrored), so every node's oriented out-degree is O(√m) on any
  * graph and the wedge-enumeration fan-out is bounded even on power-law
  * hubs — the degree ordering is exactly what makes the self-join viable at
  * web scale (a hub of degree 10⁷ contributes no wedges as a source; its
  * incident wedges are enumerated from its low-degree neighbors).
  *
  * Plan: one self-join on the oriented table E⁺ (wedges u→v, u→w with
  * (v)<(w) in degree order) + one semi-ish join closing the wedge against
  * E⁺ — each triangle u<v<w (degree order) is found exactly once.
  * Weights are ignored, self-loops dropped, parallel edges collapsed
  * (as the reference's edge-id space implies).
  */
object Triangles {

  /** Oriented edge table E⁺ `(src, dst, sd, dd)` with (deg,id)-order
    * src < dst; degree columns kept for the wedge ordering predicate.
    */
  def oriented(edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      canon.withColumn("weight", lit(1.0))))
    canon
      .join(deg.withColumnRenamed("id", "src").withColumnRenamed("degree", "sdeg"), "src")
      .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("degree", "ddeg"), "dst")
      .select(
        when(ordLt(col("sdeg"), col("src"), col("ddeg"), col("dst")), col("src")).otherwise(col("dst")).as("src"),
        when(ordLt(col("sdeg"), col("src"), col("ddeg"), col("dst")), col("dst")).otherwise(col("src")).as("dst"),
        when(ordLt(col("sdeg"), col("src"), col("ddeg"), col("dst")), col("sdeg")).otherwise(col("ddeg")).as("sd"),
        when(ordLt(col("sdeg"), col("src"), col("ddeg"), col("dst")), col("ddeg")).otherwise(col("sdeg")).as("dd"))
  }

  /** (degA,a) < (degB,b) lexicographically. */
  private def ordLt(da: org.apache.spark.sql.Column, a: org.apache.spark.sql.Column,
                    db: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    (da < db) || (da === db && a < b)

  /** All triangles as `(u, v, w)` node triples in ascending (deg,id) order;
    * each triangle exactly once.
    */
  def triangles(spark: SparkSession, edges: DataFrame): DataFrame = {
    val ep = oriented(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val a = ep.select(col("src").as("u"), col("dst").as("v"),
      col("dd").as("vd"))
    val b = ep.select(col("src").as("u"), col("dst").as("w"),
      col("dd").as("wd"))
    val wedges = a.join(b, Seq("u"))
      .where(ordLt(col("vd"), col("v"), col("wd"), col("w")))
    wedges
      .join(ep.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"),
        "left_semi")
      .select("u", "v", "w")
  }

  /** Global triangle count (reference `ClusteringCoefficient::exactGlobal`
    * numerator, `global/ClusteringCoefficient.cpp:168-218`).
    */
  def globalCount(spark: SparkSession, edges: DataFrame): Long =
    triangles(spark, edges).count()

  /** Per-edge triangle counts keyed by canonical `(src<dst)` node pair —
    * the reference's `TriangleEdgeScore` output (score per edge id); edges
    * in no triangle get count 0.
    */
  def perEdge(spark: SparkSession, edges: DataFrame): DataFrame = {
    val tris = triangles(spark, edges)
    val sides = tris.select(col("u").as("a"), col("v").as("b"))
      .unionByName(tris.select(col("u").as("a"), col("w").as("b")))
      .unionByName(tris.select(col("v").as("a"), col("w").as("b")))
    val counts = sides
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("triangles"))
    GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))
      .select("src", "dst")
      .join(counts, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Per-node triangle counts (each triangle counts once per corner). */
  def perNode(spark: SparkSession, edges: DataFrame): DataFrame = {
    val tris = triangles(spark, edges)
    val corners = tris.select(col("u").as("id"))
      .unionByName(tris.select(col("v").as("id")))
      .unionByName(tris.select(col("w").as("id")))
    val nodes = GraphOps.nodes(edges)
    nodes.join(corners.groupBy("id").agg(count(lit(1)).as("triangles")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Local clustering coefficient `c(u) = 2·tri(u) / (d(u)(d(u)−1))`
    * (`centrality/LocalClusteringCoefficient.cpp:11-90`; self-loops removed,
    * degree from the simple graph). Nodes with degree < 2 get 0.
    */
  def localClusteringCoefficient(spark: SparkSession, edges: DataFrame): DataFrame = {
    val simple = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))
    val deg = GraphOps.degrees(GraphOps.symmetrize(simple))
    perNode(spark, edges).join(deg, Seq("id"), "left")
      .select(col("id"),
        when(coalesce(col("degree"), lit(0L)) >= 2,
          lit(2.0) * col("triangles") / (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** Per-edge quadrangle (4-cycle) counts — the capability of
    * `edgescores/ChibaNishizekiQuadrangleEdgeScore.cpp`: for edge (u,v),
    * the number of 4-cycles u–v–x–w–u, i.e. pairs w∈Γ(u)∖{v}, x∈Γ(v)∖{u}
    * with (w,x) an edge. One 3-hop join over the symmetrized table; run on
    * mid-density graphs (the join volume is Σ_{(w,x)∈E} d(w)·d(x), which a
    * dense hub graph inflates — at scale bound it with degree-ordered
    * orientation like the triangle kernel).
    */
  def quadranglesPerEdge(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    val sym = GraphOps.symmetrize(canon.withColumn("weight", lit(1.0)))
      .select("src", "dst")
    // path u -(e1)- w -(e2)- x -(e3)- v closing edge (u,v)
    val counts = sym.select(col("src").as("u"), col("dst").as("w"))
      .join(sym.select(col("src").as("w"), col("dst").as("x")), "w")
      .join(sym.select(col("src").as("x"), col("dst").as("v")), "x")
      .where(col("w") =!= col("v") && col("x") =!= col("u") && col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("src"),
        greatest(col("u"), col("v")).as("dst"))
      .groupBy("src", "dst").agg((count(lit(1)) / 2).cast("long").as("quads"))
    canon.join(counts, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"), coalesce(col("quads"), lit(0L)).as("quads"))
  }

  /** Exact global clustering coefficient = 3·triangles / wedges
    * (`ClusteringCoefficient::exactGlobal`).
    */
  def globalClusteringCoefficient(spark: SparkSession, edges: DataFrame): DataFrame = {
    val simple = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))
    val deg = GraphOps.degrees(GraphOps.symmetrize(simple))
    val wedgeCount = deg.agg(
      sum(col("degree") * (col("degree") - 1) / 2).as("wedges"))
    val tri = triangles(spark, edges).agg(count(lit(1)).as("tris"))
    tri.crossJoin(wedgeCount)
      .select((lit(3.0) * col("tris") /
        when(col("wedges") === 0, 1).otherwise(col("wedges"))).as("global_cc"))
  }
}
