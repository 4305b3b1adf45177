package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** Link-prediction indices on common-neighborhood statistics
  * (`networkit/cpp/linkprediction/` — CommonNeighborsIndex,
  * JaccardIndex, AdamicAdarIndex): one 2-hop self-join over the symmetrized
  * edge table produces all three; per-pair output for candidate node pairs.
  * At scale the candidate set must be bounded (here: optional node-id
  * predicate) — full all-pairs is quadratic by definition.
  */
object LinkPrediction {

  /** Common-neighbor pairs `(a, b, cn)` with a < b, over nodes satisfying
    * `nodeFilter` (both endpoints). Self-pairs excluded; pairs may or may
    * not be existing edges (the reference scores any pair).
    */
  def commonNeighbors(spark: SparkSession, edges: DataFrame,
                      maxNodeId: Long = Long.MaxValue): DataFrame = {
    val sym = GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst"))))
      .select(col("src").as("node"), col("dst").as("nbr"))
    val bounded = sym.where(col("node") < maxNodeId)
    bounded.select(col("node").as("a"), col("nbr"))
      .join(bounded.select(col("node").as("b"), col("nbr")), "nbr")
      .where(col("a") < col("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("cn"))
  }

  /** Jaccard index cn / |Γ(a) ∪ Γ(b)| (`linkprediction/JaccardIndex.cpp`). */
  def jaccard(spark: SparkSession, edges: DataFrame,
              maxNodeId: Long = Long.MaxValue): DataFrame = {
    val cn = commonNeighbors(spark, edges, maxNodeId)
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
    cn.join(deg.select(col("id").as("a"), col("degree").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("degree").as("db")), "b")
      .select(col("a"), col("b"),
        (col("cn").cast("double") / (col("da") + col("db") - col("cn")))
          .as("jaccard"))
  }

  /** Adamic-Adar: Σ over common neighbors z of 1/ln(deg(z))
    * (`linkprediction/AdamicAdarIndex.cpp`).
    */
  def adamicAdar(spark: SparkSession, edges: DataFrame,
                 maxNodeId: Long = Long.MaxValue): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))
    val sym = GraphOps.symmetrize(canon)
      .select(col("src").as("node"), col("dst").as("nbr"))
    val deg = GraphOps.degrees(GraphOps.symmetrize(canon))
      .select(col("id").as("nbr"), col("degree"))
    val bounded = sym.where(col("node") < maxNodeId)
      .join(deg, "nbr")
    bounded.select(col("node").as("a"), col("nbr"), col("degree"))
      .join(bounded.select(col("node").as("b"), col("nbr")), Seq("nbr"))
      .where(col("a") < col("b"))
      .groupBy("a", "b")
      .agg(sum(lit(1.0) / log(col("degree"))).as("aa"))
  }

  /** Preferential attachment deg(a)·deg(b) for candidate pairs. */
  def preferentialAttachment(spark: SparkSession, edges: DataFrame,
                             maxNodeId: Long): DataFrame = {
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
      .where(col("id") < maxNodeId)
    deg.select(col("id").as("a"), col("degree").as("da"))
      .join(deg.select(col("id").as("b"), col("degree").as("db")),
        col("a") < col("b"))
      .select(col("a"), col("b"), (col("da") * col("db")).as("pa"))
  }
}
