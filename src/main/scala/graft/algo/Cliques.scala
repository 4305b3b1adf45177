package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** Maximum clique (`clique/MaxClique.cpp`, Pattabiraman et al.
  * arXiv:1411.7460 — SURVEY.md §2.8): size of the largest clique plus one
  * witness.
  *
  * The reference recurses per-vertex over candidate sets with degree
  * pruning. The Spark-native reformulation is LEVEL-SYNCHRONOUS clique
  * extension over the degree-ordered orientation (the TriangleEdgeScore
  * trick): level k holds one row per k-clique — `(members, cands)` where
  * `cands` is the set of common out-neighbors of all members in the
  * orientation — and one explode + one adjacency join + one
  * `array_intersect` produces level k+1. Orientation makes every clique
  * enumerate exactly once (members ascend in degree-rank order) and
  * bounds the adjacency arrays by the forward degree (O(√m)-ish on
  * power-law graphs, the same bound the triangle count relies on). Rows
  * whose candidate set empties are dropped — every level that still has
  * rows certifies a (k+1)-clique, so the loop length IS the answer.
  * Worst-case cost is exponential like the reference's; per level it is
  * one shuffle over the surviving clique rows.
  */
object Cliques {

  case class Result(size: Int, witness: Seq[Long])

  def maxClique(spark: SparkSession, edges: DataFrame,
                maxRounds: Int = 64): Result = {
    val simple = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    if (simple.isEmpty) return Result(0, Seq.empty)
    // degree-ordered dense rank (ties by id), same orientation as Triangles
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      simple.withColumn("weight", lit(1.0))))
    val rank = graft.core.DenseId.assign(deg, "r", Seq("degree", "id"))
      .select(col("id"), col("r"))
    val sym = simple.unionByName(
      simple.select(col("dst").as("src"), col("src").as("dst")))
    val fwd = sym
      .join(rank.select(col("id").as("src"), col("r").as("ru")), "src")
      .join(rank.select(col("id").as("dst"), col("r").as("rv")), "dst")
      .where(col("ru") < col("rv"))
      .select(col("ru").as("u"), col("rv").as("v"))
    val fwdAdj = fwd.groupBy("u").agg(sort_array(collect_list("v")).as("adj"))
      .transform(Materialize.checkpoint)

    // level 2: every oriented edge, candidates = common forward neighbors
    var frontier = fwd
      .join(fwdAdj.select(col("u"), col("adj").as("au")), "u")
      .join(fwdAdj.select(col("u").as("v"), col("adj").as("av")), Seq("v"),
        "left")
      .select(array(col("u"), col("v")).as("members"),
        array_intersect(col("au"),
          coalesce(col("av"), typedLit(Array.empty[Long]))).as("cands"))
      .transform(Materialize.checkpoint)
    if (frontier.isEmpty) {
      val one = rank.limit(1).collect().headOption.map(_.getLong(0)).toSeq
      return Result(if (one.isEmpty) 0 else 1, one)
    }
    var best = frontier.limit(1).collect().head
      .getSeq[Long](0)
    var cliqueSize = 2
    var round = 0
    var live = true
    while (live && round < maxRounds) {
      round += 1
      val next = frontier.where(org.apache.spark.sql.functions.size(col("cands")) > 0)
        .select(col("members"), explode(col("cands")).as("w"), col("cands"))
        .join(fwdAdj.select(col("u").as("w"), col("adj").as("aw")),
          Seq("w"), "left")
        .select(concat(col("members"), array(col("w"))).as("members"),
          array_intersect(col("cands"),
            coalesce(col("aw"), typedLit(Array.empty[Long]))).as("cands"))
        .transform(Materialize.checkpoint)
      Materialize.free(frontier)
      val head = next.limit(1).collect()
      if (head.isEmpty) {
        live = false
      } else {
        cliqueSize += 1
        best = head.head.getSeq[Long](0)
        frontier = next
      }
    }
    // map degree ranks back to node ids
    val s2 = spark
    import s2.implicits._
    val witness = best.toDF("r").join(rank, "r")
      .select("id").collect().map(_.getLong(0)).toSeq.sorted
    Result(cliqueSize, witness)
  }
}
