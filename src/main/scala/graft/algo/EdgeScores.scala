package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** Per-edge attribute transforms and sparsification scores (SURVEY.md §2.7:
  * `edgescores/` combinators + `sparsification/` backbones). An edge-score
  * table is `(src, dst, score)` keyed by the canonical undirected edge;
  * every combinator is a `withColumn`/window over it — pure DataFrame ops.
  */
object EdgeScores {

  /** EdgeScoreNormalizer (`edgescores/EdgeScoreNormalizer.cpp`): min-max
    * scale scores into [lower, upper] (invert optionally).
    */
  def normalize(scores: DataFrame, scoreCol: String = "score",
                lower: Double = 0.0, upper: Double = 1.0,
                invert: Boolean = false): DataFrame = {
    val row = scores.agg(min(scoreCol).cast("double"),
      max(scoreCol).cast("double")).head()
    val (lo, hi) = (row.getDouble(0), row.getDouble(1))
    val range = if (hi == lo) 1.0 else hi - lo
    val base = (col(scoreCol) - lo) / range
    val v = if (invert) lit(1.0) - base else base
    scores.withColumn(scoreCol, lit(lower) + v * (upper - lower))
  }

  /** EdgeScoreLinearizer (`edgescores/EdgeScoreLinearizer.cpp`): replace
    * each score by its rank-based quantile in (0,1]. Rank is computed with
    * the scalable two-phase scheme (range-partition + per-partition
    * row_number + broadcast offsets — `DenseId.assign`), NOT a single
    * partition-less global window: ties then share the min row_number of
    * their score group via a window partitioned by score (bounded groups).
    */
  def linearize(scores: DataFrame, scoreCol: String = "score"): DataFrame = {
    val n = scores.count().toDouble
    val rn = graft.core.DenseId.assign(scores, "_rn",
      Seq(scoreCol, "src", "dst"))
    val tieRank = min(col("_rn")).over(Window.partitionBy(col(scoreCol))) + 1
    rn.withColumn(scoreCol, tieRank.cast("double") / n).drop("_rn")
  }

  /** EdgeScoreBlender (`edgescores/EdgeScoreBlender.cpp`):
    * factor·a + (1−factor)·b joined on the edge key.
    */
  def blend(a: DataFrame, b: DataFrame, factor: Double): DataFrame =
    a.withColumnRenamed("score", "sa")
      .join(b.withColumnRenamed("score", "sb"), Seq("src", "dst"))
      .select(col("src"), col("dst"),
        (lit(factor) * col("sa") + lit(1.0 - factor) * col("sb")).as("score"))

  /** GeometricMeanScore (`edgescores/GeometricMeanScore.cpp`): per edge
    * score / sqrt(deg(u)·deg(v)) — the local-geometric normalization.
    */
  def geometricMean(spark: SparkSession, edges: DataFrame,
                    scores: DataFrame): DataFrame = {
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
    scores
      .join(deg.select(col("id").as("src"), col("degree").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), "dst")
      .select(col("src"), col("dst"),
        (col("score") / sqrt(col("du") * col("dv"))).as("score"))
  }

  /** EdgeScoreAsWeight (`edgescores/EdgeScoreAsWeight.cpp`): produce a new
    * weighted edge table from a score table.
    */
  def asWeight(edges: DataFrame, scores: DataFrame,
               squared: Boolean = false, offset: Double = 1.0,
               factor: Double = 1.0): DataFrame = {
    val s = if (squared) col("score") * col("score") else col("score")
    GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))
      .select("src", "dst")
      .join(scores, Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        (lit(offset) + lit(factor) * coalesce(s, lit(0.0))).as("weight"))
  }

  // ---------------------------------------------------------- backbones
  /** JaccardSimilarityAttributizer
    * (`sparsification/JaccardSimilarityAttributizer.cpp`): per-edge
    * neighborhood Jaccard |Γ(u)∩Γ(v)| / |Γ(u)∪Γ(v)| — derived from the
    * triangle count per edge: tri(u,v) = |Γ(u)∩Γ(v)| on simple graphs.
    */
  def jaccardSimilarity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val tri = Triangles.perEdge(spark, edges)
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
    tri
      .join(deg.select(col("id").as("src"), col("degree").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), "dst")
      .select(col("src"), col("dst"),
        (col("triangles").cast("double") /
          (col("du") + col("dv") - col("triangles"))).as("score"))
  }

  /** SimmelianOverlapScore (`sparsification/SimmelianOverlapScore.cpp`,
    * non-parametric variant simplified): overlap = number of common
    * top-maxRank strong ties; here scored as the triangle count restricted
    * to each endpoint's top-k strongest (by triangle count) incident edges.
    */
  def simmelianOverlap(spark: SparkSession, edges: DataFrame,
                       maxRank: Int = 10): DataFrame = {
    val tri = Triangles.perEdge(spark, edges)
    // rank each edge within both endpoints' incidence lists by strength —
    // top-k per node via the salted two-phase primitive, so a hub's
    // incidence list never lands in a single window task
    val incident = tri.select(col("src").as("node"), col("dst").as("other"),
        col("triangles"))
      .unionByName(tri.select(col("dst").as("node"), col("src").as("other"),
        col("triangles")))
    val topk = graft.core.Skew.saltedTopK(incident, Seq("node"),
        Seq(desc("triangles"), asc("other")), maxRank)
      .select(col("node"), col("other"))
    // strong neighborhoods: overlap of topk sets of u and v
    topk.select(col("node").as("u"), col("other").as("w1"))
      .join(topk.select(col("node").as("v"), col("other").as("w1")), "w1")
      .where(col("u") < col("v"))
      .groupBy(col("u").as("src"), col("v").as("dst"))
      .agg(count(lit(1)).cast("double").as("score"))
      .join(GraphOps.canonicalizeUnweighted(
        edges.where(col("src") =!= col("dst"))).select("src", "dst"),
        Seq("src", "dst"), "right")
      .select(col("src"), col("dst"), coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** LocalDegreeScore (`sparsification/LocalDegreeScore.cpp`): for edge
    * (u,v), score = 1 − log(rank of v in u's neighbor-by-degree order) /
    * log(deg(u)), maximized over both directions — keeps hub-to-hub
    * backbone edges.
    */
  def localDegree(spark: SparkSession, edges: DataFrame): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    val deg = GraphOps.degrees(GraphOps.symmetrize(canon.withColumn("weight", lit(1.0))))
    val sym = GraphOps.symmetrize(canon.withColumn("weight", lit(1.0)))
      .select(col("src").as("node"), col("dst").as("nbr"))
      .join(deg.select(col("id").as("nbr"), col("degree").as("dnbr")), "nbr")
      .join(deg.select(col("id").as("node"), col("degree").as("dnode")), "node")
    val w = Window.partitionBy("node").orderBy(desc("dnbr"), asc("nbr"))
    val scored = sym.withColumn("rk", row_number().over(w))
      .select(col("node"), col("nbr"),
        when(col("dnode") <= 1, 1.0).otherwise(
          lit(1.0) - log(col("rk")) / log(col("dnode"))).as("s"))
    scored.select(least(col("node"), col("nbr")).as("src"),
        greatest(col("node"), col("nbr")).as("dst"), col("s"))
      .groupBy("src", "dst").agg(max("s").as("score"))
  }

  /** GlobalThresholdFilter (`sparsification/GlobalThresholdFilter.cpp`):
    * keep edges with score above (or below) a threshold.
    */
  def globalThreshold(edges: DataFrame, scores: DataFrame, threshold: Double,
                      above: Boolean = true): DataFrame = {
    val keep = if (above) scores.where(col("score") >= threshold)
               else scores.where(col("score") <= threshold)
    GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))
      .join(keep.select("src", "dst"), Seq("src", "dst"), "left_semi")
  }

  /** SCANStructuralSimilarityScore
    * (`sparsification/SCANStructuralSimilarityScore.cpp:5-16`): per edge,
    * (tri(u,v) + 1) / sqrt((deg(u)+1)·(deg(v)+1)) — closed-neighborhood
    * cosine. Derived from the triangle job + degree join, no new shuffle
    * shape.
    */
  def scanStructuralSimilarity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val tri = Triangles.perEdge(spark, edges)
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
    tri
      .join(deg.select(col("id").as("src"), col("degree").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), "dst")
      .select(col("src"), col("dst"),
        ((col("triangles") + 1).cast("double") /
          sqrt((col("du") + 1) * (col("dv") + 1))).as("score"))
  }

  /** LocalSimilarityScore (`sparsification/LocalSimilarityScore.cpp:18-67`):
    * rank each incident edge by per-edge Jaccard similarity (descending;
    * deterministic tie-break on neighbor id — the reference's std::sort
    * order on ties is unspecified), sparsification exponent
    * e = 1 − log(rank)/log(deg) (1 if deg ≤ 1), score = max over both
    * endpoints. Windows are partitioned per node (bounded by degree).
    */
  def localSimilarity(spark: SparkSession, edges: DataFrame): DataFrame = {
    val sim = jaccardSimilarity(spark, edges)
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))))
    val incident = sim.select(col("src").as("node"), col("dst").as("other"), col("score"))
      .unionByName(sim.select(col("dst").as("node"), col("src").as("other"), col("score")))
      .join(deg.select(col("id").as("node"), col("degree").as("d")), "node")
    val w = Window.partitionBy("node").orderBy(desc("score"), asc("other"))
    val exps = incident.withColumn("rank", row_number().over(w))
      .select(col("node"), col("other"),
        when(col("d") <= 1, 1.0)
          .otherwise(lit(1.0) - log(col("rank")) / log(col("d"))).as("e"))
    exps.select(least(col("node"), col("other")).as("src"),
        greatest(col("node"), col("other")).as("dst"), col("e"))
      .groupBy("src", "dst").agg(max("e").as("score"))
  }

  /** MultiscaleScore (`sparsification/MultiscaleScore.cpp:14-66`): per node,
    * normalize incident scores p = s/Σs; per edge the null-model
    * probability 1 − (1−p)^(deg−1); final score = max over both endpoints.
    * `scores` defaults to the edge weights.
    */
  def multiscale(spark: SparkSession, edges: DataFrame,
                 scores: Option[DataFrame] = None): DataFrame = {
    val canon = GraphOps.canonicalize(edges.where(col("src") =!= col("dst")))
    val attr = scores.getOrElse(canon.select(col("src"), col("dst"),
      col("weight").as("score")))
    val incident = attr.select(col("src").as("node"), col("dst").as("other"), col("score"))
      .unionByName(attr.select(col("dst").as("node"), col("src").as("other"), col("score")))
    val perNode = incident.groupBy("node")
      .agg(sum("score").as("ssum"), count(lit(1)).as("d"))
    val probs = incident.join(perNode, "node")
      .select(col("node"), col("other"),
        (lit(1.0) - pow(lit(1.0) - col("score") / col("ssum"),
          col("d") - 1)).as("p"))
    probs.select(least(col("node"), col("other")).as("src"),
        greatest(col("node"), col("other")).as("dst"), col("p"))
      .groupBy("src", "dst").agg(max("p").as("score"))
  }

  /** RandomEdgeScore (`sparsification/RandomEdgeScore.cpp`) — deterministic
    * counter-based "random" per edge (pure function of the edge key).
    */
  def randomEdge(edges: DataFrame, seed: Long = 42): DataFrame =
    GraphOps.canonicalizeUnweighted(edges.where(col("src") =!= col("dst")))
      .select(col("src"), col("dst"),
        (pmod(xxhash64(col("src"), col("dst"), lit(seed)), lit(1000000L))
          .cast("double") / 1000000.0).as("score"))
}
