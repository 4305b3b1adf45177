package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** Per-cluster partition evaluation suite (`community/LocalPartitionEvaluation`
  * family, SURVEY.md §2.6): every metric is a pair of groupBy-aggregations
  * over `(edges, labels)` — per-cluster values plus the reference's summary
  * surface (unweighted avg over clusters, size-weighted avg over nodes,
  * min, max). `edges` is the canonical undirected table, `labels (id,
  * label)` a total partition.
  */
object PartitionEval {

  private def sides(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.withColumnRenamed("id", "src")
        .withColumnRenamed("label", "lsrc"), "src")
      .join(labels.withColumnRenamed("id", "dst")
        .withColumnRenamed("label", "ldst"), "dst")

  private def clusterSizes(labels: DataFrame): DataFrame =
    labels.groupBy("label").agg(count(lit(1)).as("size"))

  /** Summary row over per-cluster `(label, value)` + sizes: the reference's
    * (unweighted avg over clusters, node-weighted avg, min, max).
    */
  def summarize(values: DataFrame, labels: DataFrame): DataFrame = {
    val n = labels.count()
    values.join(clusterSizes(labels), "label")
      .agg(avg("value").as("unweighted_avg"),
        (sum(col("value") * col("size")) / n).as("weighted_avg"),
        min("value").as("min_value"),
        max("value").as("max_value"))
  }

  /** IntrapartitionDensity (`community/IntrapartitionDensity.cpp:8-74`):
    * per cluster, intra-edge count / C(size, 2); clusters whose size < 2
    * score 1. Returns `(label, value)`.
    */
  def intrapartitionDensity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val intra = sides(edges, labels)
      .where(col("lsrc") === col("ldst") && col("src") =!= col("dst"))
      .groupBy(col("lsrc").as("label")).agg(count(lit(1)).as("intra"))
    clusterSizes(labels).join(intra, Seq("label"), "left")
      .select(col("label"),
        when(col("size") * (col("size") - 1) / 2 > 0,
          coalesce(col("intra"), lit(0L)).cast("double") /
            (col("size") * (col("size") - 1) / 2))
          .otherwise(1.0).as("value"))
  }

  /** Global intrapartition density Σ intra / Σ possible
    * (`IntrapartitionDensity.cpp:72`).
    */
  def intrapartitionDensityGlobal(spark: SparkSession, edges: DataFrame,
                                  labels: DataFrame): Double = {
    val intra = sides(edges, labels)
      .where(col("lsrc") === col("ldst") && col("src") =!= col("dst"))
      .count()
    val possible = clusterSizes(labels)
      .agg(sum(col("size") * (col("size") - 1) / 2)).head().getDouble(0)
    if (possible == 0) 1.0 else intra.toDouble / possible
  }

  /** IsolatedInterpartitionConductance
    * (`community/IsolatedInterpartitionConductance.cpp:8-66`): per cluster,
    * cut(C) / min(vol(C), totalVol − vol(C)) with vol counting both edge
    * sides (2·w per edge overall). Returns `(label, value)`.
    */
  def isolatedInterpartitionConductance(edges: DataFrame,
                                        labels: DataFrame): DataFrame = {
    val s = sides(edges, labels)
    val cut = s.where(col("lsrc") =!= col("ldst"))
      .select(col("lsrc").as("label"), col("weight"))
      .unionByName(s.where(col("lsrc") =!= col("ldst"))
        .select(col("ldst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").as("cut"))
    val vol = s.select(col("lsrc").as("label"), col("weight"))
      .unionByName(s.select(col("ldst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").as("vol"))
    val totalVol = edges.agg(sum(col("weight") * 2)).head().getDouble(0)
    clusterSizes(labels).join(vol, Seq("label"), "left")
      .join(cut, Seq("label"), "left")
      .select(col("label"),
        when(least(coalesce(col("vol"), lit(0.0)),
          lit(totalVol) - coalesce(col("vol"), lit(0.0))) > 0,
          coalesce(col("cut"), lit(0.0)) /
            least(coalesce(col("vol"), lit(0.0)),
              lit(totalVol) - coalesce(col("vol"), lit(0.0))))
          .otherwise(0.0).as("value"))
  }

  /** IsolatedInterpartitionExpansion
    * (`community/IsolatedInterpartitionExpansion.cpp:15-50`): per cluster,
    * cut(C) / min(|C|, n − |C|). Returns `(label, value)`.
    */
  def isolatedInterpartitionExpansion(edges: DataFrame,
                                      labels: DataFrame): DataFrame = {
    val n = labels.count()
    val s = sides(edges, labels)
    val cut = s.where(col("lsrc") =!= col("ldst"))
      .select(col("lsrc").as("label"), col("weight"))
      .unionByName(s.where(col("lsrc") =!= col("ldst"))
        .select(col("ldst").as("label"), col("weight")))
      .groupBy("label").agg(sum("weight").as("cut"))
    clusterSizes(labels).join(cut, Seq("label"), "left")
      .select(col("label"),
        (coalesce(col("cut"), lit(0.0)) /
          least(col("size"), lit(n) - col("size"))).as("value"))
  }

  /** PartitionHubDominance (`community/PartitionHubDominance.cpp:10-60`):
    * per cluster, max internal degree / (|C| − 1); singletons score 1.
    * Returns `(label, value)`.
    */
  def partitionHubDominance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val sym = GraphOps.symmetrize(edges.where(col("src") =!= col("dst")))
    val internal = sides(sym, labels)
      .where(col("lsrc") === col("ldst"))
      .groupBy(col("src").as("id"), col("lsrc").as("label"))
      .agg(count(lit(1)).as("ideg"))
    val maxIdeg = internal.groupBy("label").agg(max("ideg").as("mx"))
    clusterSizes(labels).join(maxIdeg, Seq("label"), "left")
      .select(col("label"),
        when(col("size") > 1,
          coalesce(col("mx"), lit(0L)).cast("double") / (col("size") - 1))
          .otherwise(1.0).as("value"))
  }

  /** PartitionFragmentation (`community/PartitionFragmentation.cpp:10-55`):
    * 1 − (largest connected fragment of C) / |C| per cluster, where
    * fragments are the intersection of the partition with the graph's
    * connected components. Returns `(label, value)`.
    */
  def partitionFragmentation(spark: SparkSession, edges: DataFrame,
                             labels: DataFrame): DataFrame = {
    val comps = graft.algo.ConnectedComponents.run(spark,
      edges.where(col("src") =!= col("dst")))
    val inter = labels.join(comps, "id")
      .groupBy("label", "component").agg(count(lit(1)).as("fsize"))
    val largest = inter.groupBy("label").agg(max("fsize").as("largest"))
    clusterSizes(labels).join(largest, Seq("label"), "left")
      .select(col("label"),
        (lit(1.0) - coalesce(col("largest"), lit(0L)).cast("double") /
          col("size")).as("value"))
  }

  /** StablePartitionNodes (`community/StablePartitionNodes.cpp:10-60`): a
    * node is stable iff the edge weight into its own cluster is positive
    * and strictly larger than into any other single cluster (isolated
    * nodes are stable). Per cluster: fraction of stable members.
    * Returns `(label, value)`.
    */
  def stablePartitionNodes(edges: DataFrame, labels: DataFrame): DataFrame = {
    val sym = GraphOps.symmetrize(edges.where(col("src") =!= col("dst")))
    val nbrW = sym
      .join(labels.select(col("id").as("dst"), col("label").as("nlabel")), "dst")
      .groupBy(col("src").as("id"), col("nlabel"))
      .agg(sum("weight").as("w"))
    val own = labels.join(nbrW, Seq("id"), "left")
    val ownW = own.where(col("nlabel") === col("label"))
      .select(col("id"), col("w").as("own_w"))
    val bestOther = own.where(col("nlabel") =!= col("label"))
      .groupBy("id").agg(max("w").as("other_w"))
    val stable = labels
      .join(nbrW.groupBy("id").agg(count(lit(1)).as("ndeg")), Seq("id"), "left")
      .join(ownW, Seq("id"), "left")
      .join(bestOther, Seq("id"), "left")
      .select(col("id"), col("label"),
        when(col("ndeg").isNull, true) // isolated → stable
          .otherwise(coalesce(col("own_w"), lit(0.0)) > 0 &&
            coalesce(col("other_w"), lit(0.0)) < coalesce(col("own_w"), lit(0.0)))
          .as("stable"))
    stable.groupBy("label")
      .agg((sum(when(col("stable"), 1).otherwise(0)).cast("double") /
        count(lit(1))).as("value"))
  }

  /** AdjustedRand *dissimilarity* (`community/AdjustedRandMeasure.cpp:9-59`)
    * = 1 − ARI, from the contingency table in closed form. Replicates the
    * reference's integer division in the expected-index term
    * (`AdjustedRandMeasure.cpp:48`: count arithmetic truncates).
    */
  def adjustedRandDissimilarity(spark: SparkSession, a: DataFrame,
                                b: DataFrame): Double = {
    val cont = Metrics.contingency(a, b).persist()
    val n = cont.agg(sum("n")).head().getLong(0)
    // n·(n−1)/2 is always integral — compute as exact longs (the reference
    // does pure `count` arithmetic, `AdjustedRandMeasure.cpp:30-48`)
    def pairSum(df: DataFrame): Long =
      df.agg(sum((col("s") * (col("s") - 1) / 2).cast("long"))).head().getLong(0)
    val randIndex = pairSum(cont.select(col("n").as("s")))
    val sumA = pairSum(cont.groupBy("la").agg(sum("n").as("s")))
    val sumB = pairSum(cont.groupBy("lb").agg(sum("n").as("s")))
    cont.unpersist()
    val maxIndex = 0.5 * (sumA + sumB)
    val expectedIndex = (sumA * sumB / (n * (n - 1) / 2)).toDouble // int div, as in ref
    if (maxIndex == 0 || maxIndex == expectedIndex) 0.0
    else 1.0 - (randIndex - expectedIndex) / (maxIndex - expectedIndex)
  }
}
