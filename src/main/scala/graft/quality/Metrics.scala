package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** Partition-quality and partition-comparison metrics — pure relational jobs
  * over `(edges, labels)` (SURVEY.md §2.6). Semantics pinned to the
  * reference:
  *
  *  - totalEdgeWeight counts each undirected edge once, self-loops once
  *    (`graph/Graph.cpp` totalEdgeWeight)
  *  - coverage = Σ intra-cluster edge weight / totalEdgeWeight
  *    (`community/Coverage.cpp:14-58`)
  *  - cluster volume counts self-loops **twice**:
  *    `weightedDegree(v) + weight(v,v)` (`community/Modularity.cpp:52-60`)
  *  - modularity = coverage − Σ_C (vol(C)/(2·tw))²
  *    (`Modularity.cpp:62-76`)
  *
  * Inputs: `edges` = canonical undirected edge table (one row per edge);
  * `labels` = `(id, label)`.
  */
object Metrics {

  /** intra-cluster weight, cut weight, total weight — one pass. */
  private def edgeSides(edges: DataFrame, labels: DataFrame): DataFrame =
    edges
      .join(labels.withColumnRenamed("id", "src")
        .withColumnRenamed("label", "lsrc"), "src")
      .join(labels.withColumnRenamed("id", "dst")
        .withColumnRenamed("label", "ldst"), "dst")

  def coverage(spark: SparkSession, edges: DataFrame, labels: DataFrame): Double = {
    val sides = edgeSides(edges, labels)
    val row = sides.agg(
      sum(when(col("lsrc") === col("ldst"), col("weight")).otherwise(0.0)).as("intra"),
      sum("weight").as("tw")).head()
    row.getDouble(0) / row.getDouble(1)
  }

  /** Total weight of inter-cluster edges (`community/EdgeCut.cpp`). */
  def edgeCut(spark: SparkSession, edges: DataFrame, labels: DataFrame): Double =
    edgeSides(edges, labels).agg(
      sum(when(col("lsrc") =!= col("ldst"), col("weight")).otherwise(0.0)))
      .head().getDouble(0)

  /** Cluster volumes `(label, volume)` with reference self-loop convention
    * (loop weight twice).
    */
  def clusterVolumes(edges: DataFrame, labels: DataFrame): DataFrame = {
    val wdeg = GraphOps.weightedDegrees(GraphOps.symmetrize(edges))
      .withColumnRenamed("id", "nid")
    val loops = edges.where(col("src") === col("dst"))
      .groupBy(col("src").as("nid")).agg(sum("weight").as("loopw"))
    labels.join(wdeg, labels("id") === wdeg("nid"), "left")
      .join(loops, labels("id") === loops("nid"), "left")
      .groupBy("label")
      .agg(sum(coalesce(col("wdegree"), lit(0.0)) +
        coalesce(col("loopw"), lit(0.0))).as("volume"))
  }

  /** Modularity Q (`community/Modularity.cpp:28-96`). */
  def modularity(spark: SparkSession, edges: DataFrame, labels: DataFrame): Double = {
    val sides = edgeSides(edges, labels)
    val row = sides.agg(
      sum(when(col("lsrc") === col("ldst"), col("weight")).otherwise(0.0)).as("intra"),
      sum("weight").as("tw")).head()
    val (intra, tw) = (row.getDouble(0), row.getDouble(1))
    require(tw != 0.0, "Modularity undefined for graphs without edges")
    val expCov = clusterVolumes(edges, labels)
      .agg(sum(pow(col("volume") / tw, 2) / 4)).head().getDouble(0)
    intra / tw - expCov
  }

  /** Conductance of a 2-way partition `(id, inSet boolean)`:
    * cut / min(vol(S), vol(V∖S)) (`community/Conductance.cpp`).
    */
  def conductance(spark: SparkSession, edges: DataFrame, inSet: DataFrame): Double = {
    val labels = inSet.select(col("id"),
      when(col("inSet"), 1L).otherwise(0L).as("label"))
    val cut = edgeCut(spark, edges, labels)
    val vols = clusterVolumes(edges, labels).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val denom = math.min(vols.getOrElse(0L, 0.0), vols.getOrElse(1L, 0.0))
    if (denom == 0.0) 0.0 else cut / denom
  }

  /** Cluster sizes (`structures/Partition.h:244` subsetSizes). */
  def clusterSizes(labels: DataFrame): DataFrame =
    labels.groupBy("label").agg(count(lit(1)).as("size"))

  /** Contingency table of two partitions over the same node set. */
  def contingency(a: DataFrame, b: DataFrame): DataFrame =
    a.withColumnRenamed("label", "la")
      .join(b.withColumnRenamed("label", "lb"), "id")
      .groupBy("la", "lb").agg(count(lit(1)).as("n"))

  /** Node-structural Rand *dissimilarity* — fraction of node pairs the two
    * partitions disagree on (`community/NodeStructuralRandMeasure.cpp`).
    * Computed from the contingency table in closed form (no pair join).
    */
  def randDissimilarity(spark: SparkSession, a: DataFrame, b: DataFrame): Double = {
    val cont = contingency(a, b).persist()
    val n = cont.agg(sum("n")).head().getLong(0).toDouble
    val sPairs = cont.agg(sum(col("n") * (col("n") - 1) / 2)).head().getDouble(0)
    val aPairs = cont.groupBy("la").agg(sum("n").as("s"))
      .agg(sum(col("s") * (col("s") - 1) / 2)).head().getDouble(0)
    val bPairs = cont.groupBy("lb").agg(sum("n").as("s"))
      .agg(sum(col("s") * (col("s") - 1) / 2)).head().getDouble(0)
    cont.unpersist()
    val total = n * (n - 1) / 2
    // disagreements = pairs together in exactly one of the two partitions
    (aPairs + bPairs - 2 * sPairs) / total
  }

  /** Normalized mutual information NMI(a,b) ∈ [0,1]
    * (`community/NMIDistance.cpp`; the reference reports 1−NMI as distance).
    */
  def nmi(spark: SparkSession, a: DataFrame, b: DataFrame): Double = {
    // Fully distributed: entropies and MI are groupBy-aggregates over the
    // contingency table — never collected to the driver (near-singleton
    // partitions make the table O(n) rows, so a collect would not scale).
    val cont = contingency(a, b).persist()
    val n = cont.agg(sum("n")).head().getLong(0).toDouble
    def entropyOf(margCol: String): Double =
      -cont.groupBy(margCol).agg(sum("n").as("s"))
        .agg(sum((col("s") / n) * log(col("s") / n))).head().getDouble(0)
    val ha = entropyOf("la")
    val hb = entropyOf("lb")
    val margA = cont.groupBy("la").agg(sum("n").as("ma"))
    val margB = cont.groupBy("lb").agg(sum("n").as("mb"))
    val mi = cont.join(margA, "la").join(margB, "lb")
      .agg(sum((col("n") / n) *
        log((col("n") * n) / (col("ma") * col("mb"))))).head().getDouble(0)
    cont.unpersist()
    if (ha == 0.0 && hb == 0.0) 1.0
    else if (math.max(ha, hb) == 0.0) 0.0
    else mi / math.max(ha, hb)
  }

  /** Jaccard partition similarity (`community/JaccardMeasure.cpp`):
    * s11 / (s11 + s10 + s01) over node pairs, closed form.
    */
  def jaccardSimilarity(spark: SparkSession, a: DataFrame, b: DataFrame): Double = {
    val cont = contingency(a, b).persist()
    val s11 = cont.agg(sum(col("n") * (col("n") - 1) / 2)).head().getDouble(0)
    val aPairs = cont.groupBy("la").agg(sum("n").as("s"))
      .agg(sum(col("s") * (col("s") - 1) / 2)).head().getDouble(0)
    val bPairs = cont.groupBy("lb").agg(sum("n").as("s"))
      .agg(sum(col("s") * (col("s") - 1) / 2)).head().getDouble(0)
    cont.unpersist()
    val denom = aPairs + bPairs - s11
    if (denom == 0.0) 1.0 else s11 / denom
  }

  /** DynamicNMIDistance (`community/DynamicNMIDistance.cpp`): NMI distance
    * between a partition before and after a dynamic update, where the node
    * sets may differ (added/removed nodes) — the reference restricts to
    * nodes present in BOTH snapshots; here the inner contingency join does
    * exactly that. Returns 1 − NMI (the reference reports a distance).
    */
  def dynamicNmiDistance(spark: SparkSession, before: DataFrame,
                         after: DataFrame): Double =
    1.0 - nmi(spark,
      before.join(after.select("id"), Seq("id"), "left_semi"),
      after.join(before.select("id"), Seq("id"), "left_semi"))
}
