package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.GraphOps
import graft.iterate.{IterConfig, IterationDriver}

/** PLP — label propagation community detection, matching the reference's
  * update rule (`community/PLP.cpp:25-118`) under **synchronous** sweeps:
  *
  *  - init: singleton labels = node id unless a base clustering is given
  *    (`PLP.cpp:31-35`)
  *  - per sweep, for every active non-isolated node u:
  *    `labelWeights[l] = Σ weight(u,w) over neighbors w with label l`
  *    (:80-86); adopt the **heaviest** label, ties broken toward the
  *    **smallest** label (:89-92 — std::map iteration order + max_element
  *    keeping the first maximum)
  *  - nodes that changed re-activate their neighbors; unchanged active
  *    nodes deactivate (:94-102)
  *  - stop when `#updated ≤ updateThreshold` (default `n/1e5`, :41-43) or
  *    `maxIterations`
  *  - isolated nodes keep their singleton label (:50-61)
  *
  * The reference updates labels **asynchronously in parallel**, so its exact
  * output is schedule-dependent (documented in SURVEY.md §2.6); this engine
  * pins a deterministic **red-black semi-synchronous** schedule: sweep t
  * updates only nodes with `id % 2 == t % 2`. Fully synchronous (Jacobi)
  * label propagation 2-cycles on symmetric structures (two clique members
  * endlessly swapping labels — a well-known LPA pathology); alternating
  * parity classes is the standard deterministic remedy (red-black
  * Gauss-Seidel) and converges like the reference's async schedule while
  * staying schedule-independent. Convergence = a full red+black round with
  * ≤ threshold updates. Correctness is verified by (a) exact match against a
  * sequential oracle implementing the same pinned semantics and (b)
  * fixed-point/modularity-parity properties.
  *
  * The weighted-majority argmax with min-label tie-break is expressed as
  * `max_by(label, struct(weight, -label))` — a codegen-friendly built-in
  * (SURVEY.md §7.3), no UDAF.
  */
object PLP {

  /** Sweep-unroll factor for the fused red-black loop; env-overridable for
    * A/B and plain-loop-fallback debugging (`SPARK_GRAFT_PLP_UNROLL=1`),
    * mirroring PageRank's SPARK_GRAFT_PR_UNROLL knob.
    */
  val defaultUnroll: Int =
    IterationDriver.envUnroll("SPARK_GRAFT_PLP_UNROLL", 4)

  final case class Config(
      updateThreshold: Long = -1, // -1 → max(1, n/1e5) like the reference
      maxIter: Int = 100,
      checkpointDir: Option[String] = None)

  final case class Result(labels: DataFrame, iterations: Int,
                          history: Vector[graft.iterate.IterRecord])

  /** @param edges undirected edge table (canonical or directed rows —
    *              symmetrized internally). `(id, label)` out.
    */
  def run(spark: SparkSession, edges: DataFrame,
          baseClustering: Option[DataFrame] = None,
          cfg: Config = Config()): Result = {
    // hash-partitioned by dst ONCE: the per-sweep active-set semi-join, the
    // winner aggregation and the re-activation scan are all dst-keyed, so
    // the cached edge table is never reshuffled inside the loop (the cache
    // preserves outputPartitioning; only node-sized tables move per sweep,
    // plus the one src-keyed label join over the active half)
    val sym = GraphOps.symmetrize(edges)
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = GraphOps.nodes(edges).persist(StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val threshold: Double =
      if (cfg.updateThreshold >= 0) cfg.updateThreshold.toDouble
      else math.max(1.0, n / 1e5)

    val init = baseClustering match {
      case Some(base) => nodes.join(base, Seq("id"), "left")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"),
          lit(true).as("active"))
      case None => nodes.select(col("id"), col("id").as("label"),
        lit(true).as("active"))
    }

    // node-sized sides hinted shuffle-hash when the per-partition build
    // slice is cache-friendly (GraphOps.hashBuildHint): all loop joins are
    // co-partitioned, so sort-merge would only re-sort both sides per sweep
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def buildSide(df: DataFrame): DataFrame =
      GraphOps.hashBuildHint(df, n, parts)

    def step(state: DataFrame, iter: Int): DataFrame = {
      val labelsOnly = state.select("id", "label")
      // red-black schedule: this sweep's update set is the active nodes of
      // the current parity class; the other class keeps its labels.
      val parity = iter % 2
      val updateSet = state.where(col("active") && pmod(col("id"), lit(2)) === parity)
      // neighbor labels arriving at each updating node. The parity filter
      // (a static scan predicate) and the active-set semi-join are applied
      // to the edge table BEFORE the label join, so the big edges⋈labels
      // shuffle only carries rows whose dst actually updates this sweep —
      // at minimum half the edges, and a shrinking fraction as the active
      // set drains (previously the full join ran first and the semi-join
      // discarded most of it afterwards).
      val nbr = sym
        .where(pmod(col("dst"), lit(2)) === parity)
        .join(buildSide(updateSet.select(col("id").as("dst"))),
          Seq("dst"), "left_semi")
        .join(buildSide(labelsOnly.withColumnRenamed("id", "src")
          .withColumnRenamed("label", "nlabel")), "src")
      val winners = nbr
        .groupBy(col("dst"), col("nlabel"))
        .agg(sum("weight").as("w"))
        .groupBy(col("dst").as("id"))
        .agg(max_by(col("nlabel"),
          struct(col("w"), (-col("nlabel")).as("nl"))).as("winner"))
      val updated = state.join(buildSide(winners), Seq("id"), "left")
        .select(col("id"), col("active"),
          when(col("winner").isNotNull, col("winner"))
            .otherwise(col("label")).as("label"),
          (col("winner").isNotNull && col("winner") =!= col("label")).as("changed"),
          col("changed").as("prev_changed"),
          // this node was eligible this sweep → deactivate unless re-activated
          (pmod(col("id"), lit(2)) === parity).as("swept"))
      // re-activate changed nodes and their neighbors; deactivate swept
      // unchanged nodes; the off-parity class keeps its activation.
      val changedIds = updated.where(col("changed")).select(col("id"))
      // neighbors-of-changed via the dst side (sym is symmetric, so
      // {src : dst ∈ changed} IS the neighbor set): stays on the cached
      // dst-partitioning — no edge shuffle — and the parity filter applies
      // because every changed node carries this sweep's parity
      val nbrOfChanged = sym
        .where(pmod(col("dst"), lit(2)) === parity)
        .join(buildSide(changedIds.withColumnRenamed("id", "dst")),
          Seq("dst"), "left_semi")
        .select(col("src").as("id")).distinct()
      val activeNext = changedIds.unionByName(nbrOfChanged).distinct()
        .withColumn("nextActive", lit(true))
      updated.join(activeNext, Seq("id"), "left")
        .select(col("id"), col("label"),
          (coalesce(col("nextActive"), lit(false)) ||
            (col("active") && !col("swept"))).as("active"),
          col("changed"), col("prev_changed"))
    }

    // a full round = red + black sweep; stop when the round's total updates
    // fall to the reference's threshold (PLP.cpp:41-43 stop rule shape)
    // next-only metric → fused unrolled driver (IterationDriver.runFused):
    // red+black sweep pairs compose into one chain job with a single metric
    // read, amortizing per-sweep submission overhead; the detected stop
    // sweep and every label are identical to the plain loop.
    def updatedAgg(next: DataFrame): DataFrame =
      next.agg(sum(when(col("changed") || col("prev_changed"), 1L)
        .otherwise(0L)).as("m"))

    val res = IterationDriver.runFused(spark,
      init.withColumn("changed", lit(true)).withColumn("prev_changed", lit(true)),
      step, updatedAgg,
      IterConfig(tol = threshold, maxIter = cfg.maxIter,
        checkpointDir = cfg.checkpointDir),
      unroll = PLP.defaultUnroll)

    sym.unpersist(); nodes.unpersist()
    Result(res.state.select("id", "label"), res.iterations, res.history)
  }
}
