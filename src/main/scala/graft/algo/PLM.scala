package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** PLM — parallel Louvain method (`community/PLM.cpp:29-345`), multilevel:
  * move phase to a local optimum, contract by partition
  * (`ParallelPartitionCoarsening`), recurse, prolong.
  *
  * Move rule (`PLM.cpp:140-146`): moving u from C to D changes modularity by
  * `Δ = (aff(u,D) − aff(u,C∖u))/tw + γ·((vol(C∖u) − vol(D∖u))·vol(u)) /
  * (2·tw²)`; u moves to the Δ-maximizing neighbor community if Δ > 0.
  * Volumes count self-loops twice (`PLM.cpp:47-51`). The reference moves
  * asynchronously (schedule-dependent); this engine uses the same
  * deterministic red-black schedule as PLP, so results are reproducible;
  * quality parity is asserted via modularity in tests.
  *
  * Scale shape per sweep: one join edges×labels (neighbor-community
  * affinities, map-side combinable groupBy), one broadcast-sized community
  * volume table joined back, one argmax window-free `max_by`. Coarsening
  * shrinks the graph geometrically, so total work ≈ 2× the first level.
  */
object PLM {

  /** @param stopEarly false → run exactly `maxMovePasses` passes per level
    *                   (extra passes at a fixed point are no-ops); a fixed,
    *                   data-independent schedule is what makes the move
    *                   phase replayable by the unrolled DuckDB oracle.
    */
  final case class Config(gamma: Double = 1.0, maxMovePasses: Int = 8,
                          maxLevels: Int = 8, stopEarly: Boolean = true,
                          /** stop recursing when a level's move phase
                            * shrinks the community count by less than this
                            * fraction — the red-black schedule can 2-cycle
                            * at a fixed point (pairs endlessly swapping,
                            * zero net shrink), the parity analogue of the
                            * reference's `moved == 0` recursion stop
                            * (`PLM.cpp:208-214`) */
                          minShrink: Double = 0.01)

  final case class Result(labels: DataFrame, levels: Int)

  /** One level's move phase: returns (labels, movedAny). */
  private def movePhase(spark: SparkSession, canon: DataFrame, cfg: Config): DataFrame = {
    val sym = GraphOps.symmetrize(canon).transform(graft.core.Materialize.checkpoint)
    val nodes = GraphOps.nodes(canon)
    val tw = canon.agg(sum("weight")).head().getDouble(0)

    // vol(u): weighted degree + self-loop weight again (loops twice)
    val wdeg = GraphOps.weightedDegrees(sym)
    val loops = canon.where(col("src") === col("dst"))
      .groupBy(col("src").as("id")).agg(sum("weight").as("loopw"))
    val vol = nodes.join(wdeg, Seq("id"), "left")
      .join(loops, Seq("id"), "left")
      .select(col("id"),
        (coalesce(col("wdegree"), lit(0.0)) +
          coalesce(col("loopw"), lit(0.0))).as("vol"))
      .transform(graft.core.Materialize.checkpoint)

    // neighbor edges without self-loops (affinity excludes u itself),
    // src-partitioned ONCE: the per-pass label join is src-keyed, so each
    // pass reshuffles only the node-sized label table, never the edges
    val nbrs = sym.where(col("src") =!= col("dst"))
      .repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col("id"), col("id").as("label"))
      .transform(graft.core.Materialize.checkpoint)
    var labelsCk = labels // the checkpointed generation behind `labels`
    var pass = 0
    var moved = 1L
    val verbose = sys.env.contains("SPARK_GRAFT_PLM_VERBOSE")
    while ((moved > 0 || !cfg.stopEarly) && pass < cfg.maxMovePasses) {
      pass += 1
      val t0 = System.nanoTime()
      val parity = pass % 2
      // checkpointed: referenced twice below (cvolC and cvolD sides)
      val comVol = labels.join(vol, "id")
        .groupBy("label").agg(sum("vol").as("cvol"))
        .transform(graft.core.Materialize.checkpoint)
      // affinities of updating nodes to neighbor communities. The
      // candidate-community volume (cvolD) is attached to the LABEL table
      // before the aggregation — a node-scale join on label — and carried
      // through the agg as a per-group constant, instead of re-joining the
      // m-scale aggregated affinities on nlabel afterwards (one whole
      // edge-scale shuffle per pass removed).
      val aff = nbrs
        .join(labels.select(col("id").as("src"), col("label").as("nlabel"))
          .join(comVol.select(col("label").as("nlabel"),
            col("cvol").as("cvolD")), "nlabel"), "src")
        .where(pmod(col("dst"), lit(2)) === parity)
        .groupBy(col("dst").as("id"), col("nlabel"))
        .agg(sum("weight").as("aff"), max("cvolD").as("cvolD"))
      val cur = labels.withColumnRenamed("label", "clabel")
        .join(vol, "id")
        .join(comVol.select(col("label").as("clabel"), col("cvol").as("cvolC")), "clabel")
      // Per-row SCORE instead of the reference's per-row Δ: Δ(u, D) =
      // score(u, D) − affC(u)/tw where affC (affinity to u's own community)
      // is constant per u — so the argmax over candidate communities is
      // invariant to it, and the Δ > 0 test can be applied AFTER the argmax
      // on node-sized rows. This removes the previous shape's aff-scale
      // checkpoint + affC self-join (the dominant per-pass materialization:
      // ~7M rows/pass at bench scale): one combined groupBy produces the
      // score-argmax AND affC together, co-partitioned on the id-keyed join
      // just above. The DuckDB oracle replays score-space ordering with the
      // identical expression tree, so FP ties agree bit-for-bit.
      val scored = aff
        .join(cur, "id")
        .select(col("id"), col("nlabel"), col("aff"), col("clabel"),
          (col("aff") / tw +
            lit(cfg.gamma) *
              (((col("cvolC") - col("vol")) - col("cvolD")) * col("vol")) /
              (2 * tw * tw)).as("score"))
      // own-community rows sink to -inf in the argmax key (each id has at
      // most one such row — aff is grouped by (id, nlabel)) and feed affC
      val best = scored.groupBy("id")
        .agg(
          max_by(struct(col("nlabel"), col("score")),
            struct(when(col("nlabel") =!= col("clabel"), col("score"))
              .otherwise(lit(Double.NegativeInfinity)),
              (-col("nlabel")).as("nl"))).as("b"),
          sum(when(col("nlabel") === col("clabel"), col("aff"))).as("affC"),
          max(col("clabel")).as("clabel"))
        .where(col("b.nlabel") =!= col("clabel") &&
          (col("b.score") - coalesce(col("affC"), lit(0.0)) / tw) > 1e-15)
        .select(col("id"), col("b.nlabel").as("winner"))
      // changed-flag carried in the checkpointed state: the move count is a
      // cheap scan of the materialized rows, not a second evaluation of the
      // whole candidate/argmax pipeline (which previously doubled pass cost)
      val newLabels = labels.join(best.select("id", "winner"), Seq("id"), "left")
        .select(col("id"), coalesce(col("winner"), col("label")).as("label"),
          col("winner").isNotNull.as("changed"))
        .transform(graft.core.Materialize.checkpoint)
      moved = newLabels.where(col("changed")).count()
      graft.core.Materialize.free(labelsCk)
      graft.core.Materialize.free(comVol)
      labelsCk = newLabels
      labels = newLabels.select("id", "label")
      if (verbose) System.err.println(
        f"[plm] pass $pass moved=$moved ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    nbrs.unpersist(blocking = false)
    labels
  }

  def run(spark: SparkSession, edges: DataFrame,
          cfg: Config = Config()): Result = {
    val canon0 = GraphOps.canonicalize(edges).transform(graft.core.Materialize.checkpoint)

    def level(canon: DataFrame, depth: Int): DataFrame = {
      val labels = movePhase(spark, canon, cfg)
      val nComms = labels.select("label").distinct().count()
      val nNodes = labels.count()
      if (nNodes - nComms < cfg.minShrink * nNodes ||
          depth + 1 >= cfg.maxLevels) labels
      else {
        // contract (ParallelPartitionCoarsening.cpp:20-70) and recurse
        val coarse = Coarsening.byPartition(canon, labels).transform(graft.core.Materialize.checkpoint)
        val coarseLabels = level(coarse, depth + 1)
        // prolong: fine node -> its community's coarse label
        labels.join(coarseLabels.select(col("id").as("label"),
            col("label").as("clabel")).withColumnRenamed("clabel", "flabel"),
            Seq("label"), "left")
          .select(col("id"), coalesce(col("flabel"), col("label")).as("label"))
      }
    }
    Result(level(canon0, 0), 1)
  }
}
