package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.core.{GraphOps, Materialize}

/** Effective-resistance family — SpanningEdgeCentrality
  * (`centrality/SpanningEdgeCentrality.cpp`) and CommuteTimeDistance
  * (`distance/CommuteTimeDistance.cpp`) — via a batched Jacobi-
  * preconditioned conjugate-gradient Laplacian solver.
  *
  * The reference backs both operators with its LAMG multigrid solver (an
  * iterative tol-bounded solver, setup tol 1e-5); a distributed multigrid
  * hierarchy is not a DataFrame-shaped object, but CG is: every iteration
  * is ONE edge-scale SpMV (join + partial-aggregated groupBy — the exact
  * PageRank contribution shape, hub-safe) plus node-scale axpy updates and
  * two per-q scalar reductions (the same control-plane convergence collects
  * PageRank's L2 stop uses). All Q right-hand sides advance SIMULTANEOUSLY
  * — state is keyed by (id, q) — so a k-vector JL sketch or a k-pair batch
  * costs k× rows per job, not k× jobs.
  *
  * Scale shape: per iteration one (id)-keyed exchange of the Q·n state into
  * the SpMV join, one (dst,q) aggregation exchange, zero driver-side data
  * motion beyond the Q-row scalar frame. Iteration count is the PCG bound
  * O(√κ(D⁻¹L)·log 1/tol) — the Jacobi preconditioner absorbs the degree
  * spread that dominates κ on power-law graphs.
  */
object Resistance {

  /** Solve `L x = b` on the undirected weighted graph for Q simultaneous
    * right-hand sides, where L = D − A is the loop-free weighted Laplacian.
    *
    * @param rhs  `(id BIGINT, q BIGINT, b DOUBLE)` — only nonzero entries
    *             need rows. Each q-slice must sum to zero within every
    *             connected component it touches (`b ∈ range(L)`; the ±1
    *             pair / JL-sketch right-hand sides below satisfy this by
    *             construction). Pairs spanning two components make that
    *             slice non-solvable — it exits at `maxIter` with its
    *             residual reported, never silently.
    * @return `(id, q, x, rnorm)` — the solution (x ⊥ 1 per component up to
    *         solver tolerance, matching the pseudoinverse solution
    *         differences the scores below consume) and the final residual
    *         L2 norm of that q-slice (diagnostic; ≤ tol·||b||₂ when
    *         converged).
    */
  def cgSolve(spark: SparkSession, edges: DataFrame, rhs: DataFrame,
              tol: Double = 1e-8, maxIter: Int = 500): DataFrame = {
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sym = GraphOps.symmetrize(
        GraphOps.canonicalize(edges.where(col("src") =!= col("dst"))))
      .repartition(parts, col("src"))
      .sortWithinPartitions("src")
      .persist(StorageLevel.MEMORY_AND_DISK)
    sym.count()
    val deg = GraphOps.weightedDegrees(sym) // (id, wdegree) = diag(L)

    // state: (id, q, d, x, r, p) over the full node×q grid (dense in id so
    // the SpMV's left join preserves the universe, like PageRank's state)
    val qs = rhs.select("q").distinct()
    var state = deg.crossJoin(broadcast(qs))
      .join(rhs, Seq("id", "q"), "left")
      .select(col("id"), col("q"), col("wdegree").as("d"),
        lit(0.0).as("x"),
        coalesce(col("b"), lit(0.0)).as("r"),
        (coalesce(col("b"), lit(0.0)) / col("wdegree")).as("p"))
      .repartition(parts, col("id"))
      .transform(Materialize.checkpoint)

    // per-q running scalars: rz = rᵀz (z = D⁻¹r), bnorm = ||b||₂
    def collectPerQ(df: DataFrame, exprs: (String, org.apache.spark.sql.Column)*)
        : Map[Long, Array[Double]] =
      df.groupBy("q").agg(exprs.head._2.as(exprs.head._1),
          exprs.tail.map { case (n, e) => e.as(n) }: _*)
        .collect()
        .map(row => row.getLong(0) ->
          exprs.indices.map(i => row.getDouble(i + 1)).toArray)
        .toMap
    var rz = collectPerQ(state, "v" -> sum(col("r") * col("r") / col("d")))
      .map { case (q, a) => q -> a(0) }
    val bnorm = collectPerQ(state, "v" -> sum(col("r") * col("r")))
      .map { case (q, a) => q -> math.sqrt(a(0)) }
    val target = bnorm.map { case (q, b) => q -> math.max(tol * b, 1e-300) }

    var iter = 0
    var maxRel = Double.MaxValue
    var rnorm: Map[Long, Double] = bnorm
    // `backing` = the pinned checkpoint the current (possibly lazy) state
    // projection reads from; freed as soon as the next checkpoint exists
    var backing = state
    while (iter < maxIter && maxRel > 1.0) {
      iter += 1
      // SpMV: Ap(u,q) = d(u)·p(u,q) − Σ_v w(u,v)·p(v,q)
      val nbr = sym
        .join(state.select(col("id").as("src"), col("q"), col("p")), "src")
        .groupBy(col("dst").as("id"), col("q"))
        .agg(sum(col("weight") * col("p")).as("s"))
      val stA = state.join(nbr, Seq("id", "q"), "left")
        .select(col("id"), col("q"), col("d"), col("x"), col("r"), col("p"),
          (col("d") * col("p") - coalesce(col("s"), lit(0.0))).as("ap"))
        .transform(Materialize.checkpoint)
      Materialize.free(backing)
      val pap = collectPerQ(stA, "v" -> sum(col("p") * col("ap")))
        .map { case (q, a) => q -> a(0) }
      val alphaDf = broadcast(spark.createDataFrame(
        rz.keys.toSeq.map(q =>
          (q, if (math.abs(pap(q)) > 0) rz(q) / pap(q) else 0.0)))
        .toDF("q", "alpha"))
      val stB = stA.join(alphaDf, "q")
        .select(col("id"), col("q"), col("d"),
          (col("x") + col("alpha") * col("p")).as("x"),
          (col("r") - col("alpha") * col("ap")).as("r"), col("p"))
        .transform(Materialize.checkpoint)
      Materialize.free(stA)
      val sc = collectPerQ(stB,
        "rz" -> sum(col("r") * col("r") / col("d")),
        "rn" -> sum(col("r") * col("r")))
      val rzNew = sc.map { case (q, a) => q -> a(0) }
      rnorm = sc.map { case (q, a) => q -> math.sqrt(a(1)) }
      maxRel = rnorm.map { case (q, v) => v / target(q) }.max
      val betaDf = broadcast(spark.createDataFrame(
        rz.keys.toSeq.map(q =>
          (q, if (math.abs(rz(q)) > 0) rzNew(q) / rz(q) else 0.0)))
        .toDF("q", "beta"))
      rz = rzNew
      backing = stB
      // p' = z' + β p — a lazy projection over the pinned stB; the next
      // iteration's SpMV exchange re-keys it by id anyway
      state = stB.join(betaDf, "q")
        .select(col("id"), col("q"), col("d"), col("x"), col("r"),
          (col("r") / col("d") + col("beta") * col("p")).as("p"))
    }
    val rnormDf = broadcast(spark.createDataFrame(
      rnorm.toSeq).toDF("q", "rnorm"))
    // materialize the solution off the loop state, then release the cached
    // edge table and the final loop checkpoint
    val out = state.join(rnormDf, "q").select("id", "q", "x", "rnorm")
      .transform(Materialize.checkpoint)
    Materialize.free(backing)
    sym.unpersist(blocking = false)
    out
  }

  /** Solve the ±1-pair systems `L x_q = e_u − e_v` for a batch of node
    * pairs and return each pair's potential difference
    * `x_q(u) − x_q(v)` = effective resistance R_eff(u,v). The shared
    * building block of exact SpanningEdgeCentrality and
    * CommuteTimeDistance — the reference solves the identical systems one
    * LAMG call at a time (`SpanningEdgeCentrality.cpp:46-60`,
    * `CommuteTimeDistance.cpp:49-63`); here the whole batch advances in
    * one CG run. Pairs must lie within one connected component.
    *
    * `pairs`: `(u BIGINT, v BIGINT)`, distinct. Intended for explicit
    * query batches (the all-pairs / all-edges exact variants are the
    * reference's own quadratic verification baselines).
    */
  def pairResistance(spark: SparkSession, edges: DataFrame,
                     pairs: DataFrame, tol: Double = 1e-8,
                     maxIter: Int = 500): DataFrame = {
    val pq = graft.core.DenseId.assign(
      pairs.select("u", "v").distinct(), "q", Seq("u", "v"))
    val rhs = pq.select(col("u").as("id"), col("q"), lit(1.0).as("b"))
      .unionByName(pq.select(col("v").as("id"), col("q"), lit(-1.0).as("b")))
    val sol = cgSolve(spark, edges, rhs, tol, maxIter)
    pq.join(sol.select(col("id").as("u"), col("q"), col("x").as("xu")),
        Seq("u", "q"))
      .join(sol.select(col("id").as("v"), col("q"), col("x").as("xv"),
        col("rnorm")), Seq("v", "q"))
      .select(col("u"), col("v"), (col("xu") - col("xv")).as("resistance"),
        col("rnorm"))
  }

  /** SpanningEdgeCentrality, exact (`SpanningEdgeCentrality.cpp:35-62`
    * `run()`): score(e) = R_eff(u,v) — for unweighted graphs the fraction
    * of spanning trees containing e. One solve per edge, so quadratic by
    * definition; the reference's own exact mode is the same shape. Use
    * [[spanningEdgeApprox]] at scale.
    */
  def spanningEdgeExact(spark: SparkSession, edges: DataFrame,
                        tol: Double = 1e-8): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))
    pairResistance(spark, edges,
        canon.select(col("src").as("u"), col("dst").as("v")), tol)
      .select(col("u").as("src"), col("v").as("dst"),
        abs(col("resistance")).as("score"))
  }

  /** SpanningEdgeCentrality, JL approximation
    * (`SpanningEdgeCentrality.cpp:69-106` runApproximation /
    * runParallelApproximation): k = ⌈log₂n⌉/ε² random ±1/√k edge-signed
    * right-hand sides `y_q = Bᵀ χ_q`, solve `L z_q = y_q`, then
    * score(e=(u,v)) = Σ_q (z_q(u) − z_q(v))² ≈ R_eff(e) (Spielman-
    * Srivastava sketch). The reference's per-edge coin flips are
    * determinized to an edge-keyed hash (`xxhash64(src,dst,seed,q)`
    * parity) — same distribution, replayable, and the q systems become
    * embarrassingly batchable.
    */
  def spanningEdgeApprox(spark: SparkSession, edges: DataFrame,
                         eps: Double = 0.3, seed: Long = 42,
                         tol: Double = 1e-6, maxIter: Int = 500,
                         kOverride: Int = 0): DataFrame = {
    val canon = GraphOps.canonicalizeUnweighted(
        edges.where(col("src") =!= col("dst")))
      .select("src", "dst")
      .transform(Materialize.checkpoint)
    val n = GraphOps.nodes(canon.withColumn("weight", lit(1.0))).count()
    val k =
      if (kOverride > 0) kOverride
      else math.ceil(math.ceil(math.log(n.toDouble) / math.log(2.0)) /
        (eps * eps)).toInt
    val qRange = spark.range(k).select(col("id").as("q"))
    val chi = canon.crossJoin(qRange)
      .withColumn("chi",
        when(pmod(xxhash64(col("src"), col("dst"), lit(seed), col("q")),
          lit(2L)) === 0, lit(1.0 / math.sqrt(k.toDouble)))
          .otherwise(lit(-1.0 / math.sqrt(k.toDouble))))
    val rhs = chi.select(col("src").as("id"), col("q"), col("chi").as("b"))
      .unionByName(chi.select(col("dst").as("id"), col("q"),
        (-col("chi")).as("b")))
      .groupBy("id", "q").agg(sum("b").as("b"))
    val sol = cgSolve(spark, edges, rhs, tol, maxIter)
    canon.crossJoin(qRange)
      .join(sol.select(col("id").as("src"), col("q"), col("x").as("xu")),
        Seq("src", "q"))
      .join(sol.select(col("id").as("dst"), col("q"), col("x").as("xv")),
        Seq("dst", "q"))
      .groupBy("src", "dst")
      .agg(sum(pow(col("xu") - col("xv"), 2)).as("score"))
  }

  /** CommuteTimeDistance for a batch of pairs
    * (`CommuteTimeDistance.cpp:163-175` distance(), exact mode):
    * `ctd(u,v) = sqrt(R_eff(u,v) · m)` — the reference's unweighted
    * convention (`sqrt(distances[u][v] * G.numberOfEdges())`).
    */
  def commuteTime(spark: SparkSession, edges: DataFrame, pairs: DataFrame,
                  tol: Double = 1e-8, maxIter: Int = 500): DataFrame = {
    val m = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).count()
    pairResistance(spark, edges, pairs, tol, maxIter)
      .select(col("u"), col("v"),
        sqrt(abs(col("resistance")) * m.toDouble).as("ctd"))
  }
}
