package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** Closeness-family centralities (`centrality/Closeness.cpp`,
  * `TopCloseness.cpp` — SURVEY.md §2.4): distance sums from batched
  * multi-source BFS. At web scale exact all-sources closeness is
  * quadratic by definition; the practical operators are (a) closeness for
  * an explicit source set (all sources advance in the same frontier jobs)
  * and (b) sampled approximation (`ApproxCloseness.cpp` shape) with a
  * deterministic hash-chosen sample.
  */
object Closeness {

  /** Closeness for the given sources over the undirected graph:
    * `c(s) = (reached-1) / Σ dist` (the reference normalizes by component
    * size; unreachable nodes don't contribute). Also emits harmonic
    * closeness `Σ 1/dist` (robust on disconnected graphs).
    */
  def forSources(spark: SparkSession, edges: DataFrame,
                 sources: DataFrame): DataFrame = {
    val dists = SSSP.bfs(spark, edges, sources)
    dists.where(col("dist") > 0)
      .groupBy(col("source").as("id"))
      .agg(count(lit(1)).as("reached"),
        sum("dist").as("dist_sum"),
        sum(lit(1.0) / col("dist")).as("harmonic"))
      .select(col("id"),
        (col("reached").cast("double") / col("dist_sum")).as("closeness"),
        col("harmonic"))
  }

  /** Deterministic sampled closeness: sources = nodes with the `k` smallest
    * `xxhash64(id, seed)` values (a uniform, reproducible sample).
    */
  def sampled(spark: SparkSession, edges: DataFrame, k: Int,
              seed: Long = 42): DataFrame = {
    val sources = GraphOps.nodes(edges)
      .orderBy(xxhash64(col("id"), lit(seed)), col("id")).limit(k)
      .select("id")
    forSources(spark, edges, sources)
  }
}

/** Exact top-k closeness WITHOUT the all-sources scan — the batch
  * reformulation of the reference's pruned search
  * (`centrality/TopCloseness.cpp` BFScut: expand candidates best-bound
  * first, cut as soon as an upper bound falls under the kth-best exact
  * score). The driver-friendly bound: every non-neighbor of `u` inside
  * its component (size r) sits at distance ≥ 2, so
  * `S(u) ≥ deg(u) + 2·(r−1−deg(u))` ⇒
  * `c(u) = (r−1)/S(u) ≤ (r−1)/(2(r−1)−deg(u))`.
  * Candidates run in descending-bound batches through ONE multi-source BFS
  * per batch; after each batch the kth-best exact closeness rises and every
  * candidate whose bound is strictly below it is discarded wholesale (it
  * cannot enter the top-k under any tie-break, its exact score being
  * strictly smaller). On power-law graphs the first batch contains the
  * hubs, the cutoff lands above the long tail's bound, and the search
  * expands O(batch) ≪ n sources. Worst case (near-regular graphs, tight
  * ties) degrades to the exact scan, never returning a wrong answer.
  */
object TopCloseness {

  final case class Result(top: DataFrame, sourcesExpanded: Long,
                          candidates: Long)

  def run(spark: SparkSession, edges: DataFrame, k: Int,
          batchSize: Int = 1024): Result = {
    import graft.core.Materialize.checkpoint
    // the BFS graph is the symmetrized simple view — the bound's degree
    // must count distinct neighbors in exactly that graph
    val simple = GraphOps.symmetrize(GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))).select("src", "dst").distinct()
    val deg = simple.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val comps = ConnectedComponents.run(spark, edges)
    val csize = comps.groupBy("component").agg(count(lit(1)).as("sz"))
    val cand = comps.join(csize, "component").join(deg, "id")
      .where(col("sz") > 1)
      .select(col("id"),
        ((col("sz") - 1).cast("double") /
          (lit(2) * (col("sz") - 1) - col("deg")).cast("double")).as("ub"))
      .transform(checkpoint)
    val candN = cand.count()

    var remaining = cand
    var remCount = candN
    var acc: Option[DataFrame] = None
    var expanded = 0L
    var xk = Double.NegativeInfinity
    while (remCount > 0) {
      val batch = remaining.orderBy(desc("ub"), asc("id")).limit(batchSize)
        .select("id").transform(checkpoint)
      expanded += batch.count()
      val res = Closeness.forSources(spark, edges, batch)
      acc = Some(acc.map(_.unionByName(res)).getOrElse(res)
        .transform(checkpoint))
      // kth-best exact closeness so far — k rows to the driver, nothing more
      val topkRows = acc.get.orderBy(desc("closeness"), asc("id")).limit(k)
        .select("closeness").collect()
      if (topkRows.length >= k) xk = topkRows.last.getDouble(0)
      remaining = remaining.join(batch, Seq("id"), "left_anti")
        .where(col("ub") >= xk)
        .transform(checkpoint)
      remCount = remaining.count()
    }
    val top = acc.getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("closeness",
              org.apache.spark.sql.types.DoubleType),
            org.apache.spark.sql.types.StructField("harmonic",
              org.apache.spark.sql.types.DoubleType)))))
      .orderBy(desc("closeness"), asc("id")).limit(k)
    Result(top, expanded, candN)
  }
}

/** Per-edge node-distance measures (`distance/JaccardDistance.cpp:40-41`,
  * `distance/AdamicAdarDistance.cpp:30-58` — SURVEY.md §2.8): distances
  * attached to EXISTING edges, both derived from the degree-ordered
  * triangle listing (hub-safe — never a per-node neighborhood cross
  * product). An edge whose endpoints share no neighbor has no finite
  * Adamic-Adar distance (the reference's 1/0 = +∞) and is absent from the
  * output — the same absent-row convention BFS uses for unreachable nodes.
  */
object NodeDistances {

  private def simpleAndDegrees(edges: DataFrame): (DataFrame, DataFrame) = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst"))).select("src", "dst")
    val deg = GraphOps.degrees(GraphOps.symmetrize(
      canon.withColumn("weight", lit(1.0))))
    (canon, deg)
  }

  /** jd(u,v) = 1 − t/(deg u + deg v − t), t = the edge's triangle count. */
  def jaccardDistance(spark: SparkSession, edges: DataFrame): DataFrame = {
    val (_, deg) = simpleAndDegrees(edges)
    Triangles.perEdge(spark, edges)
      .join(deg.select(col("id").as("src"), col("degree").as("du")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dv")), "dst")
      .select(col("src"), col("dst"),
        (lit(1.0) - col("triangles") /
          (col("du") + col("dv") - col("triangles")).cast("double"))
          .as("distance"))
  }

  /** aad(u,v) = 1 / Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w) — each triangle
    * contributes its opposite corner to each of its three edges
    * (`AdamicAdarDistance.cpp:37-46` accumulation, dataflow-reformulated).
    */
  def adamicAdarDistance(spark: SparkSession, edges: DataFrame): DataFrame = {
    val (canon, deg) = simpleAndDegrees(edges)
    val tris = Triangles.triangles(spark, edges)
    val contrib = tris.select(col("u").as("a"), col("v").as("b"), col("w").as("c"))
      .unionByName(tris.select(col("u").as("a"), col("w").as("b"), col("v").as("c")))
      .unionByName(tris.select(col("v").as("a"), col("w").as("b"), col("u").as("c")))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"), col("c"))
    val aa = contrib
      .join(deg.select(col("id").as("c"), col("degree").as("dc")), "c")
      .groupBy("src", "dst").agg(sum(lit(1.0) / log(col("dc"))).as("aa"))
    canon.join(aa, Seq("src", "dst"))
      .select(col("src"), col("dst"), (lit(1.0) / col("aa")).as("distance"))
  }
}

/** Minimum spanning forest via Borůvka rounds — the scalable replacement
  * for the reference's sequential `KruskalMSF` (`graph/KruskalMSF.cpp`,
  * SURVEY.md §2.8): per round every component picks its lightest outgoing
  * edge (deterministic tie-break on (weight, src, dst)), the picked edges
  * join the forest, components contract via hash-min, repeat until no
  * outgoing edges remain. O(log n) rounds, each one join + two aggregations.
  */
object SpanningForest {

  /** Maximum spanning forest (`graph/RandomMaximumSpanningForest.cpp`
    * capability, determinized: the reference breaks weight ties with a
    * random attribute, here ties break on ascending (src, dst) — one fixed
    * member of the max-forest family): Borůvka on negated weights.
    */
  def maximumSpanningForest(spark: SparkSession, edges: DataFrame,
                            maxRounds: Int = 64): DataFrame =
    minimumSpanningForest(spark,
        edges.withColumn("weight", -col("weight")), maxRounds)
      .withColumn("weight", -col("weight"))

  def minimumSpanningForest(spark: SparkSession, edges: DataFrame,
                            maxRounds: Int = 64): DataFrame = {
    val canon = GraphOps.canonicalize(edges.where(col("src") =!= col("dst")))
      .transform(Materialize.checkpoint)
    var labels = GraphOps.nodes(canon)
      .select(col("id"), col("id").as("comp"))
      .transform(Materialize.checkpoint)
    var forest = canon.limit(0)
    var round = 0
    var picked = 1L
    while (picked > 0 && round < maxRounds) {
      round += 1
      val lab = labels
      val withComps = canon
        .join(lab.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(lab.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .where(col("csrc") =!= col("cdst"))
      // lightest outgoing edge per component (both directions considered)
      val outgoing = withComps.select(col("csrc").as("comp"), col("src"),
          col("dst"), col("weight"))
        .unionByName(withComps.select(col("cdst").as("comp"), col("src"),
          col("dst"), col("weight")))
      val pickedEdges = outgoing.groupBy("comp")
        .agg(min(struct(col("weight"), col("src"), col("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"),
          col("e.weight").as("weight"))
        .distinct()
        .transform(Materialize.checkpoint)
      picked = pickedEdges.count()
      if (picked > 0) {
        forest = forest.unionByName(pickedEdges)
          .transform(Materialize.checkpoint)
        // contract: components connected by picked edges merge (hash-min
        // label propagation over the picked-edge graph of components)
        val compEdges = pickedEdges
          .join(lab.select(col("id").as("src"), col("comp").as("a")), "src")
          .join(lab.select(col("id").as("dst"), col("comp").as("b")), "dst")
          .select("a", "b")
        val grouped = ConnectedComponents.run(spark,
          compEdges.select(col("a").as("src"), col("b").as("dst"))
            .withColumn("weight", lit(1.0)))
          .withColumnRenamed("id", "comp")
        // representative = smallest original comp id in each merged group,
        // so labels stay in the original id space (no collisions)
        val reps = grouped.join(
          grouped.groupBy("component").agg(min("comp").as("rep")), "component")
          .select("comp", "rep")
        labels = labels.join(reps, Seq("comp"), "left")
          .select(col("id"), coalesce(col("rep"), col("comp")).as("comp"))
          .transform(Materialize.checkpoint)
      }
    }
    forest
  }

  /** UnionMaximumSpanningForest (`graph/UnionMaximumSpanningForest.cpp:
    * 37-76`): every edge that belongs to AT LEAST ONE maximum spanning
    * forest. The reference walks edges in strictly descending weight
    * groups against a union-find whose merges are deferred until the
    * group closes — so an edge is in the union iff its endpoints lie in
    * different components of the strictly-heavier subgraph. Re-expressed
    * distributed: one pass per DISTINCT weight (descending); each pass is
    * an endpoint-label join of that weight group against the current
    * component labels (= components of everything strictly heavier),
    * then a component-graph CC merge — the same contraction step Borůvka
    * above uses. The distinct-weight list is a guarded control-plane
    * collect (`maxLevels`): the operator targets the discretized edge
    * scores its sparsification consumers produce (triangle counts,
    * thresholded scores); continuous weights must be quantized first —
    * failing loudly beats an unbounded driver loop.
    */
  def unionMaximumSpanningForest(spark: SparkSession, edges: DataFrame,
                                 maxLevels: Int = 64): DataFrame = {
    val canon = GraphOps.canonicalize(edges.where(col("src") =!= col("dst")))
      .transform(Materialize.checkpoint)
    val levels = canon.select("weight").distinct()
      .orderBy(desc("weight")).limit(maxLevels + 1)
      .collect().map(_.getDouble(0))
    require(levels.length <= maxLevels,
      s"unionMaximumSpanningForest: more than $maxLevels distinct weights; " +
        "quantize the weights (the reference semantics are per-distinct-" +
        "weight sequential) or raise maxLevels")
    var labels = GraphOps.nodes(canon)
      .select(col("id"), col("id").as("comp"))
      .transform(Materialize.checkpoint)
    var union = canon.limit(0)
    for (w <- levels) {
      val lab = labels
      val inUnion = canon.where(col("weight") === w)
        .join(lab.select(col("id").as("src"), col("comp").as("csrc")), "src")
        .join(lab.select(col("id").as("dst"), col("comp").as("cdst")), "dst")
        .where(col("csrc") =!= col("cdst"))
        .transform(Materialize.checkpoint)
      if (inUnion.count() > 0) {
        union = union.unionByName(inUnion.select("src", "dst", "weight"))
          .transform(Materialize.checkpoint)
        // merge the group's connections into the labels (deferred like the
        // reference's nodesToMerge: labels seen by THIS group predate it)
        val grouped = ConnectedComponents.run(spark,
          inUnion.select(col("csrc").as("src"), col("cdst").as("dst"))
            .withColumn("weight", lit(1.0)))
          .withColumnRenamed("id", "comp")
        val reps = grouped.join(
          grouped.groupBy("component").agg(min("comp").as("rep")), "component")
          .select("comp", "rep")
        labels = labels.join(reps, Seq("comp"), "left")
          .select(col("id"), coalesce(col("rep"), col("comp")).as("comp"))
          .transform(Materialize.checkpoint)
      }
    }
    union
  }
}

/** Luby's maximal independent set (`independentset/Luby.cpp`, SURVEY.md
  * §2.8 "Spark-feasible if needed"): per round each live node draws a
  * deterministic priority — `md5(seed|round|id)` concatenated with the
  * zero-padded id into one totally-ordered string key (md5 rather than
  * xxhash64 so the DuckDB oracle can replay the exact run; lexicographic
  * compare of lowercase hex is engine-independent). Nodes that beat every
  * live neighbor join the set, their neighborhoods leave the graph.
  * Expected O(log n) rounds.
  */
object IndependentSet {

  /** The per-round total-order priority key of node `idCol`. */
  def priorityKey(idCol: Column, seed: Long, round: Int): Column =
    concat(md5(concat_ws("|", lit(seed), lit(round), idCol)),
      lpad(idCol.cast("string"), 12, "0"))

  def luby(spark: SparkSession, edges: DataFrame, seed: Long = 42,
           maxRounds: Int = 64): DataFrame = {
    val simple = GraphOps.symmetrize(GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))).select("src", "dst")
    var live = simple.transform(Materialize.checkpoint)
    var liveNodes = GraphOps.nodes(
      edges.select("src", "dst").withColumn("weight", lit(1.0)))
      .transform(Materialize.checkpoint)
    val winnersAcc = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var round = 0
    var remaining = liveNodes.count()
    while (remaining > 0 && round < maxRounds) {
      round += 1
      val prio = liveNodes.select(col("id"),
        priorityKey(col("id"), seed, round).as("p"))
      // a node wins if its key beats every live neighbor's
      val nbrBest = live
        .join(prio.select(col("id").as("src"), col("p").as("ps")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("ps")).as("nb"))
      val winners = prio.join(nbrBest, Seq("id"), "left")
        .where(col("nb").isNull || col("p") < col("nb"))
        .select("id")
        .transform(Materialize.checkpoint)
      winnersAcc += winners
      // remove winners and their neighbors
      val removed = winners.unionByName(
        live.join(winners.withColumnRenamed("id", "src"), Seq("src"), "left_semi")
          .select(col("dst").as("id"))).distinct()
        .transform(Materialize.checkpoint)
      liveNodes = liveNodes.join(removed, Seq("id"), "left_anti")
        .transform(Materialize.checkpoint)
      live = live
        .join(removed.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
        .join(removed.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
        .select("src", "dst")
        .transform(Materialize.checkpoint)
      remaining = liveNodes.count()
    }
    winnersAcc.reduce(_ unionByName _).distinct()
  }
}
