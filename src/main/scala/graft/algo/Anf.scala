package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps

/** ANF / neighborhood-function approximation via Flajolet–Martin bitmask
  * sketches — the reference's `EffectiveDiameterApproximation`
  * (`distance/EffectiveDiameterApproximation.cpp:13-75`): each node carries
  * `r` 64-bit FM bitmasks; per hop every node ORs in its neighbors' masks
  * (`mCurr[v] |= mPrev[u]`); the estimated number of nodes within h hops is
  * `2^(mean lowest-zero-bit) / 0.77351`.
  *
  * Spark-native shape: the sketch is `r` BIGINT columns and the per-hop
  * update is `groupBy(dst).agg(bit_or(...))` — built-in, codegen'd, and
  * map-side-combinable, so a hub's millions of incoming masks collapse to
  * one partial per partition before the shuffle. No custom UDAF needed;
  * `bit_or` is the TypedImperativeAggregate the reference hand-rolled.
  *
  * Seeding matches the FM recipe: node u sets bit b in sketch k with
  * probability 2^-(b+1) — the trailing-zero count of a counter-based
  * `xxhash64(id, k)`: deterministic and partition-invariant.
  */
object Anf {

  private val phi = 0.77351

  /** FM seed mask for sketch k: one bit at Geometric(1/2) position. */
  private def fmBit(k: Int): Column =
    expr(s"shiftleft(cast(1 as bigint), cast(least(62.0, coalesce(log2(xxhash64(id, $k) & -xxhash64(id, $k)), 62.0)) as int))")

  /** Position of the lowest zero bit of sketch column s$k, as double. */
  private def lowestZero(k: Int): Column =
    expr(s"cast(least(62.0, coalesce(log2((~s$k) & -(~s$k)), 62.0)) as double)")

  /** Run sketch-propagation rounds until the global estimate stabilizes (or
    * `maxHops`). Returns `(hop, est_neighborhood)` — the neighborhood
    * function N(h): mean estimated h-hop neighborhood size over nodes.
    */
  def neighborhoodFunction(spark: SparkSession, edges: DataFrame,
                           r: Int = 8, maxHops: Int = 32,
                           directed: Boolean = false): DataFrame = {
    val sym = (if (directed) edges else GraphOps.symmetrize(edges))
      .select("src", "dst").transform(graft.core.Materialize.checkpoint)
    val nodes = GraphOps.nodes(sym.withColumn("weight", lit(1.0)))

    var state = nodes.select(
      (col("id") +: (0 until r).map(k => fmBit(k).as(s"s$k"))): _*)
      .transform(graft.core.Materialize.checkpoint)

    val estimates = scala.collection.mutable.ArrayBuffer.empty[(Int, Double)]
    var hop = 0
    var changed = true
    while (changed && hop < maxHops) {
      hop += 1
      val aggCols = (0 until r).map(k => bit_or(col(s"s$k")).as(s"n$k"))
      val fromNbr = sym
        .join(state.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(aggCols.head, aggCols.tail: _*)
      val next = state.join(fromNbr, Seq("id"), "left")
        .select((col("id") +: (0 until r).map { k =>
          (col(s"s$k").bitwiseOR(coalesce(col(s"n$k"), lit(0L)))).as(s"s$k")
        }): _*)
        .transform(graft.core.Materialize.checkpoint)
      val meanLowestZero = (0 until r).map(lowestZero).reduce(_ + _) / r
      val est = next.agg(avg(pow(lit(2.0), meanLowestZero))).head()
        .getDouble(0) / phi
      estimates += ((hop, est))
      changed = estimates.size < 2 ||
        math.abs(estimates(estimates.size - 2)._2 - est) > 1e-12
      state = next
    }
    import spark.implicits._
    estimates.toSeq.toDF("hop", "est_neighborhood")
  }

  /** Effective diameter at quantile q (default 0.9): smallest h with
    * N(h) ≥ q·N(h_max) — reference semantics
    * (`EffectiveDiameterApproximation.cpp:40-75`).
    */
  def effectiveDiameter(spark: SparkSession, edges: DataFrame,
                        ratio: Double = 0.9, r: Int = 8,
                        maxHops: Int = 64): Double = {
    val nf = neighborhoodFunction(spark, edges, r, maxHops).collect()
      .map(row => (row.getInt(0), row.getDouble(1)))
    if (nf.isEmpty) return 0.0
    val nInf = nf.last._2
    nf.find(_._2 >= ratio * nInf).map(_._1.toDouble).getOrElse(nf.last._1.toDouble)
  }

  /** HopPlotApproximation (`distance/HopPlotApproximation.cpp` surface):
    * the neighborhood function normalized by its limit — fraction of
    * reachable pairs within h hops, per hop.
    */
  def hopPlot(spark: SparkSession, edges: DataFrame, r: Int = 8,
              maxHops: Int = 64): DataFrame = {
    val nf = neighborhoodFunction(spark, edges, r, maxHops)
    val total = nf.agg(max("est_neighborhood")).head().getDouble(0)
    nf.select(col("hop"),
      (col("est_neighborhood") / total).as("fraction"))
  }

  /** Exact hop-plot / exact effective diameter for verification: distances
    * from every node via batched multi-source BFS (small graphs only).
    */
  def exactEffectiveDiameter(spark: SparkSession, edges: DataFrame,
                             ratio: Double = 0.9): Double = {
    val nodes = GraphOps.nodes(edges)
    val dists = SSSP.bfs(spark, edges, nodes, directed = false)
    val total = dists.count().toDouble
    val byHop = dists.groupBy("dist").count().orderBy("dist").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    var cum = 0L
    for ((h, c) <- byHop) {
      cum += c
      if (cum >= ratio * total) return h.toDouble
    }
    byHop.lastOption.map(_._1.toDouble).getOrElse(0.0)
  }
}
