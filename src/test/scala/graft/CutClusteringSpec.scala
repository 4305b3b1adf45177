package graft

import org.apache.spark.sql.functions._
import graft.algo.CutClustering
import scala.collection.mutable

/** CutClustering (`community/CutClustering.cpp:16-80`) vs a sequential
  * Edmonds-Karp replay of the reference's exact loop — the same
  * parallel-vs-sequential equivalence pattern the other oracles use.
  * The minimal min-cut source side (residual reachability from the
  * source) is unique across all maximum flows, so push-relabel and
  * Edmonds-Karp must produce identical clusters, not just equal cut
  * values.
  */
class CutClusteringSpec extends SparkTestBase {

  /** Sequential max-flow (BFS augmenting paths) returning the residual-
    * reachable source side — `flow/EdmondsKarp.cpp` semantics on an
    * undirected capacity map.
    */
  private def sourceSide(nodes: Seq[Long], caps: Map[(Long, Long), Double],
                         s: Long, t: Long): Set[Long] = {
    val res = mutable.Map[(Long, Long), Double]().withDefaultValue(0.0)
    caps.foreach { case ((u, v), w) =>
      res((u, v)) += w; res((v, u)) += w
    }
    val adj = nodes.map(u => u -> nodes.filter(v =>
      res.contains((u, v)) || res.contains((v, u)))).toMap
    var augmenting = true
    while (augmenting) {
      // BFS for a residual s-t path
      val parent = mutable.Map[Long, Long]()
      val queue = mutable.Queue(s)
      val seen = mutable.Set(s)
      while (queue.nonEmpty && !seen.contains(t)) {
        val u = queue.dequeue()
        for (v <- adj(u) if !seen.contains(v) && res((u, v)) > 1e-12) {
          seen += v; parent(v) = u; queue.enqueue(v)
        }
      }
      if (!seen.contains(t)) augmenting = false
      else {
        val path = Iterator.iterate(t)(parent).takeWhile(_ != s).toSeq :+ s
        val arcs = path.reverse.sliding(2).map(p => (p(0), p(1))).toSeq
        val bot = arcs.map(res(_)).min
        arcs.foreach { case (u, v) =>
          res((u, v)) -= bot; res((v, u)) += bot
        }
      }
    }
    val side = mutable.Set(s)
    val queue = mutable.Queue(s)
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      for (v <- adj(u) if !side.contains(v) && res((u, v)) > 1e-12) {
        side += v; queue.enqueue(v)
      }
    }
    side.toSet
  }

  /** The reference loop verbatim: sink joined to all with alpha, nodes in
    * (degree desc, id asc) order, unclustered node's source side becomes
    * its cluster, overwriting absorbed labels.
    */
  private def brute(edges: Seq[(Long, Long, Double)],
                    alpha: Double): Map[Long, Long] = {
    val canon = edges.filter(e => e._1 != e._2)
      .map { case (u, v, w) => ((math.min(u, v), math.max(u, v)), w) }
      .groupBy(_._1).map { case (k, es) => k -> es.map(_._2).sum }
    val nodes = canon.keys.flatMap(k => Seq(k._1, k._2)).toSeq.distinct.sorted
    val sink = nodes.max + 1
    val caps = canon ++ nodes.map(u => (u, sink) -> alpha).toMap
    val deg = nodes.map(u => u ->
      canon.keys.count(k => k._1 == u || k._2 == u)).toMap
    val order = nodes.sortBy(u => (-deg(u), u))
    val labels = mutable.Map[Long, Long]()
    for (u <- order if !labels.contains(u)) {
      val side = sourceSide(nodes :+ sink, caps, u, sink)
      side.foreach(v => labels(v) = u)
    }
    labels.toMap
  }

  private def run(edges: Seq[(Long, Long, Double)],
                  alpha: Double): Map[Long, Long] =
    CutClustering.run(spark, edgeDF(edges), alpha, flowMaxRounds = 2000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two weight-3 K4s over a unit bridge split at alpha 2.5") {
    val k4a = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
    val k4b = k4a.map { case (u, v) => (u + 4, v + 4) }
    val edges = (k4a ++ k4b).map { case (u, v) => (u, v, 3.0) } :+
      (3L, 4L, 1.0)
    val got = run(edges, alpha = 2.5)
    assert(got == brute(edges, 2.5))
    assert(got.values.toSet.size == 2)
    assert((0L to 3L).map(got).toSet.size == 1)
    assert((4L to 7L).map(got).toSet.size == 1)
  }

  test("matches the sequential Edmonds-Karp replay on a random graph") {
    val rnd = new scala.util.Random(11)
    val n = 12
    val edges = (for {
      u <- 0L until n; v <- (u + 1) until n
      if rnd.nextDouble() < 0.3
    } yield (u, v, (rnd.nextInt(4) + 1).toDouble)).toSeq
    for (alpha <- Seq(1.5, 3.0))
      assert(run(edges, alpha) == brute(edges, alpha), s"alpha=$alpha")
  }

  test("alpha extremes: singletons when huge, one cluster per component when tiny") {
    val edges = undirected((0L, 1L), (1L, 2L), (2L, 0L), (5L, 6L))
    val big = run(edges, alpha = 100.0)
    assert(big == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 5L -> 5L, 6L -> 6L))
    val small = run(edges, alpha = 0.01)
    // first pick per component = max degree, ties by id: 0 and 5
    assert(small == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 5L -> 5L, 6L -> 5L))
  }

  test("rejects non-positive alpha and overflowing cluster count") {
    intercept[IllegalArgumentException] {
      CutClustering.run(spark, edgeDF(undirected((0L, 1L))), 0.0)
    }
    intercept[IllegalArgumentException] {
      CutClustering.run(spark,
        edgeDF(undirected((0L, 1L), (2L, 3L), (4L, 5L))),
        alpha = 100.0, maxClusters = 2)
    }
  }
}
