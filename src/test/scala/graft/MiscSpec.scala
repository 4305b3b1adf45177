package graft

import graft.algo.{Assortativity, Generators, ClusteringGenerator, PageRank}
import graft.core.GraphOps
import graft.streaming.{GraphEvent, GraphEventType, IncrementalAnalytics}
import org.apache.spark.sql.functions._

class MiscSpec extends SparkTestBase {

  test("degree assortativity: star is disassortative") {
    val star = undirected((0, 1), (0, 2), (0, 3), (0, 4), (0, 5))
    assert(Assortativity.degreeAssortativity(spark, edgeDF(star)) < -0.9)
  }

  test("Erdos-Renyi: deterministic, edge count near expectation, valid pairs") {
    val n = 400L
    val p = 0.05
    val a = Generators.erdosRenyi(spark, n, p, seed = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Generators.erdosRenyi(spark, n, p, seed = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
    assert(a.forall { case (u, v) => u < v && v < n })
    val expected = p * n * (n - 1) / 2
    assert(math.abs(a.size - expected) < expected * 0.2, s"${a.size} vs $expected")
  }

  test("BA-like generator: early nodes accumulate high degree") {
    val df = Generators.barabasiAlbertLike(spark, 500, k = 3, seed = 1)
    val indeg = df.groupBy("dst").count()
    val top = indeg.orderBy(desc("count")).limit(10)
      .collect().map(_.getLong(0))
    assert(top.count(_ < 50) >= 7) // hubs are early nodes
  }

  test("clustering generators") {
    val s = spark
    import s.implicits._
    val nodes = (0L until 10L).toDF("id")
    assert(ClusteringGenerator.singleton(nodes).select("label").distinct().count() == 10)
    assert(ClusteringGenerator.allInOne(nodes).select("label").distinct().count() == 1)
    val bal = ClusteringGenerator.continuousBalanced(nodes, 5)
      .groupBy("label").count().collect().map(_.getLong(1))
    assert(bal.forall(_ == 2))
  }

  test("incremental streaming PageRank: warm-started state equals fresh run") {
    val s = spark
    import s.implicits._
    val stateDir = java.nio.file.Files.createTempDirectory("inc").toString

    // batch 1: a triangle
    val b1 = Seq(
      GraphEvent(GraphEventType.EdgeAddition, 0, 1, 1.0, 1),
      GraphEvent(GraphEventType.EdgeAddition, 1, 2, 1.0, 2),
      GraphEvent(GraphEventType.EdgeAddition, 2, 0, 1.0, 3)).toDS()
    IncrementalAnalytics.processBatch(spark, stateDir, b1, tol = 1e-9)
    // batch 2: attach a tail and remove one edge
    val b2 = Seq(
      GraphEvent(GraphEventType.EdgeAddition, 2, 3, 1.0, 4),
      GraphEvent(GraphEventType.EdgeRemoval, 0, 1, 0.0, 5)).toDS()
    IncrementalAnalytics.processBatch(spark, stateDir, b2, tol = 1e-9)

    val scores = spark.read.parquet(s"$stateDir/scores")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // fresh run on the final graph
    val finalEdges = edgeDF(Seq((1L, 2L, 1.0), (2L, 0L, 1.0), (2L, 3L, 1.0)))
    val fresh = PageRank.run(spark, GraphOps.symmetrize(finalEdges),
      GraphOps.nodes(finalEdges), PageRank.Config(tol = 1e-9))
      .scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores.keySet == fresh.keySet)
    scores.foreach { case (id, v) =>
      assert(math.abs(v - fresh(id)) < 1e-6, s"node $id: $v vs ${fresh(id)}")
    }
  }
}
