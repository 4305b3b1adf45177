package graft

import graft.algo.{ConnectedComponents, PageRank}
import graft.core.GraphOps
import graft.sources.Readers
import org.apache.spark.sql.functions._

/** Golden-value assertions against the reference's own test fixtures
  * (read-only inputs under /root/reference/input), reproducing the
  * reference gtest anchors end-to-end through our readers + algorithms.
  */
class GoldenFixturesSpec extends SparkTestBase {

  private val input = "/root/reference/input"

  test("astro-ph.graph (METIS) has exactly 1029 connected components") {
    // components/test/ConnectedComponentsGTest.cpp:61-69
    assume(new java.io.File(s"$input/astro-ph.graph").canRead)
    val s = spark
    import s.implicits._
    val edges = Readers.metis(spark, s"$input/astro-ph.graph")
    // isolated nodes are real nodes (header says n=16706): carry the full
    // universe via self-loops
    val header = spark.read.text(s"$input/astro-ph.graph")
      .limit(1).head().getString(0).trim.split("\\s+")
    val n = header(0).toLong
    val withAll = edges.select("src", "dst", "weight")
      .unionByName(spark.range(n).select(col("id").as("src"),
        col("id").as("dst"), lit(1.0).as("weight")))
    val count = ConnectedComponents.run(spark, withAll)
      .select("component").distinct().count()
    assert(count == 1029L)
  }

  test("wiki-Vote (SNAP) PageRank: argmax node 699, score ~0.00432") {
    // centrality/test/CentralityGTest.cpp:186-199 (reference defaults:
    // damp 0.85, tol 1e-8, undirected graph from SNAPGraphReader)
    assume(new java.io.File(s"$input/wiki-Vote.txt").canRead)
    val raw = Readers.snap(spark, s"$input/wiki-Vote.txt")
    val undirected = GraphOps.canonicalizeUnweighted(raw)
    val sym = GraphOps.symmetrize(undirected)
    val nodes = GraphOps.nodes(undirected)
    val res = PageRank.run(spark, sym, nodes,
      PageRank.Config(damping = 0.85, tol = 1e-8, maxIter = 200))
    val top = res.scores.orderBy(desc("score"), asc("id")).limit(1).head()
    assert(top.getLong(0) == 699L, s"argmax ${top.getLong(0)}")
    assert(math.abs(top.getDouble(1) - 0.00432) < 1e-3)
  }

  test("karate.graph (METIS): 34 nodes, 78 edges, one component") {
    assume(new java.io.File(s"$input/karate.graph").canRead)
    val edges = Readers.metis(spark, s"$input/karate.graph")
    val canon = GraphOps.canonicalizeUnweighted(edges)
    assert(canon.count() == 78L)
    assert(GraphOps.nodes(canon).count() == 34L)
    assert(ConnectedComponents.run(spark, canon)
      .select("component").distinct().count() == 1L)
  }
}
