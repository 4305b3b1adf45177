package graft

import graft.algo.{Anf, EdgeScores, PLM, Triangles}
import graft.quality.Metrics
import graft.sources.{Readers, Writers}
import graft.streaming.GraphEventType
import org.apache.spark.sql.functions._
import java.nio.file.Files

class AnfSpec extends SparkTestBase {

  test("neighborhood function grows then saturates on a path") {
    val path = (0L until 20L).sliding(2).map(p => (p(0), p(1), 1.0)).toSeq
    val nf = Anf.neighborhoodFunction(spark, edgeDF(path), r = 16, maxHops = 25)
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(nf.length >= 2)
    val ests = nf.map(_._2)
    assert(ests.last >= ests.head) // monotone-ish growth
  }

  test("approx effective diameter within 2x of exact on a small power-law graph") {
    val df = graft.ingest.PageGen.edges(spark, 150, seed = 5, maxOutDeg = 8)
    val exact = Anf.exactEffectiveDiameter(spark, df)
    val approx = Anf.effectiveDiameter(spark, df, r = 32)
    assert(approx >= exact / 2 && approx <= exact * 2 + 2,
      s"approx $approx vs exact $exact")
  }
}

class ReadersSpec extends SparkTestBase {

  private def writeTemp(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graftio")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("edge list continuous, weighted and unweighted, firstNode offset") {
    val p = writeTemp("g.txt", "# comment\n1 2\n2 3 2.5\n3 1\n")
    val got = Readers.edgeList(spark, p, firstNode = 1, continuous = true)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == Set((0L, 1L, 1.0), (1L, 2L, 2.5), (2L, 0L, 1.0)))
  }

  test("non-continuous ids remapped by first appearance (SNAP semantics)") {
    val p = writeTemp("s.txt", "# c\n100 7\n7 55\n55 100\n")
    val got = Readers.snap(spark, p)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // first appearance: 100→0, 7→1, 55→2
    assert(got == Set((0L, 1L), (1L, 2L), (2L, 0L)))
  }

  test("METIS reader: tiny graph, edges doubled then canonicalized") {
    // 3 nodes, 2 edges: 0-1, 1-2 (file is 1-based)
    val p = writeTemp("m.graph", "3 2\n2\n1 3\n2\n")
    val canon = graft.core.GraphOps.canonicalizeUnweighted(
      Readers.metis(spark, p))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(canon == Set((0L, 1L), (1L, 2L)))
  }

  test("partition reader/writer round trip") {
    val p = writeTemp("p.txt", "0\n0\n1\n1\n2\n")
    val labels = Readers.partition(spark, p)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L, 4L -> 2L))
    val out = Files.createTempDirectory("graftio").resolve("out").toString
    Writers.partition(spark.createDataFrame(
      labels.toSeq.map(x => (x._1, x._2))).toDF("id", "label"), out)
    val back = Readers.partition(spark, out)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == labels)
  }

  test("DGS parser matches reference example semantics") {
    val dgs = """DGS004
      |test 0 0
      |an aa
      |an bb
      |ae aa-bb aa bb weight=1
      |st 1
      |ce aa-bb weight=2
      |de aa-bb
      |dn aa
      |""".stripMargin
    val p = writeTemp("e.dgs", dgs)
    val evs = Readers.dgs(spark, p).collect()
    assert(evs.map(_.etype).toSeq == Seq(
      GraphEventType.NodeAddition, GraphEventType.NodeAddition,
      GraphEventType.EdgeAddition, GraphEventType.TimeStep,
      GraphEventType.EdgeWeightUpdate, GraphEventType.EdgeRemoval,
      GraphEventType.NodeRemoval))
    // key mapping: aa→0, bb→1
    assert(evs(2).u == 0 && evs(2).v == 1 && evs(2).w == 1.0)
    assert(evs(4).w == 2.0)
  }
}

class EdgeScoresSpec extends SparkTestBase {

  private val und = undirected((0, 1), (0, 2), (1, 2), (2, 3), (3, 4))

  test("normalize to [0,1] and inverted") {
    val tri = Triangles.perEdge(spark, edgeDF(und))
      .withColumnRenamed("triangles", "score")
    val norm = EdgeScores.normalize(tri).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(norm((0L, 1L)) == 1.0 && norm((2L, 3L)) == 0.0)
    val inv = EdgeScores.normalize(tri, invert = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(inv((0L, 1L)) == 0.0 && inv((2L, 3L)) == 1.0)
  }

  test("jaccard similarity per edge from triangle counts") {
    val got = EdgeScores.jaccardSimilarity(spark, edgeDF(und))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // edge (0,1): tri=1, deg0=2, deg1=2 → 1/(2+2-1)
    assert(math.abs(got((0L, 1L)) - 1.0 / 3.0) < 1e-12)
    assert(got((3L, 4L)) == 0.0)
  }

  test("global threshold filter keeps high-score edges") {
    val tri = Triangles.perEdge(spark, edgeDF(und))
      .select(col("src"), col("dst"), col("triangles").cast("double").as("score"))
    val kept = EdgeScores.globalThreshold(edgeDF(und), tri, 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((0L, 1L), (0L, 2L), (1L, 2L)))
  }

  test("blend and linearize") {
    val tri = Triangles.perEdge(spark, edgeDF(und))
      .select(col("src"), col("dst"), col("triangles").cast("double").as("score"))
    val blended = EdgeScores.blend(tri, tri, 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(blended((0L, 1L)) == 1.0)
    val lin = EdgeScores.linearize(tri).collect().map(_.getDouble(2))
    assert(lin.max <= 1.0 && lin.min > 0.0)
  }
}

class PLMSpec extends SparkTestBase {

  test("two K5 cliques + bridge: PLM finds the two cliques, Q matches") {
    val k5a = for (i <- 0L until 5L; j <- (i + 1) until 5L) yield (i, j, 1.0)
    val k5b = for (i <- 5L until 10L; j <- (i + 1) until 10L) yield (i, j, 1.0)
    val edges = edgeDF(k5a ++ k5b ++ Seq((4L, 5L, 1.0)))
    val labels = PLM.run(spark, edges).labels
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.toSet.size == 2)
    assert((0L to 4L).map(got).toSet.size == 1)
    assert((5L to 9L).map(got).toSet.size == 1)
    val q = Metrics.modularity(spark, graft.core.GraphOps.canonicalize(edges), labels)
    // optimal 2-clique partition modularity on this graph
    assert(q > 0.4, s"modularity $q")
  }

  test("PLM modularity >= PLP modularity on a power-law graph") {
    val df = graft.ingest.PageGen.edges(spark, 200, seed = 9, maxOutDeg = 6)
    val canon = graft.core.GraphOps.canonicalize(df)
    val plm = PLM.run(spark, canon).labels
    val plp = graft.algo.PLP.run(spark, canon).labels
    val qPlm = Metrics.modularity(spark, canon, plm)
    val qPlp = Metrics.modularity(spark, canon, plp)
    assert(qPlm >= qPlp - 0.05, s"PLM $qPlm vs PLP $qPlp")
    assert(qPlm > 0.1)
  }
}
