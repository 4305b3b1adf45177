package graft

import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.core.GraphOps
import graft.iterate.IterationDriver

/** Contract tests for `IterationDriver.runFused` (the unrolled chain-job
  * loop): hop-for-hop parity with the plain loop — identical score
  * trajectories, identical detected convergence iteration, interchangeable
  * disk-checkpoint manifests, and resume across loop flavors.
  */
class FusedLoopSpec extends SparkTestBase {

  // deterministic 50-node digraph with weight variety and a dangling node
  private def edgesDF = {
    val rows = (0L until 49L).flatMap { i =>
      Seq((i, (i * 7 + 3) % 50, 1.0 + (i % 3)),
          (i, (i * 13 + 1) % 50, 1.0))
    } // node 49 has no out-edges: dangling mass leaks, like the reference
    spark.createDataFrame(rows).toDF("src", "dst", "weight")
  }

  test("runFused trajectory, convergence iteration and scores match run exactly") {
    val df = edgesDF
    val nodes = GraphOps.nodes(df)
    // unroll=3 does not divide the iteration count, exercising the final
    // partial group and overshoot-hop discard
    val plain = PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-8, unroll = 1))
    val fused = PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-8, unroll = 3))
    assert(fused.iterations == plain.iterations)
    val mP = plain.history.map(r => r.iter -> r.metric).toMap
    val mF = fused.history.map(r => r.iter -> r.metric).toMap
    assert(mF == mP) // L2 trajectory bit-identical, every iteration
    val sP = plain.scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sF = fused.scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(sF == sP)
  }

  test("fused disk snapshots land at the same iterations as the plain loop") {
    val df = edgesDF
    val nodes = GraphOps.nodes(df)
    val dirP = java.nio.file.Files.createTempDirectory("fused_p").toString
    val dirF = java.nio.file.Files.createTempDirectory("fused_f").toString
    PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-8, checkpointDir = Some(dirP),
        checkpointEvery = 2, unroll = 1))
    PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-8, checkpointDir = Some(dirF),
        checkpointEvery = 2, unroll = 4))
    val manP = IterationDriver.readManifest(dirP)
    val manF = IterationDriver.readManifest(dirF)
    assert(manF.map(_.iter) == manP.map(_.iter))
    assert(manF.map(_.metric) == manP.map(_.metric))
    // snapshots at exactly the same iterations (every 2nd + convergence)
    assert(manF.filter(_.snapshot.nonEmpty).map(_.iter) ==
           manP.filter(_.snapshot.nonEmpty).map(_.iter))
  }

  test("a plain-loop checkpoint resumes under the fused loop, scores identical") {
    val df = edgesDF
    val nodes = GraphOps.nodes(df)
    val dir = java.nio.file.Files.createTempDirectory("fused_x").toString
    val partial = PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-10, maxIter = 6, checkpointDir = Some(dir),
        checkpointEvery = 2, unroll = 1))
    assert(partial.iterations == 6)
    val resumed = PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-10, checkpointDir = Some(dir), unroll = 4))
    assert(resumed.resumedFrom == 6)
    val clean = PageRank.run(spark, df, nodes,
      PageRank.Config(tol = 1e-10, unroll = 1))
    assert(resumed.resumedFrom + resumed.iterations ==
           clean.iterations)
    val a = resumed.scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = clean.scores.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
  }
}
