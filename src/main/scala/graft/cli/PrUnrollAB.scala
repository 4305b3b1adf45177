package graft.cli

import org.apache.spark.sql.functions._
import graft.algo.PageRank
import graft.core.GraphOps
import graft.ingest.PageGen

/** Interleaved A/B for the PageRank iteration-unroll factor
  * (`PageRank.Config.unroll`): fresh session per rep, configs alternated
  * rep-major so ambient-bandwidth weather (BASELINE.md attribution: ~2×
  * minute-to-minute swings) hits every config equally. Usage:
  *
  *   sbt "runMain graft.cli.PrUnrollAB <reps> <u1,u2,...> [nodes]"
  */
object PrUnrollAB {
  def main(args: Array[String]): Unit = {
    val reps = if (args.length > 0) args(0).toInt else 3
    val unrolls = (if (args.length > 1) args(1) else "1,4")
      .split(",").map(_.trim.toInt).toSeq
    val n = if (args.length > 2) args(2).toLong else 2000000L

    for (r <- 1 to reps; u <- unrolls) {
      val spark = graft.Bench.buildSession("32")
      spark.conf.set("spark.sql.shuffle.partitions", "64")
      try {
        val edges = PageGen.edges(spark, n, seed = 42, numPartitions = 64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val m = edges.count()
        val nodes = GraphOps.nodes(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        nodes.count()
        // discarded warmup (JIT + cache materialization), then timed run
        PageRank.run(spark, edges, nodes,
          PageRank.Config(tol = 1e-6, maxIter = 4, unroll = u))
          .scores.agg(sum("score")).head()
        spark.sparkContext.getPersistentRDDs.values
          .filter(org.apache.spark.rdd.graftshim.RddIntrospect.isLocallyCheckpointed)
          .foreach(_.unpersist(blocking = false))
        val t0 = System.nanoTime()
        val res = PageRank.run(spark, edges, nodes,
          PageRank.Config(tol = 1e-6, maxIter = 100, unroll = u))
        res.scores.agg(sum("score")).head()
        val sec = (System.nanoTime() - t0) / 1e9
        val eps = m.toDouble * res.iterations / sec
        System.err.println(
          f"[ab] rep $r unroll=$u: $sec%.1f s, ${res.iterations} iters, " +
          f"${eps / 1e6}%.2f M eps/iter")
      } finally spark.stop()
    }
  }
}
