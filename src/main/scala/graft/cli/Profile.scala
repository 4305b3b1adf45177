package graft.cli

import org.apache.spark.sql.functions._

/** Ad-hoc wall-clock profiling of the iterative hot paths (pr20 / plp /
  * pagerank) with per-iteration timings from the IterationDriver manifest —
  * used to attribute fixed per-iteration overhead vs real shuffle work.
  *
  * Usage: `runMain graft.cli.Profile [sfDir] [what]`
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args(1) else "pr20"
    val spark = graft.core.Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    what match {
      case "pr20" =>
        val eDir = time("build eDir distinct") {
          val e = graft.EntryQueries.g1Raw(spark, sfDir)
            .select("src", "dst").distinct()
            .withColumn("weight", lit(1.0))
            .transform(graft.core.Materialize.checkpoint)
          println(s"[profile] edges = ${e.count()}")
          e
        }
        val nodes = graft.core.GraphOps.nodes(eDir)
        val r = time("pagerank 20 iters") {
          graft.algo.PageRank.run(spark, eDir, nodes,
            graft.algo.PageRank.Config(tol = 0.0, maxIter = 20))
        }
        r.history.foreach(h => println(s"[profile] iter ${h.iter}: ${h.wallMs} ms"))
        time("final collect") { r.scores.orderBy("id").count() }
      case "benchpr" =>
        val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "2000000").toLong
        val edges = time("bench graph") {
          val e = graft.ingest.PageGen.edges(spark, n, seed = 42,
            numPartitions = 64)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[profile] edges = ${e.count()}")
          e
        }
        val nodes = graft.core.GraphOps.nodes(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("nodes count") { nodes.count() }
        for (rep <- 1 to 2) {
          val r = time(s"pagerank tol=1e-6 rep$rep") {
            graft.algo.PageRank.run(spark, edges, nodes,
              graft.algo.PageRank.Config(tol = 1e-6, maxIter = 100))
          }
          val ws = r.history.map(_.wallMs)
          println(s"[profile] iters=${r.iterations} iterMs=" +
            s"min=${ws.min} median=${ws.sorted.apply(ws.length / 2)} max=${ws.max}")
        }
      case "plp" =>
        val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "2000000").toLong
        val edges = time("bench graph") {
          val e = graft.ingest.PageGen.edges(spark, n, seed = 42,
            numPartitions = 64)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[profile] edges = ${e.count()}")
          e
        }
        val r = time("plp 8 sweeps") {
          graft.algo.PLP.run(spark, edges,
            cfg = graft.algo.PLP.Config(maxIter = 8))
        }
        r.history.foreach(h => println(s"[profile] sweep ${h.iter}: ${h.wallMs} ms, metric=${h.metric}"))
      case "slow4" =>
        // the four heavyweight bench entries, individually timed on the
        // bench graph (kcore / plm / diameter / scc + the 4-source bfs)
        val n = sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "2000000").toLong
        val edges = time("bench graph") {
          val e = graft.ingest.PageGen.edges(spark, n, seed = 42,
            numPartitions = 64)
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          println(s"[profile] edges = ${e.count()}")
          e
        }
        val nodes = graft.core.GraphOps.nodes(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        time("nodes count") { nodes.count() }
        val which = sys.env.getOrElse("SPARK_GRAFT_SLOW4", "bfs,kcore,scc,diameter,plm")
          .split(",").toSet
        if (which("bfs")) time("bfs 4 sources") {
          val sources = nodes.orderBy(xxhash64(col("id"), lit(1L)), col("id"))
            .limit(4).select("id")
          println("[profile] max dist = " + graft.algo.SSSP
            .bfs(spark, edges, sources).agg(max("dist")).head().getLong(0))
        }
        if (which("kcore")) time("kcore") {
          println("[profile] max coreness = " + graft.algo.Centrality
            .coreDecomposition(spark, edges).agg(max("coreness")).head().getLong(0))
        }
        if (which("scc")) time("scc") {
          println("[profile] n scc = " + (graft.algo.StronglyConnectedComponents
            .run(spark, edges).agg(max("component")).head().getLong(0) + 1))
        }
        if (which("diameter")) time("diameter") {
          println("[profile] diameter = " +
            graft.algo.Diameter.exact(spark, edges))
        }
        if (which("plm")) time("plm") {
          println("[profile] plm communities = " + graft.algo.PLM
            .run(spark, edges).labels.agg(countDistinct("label")).head().getLong(0))
        }
      case _ => sys.error(s"unknown profile target $what")
    }
    spark.stop()
  }
}
