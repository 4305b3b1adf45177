package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Plan regression guard: the physical plan of every NON-ITERATIVE query in
  * the surface must be free of the two scale-killers the engine's design
  * forbids — a cartesian/nested-loop join and a partition-less window
  * (one task receives the whole table) — except where a query is the
  * DOCUMENTED small-scale verification baseline of a bucketed scale path.
  *
  * Planning only, no execution: iterative queries (pagerank, plp, …) run
  * their convergence loop during construction and are exercised by their
  * own specs + DuckDB oracles instead.
  */
class PlanGuardSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  /** Queries allowed a nested-loop/cartesian join, each with the reason. */
  private val crossJoinBaselines: Set[String] = Set(
    "emb_neardup",  // exact n² verification baseline for emb_neardup_lsh
    "emb_topk",     // broadcast queries × corpus scan — queries side tiny
    "lp_common_neighbors", "lp_jaccard", "lp_adamic_adar", // bounded id<100
    "lp_pref_attachment", "lp_total_neighbors", "lp_neighbors_measure",
    "lp_neighborhood_dist", "lp_same_community", "lp_katz",
    "lp_resource_alloc", "lp_degrees",
    "lp_roc",       // candidate set is the bounded lp pair universe
    "lp_neighborhood_utility", // bounded id<60 candidate pair universe
    "g_stats", "tri_gcc" // 1×1 cross combining single-row scalar aggregates
  )

  /** Iterative/loop-running queries — constructing them executes jobs, so
    * they are excluded from the static plan walk (their loop bodies reuse
    * the same audited primitives).
    */
  private val iterative: Set[String] = Set(
    "pagerank", "pr20", "plp", "plm", "cc_components", "cc_sizes", "bfs_hops",
    "kcore", "msf", "msf_max", "rsf", "luby_mis", "betweenness", "closeness",
    "top_closeness", "anf_diameter", "diameter", "scc", "scd_nibble",
    "alg_distance", "matching", "seir", "apsp_sample", "eccentricity",
    "dyn_sssp", "sssp_relax8", "hop_plot_exact", "emb_ivf_topk",
    "lp_algebraic",
    // constructing these executes full jobs too (CC/SCC/triangle runs,
    // prefix-sum actions) and their cross joins sit behind localCheckpoint
    // LogicalRDDs where a static walk can't see them — their internals
    // reuse already-guarded primitives (and RuntimePlanGuardSpec covers the
    // iterative bodies at runtime)
    "overview", "lp_pr_curve",
    // round-4 additions: UMSF's weight-group loop and the CG solver both
    // run checkpointed loops at construction time; clique extension and
    // push-relabel likewise loop at construction
    "umsf", "ctd_tree", "clique_max", "flow_value")

  private def collectAll(p: SparkPlan): Seq[SparkPlan] = {
    val here = p +: p.children.flatMap(collectAll)
    p match {
      case a: AdaptiveSparkPlanExec => here ++ collectAll(a.inputPlan)
      case _ => here ++ p.subqueries.flatMap(collectAll)
    }
  }

  for ((name, fn) <- EntryQueries.queries.toSeq.sortBy(_._1)
       if !iterative(name) && !name.startsWith("ingest") && name != "mm_features") {
    test(s"plan guard: $name") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan
      val nodes = collectAll(plan)
      val crosses = nodes.collect {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b
      }
      if (!crossJoinBaselines(name))
        assert(crosses.isEmpty,
          s"$name has a cartesian/nested-loop join:\n${crosses.headOption.getOrElse("")}")
      // DenseId's two-phase rank intentionally runs ONE partition-less
      // window — over the per-partition COUNT table (≤ numPartitions rows,
      // recognizable by its _pid/_cnt internals), never over the data.
      val badWindows = nodes.collect {
        case w: WindowExec if w.partitionSpec.isEmpty &&
          !w.child.output.exists(a => a.name == "_pid" || a.name == "_cnt") => w
      }
      assert(badWindows.isEmpty,
        s"$name has a partition-less window (single-task):\n${badWindows.headOption.getOrElse("")}")
    }
  }
}
