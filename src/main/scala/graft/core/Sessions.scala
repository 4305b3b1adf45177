package graft.core

import org.apache.spark.sql.SparkSession

/** Session tuning shared by every entry point. Two settings are
  * load-bearing for iterative graph plans:
  *
  *  - `spark.sql.defaultSizeInBytes`: Spark's default for leaves with
  *    unknown size (e.g. `LogicalRDD` from localCheckpoint) is
  *    Long.MaxValue; the size-only stats visitor *multiplies* child sizes
  *    across join trees, so a join-heavy plan over checkpointed state
  *    produces BigInt statistics thousands of bits wide and planning time
  *    blows up in BigInteger.multiply (observed: a 200-node PLM run
  *    spending 20 min in Toom-Cook multiplication). 50 MB keeps the
  *    arithmetic in cheap territory while staying above the 10 MB broadcast
  *    threshold, so join-strategy choices are unchanged.
  *  - `spark.sql.maxPlanStringLength`: plan-string generation is invoked by
  *    listeners even with the UI off; bounded so deep iterative plans don't
  *    pay quadratic stringification.
  */
object Sessions {

  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.maxPlanStringLength", "65536")
    spark.conf.set("spark.sql.defaultSizeInBytes", (50L * 1024 * 1024).toString)
    spark
  }

  /** Run `f` with AQE disabled, restoring the previous setting after.
    *
    * For tight iterative loops over localCheckpointed state: the plan is
    * identical every sweep, partitioning is pinned by design (inputs
    * pre-partitioned on the join key, hub fan-in absorbed by map-side
    * partial aggregation), and cardinalities are stable — AQE's per-stage
    * driver re-planning is then pure fixed overhead per iteration.
    * Measured (PageRank, 2M nodes / 9.66M edges, local[4]): 2.92-3.64 s/iter
    * with AQE vs 2.29-2.36 s/iter without. Because the cost is fixed driver
    * time, it is also the serial fraction that caps N→4N scaling
    * efficiency. One-shot queries keep AQE on (skew-join + coalescing earn
    * their keep there).
    *
    * Caveat: session confs are session-global, so a query PLANNED on this
    * session concurrently with the loop may plan without AQE (a perf
    * effect, never a value effect — nothing in the engine derives values
    * from the physical plan; `DenseId` pins its partitioning explicitly).
    * For heterogeneous concurrent workloads, give the loop its own
    * `spark.newSession()`.
    */
  def withoutAqe[T](spark: SparkSession)(f: => T): T = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try f
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** Standard local session for CLI/bench entry points. */
  def build(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      // AQE on by default (skew-join + runtime coalescing at scale); the
      // env override exists because AQE's per-stage driver re-planning is
      // measurable fixed overhead in tight iterative loops — ScalingBench
      // uses it to report the loop's parallel fraction honestly.
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The IterationDriver intentionally unpersists superseded localCheckpoint
    // generations; each emits a scary-but-expected WARN from
    // MapPartitionsRDD that would otherwise dominate bench/verify logs.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
    tune(s)
  }
}
