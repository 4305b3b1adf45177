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

  /** Standard local session for CLI/bench entry points. */
  def build(cpus: String, appName: String = "graft"): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]"))
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
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
