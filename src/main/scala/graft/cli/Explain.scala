package graft.cli

import org.apache.spark.sql.functions._

/** Plan-inspection entry point: prints the formatted physical plan of the
  * key operators so shuffle structure, pushed filters, pruned schemas and
  * whole-stage-codegen spans can be reviewed (and regressions spotted).
  *
  * Usage: `runMain graft.cli.Explain [sfDir]`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.core.Sessions.build(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))

    def show(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      df.explain("formatted")
    }

    // parquet scan pruning/pushdown: a projection+filter must reach the scan
    show("scan-pushdown") {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .where(col("l_quantity") <= 5 && col("l_linenumber") === 1)
        .select("l_orderkey", "l_partkey")
    }

    // one PageRank iteration: the join + partial-agg shuffle shape
    val edges = graft.ingest.PageGen.edges(spark, 50000, seed = 42)
      .persist()
    edges.count()
    val nodes = graft.core.GraphOps.nodes(edges).persist()
    nodes.count()
    val outW = edges.groupBy("src").agg(sum("weight").as("wout"))
    val shares = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("wout")).as("share"))
    val ranks = nodes.select(col("id"), lit(1.0).as("score"))
    show("pagerank-iteration") {
      nodes.join(
        shares.join(ranks.withColumnRenamed("id", "src"), "src")
          .groupBy(col("dst").as("id"))
          .agg(sum(col("share") * col("score")).as("mass")),
        Seq("id"), "left")
        .select(col("id"),
          (lit(0.85) * coalesce(col("mass"), lit(0.0)) + lit(0.15)).as("score"))
    }

    // triangle wedge join: oriented table self-join + semi-join close
    show("triangle-wedges") {
      graft.algo.Triangles.triangles(spark, edges)
    }

    // hash-min CC sweep
    val labels = nodes.select(col("id"), col("id").as("label"),
      lit(true).as("changed"))
    show("cc-sweep") {
      val frontier = labels.where(col("changed"))
        .select(col("id").as("src"), col("label"))
      val sym = graft.core.GraphOps.symmetrize(edges).select("src", "dst")
      labels.select("id", "label").join(
        sym.join(frontier, "src")
          .groupBy(col("dst").as("id")).agg(min("label").as("prop")),
        Seq("id"), "left")
        .select(col("id"), least(col("label"), coalesce(col("prop"), col("label"))).as("label"))
    }
    spark.stop()
  }
}
