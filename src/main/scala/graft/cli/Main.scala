package graft.cli

import org.apache.spark.sql.SparkSession

/** spark-submit entry points (SURVEY.md §7.1 graft.cli).
  *
  * Usage: `graft.cli.Main <job> [args]`
  *   entry                         — flagship crawl→PageRank pipeline
  *   query <name> <sfDir>          — run one SparkEntry query, show result
  *   pagerank <n> [tol] [ckptDir]  — PageRank on the seed-42 synthetic graph
  */
object Main {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = graft.core.Sessions.build(cpus)
    args.toList match {
      case "entry" :: _ =>
        graft.SparkEntry.entry(spark).show(20, truncate = false)
      case "query" :: name :: sfDir :: _ =>
        graft.SparkEntry.queries(name)(spark, sfDir).show(20, truncate = false)
      case "pagerank" :: n :: rest =>
        val tol = rest.headOption.map(_.toDouble).getOrElse(1e-6)
        val ckpt = rest.drop(1).headOption
        val edges = graft.ingest.PageGen.edges(spark, n.toLong, seed = 42)
        val r = graft.algo.PageRank.run(spark, edges,
          graft.core.GraphOps.nodes(edges),
          graft.algo.PageRank.Config(tol = tol, checkpointDir = ckpt))
        println(s"iterations=${r.iterations}")
        graft.algo.Centrality.ranking(r.scores, 10).show()
      case other =>
        System.err.println(s"unknown job: $other"); sys.exit(2)
    }
    spark.stop()
  }
}
