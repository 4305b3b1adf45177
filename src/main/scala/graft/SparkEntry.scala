package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The operator surface lives in [[EntryQueries]]; this object is the thin
  * stable facade the driver calls.
  */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2 end-to-end slice): synthesize a
    * 2000-page crawl (seed 42), extract text + hyperlinks, build the link
    * graph, run PageRank to 1e-6, return the top-20 ranking joined back to
    * urls. Exercises ingest → canonical edge table → iteration driver →
    * centrality output in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    core.Sessions.tune(spark)
    val pages = ingest.PageGen.pages(spark, 2000, seed = 42).toDF()
    val (nodes, edges) = ingest.LinkGraph.build(spark, pages)
    val pr = algo.PageRank.run(spark, edges, nodes.select("id"),
      algo.PageRank.Config(tol = 1e-6, maxIter = 100))
    algo.Centrality.ranking(pr.scores, k = 20)
      .join(nodes.select(col("id"), col("url")), "id")
      .select(col("id"), col("url"), col("score"))
      .orderBy(desc("score"), asc("id"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    EntryQueries.queries.map { case (name, fn) =>
      name -> ((s: SparkSession, d: String) => {
        core.Sessions.tune(s); fn(s, d)
      })
    }

  /** DuckDB-runnable oracle SQL per query (omitted → rows-only check). */
  def oracleSql: Map[String, String] = EntryQueries.oracleSql
}
