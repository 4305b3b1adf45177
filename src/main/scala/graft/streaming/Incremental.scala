package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.algo.PageRank

/** Structured-Streaming dynamic-graph analytics: the Spark-native
  * counterpart of the reference's Dyn* algorithms + `GraphUpdater` fold
  * (`dynamics/GraphUpdater.h:19-36`). Each micro-batch of `GraphEvent`s is
  * folded into the persistent edge-table state (parquet in-sandbox; an
  * Iceberg MERGE in production — same layout), then the analytics job
  * reruns **warm-started** from the previous score snapshot, which is the
  * incremental-recompute strategy that works at web scale (the reference's
  * per-event updates don't distribute; warm-started batch recompute does,
  * and converges in a handful of iterations when the batch is small
  * relative to the graph).
  */
object IncrementalAnalytics {

  /** Fold one batch of events into the state dir and refresh PageRank.
    * State layout under `stateDir`: `edges/` (current edge table),
    * `removed/`, `scores/` (latest PageRank snapshot).
    */
  def processBatch(spark: SparkSession, stateDir: String,
                   batch: Dataset[GraphEvent], tol: Double = 1e-6): Unit = {
    import spark.implicits._
    val fs = new java.io.File(stateDir)
    fs.mkdirs()
    def readOr(path: String, empty: => DataFrame): DataFrame =
      if (new java.io.File(path + "/_SUCCESS").exists()) spark.read.parquet(path)
      else empty
    val edges = readOr(s"$stateDir/edges",
      Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight"))
    val removed = readOr(s"$stateDir/removed", Seq.empty[Long].toDF("id"))
    val prevScores =
      if (new java.io.File(s"$stateDir/scores/_SUCCESS").exists())
        Some(spark.read.parquet(s"$stateDir/scores"))
      else None

    val (newEdges, newRemoved) =
      GraphUpdater.applyEvents(spark, edges, removed, batch)
    // materialize BEFORE overwriting the inputs they derive from
    val e = newEdges.transform(graft.core.Materialize.checkpoint)
    val r = newRemoved.transform(graft.core.Materialize.checkpoint)
    e.write.mode("overwrite").parquet(s"$stateDir/edges")
    r.write.mode("overwrite").parquet(s"$stateDir/removed")

    if (e.take(1).nonEmpty) {
      val sym = graft.core.GraphOps.symmetrize(e)
      val nodes = graft.core.GraphOps.nodes(e)
      val res = PageRank.run(spark, sym, nodes,
        PageRank.Config(tol = tol, maxIter = 100), warmStart = prevScores)
      res.scores.transform(graft.core.Materialize.checkpoint)
        .write.mode("overwrite").parquet(s"$stateDir/scores")
    }
  }

  /** Run the live pipeline over a streaming Dataset of events. */
  def start(spark: SparkSession, events: Dataset[GraphEvent],
            stateDir: String, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: Dataset[GraphEvent], _: Long) =>
        processBatch(batch.sparkSession, stateDir, batch)
      }
      .start()
}
