package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Dynamic-graph event model, mirroring the reference's
  * `dynamics/GraphEvent.h:24-39` (8 event types incl. the TIME_STEP batch
  * separator). The reference's "streaming" is a totally-ordered event log
  * folded into an in-memory graph (`dynamics/GraphUpdater.h:19-36`); the
  * Spark-native counterpart folds event batches into the edge table
  * relationally, and the same fold runs under Structured Streaming
  * `foreachBatch` for live ingestion.
  */
object GraphEventType {
  val NodeAddition = "NODE_ADDITION"
  val NodeRemoval = "NODE_REMOVAL"
  val NodeRestoration = "NODE_RESTORATION"
  val EdgeAddition = "EDGE_ADDITION"
  val EdgeRemoval = "EDGE_REMOVAL"
  val EdgeWeightUpdate = "EDGE_WEIGHT_UPDATE"
  val EdgeWeightIncrement = "EDGE_WEIGHT_INCREMENT"
  val TimeStep = "TIME_STEP"
}

case class GraphEvent(etype: String, u: Long, v: Long, w: Double, ts: Long)

object GraphUpdater {

  /** Fold an ordered event batch into graph state.
    *
    * State = (edges(src,dst,weight), removedNodes(id)). Events apply in
    * `ts` order; within the relational fold, later events on the same edge
    * win (`row_number` over ts desc). Node removal drops incident edges
    * (`Graph.cpp` removeNode semantics); restoration clears the tombstone
    * (ids are never reused, `Graph.h:102`).
    *
    * This is a batch fold — for streams, call it from `foreachBatch` with
    * the accumulated state table (Iceberg MERGE in production; parquet
    * rewrite in-sandbox).
    */
  def applyEvents(spark: SparkSession, edges: DataFrame, removed: DataFrame,
                  events: Dataset[GraphEvent]): (DataFrame, DataFrame) = {
    import spark.implicits._
    val ev = events.toDF()

    // --- node tombstones -------------------------------------------------
    val nodeEvents = ev.where(col("etype").isin(
        GraphEventType.NodeRemoval, GraphEventType.NodeRestoration))
      .groupBy(col("u").as("id"))
      .agg(max_by(col("etype"), col("ts")).as("last"))
    val newlyRemoved = nodeEvents.where(col("last") === GraphEventType.NodeRemoval)
      .select("id")
    val restored = nodeEvents.where(col("last") === GraphEventType.NodeRestoration)
      .select("id")
    val removedOut = removed.join(restored, Seq("id"), "left_anti")
      .unionByName(newlyRemoved).distinct()

    // --- edge set --------------------------------------------------------
    // canonical undirected key
    val evE = ev.where(col("etype").isin(
        GraphEventType.EdgeAddition, GraphEventType.EdgeRemoval,
        GraphEventType.EdgeWeightUpdate, GraphEventType.EdgeWeightIncrement))
      .select(least(col("u"), col("v")).as("src"),
        greatest(col("u"), col("v")).as("dst"),
        col("etype"), col("w"), col("ts"))

    // last add/remove decides existence; weight = last update + increments
    // since then. Simplification that matches the reference's sequential
    // fold for well-formed logs: process per-edge in ts order via groupBy +
    // sorted collect (bounded per edge — event logs are per-edge sparse).
    // The fold's initial state comes from the PERSISTED edge table: an edge
    // that exists across batches and receives only a weight update /
    // increment must keep existing and keep its base weight (reference
    // GraphUpdater mutates the live graph in place — `dynamics/
    // GraphUpdater.h:19-36`). Without this seed, a cross-batch
    // EDGE_WEIGHT_UPDATE would silently delete the edge.
    val canonEdges = edges.select(least(col("src"), col("dst")).as("src"),
      greatest(col("src"), col("dst")).as("dst"), col("weight"))
    val folded = evE.groupBy("src", "dst")
      .agg(array_sort(collect_list(struct(col("ts"), col("etype"), col("w"))))
        .as("evs"))
      .join(canonEdges.select(col("src"), col("dst"),
        col("weight").as("base_weight")), Seq("src", "dst"), "left")
      .select(col("src"), col("dst"),
        aggregate(col("evs"),
          struct(col("base_weight").isNotNull.as("exists"),
            coalesce(col("base_weight"), lit(0.0)).as("weight")),
          (acc, e) => {
            val t = e.getField("etype")
            val w = e.getField("w")
            when(t === GraphEventType.EdgeAddition,
              struct(lit(true).as("exists"), w.as("weight")))
              .when(t === GraphEventType.EdgeRemoval,
                struct(lit(false).as("exists"), lit(0.0).as("weight")))
              .when(t === GraphEventType.EdgeWeightUpdate,
                struct(acc.getField("exists").as("exists"), w.as("weight")))
              .when(t === GraphEventType.EdgeWeightIncrement,
                struct(acc.getField("exists").as("exists"),
                  (acc.getField("weight") + w).as("weight")))
              .otherwise(acc)
          }).as("st"))
      .select(col("src"), col("dst"), col("st.exists").as("exists"),
        col("st.weight").as("weight"))

    val untouched = canonEdges.join(folded.select("src", "dst"),
      Seq("src", "dst"), "left_anti")
    val added = folded.where(col("exists")).select("src", "dst", "weight")
    val merged = untouched.unionByName(added)
    // drop edges incident to removed nodes
    val edgesOut = merged
      .join(removedOut.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
      .join(removedOut.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
      .select("src", "dst", "weight")
    (edgesOut, removedOut)
  }

  /** Graph size timeline per TIME_STEP (`GraphUpdater.h` size timeline):
    * number of live edges after each time step marker.
    */
  def sizeTimeline(spark: SparkSession, events: Dataset[GraphEvent]): DataFrame = {
    import spark.implicits._
    val ev = events.toDF()
    val withStep = ev.withColumn("step",
      sum(when(col("etype") === GraphEventType.TimeStep, 1).otherwise(0))
        .over(org.apache.spark.sql.expressions.Window.orderBy("ts")
          .rowsBetween(Long.MinValue, 0)))
    val delta = withStep.select(col("step"),
      when(col("etype") === GraphEventType.EdgeAddition, 1)
        .when(col("etype") === GraphEventType.EdgeRemoval, -1)
        .otherwise(0).as("d"))
      .groupBy("step").agg(sum("d").as("delta"))
    delta.select(col("step"),
      sum("delta").over(org.apache.spark.sql.expressions.Window
        .orderBy("step").rowsBetween(Long.MinValue, 0)).as("m"))
  }
}

/** Structured Streaming surface: windowed aggregation over an event stream
  * (the engine's watermark/window machinery the reference lacks — SURVEY.md
  * §2.10). Works identically on a static DataFrame (tests/oracle) and a
  * readStream source.
  */
object StreamOps {

  /** Tumbling-window counts and value sums per event type. `events` may be
    * static or streaming; with streaming input add
    * `.withWatermark("ts", "10 minutes")` upstream.
    */
  def windowedEventStats(events: DataFrame, windowLen: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowLen).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("sum_value"))
      .select(col("win.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
}
