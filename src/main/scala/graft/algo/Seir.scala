package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{GraphOps, Materialize}

/** SEIR epidemic simulation (`simulation/EpidemicSimulationSEIR.cpp:16-100`
  * — SURVEY.md §2 simulation family): susceptible → exposed → infectious →
  * removed over the undirected contact graph. The reference mutates state
  * inside one racy `parallelForNodes` sweep with a global RNG; the engine
  * pins the only deterministic parallel reading — fully SYNCHRONOUS steps
  * (every transition at step t reads the state at the START of t) with a
  * counter-based per-contact draw: infectious u exposes susceptible
  * neighbor v at step t iff
  *   (u·1000003 + v·7919 + t·104729) mod 1000000 < round(transP·10⁶).
  * Pure integer arithmetic ⇒ the exact run replays in any SQL engine (the
  * DuckDB oracle unrolls the same steps) and is independent of parallelism.
  *
  * Per step: one semi-join of the (dst-partitioned, loop-invariant) edge
  * table against the infectious set + one node-sized left join — the same
  * active-set shape as PLP/CC; hub fan-out is bounded by map-side distinct
  * aggregation of the exposure targets.
  *
  * Census rows (`t`, `state`, `n`) are emitted AFTER each step's sweep,
  * all four states always present (reference `census()` convention).
  */
object Epidemic {

  final case class Config(tMax: Int = 12, transP: Double = 0.3,
                          eTime: Int = 2, iTime: Int = 3)

  def seir(spark: SparkSession, edges: DataFrame, zero: Option[Long] = None,
           cfg: Config = Config()): DataFrame = {
    import spark.implicits._
    val sym = GraphOps.symmetrize(GraphOps.canonicalizeUnweighted(
        edges.where(col("src") =!= col("dst"))).withColumn("weight", lit(1.0)))
      .select("src", "dst").repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = GraphOps.nodes(sym.withColumn("weight", lit(1.0)))
    val z = zero.getOrElse(nodes.agg(min("id")).head().getLong(0))
    val thr = math.round(cfg.transP * 1000000.0)

    var state = nodes.select(col("id"),
        when(col("id") === z, lit("I")).otherwise(lit("S")).as("state"),
        when(col("id") === z, lit(0L)).otherwise(lit(null).cast("long")).as("ts"))
      .transform(Materialize.checkpoint)
    val stats = scala.collection.mutable.ArrayBuffer.empty[(Long, String, Long)]

    for (t <- 0 until cfg.tMax) {
      val infectious = state.where(col("state") === "I")
        .select(col("id").as("src"))
      val contacts = sym.join(infectious, Seq("src"), "left_semi")
        .where((col("src") * 1000003L + col("dst") * 7919L + lit(t.toLong) * 104729L)
          % 1000000L < thr)
        .select(col("dst").as("id")).distinct()
      val eDone = col("state") === "E" && lit(t.toLong) - col("ts") >= cfg.eTime
      val iDone = col("state") === "I" && lit(t.toLong) - col("ts") >= cfg.iTime
      val exposed = col("state") === "S" && col("hit").isNotNull
      val next = state
        .join(contacts.withColumn("hit", lit(true)), Seq("id"), "left")
        .select(col("id"),
          when(exposed, lit("E")).when(eDone, lit("I")).when(iDone, lit("R"))
            .otherwise(col("state")).as("state"),
          when(exposed || eDone || iDone, lit(t.toLong)).otherwise(col("ts")).as("ts"))
        .transform(Materialize.checkpoint)
      Materialize.free(state)
      state = next
      val census = state.groupBy("state").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      for (s <- Seq("E", "I", "R", "S"))
        stats += ((t.toLong, s, census.getOrElse(s, 0L)))
    }
    sym.unpersist(blocking = false)
    stats.toSeq.toDF("t", "state", "n")
  }
}
