package graft.algo

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{DenseId, GraphOps, Materialize}

/** Strongly connected components of a DIRECTED graph — the capability of the
  * reference's `components/StronglyConnectedComponents.cpp:25-178` (Tarjan,
  * inherently sequential DFS) re-expressed as the distributed
  * trim + forward-max-coloring + backward-reach algorithm (Orzan's coloring
  * / FW-BW family — the standard dataflow SCC):
  *
  *  1. **Trim**: a node with no remaining in-edges or no remaining
  *     out-edges is its own SCC (repeat to a fixpoint — this alone consumes
  *     the DAG-like fringe of web graphs).
  *  2. **Color**: propagate `color(v) = max(color(v), max over in-edges
  *     color(u))` to a fixpoint (hash-max with an active frontier, the same
  *     shape as hash-min connected components) — color(v) = the largest id
  *     that reaches v.
  *  3. **Extract**: for every root r (color(r) = r), the SCC of r is
  *     `{v : color(v) = r and v reaches r}`; find it by backward BFS from
  *     all roots simultaneously over reversed edges restricted to equal
  *     color. All roots' SCCs extract in parallel in one frontier loop.
  *  4. Remove extracted SCCs; repeat.
  *
  * Output `(id, component)` with components densely numbered by ascending
  * minimum member id (the same renumbering convention as
  * [[ConnectedComponents]] — Tarjan's discovery order is a sequential
  * artifact; min-id order is deterministic and engine-independent).
  *
  * Scale shape: every step is a frontier join + aggregation over the live
  * edge set; the live set shrinks monotonically, and on web-ish graphs the
  * trim pass plus the giant-SCC extraction remove almost everything in the
  * first outer round.
  */
object StronglyConnectedComponents {

  def run(spark: SparkSession, edges: DataFrame, maxOuter: Int = 200): DataFrame = {
    var live = edges.select("src", "dst")
      .where(col("src") =!= col("dst")).distinct()
      .transform(Materialize.checkpoint)
    var liveNodes = GraphOps.nodes(live.withColumn("weight", lit(1.0)))
      .transform(Materialize.checkpoint)
    val found = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var outer = 0
    var remaining = liveNodes.count()

    while (remaining > 0 && outer < maxOuter) {
      outer += 1
      // ---- 1. trim fixpoint --------------------------------------------
      var trimmed = true
      while (trimmed && remaining > 0) {
        val withOut = live.select(col("src").as("id")).distinct()
        val withIn = live.select(col("dst").as("id")).distinct()
        val trivial = liveNodes.join(withOut, Seq("id"), "left_anti")
          .unionByName(liveNodes.join(withIn, Seq("id"), "left_anti"))
          .distinct()
          .transform(Materialize.checkpoint)
        val nTrivial = trivial.count()
        if (nTrivial == 0) trimmed = false
        else {
          found += trivial.select(col("id"), col("id").as("root"))
          liveNodes = liveNodes.join(trivial, Seq("id"), "left_anti")
            .transform(Materialize.checkpoint)
          live = live
            .join(trivial.withColumnRenamed("id", "src"), Seq("src"), "left_anti")
            .join(trivial.withColumnRenamed("id", "dst"), Seq("dst"), "left_anti")
            .select("src", "dst")
            .transform(Materialize.checkpoint)
          remaining -= nTrivial
        }
      }
      if (remaining > 0) {
        // ---- 2. forward max-coloring to fixpoint -------------------------
        // the live edge set is loop-invariant here: partition it by src once
        // so each propagation sweep shuffles only the node-sized frontier
        val liveP = live.repartition(col("src"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        var colors = liveNodes.select(col("id"), col("id").as("color"),
          lit(true).as("changed")).transform(Materialize.checkpoint)
        var changed = 1L
        while (changed > 0) {
          val frontier = colors.where(col("changed"))
            .select(col("id").as("src"), col("color"))
          val prop = liveP.join(frontier, "src")
            .groupBy(col("dst").as("id"))
            .agg(max("color").as("prop"))
          colors = colors.select("id", "color").join(prop, Seq("id"), "left")
            .select(col("id"),
              greatest(col("color"), coalesce(col("prop"), col("color"))).as("color"),
              (col("prop").isNotNull && col("prop") > col("color")).as("changed"))
            .transform(Materialize.checkpoint)
          changed = colors.where(col("changed")).count()
          // pointer-jump acceleration: color(v)=u means u reaches v, and
          // color(u)=w means w reaches u, so w reaches v — take
          // color ← max(color, color(color)) to a fixpoint. Propagation
          // distance doubles per jump, so path-shaped regions converge in
          // O(log diameter) edge sweeps instead of O(diameter). Sound to
          // stop on edge-sweep fixpoint: there, color(v) ≥ color(color(v))
          // already holds (colors are ≥ own id and monotone along edges).
          var jumped = if (changed > 0) 1L else 0L
          while (jumped > 0) {
            val parents = colors
              .select(col("id").as("color"), col("color").as("pcolor"))
            val nxt = colors.join(parents, Seq("color"), "left")
              .select(col("id"), col("changed"), col("color"),
                greatest(col("color"), coalesce(col("pcolor"), col("color")))
                  .as("color2"))
              .select(col("id"), col("color2").as("color"),
                (col("changed") || col("color2") =!= col("color")).as("changed"),
                (col("color2") =!= col("color")).as("moved"))
              .transform(Materialize.checkpoint)
            jumped = nxt.where(col("moved")).count()
            colors = nxt.select("id", "color", "changed")
          }
        }
        liveP.unpersist(blocking = false)
        val colorOf = colors.select("id", "color")
        // ---- 3. backward reach from all roots within equal color --------
        val roots = colorOf.where(col("id") === col("color")).select(col("id"))
        val rev = live // traverse dst -> src
          .join(colorOf.withColumnRenamed("id", "src")
            .withColumnRenamed("color", "csrc"), "src")
          .join(colorOf.withColumnRenamed("id", "dst")
            .withColumnRenamed("color", "cdst"), "dst")
          .where(col("csrc") === col("cdst"))
          .select(col("dst").as("from"), col("src").as("to"))
          .repartition(col("from")) // loop-invariant: partition on join key
          .transform(Materialize.checkpoint)
        var visited = roots.select(col("id"), col("id").as("root"))
          .transform(Materialize.checkpoint)
        var frontier = visited
        var fSize = frontier.count()
        while (fSize > 0) {
          val expanded = rev.join(frontier.select(col("id").as("from"), col("root")), "from")
            .select(col("to").as("id"), col("root")).distinct()
          frontier = expanded.join(visited.select("id"), Seq("id"), "left_anti")
            .transform(Materialize.checkpoint)
          fSize = frontier.count()
          if (fSize > 0)
            visited = visited.unionByName(frontier).transform(Materialize.checkpoint)
        }
        // a node reaching multiple roots is impossible within equal color:
        // its color equals the single largest root reaching it
        found += visited
        val nFound = visited.count()
        liveNodes = liveNodes.join(visited.select("id"), Seq("id"), "left_anti")
          .transform(Materialize.checkpoint)
        live = live
          .join(visited.select(col("id").as("src")), Seq("src"), "left_anti")
          .join(visited.select(col("id").as("dst")), Seq("dst"), "left_anti")
          .select("src", "dst")
          .transform(Materialize.checkpoint)
        remaining -= nFound
      }
    }
    require(remaining == 0, s"SCC: $remaining nodes left after $maxOuter outer rounds")

    val membership = found.reduce(_ unionByName _)
    // dense renumber by ascending min member id
    val minIds = membership.groupBy("root").agg(min("id").as("min_id"))
    val numbered = DenseId.assign(minIds.select("root", "min_id"), "component",
      Seq("min_id"))
    membership.join(numbered.select("root", "component"), "root")
      .select("id", "component")
  }

  def count(spark: SparkSession, edges: DataFrame): Long =
    run(spark, edges).select("component").distinct().count()
}
