package graft.iterate

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel
import scala.jdk.CollectionConverters._

/** Per-iteration record written to the checkpoint manifest — the north
  * rule's "per-partition lineage + metrics": `snapshot` names the state
  * parquet written for that iteration (per-partition files inside), `metric`
  * is the convergence scalar, `wallMs` the iteration wall time.
  */
final case class IterRecord(iter: Int, metric: Double, wallMs: Long,
                            rows: Long, snapshot: String)

final case class IterConfig(
    tol: Double,
    maxIter: Int,
    /** write resumable state+manifest here; None = in-memory only */
    checkpointDir: Option[String] = None,
    /** disk-checkpoint every k iterations (and at convergence) */
    checkpointEvery: Int = 5)

object IterConfig {
  /** Production-tier preset (SURVEY.md §7.1): EVERY iteration snapshotted
    * to durable storage, so a killed run loses at most the in-flight
    * iteration. On a real cluster `dir` is an object-store/Iceberg path;
    * the per-iteration parquet write is one extra scan of the state table —
    * cheap relative to a multi-hour loop's re-run risk at 10^12-edge scale.
    */
  def production(tol: Double, maxIter: Int, dir: String): IterConfig =
    IterConfig(tol, maxIter, checkpointDir = Some(dir), checkpointEvery = 1)
}

final case class IterResult(state: DataFrame, iterations: Int,
                            history: Vector[IterRecord], resumedFrom: Int)

/** Generic convergence loop shared by PageRank / connected components / PLP:
  *
  *   state₀ → step → state₁ → … until `metric(prev, next) <= tol` or maxIter.
  *
  * Responsibilities: persist/unpersist bracketing (exactly one cached state
  * generation live at a time), lineage truncation, resumable disk
  * checkpoints (parquet state + JSONL manifest; a snapshot is visible only
  * after its manifest line is appended, so a killed run resumes from the
  * last complete iteration — the reference has nothing like this, it reruns
  * from scratch; at 10^12-edge scale resumability is mandatory).
  *
  * In-sandbox the checkpoint store is a local directory; in production the
  * same layout maps to an Iceberg table partitioned by `iter` (SURVEY.md
  * §7.4.4 TableIO note) — the driver logic is storage-agnostic.
  */
object IterationDriver {

  /** Parse an iteration-unroll override from the environment. Malformed or
    * < 1 values fall back to `default` with a stderr warning — a bare
    * `.toInt` here would throw inside a lazy object initializer and poison
    * the whole algorithm object for the JVM's lifetime with an opaque
    * `ExceptionInInitializerError`.
    */
  def envUnroll(name: String, default: Int): Int =
    sys.env.get(name) match {
      case None => default
      case Some(v) =>
        scala.util.Try(v.trim.toInt).toOption.filter(_ >= 1).getOrElse {
          System.err.println(
            s"[graft] ignoring $name='$v' (need an int >= 1); using $default")
          default
        }
    }

  private def manifestPath(dir: String) = Paths.get(dir, "manifest.jsonl")

  def readManifest(dir: String): Vector[IterRecord] = {
    val p = manifestPath(dir)
    if (!Files.exists(p)) Vector.empty
    else Files.readAllLines(p).asScala.toVector.filter(_.nonEmpty).map { line =>
      // minimal fixed-shape JSON parse (we wrote it)
      def field(name: String): String = {
        val i = line.indexOf("\"" + name + "\":")
        val start = i + name.length + 3
        val rest = line.substring(start)
        if (rest.startsWith("\"")) rest.substring(1, rest.indexOf('"', 1))
        else rest.takeWhile(c => c != ',' && c != '}')
      }
      IterRecord(field("iter").toInt, field("metric").toDouble,
        field("wall_ms").toLong, field("rows").toLong, field("snapshot"))
    }
  }

  private def appendManifest(dir: String, r: IterRecord): Unit = {
    Files.createDirectories(Paths.get(dir))
    val line = s"""{"iter":${r.iter},"metric":${r.metric},"wall_ms":${r.wallMs},"rows":${r.rows},"snapshot":"${r.snapshot}"}""" + "\n"
    Files.write(manifestPath(dir), line.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Latest complete snapshot in `dir`, if any. */
  def latestSnapshot(spark: SparkSession, dir: String): Option[(Int, DataFrame)] = {
    val recs = readManifest(dir).filter(_.snapshot.nonEmpty)
    recs.lastOption.map(r => (r.iter, spark.read.parquet(r.snapshot)))
  }

  /** Free the block-manager copy behind an eagerly localCheckpoint'ed
    * DataFrame (its logical plan is a LogicalRDD over a cached RDD).
    */
  private def freeCheckpointed(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }

  /** Run the loop. `step(state, iter)` produces the next state; `metric`
    * compares consecutive states (an action). Convergence when
    * `metric <= tol`. If `cfg.checkpointDir` holds a previous run's
    * manifest, resumes from its last snapshot (warm start).
    *
    * Every iteration is eagerly `localCheckpoint`ed: the new state
    * materializes once into the block manager and its logical plan is
    * truncated to a `LogicalRDD`. Without this, iterative plans nest one
    * `InMemoryRelation`/`AdaptiveSparkPlanExec` per iteration and both
    * re-analysis and plan-string generation go super-linear (the well-known
    * iterative-lineage blowup — SURVEY.md §7.4.3); with it, every
    * iteration's plan is flat and planning cost is O(1) in the iteration
    * number. Exactly one state generation is retained at a time.
    */
  def run(spark: SparkSession, init: => DataFrame,
          step: (DataFrame, Int) => DataFrame,
          metric: (DataFrame, DataFrame) => Double,
          cfg: IterConfig): IterResult = {

    // AQE is OFF inside the loop (restored on exit) — see
    // `Sessions.withoutAqe` for the rationale and measurements. The fixed
    // per-stage driver re-planning cost is 22-35% of iteration wall time at
    // sandbox scale and is the serial fraction that caps N→4N scaling
    // efficiency.
    graft.core.Sessions.withoutAqe(spark)(runLoop(spark, init, step, metric, cfg))
  }

  private def runLoop(spark: SparkSession, init: => DataFrame,
          step: (DataFrame, Int) => DataFrame,
          metric: (DataFrame, DataFrame) => Double,
          cfg: IterConfig): IterResult = {

    val resumed = cfg.checkpointDir.flatMap(latestSnapshot(spark, _))
    val startIter = resumed.map(_._1).getOrElse(0)
    var state = resumed.map(_._2).getOrElse(init).transform(graft.core.Materialize.checkpoint)
    var history = Vector.empty[IterRecord]

    var iter = startIter
    var converged = false
    while (!converged && iter < cfg.maxIter) {
      val t0 = System.nanoTime()
      iter += 1
      // eager: materializes the new state and truncates lineage
      var next = step(state, iter).transform(graft.core.Materialize.checkpoint)
      val m = metric(state, next)
      converged = m <= cfg.tol

      val doCheckpoint = cfg.checkpointDir.isDefined &&
        (converged || iter % cfg.checkpointEvery == 0)
      var snapshot = ""
      val rows = -1L
      if (doCheckpoint) {
        val dir = cfg.checkpointDir.get
        snapshot = s"$dir/state/iter=${"%05d".format(iter)}"
        next.write.mode("overwrite").parquet(snapshot)
        freeCheckpointed(next)
        // reload: resume-from-disk ≡ continue-in-memory, bit-identical
        next = spark.read.parquet(snapshot).transform(graft.core.Materialize.checkpoint)
      }
      freeCheckpointed(state)
      val wallMs = (System.nanoTime() - t0) / 1000000
      val rec = IterRecord(iter, m, wallMs, rows, snapshot)
      history :+= rec
      cfg.checkpointDir.foreach(appendManifest(_, rec))
      state = next
    }
    IterResult(state, iter - startIter, history, startIter)
  }

  /** Unrolled variant of `run`: composes up to `unroll` steps into ONE
    * Spark job per loop pass, for operators whose convergence metric is a
    * 1-row GLOBAL aggregate over the NEW state alone — `metricAgg(next)`
    * must return exactly ONE column and exactly ONE row (an ungrouped
    * aggregate; PageRank embeds `prev` in the state for exactly this).
    * Both halves of the contract are asserted at runtime: a multi-column
    * aggregate fails the per-hop column check, a grouped (multi-row) one
    * fails the collected-row-count check — neither can silently become a
    * wrong convergence decision.
    *
    * Why: at sandbox bench scale the per-iteration wall is roughly half
    * fixed driver overhead — one job round-trip to materialize the state
    * (eager localCheckpoint) plus one to read the convergence scalar. This
    * loop lazily local-checkpoints each intermediate hop (plan truncates to
    * a flat `LogicalRDD` immediately; the data materializes and caches when
    * the enclosing job first computes through it — the kcore
    * sweep-unrolling mechanism), eagerly checkpoints only the LAST hop (the
    * group's one chain job; every intermediate hop has exactly one consumer
    * stage inside it, so nothing is computed twice), then reads all k
    * convergence scalars from the cached states in one cheap second action:
    * k materializations + k metrics ride two job submissions instead of 2k.
    *
    * Exactness is preserved hop-for-hop: each hop's values are identical to
    * the un-unrolled loop (lazy checkpoint changes scheduling, not data),
    * and convergence is detected at the FIRST hop whose metric ≤ tol — the
    * reported iteration count and returned state match `run` exactly; hops
    * computed past convergence inside the final group are freed, never
    * observed. Groups never cross a disk-checkpoint boundary (the group is
    * clamped so snapshots land exactly where `run` would put them), so
    * resume manifests are interchangeable between the two loops; with
    * `checkpointEvery = 1` (the production preset) the group size degrades
    * to 1 ≡ `run`. Per-hop manifest records carry the group wall divided
    * evenly across its hops (the amortized per-iteration figure), with the
    * division remainder assigned to the group's last hop so the summed
    * wallMs equals the true group wall.
    */
  def runFused(spark: SparkSession, init: => DataFrame,
          step: (DataFrame, Int) => DataFrame,
          metricAgg: DataFrame => DataFrame,
          cfg: IterConfig, unroll: Int): IterResult = {
    require(unroll >= 1, s"unroll must be >= 1, got $unroll")
    graft.core.Sessions.withoutAqe(spark)(
      runLoopFused(spark, init, step, metricAgg, cfg, unroll))
  }

  private def runLoopFused(spark: SparkSession, init: => DataFrame,
          step: (DataFrame, Int) => DataFrame,
          metricAgg: DataFrame => DataFrame,
          cfg: IterConfig, unroll: Int): IterResult = {
    import org.apache.spark.sql.functions.{col, lit}

    val resumed = cfg.checkpointDir.flatMap(latestSnapshot(spark, _))
    val startIter = resumed.map(_._1).getOrElse(0)
    var state = resumed.map(_._2).getOrElse(init).transform(graft.core.Materialize.checkpoint)
    var history = Vector.empty[IterRecord]

    var iter = startIter
    var converged = false
    while (!converged && iter < cfg.maxIter) {
      val t0 = System.nanoTime()
      // hops until the next disk-checkpoint boundary: snapshots must land
      // at exactly the iterations `run` would snapshot, so a group never
      // crosses a multiple of checkpointEvery.
      val toBoundary = cfg.checkpointDir
        .map(_ => cfg.checkpointEvery - (iter % cfg.checkpointEvery))
        .getOrElse(Int.MaxValue)
      val k = math.max(1, math.min(math.min(unroll, cfg.maxIter - iter), toBoundary))

      val hops = new scala.collection.mutable.ArrayBuffer[DataFrame](k)
      var s = state
      for (j <- 1 to k) {
        // intermediate hops: LAZY checkpoint (plan truncates now, data
        // caches when the chain job computes through them — each has
        // exactly ONE consumer stage inside that job, so nothing is
        // computed twice); final hop: EAGER — its materialization is the
        // one chain job of the group.
        val hop = step(s, iter + j)
        s =
          if (j < k) hop.transform(graft.core.Materialize.checkpointLazy)
          else hop.transform(graft.core.Materialize.checkpoint)
        hops += s
      }
      // second (cheap) action: every hop's 1-row metric, all reading the
      // now-cached hop states.
      val mrows = hops.zipWithIndex.map { case (h, j) =>
        val agg = metricAgg(h)
        require(agg.columns.length == 1,
          s"runFused metricAgg must return exactly one column (the metric); " +
            s"got ${agg.columns.mkString("[", ",", "]")}")
        agg.select(lit(j).as("_hop"), col(agg.columns.head).cast("double").as("_m"))
      }.reduce(_ unionByName _).collect()
      require(mrows.length == k,
        s"runFused metricAgg must be a 1-row (ungrouped) aggregate; " +
          s"$k hops produced ${mrows.length} metric rows")
      val ms: Array[Double] = {
        // a null aggregate (empty state) reads as 0.0 = converged, matching
        // the plain loop's count/sum-over-empty behavior
        val byHop = mrows.map(r =>
          r.getInt(0) -> (if (r.isNullAt(1)) 0.0 else r.getDouble(1))).toMap
        Array.tabulate(k)(byHop)
      }

      val hitIdx = ms.indexWhere(_ <= cfg.tol)
      converged = hitIdx >= 0
      val used = if (converged) hitIdx + 1 else k
      // overshoot hops inside the final group were computed but are never
      // observed — free and forget them
      for (j <- used until k) graft.core.Materialize.free(hops(j))

      var next = hops(used - 1)
      val doCheckpoint = cfg.checkpointDir.isDefined &&
        (converged || (iter + used) % cfg.checkpointEvery == 0)
      var snapshot = ""
      if (doCheckpoint) {
        val dir = cfg.checkpointDir.get
        snapshot = s"$dir/state/iter=${"%05d".format(iter + used)}"
        next.write.mode("overwrite").parquet(snapshot)
        graft.core.Materialize.free(next)
        next = spark.read.parquet(snapshot).transform(graft.core.Materialize.checkpoint)
      }
      for (j <- 0 until used - 1) graft.core.Materialize.free(hops(j))
      freeCheckpointed(state)
      val groupWall = (System.nanoTime() - t0) / 1000000
      for (j <- 0 until used) {
        // per-hop walls are the amortized group wall; the integer-division
        // remainder rides the LAST hop so summed wallMs equals the group wall
        val hopWall = groupWall / used +
          (if (j == used - 1) groupWall % used else 0L)
        val rec = IterRecord(iter + j + 1, ms(j), hopWall, -1L,
          if (j == used - 1) snapshot else "")
        history :+= rec
        cfg.checkpointDir.foreach(appendManifest(_, rec))
      }
      iter += used
      state = next
    }
    IterResult(state, iter - startIter, history, startIter)
  }
}
