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
}
