package graft.algo

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.GraphOps
import graft.ingest.PageGen

/** Degree assortativity (`correlation/Assortativity.cpp` in the reference;
  * used by `networkit.overview()`): Pearson correlation of endpoint degrees
  * over the symmetrized edge list. One join + one aggregate.
  */
object Assortativity {
  def degreeAssortativity(spark: SparkSession, edges: DataFrame): Double = {
    val canon = GraphOps.canonicalizeUnweighted(
      edges.where(col("src") =!= col("dst")))
    val deg = GraphOps.degrees(GraphOps.symmetrize(canon))
    val sym = GraphOps.symmetrize(canon)
      .join(deg.select(col("id").as("src"), col("degree").as("dx")), "src")
      .join(deg.select(col("id").as("dst"), col("degree").as("dy")), "dst")
    val r = sym.agg(corr(col("dx").cast("double"), col("dy").cast("double")))
      .head()
    if (r.isNullAt(0)) 0.0 else r.getDouble(0)
  }
}

/** Partition overlap combiner (`overlap/HashingOverlapper.cpp`,
  * `overlap/Overlapper.h`): the finest common coarsening of several
  * partitions — two nodes share a combined label iff they agree on EVERY
  * input partition. The reference combines labels with a djb2 hash
  * (collisions possible by design); here the combined label is the min
  * node id of each label-tuple group — collision-free, deterministic, and
  * consistent with the engine's CC min-id labeling convention.
  */
object Overlapper {
  def combine(spark: SparkSession, partitions: Seq[DataFrame]): DataFrame = {
    require(partitions.nonEmpty, "need at least one partition")
    val joined = partitions.zipWithIndex
      .map { case (p, i) => p.select(col("id"), col("label").as(s"_l$i")) }
      .reduce(_.join(_, "id"))
    val keys = partitions.indices.map(i => s"_l$i")
    val groups = joined.groupBy(keys.map(col): _*).agg(min("id").as("label"))
    joined.join(groups, keys).select("id", "label")
  }
}

/** Deterministic synthetic graph generators (reference
  * `networkit/cpp/generators/`, 5041 LoC of stateful-RNG generators) —
  * re-expressed as pure counter-based functions of (seed, index) so output
  * is identical across runs and parallelism levels (SURVEY.md §2.9).
  */
object Generators {

  /** Erdős–Rényi G(n, p) (`generators/ErdosRenyiGenerator.cpp`) via the
    * geometric-skip trick the reference itself uses (Batagelj–Brandes):
    * per source u, successive kept neighbors v > u are found by skipping
    * Geometric(p) gaps. Each skip is a pure function of (seed, u, k), so
    * generation is embarrassingly parallel over sources and O(m) total —
    * no n² pair enumeration.
    */
  def erdosRenyi(spark: SparkSession, n: Long, p: Double,
                 seed: Long = 42): DataFrame = {
    import spark.implicits._
    val log1mp = math.log1p(-p)
    spark.range(n).flatMap { uBoxed =>
      val u: Long = uBoxed.longValue
      Iterator.unfold((u, 0)) { case (v, k) =>
        val h = PageGen.mix64(PageGen.mix64(seed ^ u) ^ k.toLong)
        val r = math.max((h >>> 11).toDouble / (1L << 53).toDouble, 1e-300)
        val skip = 1L + math.floor(math.log(r) / log1mp).toLong
        val next = v + skip
        if (next >= n) None else Some(((u, next, 1.0), (next, k + 1)))
      }
    }.toDF("src", "dst", "weight")
  }

  /** RMAT-style web-like power-law generator
    * (`generators/RmatGenerator.cpp` shape): delegates to the crawl
    * generator's skewed link function — each of ~m edges is a pure function
    * of (seed, counter).
    */
  def rmatLike(spark: SparkSession, n: Long, seed: Long = 42,
               maxOutDeg: Int = 256): DataFrame =
    PageGen.edges(spark, n, seed, maxOutDeg)

  /** Chung–Lu expected-degree model (`generators/ChungLuGenerator.cpp`
    * semantics, determinized): given a power-law weight sequence
    * w_i = (n/(i+1))^(1/(β−1)), draw m = Σw/2 edges whose endpoints are
    * sampled ∝ w via inverse-CDF on counter-based uniforms — the standard
    * O(m) edge-list formulation (no n² pair scan), embarrassingly parallel
    * over the edge counter.
    */
  def chungLu(spark: SparkSession, n: Long, beta: Double = 2.5,
              avgDeg: Double = 8.0, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val exp = 1.0 / (beta - 1.0)
    val m = (n * avgDeg / 2).toLong
    // inverse CDF of the weight distribution: picking node ⌊n·u^(1/(1-exp̂))⌋
    // where the weight of rank i is (n/(i+1))^exp — the CDF of cumulative
    // weights of a power law with exponent `exp` inverts to u^(1/(1-exp)).
    val invExp = 1.0 / (1.0 - exp)
    def pick(h: Long): Long = {
      val u = math.max((h >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
      math.min((n * math.pow(u, invExp)).toLong, n - 1)
    }
    spark.range(m).map { eBoxed =>
      val e: Long = eBoxed.longValue
      val h1 = PageGen.mix64(PageGen.mix64(seed ^ e) ^ 0x9E3779B97F4A7C15L)
      val h2 = PageGen.mix64(PageGen.mix64(seed ^ e) ^ 0xC2B2AE3D27D4EB4FL)
      (pick(h1), pick(h2), 1.0)
    }.toDF("src", "dst", "weight")
      .where(col("src") =!= col("dst"))
  }

  /** Watts–Strogatz small world (`generators/WattsStrogatzGenerator.cpp`
    * semantics, determinized): ring lattice of degree 2k with each edge's
    * far endpoint rewired to a uniform target with probability p — rewiring
    * decided by a counter-based hash of (seed, u, j), so the graph is a
    * pure function of its parameters.
    */
  def wattsStrogatz(spark: SparkSession, n: Long, k: Int = 2,
                    p: Double = 0.1, seed: Long = 42): DataFrame = {
    import spark.implicits._
    spark.range(n).flatMap { uBoxed =>
      val u: Long = uBoxed.longValue
      (1 to k).iterator.map { j =>
        val h = PageGen.mix64(PageGen.mix64(seed ^ u) ^ j.toLong)
        val rewire = ((h >>> 11).toDouble / (1L << 53).toDouble) < p
        val v =
          if (rewire) {
            val h2 = PageGen.mix64(h ^ 0xD6E8FEB86659FD93L)
            ((h2 % n) + n) % n
          } else (u + j) % n
        (u, v, 1.0)
      }
    }.toDF("src", "dst", "weight")
      .where(col("src") =!= col("dst"))
  }

  /** HavelHakimiGenerator (`generators/HavelHakimiGenerator.cpp`): EXACT
    * realization of a graphical degree sequence — node i of the output has
    * degree `degrees(i)`, exactly. Classic Havel–Hakimi greedy: repeatedly
    * connect the highest-residual node to the d next-highest. The pairing
    * loop runs driver-side over the degree SEQUENCE only (the reference is
    * likewise sequential over its bucket queues): O(n) state, O(m + n log n)
    * time, independent of how edges distribute. Sortedness of the residual
    * array is maintained without re-sorting via the contiguous-block
    * decrement trick — each step decrements the strict-prefix fully plus
    * the TAIL of the tie block straddling position d. Edge materialization
    * is distributed from the emitted pairs; at 10^12-edge scale the same
    * loop emits O(n) rank-interval descriptors expanded by `spark.range`,
    * so driver memory stays O(n) while edges never touch the driver.
    * Throws IllegalArgumentException when the sequence is not graphical.
    */
  def havelHakimi(spark: SparkSession, degrees: Seq[Int]): DataFrame = {
    import spark.implicits._
    val n = degrees.length
    require(degrees.forall(d => d >= 0 && d < n), "degree out of range [0, n)")
    // rank order: degree desc, original index asc (stable, deterministic)
    val byRank = degrees.zipWithIndex.sortBy { case (d, i) => (-d, i) }
    val ids = byRank.map(_._2.toLong).toArray
    val res = byRank.map(_._1).toArray
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var h = 0
    while (h < n && res(h) > 0) {
      val d = res(h)
      require(h + d < n,
        s"not graphical: node ${ids(h)} needs $d partners, ${n - h - 1} left")
      require(res(h + d) > 0,
        s"not graphical: fewer than $d positive residuals for node ${ids(h)}")
      val v = res(h + d)
      // [lo, hi] = the tie block of value v; binary searches on the
      // descending residual array
      var a = h + 1; var b = h + d
      while (a < b) { val mid = (a + b) / 2; if (res(mid) > v) a = mid + 1 else b = mid }
      val lo = a
      a = lo; b = n - 1
      while (a < b) { val mid = (a + b + 1) / 2; if (res(mid) >= v) a = mid else b = mid - 1 }
      val hi = a
      val u = ids(h)
      var j = h + 1
      while (j < lo) { // strict prefix: res > v, all targeted
        res(j) -= 1; edges += ((math.min(u, ids(j)), math.max(u, ids(j)))); j += 1
      }
      val take = d - (lo - h - 1) // targets still needed, from the block's tail
      var k = hi - take + 1
      while (k <= hi) {
        res(k) -= 1; edges += ((math.min(u, ids(k)), math.max(u, ids(k)))); k += 1
      }
      res(h) = 0
      h += 1
    }
    require(res.forall(_ == 0), "not graphical: leftover residuals")
    edges.toSeq.toDF("src", "dst").withColumn("weight", lit(1.0))
  }

  /** Deterministic ranked-ring realization of a power-law degree SHAPE —
    * kept as the O(1)-driver-state alternative to [[havelHakimi]] (which
    * realizes an explicit sequence exactly): node i connects to the next
    * ⌈w_i⌉ nodes in rank order.
    */
  def rankedDegreeRing(spark: SparkSession, n: Long, beta: Double = 2.5,
                       maxDeg: Int = 64): DataFrame = {
    import spark.implicits._
    val exp = 1.0 / (beta - 1.0)
    spark.range(n).flatMap { iBoxed =>
      val i: Long = iBoxed.longValue
      val w = math.min(math.pow(n.toDouble / (i + 1), exp), maxDeg.toDouble)
      (1 to math.max(1, w.toInt)).iterator.map(j => (i, (i + j) % n, 1.0))
    }.toDF("src", "dst", "weight")
      .where(col("src") =!= col("dst"))
  }

  /** ClusteredRandomGraphGenerator
    * (`generators/ClusteredRandomGraphGenerator.cpp` semantics,
    * determinized): k contiguous equal communities, intra-community edge
    * probability pin, inter pout. Realized as the union of two independent
    * geometric-skip ER processes — a full-range G(n, pout) plus an
    * in-community G(range, p1) with p1 = (pin−pout)/(1−pout), so the union
    * hits exactly pin within communities and pout across. O(m), no pair
    * enumeration; ground-truth labels = id / ⌈n/k⌉.
    */
  def clusteredRandom(spark: SparkSession, n: Long, k: Int,
                      pin: Double, pout: Double,
                      seed: Long = 42): DataFrame = {
    import spark.implicits._
    require(pin >= pout, "clusteredRandom needs pin >= pout")
    val size = math.max(1L, (n + k - 1) / k)
    val p1 = (pin - pout) / (1.0 - pout)
    val intra =
      if (p1 <= 0) spark.emptyDataset[(Long, Long, Double)].toDF("src", "dst", "weight")
      else {
        val log1mp = math.log1p(-p1)
        spark.range(n).flatMap { uBoxed =>
          val u: Long = uBoxed.longValue
          val end = math.min(((u / size) + 1) * size, n)
          Iterator.unfold((u, 0)) { case (v, i) =>
            val h = PageGen.mix64(PageGen.mix64(seed ^ 0x5DEECE66DL ^ u) ^ i.toLong)
            val r = math.max((h >>> 11).toDouble / (1L << 53).toDouble, 1e-300)
            val skip = 1L + math.floor(math.log(r) / log1mp).toLong
            val next = v + skip
            if (next >= end) None else Some(((u, next, 1.0), (next, i + 1)))
          }
        }.toDF("src", "dst", "weight")
      }
    val inter = if (pout <= 0)
      spark.emptyDataset[(Long, Long, Double)].toDF("src", "dst", "weight")
    else erdosRenyi(spark, n, pout, seed ^ 0x2545F4914F6CDD1DL)
    intra.unionByName(inter).select("src", "dst").distinct()
      .withColumn("weight", lit(1.0))
  }

  /** Ground-truth community labels for [[clusteredRandom]]. */
  def clusteredRandomLabels(spark: SparkSession, n: Long, k: Int): DataFrame = {
    val size = math.max(1L, (n + k - 1) / k)
    spark.range(n).select(col("id"), (col("id") / size).cast("long").as("label"))
  }

  /** Deterministic power-law community layout shared by [[lfrLike]] and
    * [[lfrLikeLabels]]: sizes s_j = minCommunity·u_j^(−1/(τ2−1)) (capped at
    * n/4), appended until they cover n (last one trimmed). Driver-side —
    * k ≤ n/minCommunity entries, control-plane-sized.
    */
  private def communityLayout(n: Long, tau2: Double, minCommunity: Long,
                              seed: Long): (Array[Long], Array[Long]) = {
    val maxCommunity = math.max(minCommunity, n / 4)
    val starts = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Long]
    var total = 0L
    var j = 0
    while (total < n) {
      val h = PageGen.mix64(seed ^ 0x1FC0DEL ^ j.toLong)
      val u = math.max((h >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
      val raw = (minCommunity * math.pow(u, -1.0 / (tau2 - 1.0))).toLong
      val sz = math.min(math.min(math.max(raw, minCommunity), maxCommunity),
        n - total)
      starts += total; sizes += sz; total += sz; j += 1
    }
    (starts.toArray, sizes.toArray)
  }

  /** LFR-style community benchmark graph
    * (`generators/LFRGenerator.cpp` WHAT: power-law degree sequence with
    * exponent τ1, power-law community sizes with exponent τ2, mixing
    * parameter μ = the fraction of each node's edges leaving its
    * community), determinized and re-expressed as two O(m) edge-list
    * Chung–Lu processes — (1−μ) of the edge budget drawn inside contiguous
    * community blocks with block-local rank weights, μ drawn globally and
    * kept only when it crosses communities. No configuration-model
    * stub-matching (that is inherently sequential); degrees follow the
    * rank-weighted power law in expectation, which is what the benchmark
    * consumers here (PLP/PLM quality tests) need. Pure function of its
    * parameters; ground truth via [[lfrLikeLabels]].
    */
  def lfrLike(spark: SparkSession, n: Long, tau1: Double = 2.5,
              tau2: Double = 1.5, mu: Double = 0.2, avgDeg: Double = 10.0,
              minCommunity: Long = 20L, seed: Long = 42): DataFrame = {
    import spark.implicits._
    require(mu >= 0.0 && mu <= 1.0, "mixing parameter must be in [0,1]")
    require(tau1 > 2.0 && tau2 > 1.0, "LFR exponents need tau1>2, tau2>1")
    val (starts, sizes) = communityLayout(n, tau2, minCommunity, seed)
    val invExp = 1.0 / (1.0 - 1.0 / (tau1 - 1.0))
    def pick(h: Long, range: Long): Long = {
      val u = math.max((h >>> 11).toDouble / (1L << 53).toDouble, 1e-12)
      math.min((range * math.pow(u, invExp)).toLong, range - 1)
    }
    def commOf(i: Long): Int = {
      var lo = 0; var hi = starts.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (starts(mid) <= i) lo = mid else hi = mid - 1
      }
      lo
    }
    val mPer = sizes.map(s => math.max(0L, math.round((1 - mu) * avgDeg * s / 2)))
    val offs = mPer.scanLeft(0L)(_ + _)
    val intra = spark.range(offs.last).flatMap { eBoxed =>
      val e: Long = eBoxed.longValue
      var lo = 0; var hi = offs.length - 2
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (offs(mid) <= e) lo = mid else hi = mid - 1
      }
      val sz = sizes(lo); val st = starts(lo)
      if (sz < 2) Iterator.empty
      else {
        val h1 = PageGen.mix64(PageGen.mix64(seed ^ e) ^ 0x9E3779B97F4A7C15L)
        val h2 = PageGen.mix64(PageGen.mix64(seed ^ e) ^ 0xC2B2AE3D27D4EB4FL)
        val a = st + pick(h1, sz); val b = st + pick(h2, sz)
        if (a == b) Iterator.empty
        else Iterator((math.min(a, b), math.max(a, b)))
      }
    }.toDF("src", "dst")
    val interM = math.round(mu * avgDeg * n / 2)
    val inter = spark.range(interM).flatMap { eBoxed =>
      val e: Long = eBoxed.longValue
      val h1 = PageGen.mix64(PageGen.mix64(seed ^ 0x7E57EDL ^ e) ^ 0x9E3779B97F4A7C15L)
      val h2 = PageGen.mix64(PageGen.mix64(seed ^ 0x7E57EDL ^ e) ^ 0xC2B2AE3D27D4EB4FL)
      val a = pick(h1, n); val b = pick(h2, n)
      if (a == b || commOf(a) == commOf(b)) Iterator.empty
      else Iterator((math.min(a, b), math.max(a, b)))
    }.toDF("src", "dst")
    intra.unionByName(inter).distinct().withColumn("weight", lit(1.0))
  }

  /** Ground-truth community labels for [[lfrLike]] (same layout seed). */
  def lfrLikeLabels(spark: SparkSession, n: Long, tau2: Double = 1.5,
                    minCommunity: Long = 20L, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val (starts, _) = communityLayout(n, tau2, minCommunity, seed)
    spark.range(n).map { iBoxed =>
      val i: Long = iBoxed.longValue
      var lo = 0; var hi = starts.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (starts(mid) <= i) lo = mid else hi = mid - 1
      }
      (i, lo.toLong)
    }.toDF("id", "label")
  }

  /** Dynamic graph event stream (the `generators/Dynamic*Generator.cpp`
    * family surface: a deterministic time-ordered stream of edge
    * addition/removal events driving the Dyn* algorithms). Batch b adds a
    * disjoint deterministic slice of ER edges (counter-hashed endpoints)
    * and removes a hash-chosen quarter of batch b−1's additions — a pure
    * function of (n, batches, addsPerBatch, seed), so any batch can be
    * regenerated independently (no sequential driver state). Rows are
    * `streaming.GraphEvent`-shaped: (etype, u, v, w, ts) with ts = batch.
    */
  def dynamicEvents(spark: SparkSession, n: Long, batches: Int,
                    addsPerBatch: Long, seed: Long = 42): DataFrame = {
    import spark.implicits._
    val evs = spark.range(batches.toLong * addsPerBatch).flatMap { iBoxed =>
      val i: Long = iBoxed.longValue
      val b = i / addsPerBatch
      val h1 = PageGen.mix64(PageGen.mix64(seed ^ i) ^ 0x9E3779B97F4A7C15L)
      val h2 = PageGen.mix64(PageGen.mix64(seed ^ i) ^ 0xC2B2AE3D27D4EB4FL)
      val u = java.lang.Long.remainderUnsigned(h1, n)
      val v = java.lang.Long.remainderUnsigned(h2, n)
      if (u == v) Iterator.empty
      else {
        val add = ("EDGE_ADDITION", math.min(u, v), math.max(u, v), 1.0, b)
        // a quarter of this batch's additions are removed in batch b+1
        val h3 = PageGen.mix64(seed ^ 0xDE1E7EL ^ i)
        if (b + 1 < batches && java.lang.Long.remainderUnsigned(h3, 4L) == 0L)
          Iterator(add,
            ("EDGE_REMOVAL", math.min(u, v), math.max(u, v), 1.0, b + 1))
        else Iterator(add)
      }
    }.toDF("etype", "u", "v", "w", "ts")
    evs.orderBy("ts", "etype", "u", "v")
  }

  /** Hyperbolic random graph, threshold regime T = 0
    * (`generators/HyperbolicGenerator.h:13-23` / `HyperbolicGenerator.cpp`
    * generateCold): nodes at polar positions (θ uniform, r by the
    * α·sinh density via inverse-CDF), edge iff hyperbolic distance ≤ R,
    * cosh d = cosh r_u cosh r_v − sinh r_u sinh r_v cos Δθ. Produces
    * power-law degrees with exponent 2α+1.
    *
    * Distributed shape (the Spark analog of the reference's band/quadtree
    * pruning, `HyperbolicGenerator.cpp` bands): the disk splits into
    * `bands` angular sectors; two PERIPHERY nodes (r > ¾R) within distance
    * R are provably within Δθmax(¾R, ¾R) of each other, so periphery
    * candidate pairs come from a sector ⋈ neighboring-sectors join —
    * never n². The few CORE nodes (r ≤ ¾R, ~n·e^(−αR/4) of them) can reach
    * any angle and are broadcast against all nodes. Every candidate is
    * checked against the exact distance; positions are counter-hashed, so
    * the graph is a pure function of (n, R, α, seed).
    */
  def hyperbolic(spark: SparkSession, n: Long, avgDegree: Double = 6.0,
                 exp: Double = 3.0, seed: Long = 42,
                 bands: Int = 512): DataFrame = {
    import spark.implicits._
    val alpha = (exp - 1.0) / 2.0
    // Krioukov target radius for avg degree k (α≈1 closed form; the
    // reference binary-searches the exact expectation — documented
    // approximation)
    val rDisk = 2.0 * math.log(8.0 * n / (math.Pi * avgDegree))
    val rCut = 0.75 * rDisk
    // exact worst-case angular reach of a periphery pair (both at rCut)
    val cosMax = (math.cosh(rCut) * math.cosh(rCut) - math.cosh(rDisk)) /
      (math.sinh(rCut) * math.sinh(rCut))
    val thetaMax = if (cosMax <= -1.0) math.Pi
                   else if (cosMax >= 1.0) 0.0 else math.acos(cosMax)
    val width = 2.0 * math.Pi / bands
    val reach = math.min(bands / 2, math.ceil(thetaMax / width).toInt + 1)

    val pos = spark.range(n).select(col("id"),
        (lit(2.0 * math.Pi) *
          (shiftrightunsigned(xxhash64(col("id"), lit(seed)), 11)
            .cast("double") / (1L << 53).toDouble)).as("theta"),
        (acosh(lit(1.0) + (cosh(lit(alpha * rDisk)) - 1.0) *
          (shiftrightunsigned(xxhash64(col("id"), lit(seed + 1)), 11)
            .cast("double") / (1L << 53).toDouble)) / alpha).as("r"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def distOk(r1: Column, t1: Column, r2: Column, t2: Column): Column =
      cosh(r1) * cosh(r2) - sinh(r1) * sinh(r2) *
        cos(abs(t1 - t2)) <= math.cosh(rDisk) // cos is even + periodic: |Δθ| ok

    val periph = pos.where(col("r") > rCut)
      .withColumn("band", floor(col("theta") / width).cast("int"))
    val expanded = periph.select(col("id").as("src"), col("theta").as("t1"),
        col("r").as("r1"),
        explode(sequence(lit(-reach), lit(reach))).as("off"),
        col("band"))
      .select(col("src"), col("t1"), col("r1"),
        pmod(col("band") + col("off"), lit(bands)).cast("int").as("band"))
    val periphPairs = expanded
      .join(periph.select(col("id").as("dst"), col("theta").as("t2"),
        col("r").as("r2"), col("band")), Seq("band"))
      .where(col("src") < col("dst") && distOk(col("r1"), col("t1"),
        col("r2"), col("t2")))
      .select("src", "dst").distinct()

    val core = pos.where(col("r") <= rCut)
    val corePairs = pos
      .join(broadcast(core.select(col("id").as("cid"), col("theta").as("t2"),
        col("r").as("r2"))), col("id") =!= col("cid"))
      .where(distOk(col("r"), col("theta"), col("r2"), col("t2")))
      .select(least(col("id"), col("cid")).as("src"),
        greatest(col("id"), col("cid")).as("dst"))
      .distinct()

    val out = periphPairs.unionByName(corePairs).distinct()
      .withColumn("weight", lit(1.0))
    out
  }

  /** BarabasiAlbertGenerator, EXACT Batagelj–Brandes process
    * (`generators/BarabasiAlbertGenerator.cpp:113-155` generateBatagelj):
    * slot array M of 2·k·n entries; init chain M[2v]=v, M[2v+1]=v+1 for
    * v < n0; then for each new node v and slot i, M[2(vk+i)] = v and
    * M[2(vk+i)+1] = M[r] with r uniform in [0, 2(vk+i)] INCLUSIVE —
    * copying a uniform prior slot IS preferential attachment. The
    * reference's zero-initialized gap (indices 2n0..2n0k−1 read node 0
    * when k > 1) is replicated faithfully. Draws are determinized by
    * counter-based hashing (the reference's outputs are RNG-dependent, so
    * bit-equality with it is undefined anyway; the PROCESS is exact).
    * Like [[havelHakimi]], the slot loop is driver-side over O(k·n) longs
    * (the reference is likewise sequential — each slot reads earlier
    * slots); dedup/self-loop removal is distributed.
    */
  def barabasiAlbert(spark: SparkSession, k: Int, nMax: Int, n0: Int = 1,
                     seed: Long = 42): DataFrame = {
    import spark.implicits._
    require(k >= 1 && k <= nMax, "k must be in [1, nMax]")
    require(n0 >= 1 && n0 <= nMax, "n0 must be in [1, nMax]")
    val m = new Array[Long](2 * k * nMax)
    for (v <- 0 until n0) { m(2 * v) = v.toLong; m(2 * v + 1) = (v + 1).toLong }
    for (v <- n0 until nMax; i <- 0 until k) {
      val s = 2 * (v * k + i)
      m(s) = v.toLong
      val bound = s.toLong + 1 // Aux::Random::integer(s) is inclusive
      val h = PageGen.mix64(PageGen.mix64(seed ^ s.toLong) ^ 0x9E3779B97F4A7C15L)
      val r = (((h % bound) + bound) % bound).toInt
      m(s + 1) = m(r)
    }
    (0 until k * nMax).map(i => (m(2 * i), m(2 * i + 1)))
      .toDF("a", "b")
      .where(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("src"),
        greatest(col("a"), col("b")).as("dst"))
      .distinct()
      .withColumn("weight", lit(1.0))
  }

  /** Barabási–Albert-ish attachment (determinized hash-drawn SHAPE variant,
    * O(1) driver state — kept alongside the exact [[barabasiAlbert]]
    * process): node i attaches k edges to targets drawn ∝ a power-law over
    * [0, i) via counter-based hashing.
    */
  def barabasiAlbertLike(spark: SparkSession, n: Long, k: Int = 3,
                         seed: Long = 42): DataFrame = {
    import spark.implicits._
    spark.range(1L, n).flatMap { i =>
      (0 until math.min(k.toLong, i).toInt).iterator.map { j =>
        val h = PageGen.mix64(PageGen.mix64(seed ^ i) ^ j.toLong)
        val u = (h >>> 11).toDouble / (1L << 53).toDouble
        // skew toward low ids (early nodes = high degree)
        val t = math.min((i.toDouble * math.pow(u, 2.0)).toLong, i - 1)
        (i, t, 1.0)
      }
    }.toDF("src", "dst", "weight")
  }

  /** DorogovtsevMendesGenerator (`generators/DorogovtsevMendesGenerator
    * .cpp:20-40`): seed triangle; each new node t picks one EXISTING edge
    * (uniform in the reference; deterministic counter hash here) and
    * connects to BOTH its endpoints — so m = 2n−3 and every new node closes
    * a triangle. Edge indices are fully determined up front: edge j < 3 is
    * the seed triangle; edge j ≥ 3 was created by node
    * t = (j+3)/2 (j odd, copies the parent's FIRST endpoint) or
    * t = (j+2)/2 (j even, copies the SECOND), with parent edge index
    * p(t) = h(t) mod (2t−3) — the edges alive when t arrived. Endpoints
    * resolve through the parent FOREST by a level-order DataFrame loop
    * (parent indices strictly decrease; uniform parents give a
    * random-recursive-tree profile, expected depth O(log n)) — no
    * sequential driver loop, no driver-side edge list.
    */
  def dorogovtsevMendes(spark: SparkSession, n: Long,
                        seed: Long = 42): DataFrame = {
    require(n >= 3, "DorogovtsevMendes needs n >= 3")
    import graft.core.Materialize
    val m = 2 * n - 3
    // (j, t, side, p) for j >= 3; side 0 copies parent.u, side 1 parent.v
    val pending0 = spark.range(3L, m).select(
      col("id").as("j"),
      // `/` on longs is DOUBLE division in Spark — shiftright keeps it integral
      when(col("id") % 2 === 1, shiftright(col("id") + 3, 1))
        .otherwise(shiftright(col("id") + 2, 1)).as("t"),
      when(col("id") % 2 === 1, lit(0)).otherwise(lit(1)).as("side"))
      .withColumn("p",
        pmod(xxhash64(col("t"), lit(seed)), col("t") * 2 - 3))
    val seedTri = spark.range(3).select(col("id").as("j"),
      when(col("id") === 0, lit(0L)).when(col("id") === 1, lit(1L))
        .otherwise(lit(2L)).as("u"),
      when(col("id") === 0, lit(1L)).when(col("id") === 1, lit(2L))
        .otherwise(lit(0L)).as("v"))
    var frontier = seedTri.transform(Materialize.checkpoint)
    var resolved = frontier
    var pending = pending0.transform(Materialize.checkpoint)
    var left = pending.count()
    while (left > 0) {
      val hit = pending.join(
        frontier.select(col("j").as("p"), col("u").as("pu"),
          col("v").as("pv")), "p")
      frontier = hit.select(col("j"), col("t").as("u"),
        when(col("side") === 0, col("pu")).otherwise(col("pv")).as("v"))
        .transform(Materialize.checkpoint)
      resolved = resolved.unionByName(frontier)
        .transform(Materialize.checkpoint)
      pending = pending.join(frontier.select("j"), Seq("j"), "left_anti")
        .transform(Materialize.checkpoint)
      left = pending.count()
    }
    resolved.select(col("u").as("src"), col("v").as("dst"),
      lit(1.0).as("weight"))
  }

  /** EdgeSwitchingMarkovChainGenerator (`generators/
    * EdgeSwitchingMarkovChainGenerator.cpp:13-52`): degree-preserving
    * rewiring — repeatedly pick two edges (a,b),(c,d) and swap endpoints,
    * rejecting any switch that would create a self-loop or a duplicate
    * edge. The reference runs 10·m sequential swaps after a HavelHakimi
    * seed; the distributed chain batches them: each round hash-buckets the
    * canonical edge list into m/2 pair slots, every slot holding exactly 2
    * edges proposes one switch (orientation by a hash coin), and a proposal
    * is accepted only if it creates no self-loop, no collision with any
    * CURRENT edge (anti-join), and no collision with another accepted
    * proposal (groupBy count on the proposed keys). Rejected slots keep
    * their original edges, so every round preserves the degree sequence
    * EXACTLY and keeps the graph simple — the Markov-chain invariants —
    * while performing Θ(m) swap attempts per round in 3 shuffles.
    */
  def edgeSwitchingMarkovChain(spark: SparkSession, edges: DataFrame,
                               rounds: Int = 10,
                               seed: Long = 42): DataFrame = {
    import graft.core.Materialize
    var cur = GraphOps.canonicalizeUnweighted(
        edges.where(col("src") =!= col("dst")))
      .select("src", "dst").transform(Materialize.checkpoint)
    val m = cur.count()
    val buckets = math.max(1L, m / 2)
    for (r <- 1 to rounds) {
      val h = xxhash64(col("src"), col("dst"), lit(seed), lit(r))
      val bucketed = cur.withColumn("_b", pmod(h, lit(buckets)))
        .withColumn("_h", h)
      val slots = bucketed.groupBy("_b").agg(
        count(lit(1)).as("_c"),
        min(struct(col("_h"), col("src"), col("dst"))).as("_e1"),
        max(struct(col("_h"), col("src"), col("dst"))).as("_e2"))
      val prop = slots.where(col("_c") === 2 && col("_e1._h") =!= col("_e2._h"))
        .select(col("_b"),
          col("_e1.src").as("a1"), col("_e1.dst").as("b1"),
          col("_e2.src").as("a2"), col("_e2.dst").as("b2"),
          // parity of each hash first — adding two raw xxhash64 values
          // overflows Long under ANSI mode
          pmod(pmod(col("_e1._h"), lit(2L)) + pmod(col("_e2._h"), lit(2L)),
            lit(2L)).as("coin"))
        // proposed replacement edges, canonicalized
        .withColumn("n1u", when(col("coin") === 0, least(col("a1"), col("b2")))
          .otherwise(least(col("a1"), col("a2"))))
        .withColumn("n1v", when(col("coin") === 0, greatest(col("a1"), col("b2")))
          .otherwise(greatest(col("a1"), col("a2"))))
        .withColumn("n2u", when(col("coin") === 0, least(col("a2"), col("b1")))
          .otherwise(least(col("b1"), col("b2"))))
        .withColumn("n2v", when(col("coin") === 0, greatest(col("a2"), col("b1")))
          .otherwise(greatest(col("b1"), col("b2"))))
        // structural rejects: self-loops, the two new edges colliding
        .where(col("n1u") =!= col("n1v") && col("n2u") =!= col("n2v") &&
          !(col("n1u") === col("n2u") && col("n1v") === col("n2v")))
      val newKeys = prop.select(col("_b"), col("n1u").as("src"), col("n1v").as("dst"))
        .unionByName(prop.select(col("_b"), col("n2u").as("src"), col("n2v").as("dst")))
      // reject proposals whose new edge already exists, or that collide
      // with another proposal's new edge
      val existing = newKeys.join(cur, Seq("src", "dst"), "left_semi")
        .select("_b")
      val dup = newKeys.groupBy("src", "dst").agg(count(lit(1)).as("c"))
        .where(col("c") > 1)
      val dupB = newKeys.join(dup.select("src", "dst"), Seq("src", "dst"),
        "left_semi").select("_b")
      val rejected = existing.unionByName(dupB).distinct()
      val accepted = prop.join(rejected, Seq("_b"), "left_anti")
        .transform(Materialize.checkpoint)
      val acceptedNew = accepted
        .select(col("n1u").as("src"), col("n1v").as("dst"))
        .unionByName(accepted.select(col("n2u").as("src"), col("n2v").as("dst")))
      val untouched = bucketed
        .join(accepted.select("_b"), Seq("_b"), "left_anti")
        .select("src", "dst")
      cur = untouched.unionByName(acceptedNew)
        .transform(Materialize.checkpoint)
    }
    cur.withColumn("weight", lit(1.0))
  }
}

/** Synthetic partitions (`community/ClusteringGenerator.cpp`): singleton,
  * all-in-one, deterministic-random, continuous balanced — used as test
  * inputs for quality metrics.
  */
object ClusteringGenerator {
  def singleton(nodes: DataFrame): DataFrame =
    nodes.select(col("id"), col("id").as("label"))

  def allInOne(nodes: DataFrame): DataFrame =
    nodes.select(col("id"), lit(0L).as("label"))

  def random(nodes: DataFrame, k: Int, seed: Long = 42): DataFrame =
    nodes.select(col("id"),
      pmod(xxhash64(col("id"), lit(seed)), lit(k.toLong)).as("label"))

  def continuousBalanced(nodes: DataFrame, k: Int): DataFrame = {
    val n = nodes.count()
    val per = math.max(1L, (n + k - 1) / k)
    nodes.select(col("id"), (col("id") / per).cast("long").as("label"))
  }
}
