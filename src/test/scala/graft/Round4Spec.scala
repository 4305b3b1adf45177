package graft

import org.apache.spark.sql.functions._
import graft.algo._
import graft.core.GraphOps

/** Round-2 continuation: RK approximate betweenness, LFR-style generator,
  * algebraic-distance link-prediction index, scalable prefix sum.
  */
class Round4Spec extends SparkTestBase {

  // ------------------------------------------- RK approximate betweenness
  test("RK approx betweenness: additive-eps agreement with exact Brandes") {
    val s = spark
    import s.implicits._
    // barbell: two triangles joined by a path — clear interior nodes
    val edges = edgeDF(undirected(
      (0L, 1L), (1L, 2L), (0L, 2L),
      (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 6L), (4L, 6L)))
    val n = 7.0
    val exact = Betweenness.forSources(spark, edges,
        GraphOps.nodes(edges).select("id"), scaleToFullGraph = false)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // RK estimates Σ_{s≠t} σ_st(v)/σ_st / (n(n−1)) = 2·b(v)/(n(n−1))
    val expected = exact.view.mapValues(b => 2 * b / (n * (n - 1))).toMap
    val eps = 0.15
    val approx = Betweenness.riondatoKornaropoulos(spark, edges,
        eps = eps, delta = 0.1, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    for ((id, e) <- expected)
      assert(math.abs(approx(id) - e) <= eps,
        s"node $id: approx ${approx(id)} vs expected $e")
    // determinism
    val again = Betweenness.riondatoKornaropoulos(spark, edges,
        eps = eps, delta = 0.1, seed = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == approx)
  }

  test("RK approx betweenness: path interior dominates endpoints") {
    val edges = edgeDF(undirected((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L)))
    val scores = Betweenness.riondatoKornaropoulos(spark, edges,
        eps = 0.2, delta = 0.1, seed = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) > scores(0L) && scores(2L) > scores(4L))
    assert(scores(0L) == 0.0 && scores(4L) == 0.0)
  }

  // ------------------------------------------ dynamic approx betweenness
  test("DynApproxBetweenness: insertion repair equals from-scratch rebuild") {
    val edges = edgeDF(undirected(
      (0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (0L, 7L), (7L, 8L)))
    val st0 = Betweenness.rkInit(spark, edges, r = 40, seed = 11)
    val inserted = edgeDF(undirected((1L, 5L)))
    val newEdges = edges.unionByName(inserted)
    val repaired = Betweenness.rkInsertEdges(spark, newEdges, inserted, st0)
    val got = Betweenness.rkScores(spark, newEdges, repaired)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val fresh = Betweenness.rkScores(spark, newEdges,
        Betweenness.rkInit(spark, newEdges, r = 40, seed = 11))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got == fresh)
    // the shortcut bypasses the old chain interior: node 2 lost coverage
    val before = Betweenness.rkScores(spark, edges, st0)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(2L) <= before(2L))
  }

  // ------------------------------------------------ dynamic event stream
  test("dynamic event generator: deterministic, removals subset of adds") {
    val ev = Generators.dynamicEvents(spark, n = 50L, batches = 4,
      addsPerBatch = 30L).persist()
    val adds = ev.where(col("etype") === "EDGE_ADDITION")
    val rems = ev.where(col("etype") === "EDGE_REMOVAL")
    assert(adds.count() > 0 && rems.count() > 0)
    // every removal targets an edge added in the previous batch
    val orphan = rems.as("r").join(adds.as("a"),
      col("r.u") === col("a.u") && col("r.v") === col("a.v") &&
        col("r.ts") === col("a.ts") + 1, "left_anti")
    assert(orphan.count() == 0)
    val again = Generators.dynamicEvents(spark, 50L, 4, 30L)
    assert(again.count() == ev.count())
    // folds cleanly through the GraphUpdater
    val s = spark
    import s.implicits._
    var state = (edgeDF(Seq.empty[(Long, Long, Double)]),
      Seq.empty[Long].toDF("id"))
    for (b <- 0 until 4) {
      val batch = ev.where(col("ts") === b)
        .as[(String, Long, Long, Double, Long)]
        .map(e => graft.streaming.GraphEvent(e._1, e._2, e._3, e._4, e._5))
      state = graft.streaming.GraphUpdater.applyEvents(spark, state._1,
        state._2, batch)
    }
    assert(state._1.count() > 0)
    ev.unpersist()
  }

  // --------------------------------------------------- LFR-style generator
  test("LFR-like: sizes cover n, labels consistent, mixing near mu") {
    val n = 2000L
    val g = Generators.lfrLike(spark, n, mu = 0.15, avgDeg = 12.0,
      minCommunity = 50L).persist()
    val labels = Generators.lfrLikeLabels(spark, n, minCommunity = 50L)
    assert(labels.count() == n)
    assert(labels.agg(countDistinct("label")).head().getLong(0) > 1)
    val withL = g
      .join(labels.withColumnRenamed("id", "src")
        .withColumnRenamed("label", "ls"), "src")
      .join(labels.withColumnRenamed("id", "dst")
        .withColumnRenamed("label", "ld"), "dst")
    val inter = withL.where(col("ls") =!= col("ld")).count()
    val total = g.count()
    val mixing = inter.toDouble / total
    // drawn budget is mu of edges; dedup/self-loop losses shift it a little
    assert(mixing > 0.03 && mixing < 0.35, s"mixing $mixing out of range")
    // determinism
    assert(Generators.lfrLike(spark, n, mu = 0.15, avgDeg = 12.0,
      minCommunity = 50L).count() == total)
    // PLM on a well-separated LFR graph should score high modularity
    val plm = PLM.run(spark, g)
    val q = graft.quality.Metrics.modularity(spark, g, plm.labels)
    assert(q > 0.5, s"modularity $q too low for mu=0.15")
    g.unpersist()
  }

  // ------------------------------------------- algebraic-distance LP index
  test("algebraic distance index: intra-cluster pairs closer than bridge") {
    // two triangles joined by one bridge edge
    val edges = edgeDF(undirected(
      (0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)))
    val scores = LinkPrediction.algebraicDistanceIndex(spark, edges,
        maxNodeId = 6L, systems = 4, iters = 8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val intra = Seq((0L, 1L), (0L, 2L), (3L, 4L), (4L, 5L)).map(scores)
    val cross = Seq((0L, 4L), (1L, 5L), (0L, 5L)).map(scores)
    assert(intra.max < cross.min,
      s"intra ${intra.max} should be < cross ${cross.min}")
  }

  // -------------------------------------------------- sfigality/permanence
  test("sfigality: leaves of a star score 1, the hub scores 0") {
    val edges = edgeDF(undirected((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L)))
    val s = Centrality.sfigality(spark, edges)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(0L) == 0.0)
    for (leaf <- 1L to 4L) assert(s(leaf) == 1.0)
  }

  test("permanence: two triangles + bridge, hand-computed values") {
    val s = spark
    import s.implicits._
    val edges = edgeDF(undirected(
      (0L, 1L), (1L, 2L), (0L, 2L),
      (3L, 4L), (4L, 5L), (3L, 5L),
      (2L, 3L)))
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L),
      (5L, 1L)).toDF("id", "label")
    val p = Centrality.permanence(spark, edges, labels)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // v=0: I=2, Emax->1, deg=2, c_in=1 -> 2/(1*2) - 0 = 1.0
    assert(math.abs(p(0L) - 1.0) < 1e-9)
    // v=2: I=2, Emax=1, deg=3, c_in=1 -> 2/3 - 0
    assert(math.abs(p(2L) - 2.0 / 3) < 1e-9)
    // symmetric community: same for 3
    assert(math.abs(p(3L) - 2.0 / 3) < 1e-9)
  }

  test("local partition coverage: weighted same-community edge fraction") {
    val s = spark
    import s.implicits._
    // triangle {0,1,2} in community 0 plus weighted bridge 2-3 (comm 1)
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 2.0), (0L, 2L, 1.0),
      (2L, 3L, 4.0)).toDF("src", "dst", "weight")
    val labels = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L)).toDF("id", "label")
    val c = Centrality.localPartitionCoverage(spark, edges, labels)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(c(0L) == 1.0 && c(1L) == 1.0)
    assert(math.abs(c(2L) - 3.0 / 7.0) < 1e-12) // (2+1)/(2+1+4)
    assert(c(3L) == 0.0)
  }

  test("simmelian overlap: competition ranks, ties kept, partner excluded") {
    // two triangles sharing edge (1,2): tri counts — (1,2)=2, others=1
    val edges = edgeDF(undirected(
      (0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L)))
    val s0 = EdgeScores.simmelianOverlap(spark, edges, maxRank = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // rank-0 sets: N≤(0)={1,2} (tied), N≤(1)={2}, N≤(2)={1}, N≤(3)={1,2}
    assert(s0((0L, 1L)) == 1.0) // common member 2
    assert(s0((0L, 2L)) == 1.0) // common member 1
    assert(s0((1L, 2L)) == 0.0) // only each other — partner excluded
    assert(s0((1L, 3L)) == 1.0 && s0((2L, 3L)) == 1.0)
    val s9 = EdgeScores.simmelianOverlap(spark, edges, maxRank = 9)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(s9((1L, 2L)) == 2.0) // full sets: common members {0, 3}
  }

  test("maximum spanning forest keeps the heaviest edges") {
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 2.0), (0L, 2L, 3.0))
      .toDF("src", "dst", "weight")
    val f = SpanningForest.maximumSpanningForest(spark, edges)
      .select("src", "dst", "weight").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(f == Set((1L, 2L, 2.0), (0L, 2L, 3.0)))
  }

  test("SEIR: deterministic wave on a path graph with transP=1") {
    val edges = edgeDF(undirected((0L, 1L), (1L, 2L), (2L, 3L)))
    val stats = Epidemic.seir(spark, edges, zero = Some(0L),
        Epidemic.Config(tMax = 5, transP = 1.0, eTime = 1, iTime = 1))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    // t=0: 0 infectious exposes 1
    assert(stats((0L, "S")) == 2 && stats((0L, "E")) == 1 &&
      stats((0L, "I")) == 1 && stats((0L, "R")) == 0)
    // t=1: 1 becomes infectious, 0 removed
    assert(stats((1L, "I")) == 1 && stats((1L, "R")) == 1 && stats((1L, "E")) == 0)
    // t=2: 1 exposes 2 then is removed
    assert(stats((2L, "E")) == 1 && stats((2L, "R")) == 2)
    // t=4: wave reaches 3; everyone else removed
    assert(stats((4L, "E")) == 1 && stats((4L, "R")) == 3 && stats((4L, "S")) == 0)
  }

  test("overlapper: combined labels agree iff all partitions agree") {
    val s = spark
    import s.implicits._
    val p1 = Seq((0L, 0L), (1L, 0L), (2L, 1L), (3L, 1L)).toDF("id", "label")
    val p2 = Seq((0L, 7L), (1L, 8L), (2L, 9L), (3L, 9L)).toDF("id", "label")
    val c = Overlapper.combine(spark, Seq(p1, p2))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c(2L) == c(3L))            // agree on both partitions
    assert(c(0L) != c(1L))            // split by p2
    assert(c(0L) != c(2L) && c(1L) != c(2L))
    assert(c(2L) == 2L)               // min-id labeling
  }

  test("edge-list writer: round-trips through the reader") {
    val s = spark
    import s.implicits._
    val edges = Seq((0L, 1L, 2.5), (1L, 2L, 1.0), (3L, 0L, 4.0))
      .toDF("src", "dst", "weight")
    val dir = java.nio.file.Files.createTempDirectory("elrt").toString
    graft.sources.Writers.edgeList(edges, s"$dir/e.txt")
    val back = graft.sources.Readers
      .edgeList(spark, s"$dir/e.txt/*.txt")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(back == Set((0L, 1L, 2.5), (1L, 2L, 1.0), (3L, 0L, 4.0)))
  }

  test("partition writer: line i holds node i's label; reader inverts") {
    val s = spark
    import s.implicits._
    val labels = Seq((0L, 5L), (1L, 5L), (2L, 9L)).toDF("id", "label")
    val dir = java.nio.file.Files.createTempDirectory("prt").toString
    graft.sources.Writers.partition(labels, s"$dir/p.txt")
    val part = new java.io.File(s"$dir/p.txt").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val back = graft.sources.Readers.partition(spark, part.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(back == Map(0L -> 5L, 1L -> 5L, 2L -> 9L))
  }

  test("DGS writer: round-trips through the reader") {
    val s = spark
    import s.implicits._
    import graft.streaming.{GraphEvent, GraphEventType => T}
    val evs = Seq(
      GraphEvent(T.NodeAddition, 0, 0, 0.0, 1),
      GraphEvent(T.NodeAddition, 1, 0, 0.0, 2),
      GraphEvent(T.EdgeAddition, 0, 1, 2.5, 3),
      GraphEvent(T.TimeStep, 0, 0, 0.0, 4),
      GraphEvent(T.EdgeWeightUpdate, 0, 1, 4.0, 5),
      GraphEvent(T.EdgeRemoval, 0, 1, 0.0, 6),
      GraphEvent(T.NodeRemoval, 1, 0, 0.0, 7))
    val dir = java.nio.file.Files.createTempDirectory("dgsrt").toString
    graft.sources.Writers.dgs(evs.toDS(), s"$dir/e.dgs")
    val part = new java.io.File(s"$dir/e.dgs").listFiles()
      .filter(_.getName.endsWith(".txt")).head
    val back = graft.sources.Readers.dgs(spark, part.getAbsolutePath)
      .collect().sortBy(_.ts)
    // node keys are written as ids in first-appearance order, so the
    // reader's first-appearance remap is the identity here
    assert(back.map(_.etype).toSeq == evs.map(_.etype))
    assert(back.map(_.u).toSeq == evs.map(_.u))
    assert(back.map(_.v).toSeq == evs.map(_.v))
    assert(back.collect { case e if e.etype == T.EdgeAddition => e.w }
      .toSeq == Seq(2.5))
  }

  // ----------------------------------------------------- matching family
  test("local-max matching: disjoint, maximal, weight-dominant") {
    val edges = edgeDF(Seq((0L, 1L, 1.0), (1L, 2L, 5.0), (2L, 3L, 1.0),
      (3L, 4L, 4.0), (4L, 5L, 1.0)))
    val m = Matching.localMax(spark, edges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(m == Set((1L, 2L), (3L, 4L))) // the two heavy edges dominate
    // disjoint endpoints
    val ends = m.toSeq.flatMap { case (u, v) => Seq(u, v) }
    assert(ends.distinct.size == ends.size)
    // maximality: no live edge with both endpoints unmatched
    val unmatched = Set(0L, 5L)
    assert(!Seq((0L, 1L), (4L, 5L)).exists { case (u, v) =>
      unmatched(u) && unmatched(v) })
  }

  test("matching coarsening contracts matched pairs; projector lifts back") {
    val s = spark
    import s.implicits._
    val edges = edgeDF(Seq((0L, 1L, 2.0), (1L, 2L, 1.0), (2L, 3L, 2.0)))
    val m = Matching.localMax(spark, edges) // {(0,1), (2,3)}
    val coarse = Matching.coarsen(spark, edges, m)
    val coarseNodes = GraphOps.nodes(coarse).count()
    assert(coarseNodes == 2) // 4 nodes, 2 matched pairs
    val fc = Matching.coarseMap(GraphOps.nodes(edges), m)
    val coarseLabels = Seq((0L, 7L), (2L, 9L)).toDF("id", "label")
    val lifted = Matching.projectBack(fc, coarseLabels)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lifted == Map(0L -> 7L, 1L -> 7L, 2L -> 9L, 3L -> 9L))
  }

  // ------------------------------------------------- distributed DGS parse
  test("distributed DGS parse equals the driver-side parser") {
    val f = java.io.File.createTempFile("graft", ".dgs")
    val w = new java.io.PrintWriter(f)
    w.println("DGS004"); w.println("null 0 0")
    w.println("an A"); w.println("an B"); w.println("an C")
    w.println("ae E1 A B weight=2.0")
    w.println("st")
    w.println("ae E2 B C")
    w.println("ce E1 weight=3.5")
    w.println("de E2")
    w.println("dn C")
    w.close()
    try {
      val a = graft.sources.Readers.dgs(spark, f.getAbsolutePath)
        .collect().sortBy(e => (e.ts, e.etype)).toSeq
      val b = graft.sources.Readers.dgsDistributed(spark, f.getAbsolutePath)
        .collect().sortBy(e => (e.ts, e.etype)).toSeq
      assert(b == a)
    } finally f.delete()
  }

  // ------------------------------------------------------ scalable prefix
  test("prefixSum: exclusive running total matches sequential scan") {
    val s = spark
    import s.implicits._
    val df = (1 to 100).map(i => (i.toLong, (i % 7 + 1).toDouble))
      .toDF("k", "v")
    val got = graft.core.DenseId.prefixSum(df, "v", "acc", Seq("k"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(2)))
    var run = 0.0
    for (((k, acc), i) <- got.zipWithIndex) {
      assert(k == i + 1)
      assert(math.abs(acc - run) < 1e-9, s"k=$k acc=$acc expected $run")
      run += (k % 7 + 1).toDouble
    }
  }

  test("aucRoc unchanged by the partitioned prefix sum (known AUC)") {
    val s = spark
    import s.implicits._
    // perfect separation → AUC 1; reversed → 0; interleaved → 0.5
    val preds = Seq((0L, 1L, 0.9), (0L, 2L, 0.8), (0L, 3L, 0.2),
      (0L, 4L, 0.1)).toDF("a", "b", "score")
    val pos = Seq((0L, 1L), (0L, 2L)).toDF("a", "b")
    assert(math.abs(LinkPrediction.aucRoc(spark, preds, pos) - 1.0) < 1e-9)
    val posRev = Seq((0L, 3L), (0L, 4L)).toDF("a", "b")
    assert(math.abs(LinkPrediction.aucRoc(spark, preds, posRev) - 0.0) < 1e-9)
  }
}
