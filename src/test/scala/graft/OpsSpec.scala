package graft

import graft.algo.{Centrality, LinkPrediction, SSSP, Coarsening}
import graft.ann.Ann
import graft.dedup.Dedup
import graft.quality.Metrics
import graft.text.TextOps
import graft.streaming.{GraphEvent, GraphEventType, GraphUpdater, StreamOps}
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkTestBase {

  // two triangles joined by one bridge edge; labels = the two triangles
  private val und = undirected((0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5),
    (2, 3))

  private def labels2 = {
    val s = spark
    import s.implicits._
    Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "label")
  }

  test("coverage / edge cut on two-triangle bridge") {
    assert(math.abs(Metrics.coverage(spark, edgeDF(und), labels2) - 6.0 / 7.0) < 1e-12)
    assert(Metrics.edgeCut(spark, edgeDF(und), labels2) == 1.0)
  }

  test("modularity matches hand computation (reference conventions)") {
    // tw=7; intra=6; vols: cluster0 = deg(0)+deg(1)+deg(2)=2+2+3=7, cluster1=7
    // expCov = 2 * (7/7)^2/4 = 0.5; Q = 6/7 - 0.5
    val q = Metrics.modularity(spark, edgeDF(und), labels2)
    assert(math.abs(q - (6.0 / 7.0 - 0.5)) < 1e-12)
  }

  test("modularity self-loop convention: loop counted twice in volume") {
    val withLoop = und ++ Seq((0L, 0L, 2.0))
    // tw=9; intra=8 (loop intra); vol0 = 7 + 2(loop in wdeg) + 2(again) = 11; vol1 = 7
    val q = Metrics.modularity(spark, edgeDF(withLoop), labels2)
    val expected = 8.0 / 9.0 - ((11.0 / 9) * (11.0 / 9) + (7.0 / 9) * (7.0 / 9)) / 4
    assert(math.abs(q - expected) < 1e-12)
  }

  test("conductance of balanced cut") {
    val s = spark
    import s.implicits._
    val inSet = Seq((0L, true), (1L, true), (2L, true), (3L, false),
      (4L, false), (5L, false)).toDF("id", "inSet")
    // cut=1, vol each side = 7 → 1/7
    assert(math.abs(Metrics.conductance(spark, edgeDF(und), inSet) - 1.0 / 7.0) < 1e-12)
  }

  test("partition comparison: identical partitions → rand 0, jaccard 1, nmi 1") {
    val a = labels2
    assert(Metrics.randDissimilarity(spark, a, a) == 0.0)
    assert(Metrics.jaccardSimilarity(spark, a, a) == 1.0)
    assert(math.abs(Metrics.nmi(spark, a, a) - 1.0) < 1e-12)
  }

  test("coarsening contracts the two-triangle graph to 2 supernodes") {
    val got = Coarsening.byPartition(edgeDF(und), labels2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0L, 0L) -> 3.0, (1L, 1L) -> 3.0, (0L, 1L) -> 1.0))
  }
}

class CentralityOpsSpec extends SparkTestBase {

  test("degree centrality on star graph") {
    val star = undirected((0, 1), (0, 2), (0, 3), (0, 4))
    val got = Centrality.degree(spark,
      graft.core.GraphOps.symmetrize(edgeDF(star)), normalized = true)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(0L) == 1.0 && got(1L) == 0.25)
  }

  test("eigenvector centrality: triangle + tail (non-bipartite)") {
    // power iteration needs an eigen-gap: bipartite graphs oscillate (the
    // reference shares this limitation) — use a triangle with a tail.
    val g = undirected((0, 1), (1, 2), (2, 0), (2, 3))
    val sym = graft.core.GraphOps.symmetrize(edgeDF(g))
    val s = spark
    import s.implicits._
    val got = Centrality.eigenvector(spark, sym, (0L to 3L).toDF("id"),
        tol = 1e-8, maxIter = 200)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // symmetry: nodes 0 and 1 equivalent; 2 is most central; 3 least
    assert(math.abs(got(0L) - got(1L)) < 1e-6)
    assert(got(2L) > got(0L) && got(0L) > got(3L))
    // 2-norm = 1
    assert(math.abs(got.values.map(x => x * x).sum - 1.0) < 1e-6)
  }

  test("k-core decomposition: K4 plus tail") {
    val k4 = for (i <- 0L until 4L; j <- (i + 1) until 4L) yield (i, j, 1.0)
    val tail = Seq((3L, 4L, 1.0), (4L, 5L, 1.0))
    val got = Centrality.coreDecomposition(spark, edgeDF(k4 ++ tail))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("BFS hop counts and weighted SSSP") {
    val und = undirected((0, 1), (1, 2), (2, 3), (0, 4))
    val s = spark
    import s.implicits._
    val got = SSSP.bfs(spark, edgeDF(und), Seq(0L).toDF("id"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    val w = Seq((0L, 1L, 5.0), (0L, 2L, 1.0), (2L, 1L, 1.0))
    val dist = SSSP.weighted(spark, edgeDF(w), source = 0L)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dist == Map(0L -> 0.0, 1L -> 2.0, 2L -> 1.0))
  }

  test("link prediction indices on a known 4-cycle") {
    // 0-1-2-3-0: (0,2) share neighbors {1,3}; (1,3) share {0,2}
    val cyc = undirected((0, 1), (1, 2), (2, 3), (3, 0))
    val cn = LinkPrediction.commonNeighbors(spark, edgeDF(cyc))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cn((0L, 2L)) == 2 && cn((1L, 3L)) == 2)
    assert(cn.getOrElse((0L, 1L), 0L) == 0L)
    val aa = LinkPrediction.adamicAdar(spark, edgeDF(cyc))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(aa((0L, 2L)) - 2.0 / math.log(2.0)) < 1e-9)
  }
}

class TextOpsSpec extends SparkTestBase {
  import org.apache.spark.sql.Row

  private def one(expr: org.apache.spark.sql.Column, text: String): Any = {
    val s = spark
    import s.implicits._
    Seq(text).toDF("text").select(expr).head().get(0)
  }

  test("token counts") {
    assert(one(TextOps.tokenCount(col("text")), "  a b   c ") == 3)
    assert(one(TextOps.tokenCount(col("text")), "") == 0)
    assert(one(TextOps.bpeIshTokenCount(col("text")), "ab12 c-d") == 5)
  }

  test("langId picks stopword-majority language, und fallback") {
    assert(one(TextOps.langId(col("text")), "the cat and the hat") == "en")
    assert(one(TextOps.langId(col("text")), "der hund und die katze") == "de")
    assert(one(TextOps.langId(col("text")), "xyzzy plugh") == "und")
  }

  test("quality components") {
    assert(one(TextOps.alphaRatio(col("text")), "ab12") == 0.5)
    assert(one(TextOps.punctRatio(col("text")), "a,b.") == 0.5)
    val sw = one(TextOps.stopwordRatio(col("text")), "the big dog").asInstanceOf[Double]
    assert(math.abs(sw - 1.0 / 3) < 1e-12)
  }

  test("fingerprint is stable under whitespace normalization") {
    val a = one(TextOps.fingerprint(col("text")), "one two three four")
    val b = one(TextOps.fingerprint(col("text")), "one  two\tthree   four")
    assert(a == b)
  }

  test("simhash16 within range; similar docs closer than dissimilar") {
    val base = "spark graph engine pagerank component triangle label web"
    val near = base.replace("web", "crawl")
    val far = "quantum chocolate umbrella penguin xylophone"
    def fp(t: String) = one(TextOps.simhash16(col("text")), t).asInstanceOf[Long]
    def ham(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(fp(base) >= 0 && fp(base) < 65536)
    assert(ham(fp(base), fp(near)) < ham(fp(base), fp(far)))
  }
}

class DedupSpec extends SparkTestBase {

  private def docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (2L, "the quick brown fox jumps over a lazy dog"),   // near dup
      (3L, "completely different content about spark engines"),
      (4L, "spark engines about completely different content")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts, canonical = min id") {
    val got = Dedup.exact(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(got(0L) == (2L, true) && got(1L) == (2L, false))
    assert(got(3L) == (1L, true))
  }

  test("token jaccard finds near-dups") {
    val got = Dedup.tokenJaccardPairs(docs, minSim = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((0L, 1L)) == 1.0)
    assert(got.contains((0L, 2L)) && got((0L, 2L)) > 0.7)
    assert(got.contains((3L, 4L)) && got((3L, 4L)) == 1.0) // same token set
    assert(!got.contains((0L, 3L)))
  }

  test("minhash LSH candidates include true near-dups with est_sim 1 for dups") {
    val got = Dedup.minhashLsh(docs, k = 8, bands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((0L, 1L)) == 1.0)
    assert(got.contains((3L, 4L)) && got((3L, 4L)) == 1.0)
  }

  test("simhash pairs: identical docs at distance 0") {
    val got = Dedup.simhashPairs(docs, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((0L, 1L)) == 0L)
  }

  test("embedding cosine pairs") {
    val s = spark
    import s.implicits._
    val embs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.1f)),
      (2L, Array(0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Dedup.embeddingCosinePairs(embs, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((0L, 1L)))
  }
}

class AnnSpec extends SparkTestBase {

  private def embs = {
    val s = spark
    import s.implicits._
    // three tight clusters around axes in R^3
    val rows = for {
      c <- 0 until 3
      i <- 0 until 20
    } yield {
      val base = Array.fill(3)(0.05f * ((i * 7 + c * 3) % 5))
      base(c) = 1.0f
      ((c * 20 + i).toLong, base, c)
    }
    rows.toDF("vec_id", "embedding", "label")
  }

  test("brute force top-k returns nearest cluster members, deterministic ranks") {
    val got = Ann.bruteForceTopK(embs, embs.where(col("vec_id") === 0), k = 5)
      .collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(got.length == 5)
    // all neighbors of a cluster-0 vector are cluster-0 vectors (ids < 20)
    assert(got.forall(_._1 < 20))
    assert(got.map(_._2).toSeq == Seq(1, 2, 3, 4, 5))
  }

  test("LSH cosine near-dup: subset of exact pairs, high recall on clusters") {
    import graft.dedup.Dedup
    val exact = Dedup.embeddingCosinePairs(embs, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.embeddingCosinePairsLsh(embs, minSim = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact)) // exact final filter ⇒ precision 1
    assert(exact.nonEmpty)
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall >= 0.8, s"recall $recall (${exact.size} exact pairs)")
  }

  test("IVF top-k achieves high recall vs brute force on clustered data") {
    val queries = embs.where(col("vec_id").isin(0L, 20L, 40L))
    val bf = Ann.bruteForceTopK(embs, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(spark, embs, queries, k = 5, nlist = 6, nprobe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.8, s"recall $recall")
  }
}

class DynamicsSpec extends SparkTestBase {

  test("GraphUpdater folds an event log into the edge table") {
    val s = spark
    import s.implicits._
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    val noRemoved = Seq.empty[Long].toDF("id")
    val events = Seq(
      GraphEvent(GraphEventType.EdgeAddition, 0, 1, 1.0, 1),
      GraphEvent(GraphEventType.EdgeAddition, 1, 2, 1.0, 2),
      GraphEvent(GraphEventType.EdgeWeightUpdate, 0, 1, 5.0, 3),
      GraphEvent(GraphEventType.EdgeAddition, 2, 3, 1.0, 4),
      GraphEvent(GraphEventType.EdgeRemoval, 1, 2, 0.0, 5),
      GraphEvent(GraphEventType.EdgeWeightIncrement, 0, 1, 2.0, 6),
      GraphEvent(GraphEventType.NodeRemoval, 3, 0, 0.0, 7)
    ).toDS()
    val (edges, removed) = GraphUpdater.applyEvents(spark, empty, noRemoved, events)
    val got = edges.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0L, 1L) -> 7.0)) // 5.0 updated + 2.0 increment; (2,3) dropped with node 3
    assert(removed.collect().map(_.getLong(0)).toSet == Set(3L))
  }

  test("windowed event stats under Structured Streaming = batch result") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = s.sqlContext
    val data = Seq(
      (java.sql.Timestamp.valueOf("2026-01-01 10:05:00"), "click", 1.0),
      (java.sql.Timestamp.valueOf("2026-01-01 10:45:00"), "click", 2.0),
      (java.sql.Timestamp.valueOf("2026-01-01 11:05:00"), "view", 3.0))
    val static = data.toDF("ts", "event_type", "value")
    val wantRows = StreamOps.windowedEventStats(static).collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet

    val stream = MemoryStream[(java.sql.Timestamp, String, Double)]
    stream.addData(data: _*)
    val q = StreamOps.windowedEventStats(
        stream.toDF().toDF("ts", "event_type", "value")
          .withWatermark("ts", "10 minutes"))
      .writeStream.format("memory").queryName("winstats")
      .outputMode("complete").start()
    q.processAllAvailable()
    val gotRows = s.table("winstats").collect()
      .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    q.stop()
    assert(gotRows == wantRows)
  }
}

class MultimodalSpec extends SparkTestBase {

  test("stub decode is deterministic, batch plumbing preserves ids") {
    val s = spark
    import s.implicits._
    val media = Seq((0L, "abcdefgh".getBytes), (1L, Array.empty[Byte]))
      .toDF("media_id", "media")
    val got = Multimodal.decodeFeatures(spark, media, dim = 4)
      .collect().map(r => r.getLong(0) -> (r.getSeq[Double](1), r.getLong(2))).toMap
    assert(got(0L)._2 == 8L && got(0L)._1.length == 4)
    assert(got(1L)._2 == 0L && got(1L)._1.forall(_ == 0.0))
    // pure function of bytes
    val again = Multimodal.decodeFeatures(spark, media, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(again(0L) == got(0L)._1)
  }

  test("frame sampling emits every Nth block") {
    val s = spark
    import s.implicits._
    val media = Seq((7L, Array.fill(1024)(1.toByte))).toDF("media_id", "media")
    val got = Multimodal.sampleFrames(spark, media, blockSize = 256, everyN = 2)
      .collect().map(r => r.getInt(1)).sorted
    assert(got.toSeq == Seq(0, 2))
  }
}
