package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.GraphOps
import graft.algo.{Centrality, ConnectedComponents, LinkPrediction, PLP, PageRank, SSSP, Triangles, Coarsening}
import graft.quality.Metrics
import graft.text.TextOps
import graft.dedup.Dedup
import graft.ann.Ann
import graft.ingest.{LinkGraph, PageGen}
import graft.multimodal.Multimodal

/** The driver-facing operator surface: one named query per implemented
  * operator (SURVEY.md §2), each with a DuckDB-runnable ANSI oracle where
  * the op is SQL-expressible. Graph queries run over edge tables derived
  * deterministically from the driver's TPC-H-ish parquet (TESTDATA.md) so
  * the DuckDB oracle can build the identical graph:
  *
  *  - G1 (dense, 1000 nodes): src = l_orderkey % 1000,
  *    dst = l_partkey % 1000, qty = l_quantity — hub-skewed multigraph for
  *    triangles / degrees / PageRank / quality metrics.
  *  - G2 (sparse, ≤5000 nodes): one edge per order with small quantity —
  *    fragmented into many components, sized so the oracle's recursive
  *    transitive closure stays tiny.
  *
  * All double outputs are rounded to 6 decimals on BOTH sides (sum-order
  * nondeterminism of floating point across engines); all outputs are
  * sorted by their key columns.
  */
object EntryQueries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    graft.core.Sessions.tune(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  // ---------------------------------------------------------------- graphs
  /** G1 raw directed multigraph (self-loops kept). */
  def g1Raw(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem").select(
      (col("l_orderkey") % 1000).as("src"),
      (col("l_partkey") % 1000).as("dst"),
      col("l_quantity").as("qty"))

  /** G1 canonical weighted undirected (weight = Σ qty per edge). */
  def g1Canon(spark: SparkSession, dir: String): DataFrame =
    GraphOps.canonicalize(g1Raw(spark, dir).withColumnRenamed("qty", "weight"))

  /** G1 simple graph (distinct undirected, no self-loops, weight 1). */
  def g1Simple(spark: SparkSession, dir: String): DataFrame =
    GraphOps.canonicalizeUnweighted(
      g1Raw(spark, dir).where(col("src") =!= col("dst"))
        .withColumn("weight", lit(1.0)))

  /** G2 sparse graph for CC/BFS (no self-loops). */
  def g2(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .where(col("l_linenumber") === 1 && col("l_quantity") <= 5)
      .select((col("l_orderkey") % 5000).as("src"),
        ((col("l_partkey") * 7 + col("l_suppkey")) % 5000).as("dst"))
      .where(col("src") =!= col("dst"))
      .withColumn("weight", lit(1.0))

  /** Shared oracle SQL prefix for G1 (WITH-clause body). */
  private val G1SQL =
    """e_raw AS (SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst, l_quantity AS qty FROM lineitem),
      |e_canon AS (SELECT least(src,dst) AS src, greatest(src,dst) AS dst, sum(qty) AS weight FROM e_raw GROUP BY 1,2),
      |e_simple AS (SELECT DISTINCT least(src,dst) AS src, greatest(src,dst) AS dst FROM e_raw WHERE src <> dst),
      |e_sym AS (SELECT src, dst FROM e_simple UNION ALL SELECT dst AS src, src AS dst FROM e_simple),
      |deg AS (SELECT src AS id, count(*) AS degree FROM e_sym GROUP BY 1),
      |nodes AS (SELECT src AS id FROM e_raw UNION SELECT dst FROM e_raw)""".stripMargin

  private val G2SQL =
    """e0 AS (SELECT l_orderkey % 5000 AS a, (l_partkey*7 + l_suppkey) % 5000 AS b FROM lineitem WHERE l_linenumber = 1 AND l_quantity <= 5),
      |es AS (SELECT DISTINCT least(a,b) AS u, greatest(a,b) AS v FROM e0 WHERE a <> b),
      |sym2 AS (SELECT u, v FROM es UNION ALL SELECT v AS u, u AS v FROM es),
      |nodes2 AS (SELECT u AS id FROM sym2 GROUP BY 1)""".stripMargin

  // ============================================================== queries
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- core graph ops -------------------------------------------------
    "g_stats" -> ((s, d) =>
      GraphOps.stats(g1Canon(s, d), directed = false)
        .select(col("n"), col("m"), col("self_loops"),
          round(col("total_weight"), 6).as("total_weight"),
          round(col("density"), 6).as("density"))),

    "g_degrees" -> ((s, d) =>
      GraphOps.degrees(GraphOps.symmetrize(g1Simple(s, d)))
        .orderBy("id")),

    "g_wdegrees" -> ((s, d) =>
      GraphOps.weightedDegrees(GraphOps.symmetrize(g1Canon(s, d)))
        .select(col("id"), round(col("wdegree"), 6).as("wdegree"))
        .orderBy("id")),

    "g_subgraph" -> ((s, d) => {
      val keep = GraphOps.nodes(g1Simple(s, d)).where(col("id") < 200)
      GraphOps.subgraph(g1Simple(s, d), keep)
        .select("src", "dst").orderBy("src", "dst")
    }),

    "g_coarsen" -> ((s, d) => {
      val labels = GraphOps.nodes(g1Canon(s, d))
        .select(col("id"), (col("id") % 10).as("label"))
      Coarsening.byPartition(g1Canon(s, d), labels)
        .select(col("src"), col("dst"), round(col("weight"), 6).as("weight"))
        .orderBy("src", "dst")
    }),

    "deg_centrality" -> ((s, d) =>
      Centrality.degree(s, GraphOps.symmetrize(g1Simple(s, d)), normalized = true)
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy("id")),

    // ---- triangles ------------------------------------------------------
    "tri_global" -> ((s, d) => {
      import s.implicits._
      Seq(Triangles.globalCount(s, g1Simple(s, d))).toDF("triangles")
    }),

    "tri_per_edge" -> ((s, d) =>
      Triangles.perEdge(s, g1Simple(s, d)).orderBy("src", "dst")),

    "tri_lcc" -> ((s, d) =>
      Triangles.localClusteringCoefficient(s, g1Simple(s, d))
        .select(col("id"), round(col("lcc"), 6).as("lcc")).orderBy("id")),

    "tri_gcc" -> ((s, d) =>
      Triangles.globalClusteringCoefficient(s, g1Simple(s, d))
        .select(round(col("global_cc"), 6).as("global_cc"))),

    // ---- connected components ------------------------------------------
    "cc_components" -> ((s, d) =>
      ConnectedComponents.run(s, g2(s, d)).orderBy("id")),

    "cc_sizes" -> ((s, d) =>
      ConnectedComponents.run(s, g2(s, d))
        .groupBy("component").agg(count(lit(1)).as("size"))
        .orderBy("component")),

    // ---- BFS ------------------------------------------------------------
    "bfs_hops" -> ((s, d) => {
      val srcId = g2(s, d).agg(least(min("src"), min("dst"))).head().getLong(0)
      import s.implicits._
      SSSP.bfs(s, g2(s, d), Seq(srcId).toDF("id"), maxDepth = 8)
        .select(col("id"), col("dist")).orderBy("id")
    }),

    // ---- PageRank -------------------------------------------------------
    // fixed 20 iterations (oracle-matched); reference update rule
    "pr20" -> ((s, d) => {
      val eDir = g1Raw(s, d).select("src", "dst").distinct()
        .withColumn("weight", lit(1.0))
      val nodes = GraphOps.nodes(eDir)
      PageRank.run(s, eDir, nodes, PageRank.Config(tol = 0.0, maxIter = 20))
        .scores.select(col("id"), round(col("score"), 6).as("score"))
        .orderBy("id")
    }),

    // converged at 1e-6 — the engine's real operating point (no SQL oracle:
    // convergence-dependent iteration count)
    "pagerank" -> ((s, d) => {
      val eDir = g1Raw(s, d).select("src", "dst").distinct()
        .withColumn("weight", lit(1.0))
      PageRank.run(s, eDir, GraphOps.nodes(eDir),
        PageRank.Config(tol = 1e-6, maxIter = 200))
        .scores.select(col("id"), round(col("score"), 6).as("score"))
        .orderBy("id")
    }),

    // ---- community ------------------------------------------------------
    "plp" -> ((s, d) =>
      PLP.run(s, g1Simple(s, d)).labels.orderBy("id")),

    "kcore" -> ((s, d) =>
      Centrality.coreDecomposition(s, g2(s, d)).orderBy("id")),

    // ---- community: PLM (multilevel Louvain; rows-only — async-free but
    // iterative) ---------------------------------------------------------
    "plm" -> ((s, d) =>
      graft.algo.PLM.run(s, g1Simple(s, d)).labels.orderBy("id")),

    // ---- ANF effective diameter (sketch-based; rows-only) ---------------
    "anf_diameter" -> ((s, d) => {
      import s.implicits._
      Seq(graft.algo.Anf.effectiveDiameter(s, g2(s, d), r = 16))
        .toDF("effective_diameter")
    }),

    // ---- edge scores / sparsification -----------------------------------
    "es_jaccard" -> ((s, d) =>
      graft.algo.EdgeScores.jaccardSimilarity(s, g1Simple(s, d))
        .select(col("src"), col("dst"), round(col("score"), 6).as("score"))
        .orderBy("src", "dst")),

    "es_local_degree" -> ((s, d) =>
      graft.algo.EdgeScores.localDegree(s, g1Simple(s, d))
        .select(col("src"), col("dst"), round(col("score"), 6).as("score"))
        .orderBy("src", "dst")),

    "es_backbone" -> ((s, d) => {
      val scores = graft.algo.EdgeScores.jaccardSimilarity(s, g1Simple(s, d))
      graft.algo.EdgeScores.globalThreshold(g1Simple(s, d), scores, 0.2)
        .select("src", "dst").orderBy("src", "dst")
    }),

    // ---- distance / closeness ------------------------------------------
    "closeness" -> ((s, d) => {
      val sources = GraphOps.nodes(g2(s, d)).orderBy("id").limit(3)
      graft.algo.Closeness.forSources(s, g2(s, d), sources)
        .select(col("id"), round(col("closeness"), 6).as("closeness"),
          round(col("harmonic"), 6).as("harmonic"))
        .orderBy("id")
    }),

    // ---- spanning forest / MIS / betweenness / SCD (rows-only) ----------
    "msf" -> ((s, d) =>
      graft.algo.SpanningForest.minimumSpanningForest(s, g2(s, d))
        .select(col("src"), col("dst")).orderBy("src", "dst")),

    "luby_mis" -> ((s, d) =>
      graft.algo.IndependentSet.luby(s, g2(s, d)).orderBy("id")),

    "betweenness" -> ((s, d) =>
      graft.algo.Betweenness.sampled(s, g2(s, d), nSources = 16)
        .select(col("id"), round(col("score"), 6).as("score"))
        .orderBy("id")),

    "scd_nibble" -> ((s, d) => {
      import s.implicits._
      val seed = GraphOps.nodes(g2(s, d)).agg(min("id")).head().getLong(0)
      graft.algo.SCD.pageRankNibble(s, g2(s, d), Seq(seed).toDF("id"))
        .orderBy("id")
    }),

    // ---- quality metrics ------------------------------------------------
    "q_modularity" -> ((s, d) => {
      val labels = GraphOps.nodes(g1Canon(s, d))
        .select(col("id"), (col("id") % 10).as("label"))
      import s.implicits._
      Seq(Metrics.modularity(s, g1Canon(s, d), labels)).toDF("q")
        .select(round(col("q"), 6).as("modularity"))
    }),

    "q_coverage_cut" -> ((s, d) => {
      val labels = GraphOps.nodes(g1Canon(s, d))
        .select(col("id"), (col("id") % 10).as("label"))
      import s.implicits._
      Seq((Metrics.coverage(s, g1Canon(s, d), labels),
        Metrics.edgeCut(s, g1Canon(s, d), labels))).toDF("cov", "cut")
        .select(round(col("cov"), 6).as("coverage"),
          round(col("cut"), 6).as("edge_cut"))
    }),

    "q_conductance" -> ((s, d) => {
      val inSet = GraphOps.nodes(g1Canon(s, d))
        .select(col("id"), (col("id") < 500).as("inSet"))
      import s.implicits._
      Seq(Metrics.conductance(s, g1Canon(s, d), inSet)).toDF("c")
        .select(round(col("c"), 6).as("conductance"))
    }),

    "q_partition_compare" -> ((s, d) => {
      val nodes = GraphOps.nodes(g1Canon(s, d))
      val pa = nodes.select(col("id"), (col("id") % 10).as("label"))
      val pb = nodes.select(col("id"), (col("id") % 7).as("label"))
      import s.implicits._
      Seq((Metrics.randDissimilarity(s, pa, pb),
        Metrics.jaccardSimilarity(s, pa, pb))).toDF("r", "j")
        .select(round(col("r"), 6).as("rand_dissimilarity"),
          round(col("j"), 6).as("jaccard_sim"))
    }),

    // ---- link prediction ------------------------------------------------
    "lp_common_neighbors" -> ((s, d) =>
      LinkPrediction.commonNeighbors(s, g1Simple(s, d), maxNodeId = 100)
        .orderBy("a", "b")),

    "lp_jaccard" -> ((s, d) =>
      LinkPrediction.jaccard(s, g1Simple(s, d), maxNodeId = 100)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")),

    "lp_adamic_adar" -> ((s, d) =>
      LinkPrediction.adamicAdar(s, g1Simple(s, d), maxNodeId = 100)
        .select(col("a"), col("b"), round(col("aa"), 6).as("aa"))
        .orderBy("a", "b")),

    // ---- text analysis --------------------------------------------------
    "txt_tokens" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextOps.bpeIshTokenCount(col("text")).cast("long").as("n_bpeish"))
        .orderBy("doc_id")),

    "txt_lang" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.langId(col("text")).as("lang_guess")).orderBy("doc_id")),

    "txt_quality" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        round(TextOps.alphaRatio(col("text")), 6).as("alpha_ratio"),
        round(TextOps.punctRatio(col("text")), 6).as("punct_ratio"),
        round(TextOps.stopwordRatio(col("text")), 6).as("stopword_ratio"),
        TextOps.qualityScore(col("text")).as("quality"))
        .orderBy("doc_id")),

    "txt_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.fingerprint(col("text")).as("fingerprint")).orderBy("doc_id")),

    // ---- dedup ----------------------------------------------------------
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"))
        .select(col("doc_id"), col("content_hash"), col("group_size"),
          col("is_canonical")).orderBy("doc_id")),

    "dedup_jaccard" -> ((s, d) =>
      Dedup.tokenJaccardPairs(t(s, d, "documents"), minSim = 0.5)
        .select(col("a"), col("b"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a", "b")),

    "dedup_minhash_sig" -> ((s, d) =>
      Dedup.minhashSignatures(t(s, d, "documents"), k = 4)
        .orderBy("doc_id")),

    "dedup_minhash_pairs" -> ((s, d) =>
      Dedup.minhashLsh(t(s, d, "documents"), k = 4, bands = 2)
        .select(col("a"), col("b"), round(col("est_sim"), 6).as("est_sim"))
        .orderBy("a", "b")),

    "dedup_simhash" -> ((s, d) =>
      t(s, d, "documents").select(col("doc_id"),
        TextOps.simhash16(col("text")).as("fp")).orderBy("doc_id")),

    "dedup_simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(t(s, d, "documents"), maxDist = 3)
        .orderBy("a", "b")),

    // ---- embeddings / ANN ----------------------------------------------
    "emb_topk" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Ann.bruteForceTopK(embs, embs.where(col("vec_id") < 10), k = 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rank")
    }),

    "emb_neardup" -> ((s, d) =>
      Dedup.embeddingCosinePairs(t(s, d, "embeddings"), minSim = 0.3)
        .select(col("a"), col("b"), round(col("cos"), 6).as("cos"))
        .orderBy("a", "b")),

    "emb_centroids" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("label"), posexplode(col("embedding").cast("array<double>"))
          .as(Seq("pos", "x")))
        .groupBy("label", "pos").agg(round(avg("x"), 6).as("c"))
        .select(col("label").cast("long").as("label"),
          (col("pos") + 1).cast("long").as("pos"), col("c"))
        .orderBy("label", "pos")),

    // IVF ANN — the scale path; no SQL oracle (k-means assignment), driver
    // rows-only check
    "emb_ivf_topk" -> ((s, d) => {
      val embs = t(s, d, "embeddings")
      Ann.ivfTopK(s, embs, embs.where(col("vec_id") < 10), k = 5,
        nlist = 8, nprobe = 3)
        .select(col("query_id"), col("rank"), col("neighbor_id"),
          round(col("cos"), 6).as("cos"))
        .orderBy("query_id", "rank")
    }),

    // ---- events / streaming shapes -------------------------------------
    "events_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(date_trunc("hour", col("ts")).as("window_start"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("sum_value"))
        .orderBy("window_start", "event_type")),

    "events_sessions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts")
      t(s, d, "events")
        .withColumn("prev_ts", lag("ts", 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > 1800, 1)
            .otherwise(0))
        .groupBy("user_id").agg(sum("new_session").as("n_sessions"),
          count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),

    // ---- web ingest (generator-driven; rows-only smoke) ------------------
    "ingest_pages" -> ((s, d) => {
      import s.implicits._
      PageGen.pages(s, 500, seed = 42).toDF()
        .select(col("url"), col("lang"), length(col("text")).as("text_len"))
        .orderBy("url")
    }),

    "ingest_edges" -> ((s, d) => {
      val (nodes, edges) = LinkGraph.build(s, PageGen.pages(s, 500, seed = 42).toDF())
      edges.orderBy("src", "dst")
    }),

    // ---- multimodal plumbing (stub decode; rows-only) --------------------
    "mm_features" -> ((s, d) => {
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          col("text").cast("binary").as("media"))
      Multimodal.decodeFeatures(s, media, dim = 4)
        .select(col("media_id"), col("n_bytes"),
          round(element_at(col("features"), 1), 6).as("f0"),
          round(element_at(col("features"), 2), 6).as("f1"),
          round(element_at(col("features"), 3), 6).as("f2"),
          round(element_at(col("features"), 4), 6).as("f3"))
        .orderBy("media_id")
    })
  )

  // =========================================================== oracle SQL
  /** Unrolled 20-iteration PageRank (reference update rule, final L1
    * normalization) — generated CTE chain.
    */
  private def pr20Sql: String = {
    val sb = new StringBuilder
    sb.append("WITH e_raw AS (SELECT l_orderkey % 1000 AS src, l_partkey % 1000 AS dst FROM lineitem),\n")
    sb.append("e_dir AS (SELECT DISTINCT src, dst FROM e_raw),\n")
    sb.append("prnodes AS (SELECT src AS id FROM e_dir UNION SELECT dst FROM e_dir),\n")
    sb.append("odeg AS (SELECT src AS id, count(*) AS od FROM e_dir GROUP BY 1),\n")
    sb.append("nn AS (SELECT count(*) AS n FROM prnodes),\n")
    sb.append("p0 AS (SELECT id, 1.0/nn.n AS r FROM prnodes, nn)")
    for (k <- 1 to 20) {
      sb.append(s""",
p$k AS (SELECT pn.id, 0.85 * coalesce(c.s, 0) + 0.15/nn.n AS r
  FROM prnodes pn CROSS JOIN nn LEFT JOIN (
    SELECT e.dst AS id, sum(p.r / od.od) AS s
    FROM e_dir e JOIN p${k - 1} p ON e.src = p.id JOIN odeg od ON e.src = od.id
    GROUP BY e.dst) c ON pn.id = c.id)""")
    }
    sb.append(""",
norm AS (SELECT sum(r) AS l1 FROM p20)
SELECT id, round(r / norm.l1, 6) AS score FROM p20, norm ORDER BY id""")
    sb.toString
  }

  /** Docs tokenization fragment (parity with TextOps.tokens). */
  private val TOKS =
    """toks AS (SELECT doc_id, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk FROM documents)"""

  private val TOKROWS =
    """tokrows AS (SELECT doc_id, unnest(list_distinct(tk)) AS tok FROM toks)"""

  val oracleSql: Map[String, String] = Map(
    "g_stats" ->
      s"""WITH $G1SQL
         |SELECT (SELECT count(*) FROM nodes) AS n,
         |  count(*) AS m,
         |  sum(CASE WHEN src = dst THEN 1 ELSE 0 END) AS self_loops,
         |  round(sum(weight), 6) AS total_weight,
         |  round(count(*) / ((SELECT count(*) FROM nodes) * ((SELECT count(*) FROM nodes) - 1) / 2.0), 6) AS density
         |FROM e_canon""".stripMargin,

    "g_degrees" ->
      s"WITH $G1SQL\nSELECT id, degree FROM deg ORDER BY id",

    "g_wdegrees" ->
      s"""WITH $G1SQL,
         |wsym AS (SELECT src, dst, weight FROM e_canon
         |  UNION ALL SELECT dst, src, weight FROM e_canon WHERE src <> dst)
         |SELECT src AS id, round(sum(weight), 6) AS wdegree FROM wsym GROUP BY 1 ORDER BY id""".stripMargin,

    "g_subgraph" ->
      s"""WITH $G1SQL
         |SELECT src, dst FROM e_simple WHERE src < 200 AND dst < 200 ORDER BY src, dst""".stripMargin,

    "g_coarsen" ->
      s"""WITH $G1SQL
         |SELECT least(src % 10, dst % 10) AS src, greatest(src % 10, dst % 10) AS dst,
         |  round(sum(weight), 6) AS weight
         |FROM e_canon GROUP BY 1, 2 ORDER BY src, dst""".stripMargin,

    "deg_centrality" ->
      s"""WITH $G1SQL
         |SELECT n.id, round(coalesce(d.degree, 0) / ((SELECT count(*) FROM (SELECT src AS id FROM e_sym UNION SELECT dst FROM e_sym)) - 1.0), 6) AS score
         |FROM (SELECT src AS id FROM e_sym UNION SELECT dst FROM e_sym) n
         |LEFT JOIN deg d ON n.id = d.id ORDER BY n.id""".stripMargin,

    "tri_global" ->
      s"""WITH $G1SQL
         |SELECT count(*) AS triangles FROM e_simple e1
         |JOIN e_simple e2 ON e1.dst = e2.src AND e1.src < e1.dst
         |JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst""".stripMargin,

    "tri_per_edge" ->
      s"""WITH $G1SQL,
         |tris AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w FROM e_simple e1
         |  JOIN e_simple e2 ON e1.dst = e2.src
         |  JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |sides AS (SELECT u AS a, v AS b FROM tris UNION ALL
         |  SELECT u, w FROM tris UNION ALL SELECT v, w FROM tris),
         |cnt AS (SELECT a AS src, b AS dst, count(*) AS triangles FROM sides GROUP BY 1,2)
         |SELECT e.src, e.dst, coalesce(c.triangles, 0) AS triangles
         |FROM e_simple e LEFT JOIN cnt c ON e.src = c.src AND e.dst = c.dst
         |ORDER BY e.src, e.dst""".stripMargin,

    "tri_lcc" ->
      s"""WITH $G1SQL,
         |tris AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w FROM e_simple e1
         |  JOIN e_simple e2 ON e1.dst = e2.src
         |  JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |corners AS (SELECT u AS id FROM tris UNION ALL SELECT v FROM tris UNION ALL SELECT w FROM tris),
         |tcnt AS (SELECT id, count(*) AS t FROM corners GROUP BY 1)
         |SELECT d.id, round(CASE WHEN d.degree >= 2
         |  THEN 2.0 * coalesce(t.t, 0) / (d.degree * (d.degree - 1)) ELSE 0.0 END, 6) AS lcc
         |FROM deg d LEFT JOIN tcnt t ON d.id = t.id ORDER BY d.id""".stripMargin,

    "tri_gcc" ->
      s"""WITH $G1SQL,
         |tris AS (SELECT count(*) AS t FROM e_simple e1
         |  JOIN e_simple e2 ON e1.dst = e2.src
         |  JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |wedges AS (SELECT sum(degree * (degree - 1) / 2) AS w FROM deg)
         |SELECT round(3.0 * tris.t / (CASE WHEN wedges.w = 0 THEN 1 ELSE wedges.w END), 6) AS global_cc
         |FROM tris, wedges""".stripMargin,

    "cc_components" ->
      s"""WITH RECURSIVE $G2SQL,
         |reach(id, r) AS (SELECT id, id FROM nodes2
         |  UNION SELECT reach.id, s.v FROM reach JOIN sym2 s ON s.u = reach.r),
         |comp AS (SELECT id, min(r) AS cmin FROM reach GROUP BY id)
         |SELECT id, dense_rank() OVER (ORDER BY cmin) - 1 AS component
         |FROM comp ORDER BY id""".stripMargin,

    "cc_sizes" ->
      s"""WITH RECURSIVE $G2SQL,
         |reach(id, r) AS (SELECT id, id FROM nodes2
         |  UNION SELECT reach.id, s.v FROM reach JOIN sym2 s ON s.u = reach.r),
         |comp AS (SELECT id, min(r) AS cmin FROM reach GROUP BY id),
         |lab AS (SELECT id, dense_rank() OVER (ORDER BY cmin) - 1 AS component FROM comp)
         |SELECT component, count(*) AS size FROM lab GROUP BY 1 ORDER BY component""".stripMargin,

    "bfs_hops" ->
      s"""WITH RECURSIVE $G2SQL,
         |src0 AS (SELECT min(id) AS s FROM nodes2),
         |walk(id, dd) AS (SELECT s, 0 FROM src0
         |  UNION SELECT s2.v, walk.dd + 1 FROM walk JOIN sym2 s2 ON s2.u = walk.id
         |    WHERE walk.dd < 8)
         |SELECT id, min(dd) AS dist FROM walk GROUP BY id ORDER BY id""".stripMargin,

    "pr20" -> pr20Sql,

    "closeness" ->
      s"""WITH RECURSIVE $G2SQL,
         |srcs AS (SELECT id AS s FROM nodes2 ORDER BY id LIMIT 3),
         |walk(s, id, dd) AS (SELECT s, s, 0 FROM srcs
         |  UNION SELECT walk.s, sy.v, walk.dd + 1 FROM walk JOIN sym2 sy ON sy.u = walk.id
         |    WHERE walk.dd < 30),
         |dist AS (SELECT s, id, min(dd) AS d FROM walk GROUP BY 1, 2)
         |SELECT s AS id,
         |  round(count(*) * 1.0 / sum(d), 6) AS closeness,
         |  round(sum(1.0 / d), 6) AS harmonic
         |FROM dist WHERE d > 0 GROUP BY s ORDER BY id""".stripMargin,

    "es_jaccard" ->
      s"""WITH $G1SQL,
         |tris AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w FROM e_simple e1
         |  JOIN e_simple e2 ON e1.dst = e2.src
         |  JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |sides AS (SELECT u AS a, v AS b FROM tris UNION ALL
         |  SELECT u, w FROM tris UNION ALL SELECT v, w FROM tris),
         |cnt AS (SELECT a AS src, b AS dst, count(*) AS t FROM sides GROUP BY 1,2)
         |SELECT e.src, e.dst,
         |  round(coalesce(c.t, 0) * 1.0 / (da.degree + db.degree - coalesce(c.t, 0)), 6) AS score
         |FROM e_simple e LEFT JOIN cnt c ON e.src = c.src AND e.dst = c.dst
         |JOIN deg da ON e.src = da.id JOIN deg db ON e.dst = db.id
         |ORDER BY e.src, e.dst""".stripMargin,

    "es_local_degree" ->
      s"""WITH $G1SQL,
         |inc AS (SELECT s.src AS node, s.dst AS nbr, dn.degree AS dnbr, dd.degree AS dnode
         |  FROM e_sym s JOIN deg dn ON s.dst = dn.id JOIN deg dd ON s.src = dd.id),
         |rk AS (SELECT node, nbr, dnode,
         |  row_number() OVER (PARTITION BY node ORDER BY dnbr DESC, nbr ASC) AS r
         |  FROM inc),
         |sc AS (SELECT least(node, nbr) AS src, greatest(node, nbr) AS dst,
         |  CASE WHEN dnode <= 1 THEN 1.0 ELSE 1.0 - ln(r) / ln(dnode) END AS s
         |  FROM rk)
         |SELECT src, dst, round(max(s), 6) AS score FROM sc GROUP BY 1, 2
         |ORDER BY src, dst""".stripMargin,

    "es_backbone" ->
      s"""WITH $G1SQL,
         |tris AS (SELECT e1.src AS u, e1.dst AS v, e2.dst AS w FROM e_simple e1
         |  JOIN e_simple e2 ON e1.dst = e2.src
         |  JOIN e_simple e3 ON e3.src = e1.src AND e3.dst = e2.dst),
         |sides AS (SELECT u AS a, v AS b FROM tris UNION ALL
         |  SELECT u, w FROM tris UNION ALL SELECT v, w FROM tris),
         |cnt AS (SELECT a AS src, b AS dst, count(*) AS t FROM sides GROUP BY 1,2)
         |SELECT e.src, e.dst
         |FROM e_simple e LEFT JOIN cnt c ON e.src = c.src AND e.dst = c.dst
         |JOIN deg da ON e.src = da.id JOIN deg db ON e.dst = db.id
         |WHERE coalesce(c.t, 0) * 1.0 / (da.degree + db.degree - coalesce(c.t, 0)) >= 0.2
         |ORDER BY e.src, e.dst""".stripMargin,

    "q_modularity" ->
      s"""WITH $G1SQL,
         |lab AS (SELECT id, id % 10 AS label FROM nodes),
         |tw AS (SELECT sum(weight) AS w FROM e_canon),
         |intra AS (SELECT sum(weight) AS w FROM e_canon e
         |  JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id
         |  WHERE la.label = lb.label),
         |wsym AS (SELECT src, dst, weight FROM e_canon
         |  UNION ALL SELECT dst, src, weight FROM e_canon WHERE src <> dst),
         |wdeg AS (SELECT src AS id, sum(weight) AS wd FROM wsym GROUP BY 1),
         |loops AS (SELECT src AS id, sum(weight) AS lw FROM e_canon WHERE src = dst GROUP BY 1),
         |vol AS (SELECT la.label, sum(coalesce(w.wd, 0) + coalesce(lp.lw, 0)) AS v
         |  FROM lab la LEFT JOIN wdeg w ON la.id = w.id LEFT JOIN loops lp ON la.id = lp.id
         |  GROUP BY 1),
         |expcov AS (SELECT sum((v / tw.w) * (v / tw.w)) / 4 AS e FROM vol, tw)
         |SELECT round(intra.w / tw.w - expcov.e, 6) AS modularity FROM intra, tw, expcov""".stripMargin,

    "q_coverage_cut" ->
      s"""WITH $G1SQL,
         |lab AS (SELECT id, id % 10 AS label FROM nodes),
         |j AS (SELECT e.weight, la.label AS l1, lb.label AS l2 FROM e_canon e
         |  JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id)
         |SELECT round(sum(CASE WHEN l1 = l2 THEN weight ELSE 0 END) / sum(weight), 6) AS coverage,
         |  round(sum(CASE WHEN l1 <> l2 THEN weight ELSE 0 END), 6) AS edge_cut
         |FROM j""".stripMargin,

    "q_conductance" ->
      s"""WITH $G1SQL,
         |lab AS (SELECT id, CASE WHEN id < 500 THEN 1 ELSE 0 END AS label FROM nodes),
         |j AS (SELECT e.weight, la.label AS l1, lb.label AS l2 FROM e_canon e
         |  JOIN lab la ON e.src = la.id JOIN lab lb ON e.dst = lb.id),
         |cut AS (SELECT sum(CASE WHEN l1 <> l2 THEN weight ELSE 0 END) AS c FROM j),
         |wsym AS (SELECT src, dst, weight FROM e_canon
         |  UNION ALL SELECT dst, src, weight FROM e_canon WHERE src <> dst),
         |wdeg AS (SELECT src AS id, sum(weight) AS wd FROM wsym GROUP BY 1),
         |loops AS (SELECT src AS id, sum(weight) AS lw FROM e_canon WHERE src = dst GROUP BY 1),
         |vol AS (SELECT la.label, sum(coalesce(w.wd, 0) + coalesce(lp.lw, 0)) AS v
         |  FROM lab la LEFT JOIN wdeg w ON la.id = w.id LEFT JOIN loops lp ON la.id = lp.id
         |  GROUP BY 1)
         |SELECT round(CASE WHEN least((SELECT v FROM vol WHERE label = 0), (SELECT v FROM vol WHERE label = 1)) = 0
         |  THEN 0 ELSE cut.c / least((SELECT v FROM vol WHERE label = 0), (SELECT v FROM vol WHERE label = 1)) END, 6) AS conductance
         |FROM cut""".stripMargin,

    "q_partition_compare" ->
      s"""WITH $G1SQL,
         |cont AS (SELECT a.id % 10 AS x, a.id % 7 AS y, count(*) AS n FROM nodes a GROUP BY 1, 2),
         |tot AS (SELECT sum(n) AS nn FROM cont),
         |s11 AS (SELECT sum(n * (n - 1) / 2) AS s FROM cont),
         |pa AS (SELECT sum(s * (s - 1) / 2) AS p FROM (SELECT sum(n) AS s FROM cont GROUP BY x) t),
         |pb AS (SELECT sum(s * (s - 1) / 2) AS p FROM (SELECT sum(n) AS s FROM cont GROUP BY y) t)
         |SELECT round((pa.p + pb.p - 2 * s11.s) / (tot.nn * (tot.nn - 1) / 2.0), 6) AS rand_dissimilarity,
         |  round(s11.s / (pa.p + pb.p - s11.s), 6) AS jaccard_sim
         |FROM pa, pb, s11, tot""".stripMargin,

    "lp_common_neighbors" ->
      s"""WITH $G1SQL,
         |b AS (SELECT src AS node, dst AS nbr FROM e_sym WHERE src < 100)
         |SELECT x.node AS a, y.node AS b, count(*) AS cn
         |FROM b x JOIN b y ON x.nbr = y.nbr AND x.node < y.node
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,

    "lp_jaccard" ->
      s"""WITH $G1SQL,
         |b AS (SELECT src AS node, dst AS nbr FROM e_sym WHERE src < 100),
         |cn AS (SELECT x.node AS a, y.node AS b, count(*) AS c
         |  FROM b x JOIN b y ON x.nbr = y.nbr AND x.node < y.node GROUP BY 1, 2)
         |SELECT cn.a, cn.b, round(cn.c / (da.degree + db.degree - cn.c * 1.0), 6) AS jaccard
         |FROM cn JOIN deg da ON cn.a = da.id JOIN deg db ON cn.b = db.id
         |ORDER BY a, b""".stripMargin,

    "lp_adamic_adar" ->
      s"""WITH $G1SQL,
         |b AS (SELECT src AS node, dst AS nbr FROM e_sym WHERE src < 100)
         |SELECT x.node AS a, y.node AS b, round(sum(1.0 / ln(d.degree)), 6) AS aa
         |FROM b x JOIN b y ON x.nbr = y.nbr AND x.node < y.node
         |JOIN deg d ON x.nbr = d.id
         |GROUP BY 1, 2 ORDER BY a, b""".stripMargin,

    "txt_tokens" ->
      """SELECT doc_id,
        |  len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS n_tokens,
        |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish
        |FROM documents ORDER BY doc_id""".stripMargin,

    "txt_lang" ->
      """WITH toks AS (SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS tk FROM documents),
        |hits AS (SELECT doc_id,
        |  len(list_filter(tk, t -> list_contains(['der','die','das','und','ist','nicht','mit','ein','ich'], t))) AS de,
        |  len(list_filter(tk, t -> list_contains(['the','and','of','to','in','is','you','that','it'], t))) AS en,
        |  len(list_filter(tk, t -> list_contains(['el','los','las','y','que','en','un','una','por'], t))) AS es,
        |  len(list_filter(tk, t -> list_contains(['le','les','et','des','est','une','du','dans','pour'], t))) AS fr,
        |  len(list_filter(tk, t -> list_contains(['il','gli','e','di','che','per','con','del','una'], t))) AS it
        |  FROM toks),
        |mx AS (SELECT doc_id, de, en, es, fr, it, greatest(de, en, es, fr, it) AS m FROM hits)
        |SELECT doc_id, CASE WHEN m = 0 THEN 'und'
        |  WHEN de = m THEN 'de' WHEN en = m THEN 'en' WHEN es = m THEN 'es'
        |  WHEN fr = m THEN 'fr' ELSE 'it' END AS lang_guess
        |FROM mx ORDER BY doc_id""".stripMargin,

    "txt_quality" ->
      """WITH toks AS (SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk FROM documents),
        |base AS (SELECT doc_id, text, tk,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 1.0 / length(text) END AS alpha_ratio,
        |  CASE WHEN length(text) = 0 THEN 0.0 ELSE length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 / length(text) END AS punct_ratio,
        |  CASE WHEN len(tk) = 0 THEN 0.0 ELSE len(list_filter(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), t -> list_contains(['the','and','of','to','in','is','you','that','it'], t))) * 1.0 / len(tk) END AS stopword_ratio
        |  FROM toks)
        |SELECT doc_id, round(alpha_ratio, 6) AS alpha_ratio, round(punct_ratio, 6) AS punct_ratio,
        |  round(stopword_ratio, 6) AS stopword_ratio,
        |  round(0.25 * least(length(text) / 500.0, 1.0) + 0.35 * alpha_ratio
        |    + 0.2 * (1.0 - least(punct_ratio * 5.0, 1.0)) + 0.2 * least(stopword_ratio * 5.0, 1.0), 6) AS quality
        |FROM base ORDER BY doc_id""".stripMargin,

    "txt_fingerprint" ->
      """WITH toks AS (SELECT doc_id, text, list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS tk FROM documents),
        |sh AS (SELECT doc_id, text, list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
        |  i -> md5(array_to_string(list_slice(tk, i, i + 2), ' '))) AS hs FROM toks)
        |SELECT doc_id, coalesce(list_min(hs), md5(text)) AS fingerprint
        |FROM sh ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS content_hash FROM documents)
        |SELECT doc_id, content_hash,
        |  count(*) OVER (PARTITION BY content_hash) AS group_size,
        |  doc_id = min(doc_id) OVER (PARTITION BY content_hash) AS is_canonical
        |FROM h ORDER BY doc_id""".stripMargin,

    "dedup_jaccard" ->
      s"""WITH $TOKS, $TOKROWS,
         |sz AS (SELECT doc_id, count(*) AS s FROM tokrows GROUP BY 1),
         |inter AS (SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS i
         |  FROM tokrows x JOIN tokrows y ON x.tok = y.tok AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, round(i * 1.0 / (sa.s + sb.s - i), 6) AS jaccard
         |FROM inter JOIN sz sa ON a = sa.doc_id JOIN sz sb ON b = sb.doc_id
         |WHERE i * 1.0 / (sa.s + sb.s - i) >= 0.5 ORDER BY a, b""".stripMargin,

    "dedup_minhash_sig" ->
      s"""WITH $TOKS
         |SELECT doc_id,
         |  list_min(list_transform(list_distinct(tk), t -> md5('0' || '|' || t))) AS mh0,
         |  list_min(list_transform(list_distinct(tk), t -> md5('1' || '|' || t))) AS mh1,
         |  list_min(list_transform(list_distinct(tk), t -> md5('2' || '|' || t))) AS mh2,
         |  list_min(list_transform(list_distinct(tk), t -> md5('3' || '|' || t))) AS mh3
         |FROM toks ORDER BY doc_id""".stripMargin,

    "dedup_minhash_pairs" ->
      s"""WITH $TOKS,
         |sig AS (SELECT doc_id,
         |  list_min(list_transform(list_distinct(tk), t -> md5('0' || '|' || t))) AS mh0,
         |  list_min(list_transform(list_distinct(tk), t -> md5('1' || '|' || t))) AS mh1,
         |  list_min(list_transform(list_distinct(tk), t -> md5('2' || '|' || t))) AS mh2,
         |  list_min(list_transform(list_distinct(tk), t -> md5('3' || '|' || t))) AS mh3
         |  FROM toks),
         |buckets AS (SELECT doc_id, 0 AS band_idx, md5(mh0 || mh1) AS band FROM sig
         |  UNION ALL SELECT doc_id, 1, md5(mh2 || mh3) FROM sig),
         |cand AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
         |  FROM buckets x JOIN buckets y ON x.band_idx = y.band_idx AND x.band = y.band
         |  WHERE x.doc_id < y.doc_id)
         |SELECT cand.a, cand.b,
         |  round(((CASE WHEN sa.mh0 = sb.mh0 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh1 = sb.mh1 THEN 1 ELSE 0 END)
         |    + (CASE WHEN sa.mh2 = sb.mh2 THEN 1 ELSE 0 END) + (CASE WHEN sa.mh3 = sb.mh3 THEN 1 ELSE 0 END)) / 4.0, 6) AS est_sim
         |FROM cand JOIN sig sa ON cand.a = sa.doc_id JOIN sig sb ON cand.b = sb.doc_id
         |ORDER BY a, b""".stripMargin,

    "dedup_simhash" ->
      s"""WITH $TOKS,
         |hs AS (SELECT doc_id, list_transform(tk, t -> ('0x' || substr(md5(t), 1, 4))::BIGINT) AS h FROM toks),
         |bits AS (SELECT doc_id, h FROM hs)
         |SELECT doc_id, ${(0 until 16).map(j =>
          s"(CASE WHEN list_sum(list_transform(h, x -> ((x >> $j) & 1) * 2 - 1)) > 0 THEN ${1L << j} ELSE 0 END)")
          .mkString(" + ")} AS fp
         |FROM bits ORDER BY doc_id""".stripMargin,

    "emb_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
        |scored AS (SELECT query_id, neighbor_id,
        |  list_dot_product(qv::DOUBLE[], cv::DOUBLE[]) /
        |    (sqrt(list_dot_product(qv::DOUBLE[], qv::DOUBLE[])) * sqrt(list_dot_product(cv::DOUBLE[], cv::DOUBLE[]))) AS cos
        |  FROM q, c WHERE query_id <> neighbor_id),
        |ranked AS (SELECT query_id, neighbor_id, cos,
        |  row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id ASC) AS rank
        |  FROM scored)
        |SELECT query_id, rank, neighbor_id, round(cos, 6) AS cos
        |FROM ranked WHERE rank <= 5 ORDER BY query_id, rank""".stripMargin,

    "emb_neardup" ->
      """WITH v AS (SELECT vec_id AS id, embedding::DOUBLE[] AS e FROM embeddings)
        |SELECT a.id AS a, b.id AS b,
        |  round(list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cos
        |FROM v a JOIN v b ON a.id < b.id
        |WHERE list_dot_product(a.e, b.e) / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) >= 0.3
        |ORDER BY a, b""".stripMargin,

    "emb_centroids" ->
      """WITH pos AS (SELECT label, embedding, unnest(range(1, len(embedding) + 1)) AS pos FROM embeddings)
        |SELECT label::BIGINT AS label, pos::BIGINT AS pos, round(avg(embedding[pos]::DOUBLE), 6) AS c
        |FROM pos GROUP BY 1, 2 ORDER BY label, pos""".stripMargin,

    "events_window" ->
      """SELECT date_trunc('hour', ts) AS window_start, event_type,
        |  count(*) AS n, round(sum(value), 6) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin,

    "events_sessions" ->
      """WITH l AS (SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts FROM events),
        |s AS (SELECT user_id, CASE WHEN prev_ts IS NULL OR epoch(ts) - epoch(prev_ts) > 1800 THEN 1 ELSE 0 END AS new_session FROM l)
        |SELECT user_id, sum(new_session) AS n_sessions, count(*) AS n_events
        |FROM s GROUP BY 1 ORDER BY user_id""".stripMargin
  )
}
