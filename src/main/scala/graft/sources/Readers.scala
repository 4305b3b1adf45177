package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DenseId
import graft.streaming.{GraphEvent, GraphEventType}

/** Graph file-format sources/sinks (SURVEY.md §2.1; reference dispatch in
  * `networkit/graphio.py:116` over the Format enum).
  *
  * Distributed parse shape: `spark.read.text` → split/filter — fully
  * parallel. Where a format's semantics need file order (non-continuous id
  * remap by first appearance, METIS line-number = node id), order comes
  * from `monotonically_increasing_id()` over the text scan, which is
  * ascending in file order (splits are enumerated by offset); dense ids are
  * then assigned with the scalable two-phase DenseId pass — no global
  * single-partition window.
  */
object Readers {

  /** EdgeList reader (`io/EdgeListReader.h:27-75`): configurable separator,
    * firstNode offset, comment prefix; 2 columns = unweighted (weight 1.0),
    * 3 = weighted. `continuous=true` assumes numeric ids (reference
    * readContinuous, `EdgeListReader.cpp:37`); otherwise tokens are remapped
    * to consecutive 0-based ids in order of first appearance
    * (readNonContinuous, `:143`).
    */
  def edgeList(spark: SparkSession, path: String, separator: String = "\\s+",
               firstNode: Long = 0, commentPrefix: String = "#",
               continuous: Boolean = true): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", monotonically_increasing_id())
      .where(!col("value").startsWith(commentPrefix) &&
        length(trim(col("value"))) > 0)
    val parts = lines.select(col("_ord"),
      split(trim(col("value")), separator).as("p"))
    val raw = parts.select(col("_ord"),
      element_at(col("p"), 1).as("srcTok"),
      element_at(col("p"), 2).as("dstTok"),
      when(size(col("p")) >= 3, element_at(col("p"), 3).cast("double"))
        .otherwise(1.0).as("weight"))
    if (continuous) {
      raw.select((col("srcTok").cast("long") - firstNode).as("src"),
        (col("dstTok").cast("long") - firstNode).as("dst"), col("weight"))
    } else {
      // first-appearance order: src of line k precedes dst of line k
      val occurrences = raw
        .select(col("srcTok").as("tok"), (col("_ord") * 2).as("pos"))
        .unionByName(raw.select(col("dstTok").as("tok"),
          (col("_ord") * 2 + 1).as("pos")))
        .groupBy("tok").agg(min("pos").as("first_pos"))
      val ids = DenseId.assign(occurrences, "nid", Seq("first_pos"))
        .select("tok", "nid")
      raw
        .join(ids.select(col("tok").as("srcTok"), col("nid").as("src")), "srcTok")
        .join(ids.select(col("tok").as("dstTok"), col("nid").as("dst")), "dstTok")
        .select("src", "dst", "weight")
    }
  }

  /** SNAP reader (`io/SNAPGraphReader.cpp:17-45`): tab/space edge list with
    * `#` comments, ids remapped by first appearance.
    */
  def snap(spark: SparkSession, path: String): DataFrame =
    edgeList(spark, path, separator = "\\s+", commentPrefix = "#",
      continuous = false)

  /** KONECT reader (`io/KONECTGraphReader.cpp`): whitespace edge list with
    * `%` comments, 1-based continuous ids.
    */
  def konect(spark: SparkSession, path: String): DataFrame =
    edgeList(spark, path, separator = "\\s+", firstNode = 1,
      commentPrefix = "%", continuous = true)

  /** METIS reader (`io/METISGraphReader.h:21-34`): header `n m [fmt]`;
    * data line i (1-based after skipping `%` comments) lists the neighbors
    * of node i-1 (1-based ids); fmt=1 → weighted pairs (nbr w). Emits each
    * undirected edge twice (once per endpoint) like the in-memory adjacency;
    * canonicalize downstream.
    */
  def metis(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", monotonically_increasing_id())
      .where(!col("value").startsWith("%"))
    val withNo = DenseId.assign(lines, "_lineno", Seq("_ord"))
    val header = withNo.where(col("_lineno") === 0)
      .select(split(trim(col("value")), "\\s+").as("h")).head()
    val fmt = { val h = header.getSeq[String](0); if (h.length >= 3) h(2) else "0" }
    val weighted = fmt.endsWith("1") && fmt != "10" // edge weights present
    val data = withNo.where(col("_lineno") > 0)
      .select((col("_lineno") - 1).as("src"),
        split(trim(col("value")), "\\s+").as("toks"))
      .where(size(col("toks")) > 0 && element_at(col("toks"), 1) =!= "")
    if (!weighted) {
      data.select(col("src"), explode(col("toks")).as("nbr"))
        .select(col("src"), (col("nbr").cast("long") - 1).as("dst"),
          lit(1.0).as("weight"))
    } else {
      // pairs (neighbor, weight)
      data.select(col("src"), posexplode(col("toks")).as(Seq("i", "tok")))
        .withColumn("pair", (col("i") / 2).cast("long"))
        .groupBy("src", "pair")
        .agg(min(when(col("i") % 2 === 0, col("tok"))).as("nbr"),
          min(when(col("i") % 2 === 1, col("tok"))).as("w"))
        .select(col("src"), (col("nbr").cast("long") - 1).as("dst"),
          col("w").cast("double").as("weight"))
    }
  }

  /** Partition reader (`io/PartitionReader.cpp`): line i = label of node i. */
  def partition(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", monotonically_increasing_id())
    DenseId.assign(lines, "id", Seq("_ord"))
      .select(col("id"), trim(col("value")).cast("long").as("label"))
  }

  /** GML reader (`io/GMLGraphReader.cpp:17-130`): `node [ id k ]` /
    * `edge [ source a target b ]` blocks, optional `directed 1` header.
    * Node ids are remapped to dense 0-based ids in file order (the
    * reference inserts into `nodeMap` as node blocks appear). GML is a
    * small-fixture interchange format (SURVEY.md §2.1: "small-fixture
    * only") — parsed driver-side like the reference, then parallelized.
    * Returns (edges `(src, dst, weight)`, directed flag).
    */
  def gml(spark: SparkSession, path: String): (DataFrame, Boolean) = {
    val (edges, _, directed) = gmlParse(spark, path)
    (edges, directed)
  }

  private def gmlParse(spark: SparkSession,
                       path: String): (DataFrame, Long, Boolean) = {
    import spark.implicits._
    val lines = scala.io.Source.fromFile(path).getLines().map(_.trim).toVector
    val directed = lines.exists(l => l.matches("directed\\s+1"))
    val nodeMap = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val edges = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Double)]
    var mode = ""
    var src = ""; var dst = ""; var w = 1.0
    lines.foreach { l =>
      if (l.startsWith("node") && l.contains("[")) mode = "node"
      else if (l.startsWith("edge") && l.contains("[")) { mode = "edge"; src = ""; dst = ""; w = 1.0 }
      else if (l.startsWith("]")) {
        if (mode == "edge" && src.nonEmpty && dst.nonEmpty)
          edges += ((nodeMap(src), nodeMap(dst), w))
        mode = ""
      } else {
        val kv = l.split("\\s+", 2)
        if (kv.length == 2) (mode, kv(0)) match {
          case ("node", "id") =>
            nodeMap.getOrElseUpdate(kv(1), nodeMap.size.toLong)
          case ("edge", "source") => src = kv(1)
          case ("edge", "target") => dst = kv(1)
          case ("edge", "weight") => w = kv(1).toDouble
          case _ => ()
        }
      }
    }
    (edges.toSeq.toDF("src", "dst", "weight"), nodeMap.size.toLong, directed)
  }

  /** GML with the DECLARED node set (`io/GMLGraphReader.cpp` keeps isolated
    * nodes — `jazz2_undirected.gml` declares 5 nodes but only 3 appear in
    * edges; `GraphOps.nodes` cannot recover the isolated two). The node
    * count comes from the same mode-based parse as the edges (NOT a
    * line-pair scan: valid GML may put other attributes before a node's
    * `id`, which only the stateful parse counts consistently with the edge
    * endpoint remap). Returns (edges, nodes, directed).
    */
  def gmlWithNodes(spark: SparkSession,
                   path: String): (DataFrame, DataFrame, Boolean) = {
    import spark.implicits._
    val (edges, nodeCount, directed) = gmlParse(spark, path)
    ((edges, (0L until nodeCount).toDF("id"), directed))
  }

  /** MatrixMarket reader (`io/MatrixMarketReader.cpp`): `%%MatrixMarket
    * matrix coordinate …` banner, `%` comments, first data line `rows cols
    * nnz`, then 1-based `i j [w]` entries. Fully distributed text parse.
    */
  def matrixMarket(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", monotonically_increasing_id())
      .where(!col("value").startsWith("%") && length(trim(col("value"))) > 0)
    val withNo = DenseId.assign(lines, "_lineno", Seq("_ord"))
    withNo.where(col("_lineno") > 0) // skip the dims line
      .select(split(trim(col("value")), "\\s+").as("p"))
      .select((element_at(col("p"), 1).cast("long") - 1).as("src"),
        (element_at(col("p"), 2).cast("long") - 1).as("dst"),
        when(size(col("p")) >= 3, element_at(col("p"), 3).cast("double"))
          .otherwise(1.0).as("weight"))
  }

  /** Cover reader (`io/CoverReader.cpp:5-30`): non-`#` line i lists the
    * member node ids of community i. Output `(id, label)` — one row per
    * membership (overlapping allowed), the engine's Cover representation
    * (SURVEY.md §1.1).
    */
  def cover(spark: SparkSession, path: String): DataFrame = {
    val lines = spark.read.text(path)
      .withColumn("_ord", monotonically_increasing_id())
      .where(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
    DenseId.assign(lines, "label", Seq("_ord"))
      .select(col("label"), explode(split(trim(col("value")), "\\s+")).as("tok"))
      .select(col("tok").cast("long").as("id"), col("label"))
  }

  /** EdgeListCover reader (`io/EdgeListCoverReader.cpp`): line = node id
    * followed by the ids of the communities it belongs to (1-based node
    * ids by default, like the reference's firstNode=1).
    */
  def edgeListCover(spark: SparkSession, path: String,
                    firstNode: Long = 1): DataFrame =
    spark.read.text(path)
      .where(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(split(trim(col("value")), "\\s+").as("p"))
      .select((element_at(col("p"), 1).cast("long") - firstNode).as("id"),
        explode(slice(col("p"), 2, Int.MaxValue)).as("tok"))
      .select(col("id"), col("tok").cast("long").as("label"))

  /** DGS dynamic-graph stream parser (`dynamics/DGSStreamParser.h:23-40`,
    * format cookie DGS004): commands st / an / ae / de / dn / ce; string
    * keys mapped to consecutive ids in first-appearance order. An ordered
    * event log with stateful key mapping is inherently sequential — parsed
    * driver-side (event logs are control-plane-sized), returned as a
    * Dataset for distributed downstream folds.
    */
  def dgs(spark: SparkSession, path: String): Dataset[GraphEvent] = {
    import spark.implicits._
    val lines = scala.io.Source.fromFile(path).getLines().toVector
    require(lines.nonEmpty && lines.head.startsWith("DGS"),
      "expected DGS cookie in first line")
    val key2id = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def mapKey(k: String): Long = key2id.getOrElseUpdate(k, key2id.size.toLong)
    val edgeKey = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
    var ts = 0L
    val events = lines.drop(2).filter(_.trim.nonEmpty).flatMap { line =>
      ts += 1
      val sp = line.trim.split("\\s+").toVector
      def weightArg(i: Int): Double =
        if (sp.length > i && sp(i).contains("=")) sp(i).split("=")(1).toDouble
        else 1.0
      sp.head match {
        case "st" => Some(GraphEvent(GraphEventType.TimeStep, 0, 0, 0.0, ts))
        case "an" => Some(GraphEvent(GraphEventType.NodeAddition,
          mapKey(sp(1)), 0, 0.0, ts))
        case "dn" => Some(GraphEvent(GraphEventType.NodeRemoval,
          mapKey(sp(1)), 0, 0.0, ts))
        case "ae" =>
          val (u, v) = (mapKey(sp(2)), mapKey(sp(3)))
          edgeKey(sp(1)) = (u, v)
          Some(GraphEvent(GraphEventType.EdgeAddition, u, v, weightArg(4), ts))
        case "de" => edgeKey.get(sp(1)).map { case (u, v) =>
          GraphEvent(GraphEventType.EdgeRemoval, u, v, 0.0, ts) }
        case "ce" => edgeKey.get(sp(1)).map { case (u, v) =>
          GraphEvent(GraphEventType.EdgeWeightUpdate, u, v, weightArg(2), ts) }
        case _ => None
      }
    }
    events.toDS()
  }

  /** Distributed DGS parse — same semantics as [[dgs]] (first-appearance
    * node remap, edge-name resolution, ts = nonempty-line ordinal) with
    * every order-dependent step re-expressed relationally, so the stream
    * file can be arbitrarily large:
    *   - line ordinals via `zipWithIndex` (order-preserving text read);
    *   - ts = dense rank of nonempty body lines (range-partitioned
    *     two-phase rank, no global window);
    *   - node ids = dense rank of first mention `(ts, argPos)` — exactly
    *     the driver parser's `getOrElseUpdate` encounter order;
    *   - `de`/`ce` events resolve their edge name with a join against the
    *     `ae` definitions.
    */
  def dgsDistributed(spark: SparkSession, path: String): Dataset[GraphEvent] = {
    import spark.implicits._
    val raw = spark.read.text(path).rdd.zipWithIndex()
      .map { case (r, i) => (i, r.getString(0).trim) }
      .toDF("ln", "line")
    require(raw.where(col("ln") === 0 && col("line").startsWith("DGS"))
      .count() == 1, "expected DGS cookie in first line")
    val body = raw.where(col("ln") >= 2 && length(col("line")) > 0)
    val ts0 = graft.core.DenseId.assign(body, "ts0", Seq("ln"))
      .select(col("ln"), (col("ts0") + 1).as("ts"),
        split(col("line"), "\\s+").as("sp"))
      .persist()

    def arg(i: Int) = try_element_at(col("sp"), lit(i + 1))
    def weightArg(i: Int) =
      when(arg(i).isNotNull && arg(i).contains("="),
        split(arg(i), "=").getItem(1).cast("double")).otherwise(lit(1.0))

    // node key mentions in encounter order (ts, then position in line)
    val mentions =
      ts0.where(arg(0).isin("an", "dn"))
        .select(arg(1).as("key"), col("ts"), lit(0).as("pos"))
      .unionByName(ts0.where(arg(0) === "ae")
        .select(arg(2).as("key"), col("ts"), lit(0).as("pos")))
      .unionByName(ts0.where(arg(0) === "ae")
        .select(arg(3).as("key"), col("ts"), lit(1).as("pos")))
    val firstSeen = mentions.groupBy("key")
      .agg(min(struct(col("ts"), col("pos"))).as("f"))
      .select(col("key"), col("f.ts").as("fts"), col("f.pos").as("fpos"))
    val keyIds = graft.core.DenseId.assign(firstSeen, "nid",
        Seq("fts", "fpos")).select("key", "nid")
      .persist()

    val nodeEv = ts0.where(arg(0).isin("an", "dn"))
      .select(arg(0).as("op"), arg(1).as("key"), col("ts"))
      .join(keyIds, "key")
      .select(when(col("op") === "an", GraphEventType.NodeAddition)
          .otherwise(GraphEventType.NodeRemoval).as("etype"),
        col("nid").as("u"), lit(0L).as("v"), lit(0.0).as("w"), col("ts"))
    val stEv = ts0.where(arg(0) === "st")
      .select(lit(GraphEventType.TimeStep).as("etype"), lit(0L).as("u"),
        lit(0L).as("v"), lit(0.0).as("w"), col("ts"))
    val aeDefs = ts0.where(arg(0) === "ae")
      .select(arg(1).as("ename"), arg(2).as("ku"), arg(3).as("kv"),
        weightArg(4).as("w"), col("ts"))
      .join(keyIds.select(col("key").as("ku"), col("nid").as("u")), "ku")
      .join(keyIds.select(col("key").as("kv"), col("nid").as("v")), "kv")
      .persist()
    val aeEv = aeDefs.select(lit(GraphEventType.EdgeAddition).as("etype"),
      col("u"), col("v"), col("w"), col("ts"))
    // name resolution: latest definition strictly before the event (valid
    // DGS defines a name once; max_by keeps the reference's last-write-wins
    // behavior under redefinition)
    val named = aeDefs.select(col("ename"), col("u"), col("v"),
      col("ts").as("defTs"))
    def resolve(ev: DataFrame): DataFrame = ev.join(named, "ename")
      .where(col("defTs") < col("ts"))
      .groupBy(ev.columns.map(col): _*)
      .agg(max_by(struct(col("u"), col("v")), col("defTs")).as("uv"))
      .select((ev.columns.map(col) :+ col("uv.u") :+ col("uv.v")): _*)
    val deEv = resolve(ts0.where(arg(0) === "de")
        .select(arg(1).as("ename"), col("ts")))
      .select(lit(GraphEventType.EdgeRemoval).as("etype"), col("u"),
        col("v"), lit(0.0).as("w"), col("ts"))
    val ceEv = resolve(ts0.where(arg(0) === "ce")
        .select(arg(1).as("ename"), weightArg(2).as("w"), col("ts")))
      .select(lit(GraphEventType.EdgeWeightUpdate).as("etype"), col("u"),
        col("v"), col("w"), col("ts"))

    nodeEv.unionByName(stEv).unionByName(aeEv).unionByName(deEv)
      .unionByName(ceEv)
      .orderBy("ts")
      .as[GraphEvent]
  }
}

/** Writers (`io/EdgeListWriter.cpp`, `PartitionWriter.cpp`): edge table /
  * labels → text, plus parquet as the engine-native sink.
  */
object Writers {

  def edgeList(edges: DataFrame, path: String, separator: String = " "): Unit =
    edges.select(concat_ws(separator,
        col("src").cast("string"), col("dst").cast("string"),
        col("weight").cast("string")).as("value"))
      .write.mode("overwrite").text(path)

  def partition(labels: DataFrame, path: String): Unit =
    labels.orderBy("id").select(col("label").cast("string").as("value"))
      .coalesce(1).write.mode("overwrite").text(path)

  def parquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** GML writer (`io/GMLGraphWriter.cpp` capability): canonical node/edge
    * blocks; small-fixture interchange, single text file.
    */
  def gml(edges: DataFrame, path: String, directed: Boolean = false): Unit = {
    val nodes = graft.core.GraphOps.nodes(edges).orderBy("id")
      .select(concat(lit("  node [\n    id "), col("id"), lit("\n  ]")).as("value"))
    val es = edges.orderBy("src", "dst")
      .select(concat(lit("  edge [\n    source "), col("src"),
        lit("\n    target "), col("dst"), lit("\n  ]")).as("value"))
    import nodes.sparkSession.implicits._
    val header = Seq("graph [" + (if (directed) "\n  directed 1" else "")).toDF("value")
    val footer = Seq("]").toDF("value")
    header.unionByName(nodes).unionByName(es).unionByName(footer)
      .coalesce(1).write.mode("overwrite").text(path)
  }

  /** DGS writer (`dynamics/DGSWriter.cpp` capability): serialize an ordered
    * event log to DGS004 lines — the inverse of [[Readers.dgs]]. Node keys
    * are the numeric ids; edge names are `e<u>_<v>`. TimeStep → `st`,
    * weight-update and weight-increment both serialize as `ce` (DGS has a
    * single change-edge command; an increment is materialized as the
    * resulting absolute weight by the caller if exactness matters).
    */
  def dgs(events: org.apache.spark.sql.Dataset[graft.streaming.GraphEvent],
          path: String): Unit = {
    import graft.streaming.GraphEventType._
    val lines = events.toDF()
      .select(col("ts").as("ord"), when(col("etype") === TimeStep, lit("st"))
        .when(col("etype").isin(NodeAddition, NodeRestoration),
          concat(lit("an "), col("u")))
        .when(col("etype") === NodeRemoval, concat(lit("dn "), col("u")))
        .when(col("etype") === EdgeAddition,
          concat(lit("ae e"), col("u"), lit("_"), col("v"), lit(" "),
            col("u"), lit(" "), col("v"), lit(" weight="), col("w")))
        .when(col("etype") === EdgeRemoval,
          concat(lit("de e"), col("u"), lit("_"), col("v")))
        .when(col("etype").isin(EdgeWeightUpdate, EdgeWeightIncrement),
          concat(lit("ce e"), col("u"), lit("_"), col("v"),
            lit(" weight="), col("w")))
        .as("value"))
      .where(col("value").isNotNull)
    import lines.sparkSession.implicits._
    // header gets ord −2/−1; one partition sorted in-place so the physical
    // line order is guaranteed (a bare union + coalesce is not order-stable)
    Seq((-2L, "DGS004"), (-1L, "graft 0 0")).toDF("ord", "value")
      .unionByName(lines)
      .repartition(1).sortWithinPartitions("ord")
      .select("value")
      .write.mode("overwrite").text(path)
  }

  /** Cover writer (`io/CoverWriter.cpp`): line i = members of community i. */
  def cover(memberships: DataFrame, path: String): Unit =
    memberships.groupBy("label")
      .agg(array_join(array_sort(collect_list(col("id"))), " ").as("value"))
      .orderBy("label").select("value")
      .coalesce(1).write.mode("overwrite").text(path)

  /** Sections glued in guaranteed physical order (the DGS writer's ord
    * trick: one partition, sorted by (section, line) — a bare
    * union+coalesce is not order-stable).
    */
  private def writeOrdered(path: String,
                           sections: Seq[DataFrame]): Unit = {
    val tagged = sections.zipWithIndex.map { case (df, i) =>
      df.select(lit(i).as("ord"), col("value"))
    }.reduce(_ unionByName _)
    tagged.repartition(1).sortWithinPartitions("ord", "value")
      .select("value")
      .write.mode("overwrite").text(path)
  }

  /** DOT writer (`io/DotGraphWriter.cpp:12-20`): `graph {`, one
    * `u -- v;` line per edge, `}`; digraph/`->` when directed.
    */
  def dot(edges: DataFrame, path: String, directed: Boolean = false): Unit = {
    val arrow = if (directed) " -> " else " -- "
    val es = edges.select(
      concat(col("src"), lit(arrow), col("dst"), lit(";")).as("value"))
    import es.sparkSession.implicits._
    writeOrdered(path, Seq(
      Seq(if (directed) "digraph {" else "graph {").toDF("value"),
      es,
      Seq("}").toDF("value")))
  }

  /** GraphML writer (`networkit/GraphMLIO.py:107-210` capability): minimal
    * schema-valid document — the weight key `d1` when weighted, `n<id>`
    * node elements, edge elements carrying the weight as `<data>`.
    */
  def graphml(edges: DataFrame, path: String, directed: Boolean = false,
              weighted: Boolean = false): Unit = {
    val nodes = graft.core.GraphOps.nodes(edges)
      .select(concat(lit("    <node id=\"n"), col("id"), lit("\"/>"))
        .as("value"))
    val es = edges.select(
      (if (weighted)
        concat(lit("    <edge source=\"n"), col("src"),
          lit("\" target=\"n"), col("dst"),
          lit("\"><data key=\"d1\">"), col("weight"),
          lit("</data></edge>"))
      else
        concat(lit("    <edge source=\"n"), col("src"),
          lit("\" target=\"n"), col("dst"), lit("\"/>"))).as("value"))
    import es.sparkSession.implicits._
    val header = Seq(
      "<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
      "<graphml xmlns=\"http://graphml.graphdrawing.org/xmlns\">") ++
      (if (weighted)
        Seq("""  <key for="edge" id="d1" attr.name="weight" attr.type="double"/>""")
      else Seq.empty) ++
      Seq(s"""  <graph edgedefault="${if (directed) "directed" else "undirected"}">""")
    // header lines must keep their own order: give each its own section
    writeOrdered(path,
      header.map(h => Seq(h).toDF("value")) ++
        Seq(nodes, es, Seq("  </graph>").toDF("value"),
          Seq("</graphml>").toDF("value")))
  }

  /** Like [[writeOrdered]] but with an intra-section sort key `i` (node
    * lines of positional formats must land in id order, not value order).
    */
  private def writeOrderedKeyed(path: String,
                                sections: Seq[DataFrame]): Unit = {
    val tagged = sections.zipWithIndex.map { case (df, s) =>
      df.select(lit(s).as("s"), col("i"), col("value"))
    }.reduce(_ unionByName _)
    tagged.repartition(1).sortWithinPartitions("s", "i", "value")
      .select("value")
      .write.mode("overwrite").text(path)
  }

  /** METIS writer (`io/METISGraphWriter.cpp` capability): header
    * `n m [1]`, then line i+1 lists the 1-based neighbors of node i
    * (`nbr w` pairs when `weighted`). The format is positional, so the
    * node universe is 0..max(id); ids in that range without edges get
    * empty lines, matching the reference's full-adjacency dump. Inverse
    * of [[Readers.metis]] up to neighbor order.
    */
  def metis(edges: DataFrame, path: String, weighted: Boolean = false): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = graft.core.GraphOps.canonicalize(
      edges.where(col("src") =!= col("dst")))
    val sym = graft.core.GraphOps.symmetrize(canon)
    val maxId = graft.core.GraphOps.nodes(canon)
      .agg(max("id")).head().get(0)
    val n = if (maxId == null) 0L else maxId.asInstanceOf[Long] + 1L
    val m = canon.count()
    val adj =
      if (weighted)
        sym.groupBy(col("src").as("i"))
          .agg(array_join(flatten(transform(
            array_sort(collect_list(struct(col("dst"), col("weight")))),
            p => array((p("dst") + 1).cast("string"),
              p("weight").cast("string")))), " ").as("value"))
      else
        sym.groupBy(col("src").as("i"))
          .agg(array_join(array_sort(collect_list(
            (col("dst") + 1).cast("string"))), " ").as("value"))
    val lines = spark.range(n).select(col("id").as("i"))
      .join(adj, Seq("i"), "left")
      .select(col("i"), coalesce(col("value"), lit("")).as("value"))
    val header = Seq((0L, s"$n $m" + (if (weighted) " 1" else "")))
      .toDF("i", "value")
    writeOrderedKeyed(path, Seq(header, lines))
  }

  /** SNAP writer (`io/SNAPGraphWriter.cpp` capability): `#` comment header
    * carrying the node/edge counts, then one `u\tv` line per edge in
    * (src, dst) order. [[Readers.snap]] reads it back (ids remapped by
    * first appearance, the SNAP convention).
    */
  def snap(edges: DataFrame, path: String, directed: Boolean = false): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    val es = edges.select(col("src").as("i"),
      concat_ws("\t", col("src").cast("string"), col("dst").cast("string"))
        .as("value"))
    val n = graft.core.GraphOps.nodes(edges).count()
    val m = edges.count()
    val header = Seq(
      (0L, s"# ${if (directed) "Directed" else "Undirected"} graph"),
      (1L, s"# Nodes: $n Edges: $m"),
      (2L, "# FromNodeId\tToNodeId")).toDF("i", "value")
    writeOrderedKeyed(path, Seq(header, es))
  }

  /** GEXF writer (`networkit/GEXFIO.py:15-120` capability): minimal
    * 1.2draft document — `<node id>` per node, `<edge>` elements with a
    * stable `e<u>_<v>` id and the weight attribute when `weighted`.
    */
  def gexf(edges: DataFrame, path: String, directed: Boolean = false,
           weighted: Boolean = false): Unit = {
    val spark = edges.sparkSession
    import spark.implicits._
    val nodes = graft.core.GraphOps.nodes(edges)
      .select(col("id").as("i"),
        concat(lit("      <node id=\""), col("id"), lit("\"/>")).as("value"))
    val es = edges.select(col("src").as("i"),
      concat(lit("      <edge id=\"e"), col("src"), lit("_"), col("dst"),
        lit("\" source=\""), col("src"), lit("\" target=\""), col("dst"),
        if (weighted) concat(lit("\" weight=\""), col("weight")) else lit(""),
        lit("\"/>")).as("value"))
    def sec(ls: String*): DataFrame =
      ls.zipWithIndex.map { case (l, i) => (i.toLong, l) }.toDF("i", "value")
    writeOrderedKeyed(path, Seq(
      sec("<?xml version=\"1.0\" encoding=\"UTF-8\"?>",
        "<gexf xmlns=\"http://www.gexf.net/1.2draft\" version=\"1.2\">",
        s"""  <graph defaultedgetype="${if (directed) "directed" else "undirected"}">""",
        "    <nodes>"),
      nodes,
      sec("    </nodes>", "    <edges>"),
      es,
      sec("    </edges>", "  </graph>", "</gexf>")))
  }
}
