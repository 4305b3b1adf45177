package graft.ingest

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import java.security.MessageDigest

class TextExtractSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def x(html: String): String =
    TextExtract.extract(html.getBytes("UTF-8"))

  test("basic tag stripping and whitespace collapse") {
    assert(x("<html><body><p>hello  world</p></body></html>") == "hello world")
    assert(x("a<p>b</p>c") == "a b c")
    assert(x("  <b>bold</b>\n\ttext ") == "bold text")
  }

  test("script/style subtrees dropped with content") {
    assert(x("<script>var x=1;</script>visible") == "visible")
    assert(x("a<style>p{}</style>b<SCRIPT src='x'>ignore</SCRIPT>c") == "a b c")
    assert(x("<script>unterminated") == "")
    // 'scriptx' is not a script tag boundary
    assert(x("<scriptx>t</scriptx>") == "t")
  }

  test("comments removed, even wrapping tags") {
    assert(x("a<!-- c --><b>d</b>") == "a d")
    assert(x("a<!-- unterminated") == "a")
    assert(x("<!--<script>evil()</script>-->ok") == "ok")
  }

  test("entities decoded once, &amp; last, &nbsp; collapses") {
    assert(x("a &lt;tag&gt; &amp; b") == "a <tag> & b")
    assert(x("&amp;lt;") == "&lt;")
    assert(x("x&nbsp;&nbsp;y") == "x y")
    assert(x("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(x("&unknown; stays") == "&unknown; stays")
  }

  test("malformed utf-8 replaced losslessly deterministic") {
    val bad = Array[Byte]('a'.toByte, 0xC3.toByte, 'b'.toByte)
    assert(TextExtract.extract(bad) == "a�b")
  }

  test("unterminated tag eats rest of input") {
    assert(x("ok<div unterminated") == "ok")
  }

  test("golden sha-256 fixtures pin the extractor spec bytewise") {
    // These hashes pin the extractor output BYTES — the byte-identical
    // invariant of BASELINE.json input_hint. Do not change without
    // versioning the extractor spec.
    val goldens = Seq(
      "<html><head><title>T</title><script>s()</script></head>" +
        "<body><!-- c --><h1>Head</h1><p>body &amp; soul</p></body></html>"
        -> "T Head body & soul",
      "<p>nested <b>bold <i>italic</i></b> end</p>" -> "nested bold italic end",
      "<a href=\"http://x.test/\">anchor</a> tail" -> "anchor tail",
      "éè <p>café</p>" -> "éè café",
      "" -> "")
    goldens.foreach { case (html, want) =>
      assert(x(html) == want, s"extract($html)")
      assert(sha(x(html)) == sha(want))
    }
  }

  test("href extraction in document order, quoted only, &amp; decoded") {
    val html = """<a href="http://a.test/1">one</a>
      <A HREF='http://b.test/2?x=1&amp;y=2'>two</A>
      <a name="no-href">three</a>
      <area href="http://not-anchor.test">x</area>
      <a href="http://c.test/3#frag">four</a>"""
    val got = TextExtract.extractHrefs(html.getBytes("UTF-8"))
    assert(got == Seq("http://a.test/1", "http://b.test/2?x=1&y=2",
      "http://c.test/3#frag"))
  }

  test("url normalization: trim, strip fragment, strip one trailing slash") {
    assert(TextExtract.normalizeUrl(" http://a.test/p/ ") == "http://a.test/p")
    assert(TextExtract.normalizeUrl("http://a.test/p#frag") == "http://a.test/p")
    assert(TextExtract.normalizeUrl("http://a.test") == "http://a.test")
  }
}

class PageGenSpec extends SparkTestBase {

  test("generation is a pure function of (seed, id): partitioning-invariant") {
    val a = PageGen.pages(spark, 50, seed = 42, numPartitions = 1)
      .collect().sortBy(_.url)
    val b = PageGen.pages(spark, 50, seed = 42, numPartitions = 7)
      .collect().sortBy(_.url)
    assert(a.length == 50)
    a.zip(b).foreach { case (pa, pb) =>
      assert(pa.url == pb.url && pa.text == pb.text &&
        java.util.Arrays.equals(pa.html, pb.html))
    }
  }

  test("text column is byte-identical to extractor output per url") {
    val pages = PageGen.pages(spark, 30, seed = 42)
    IngestFunctions.register(spark)
    val mismatches = pages.toDF()
      .withColumn("re", call_function("graft_extract_text", col("html")))
      .where(col("re") =!= col("text")).count()
    assert(mismatches == 0)
  }

  test("PageGen.edges equals pages→LinkGraph edge multiset (id space = page id)") {
    val n = 60L
    val pages = PageGen.pages(spark, n, seed = 42).toDF()
    val (nodes, edges) = LinkGraph.build(spark, pages)
    // page urls normalize to themselves minus nothing (no trailing slash),
    // and targets are page urls → node ids == page generation order ids
    val nodeMap = nodes.collect().map(r => r.getString(1) -> r.getLong(0)).toMap
    (0L until n).foreach { i =>
      assert(nodeMap(PageGen.url(42, i, 97)) == i)
    }
    val gotEdges = edges.collect()
      .map(r => (r.getLong(1), r.getLong(0)) -> r.getDouble(2)).toMap
      .map { case ((d, s), w) => (s, d) -> w }
    val wantEdges = PageGen.edges(spark, n, seed = 42).groupBy("src", "dst")
      .agg(sum("weight").as("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gotEdges == wantEdges)
  }

  test("out-degree distribution is heavy-tailed with hubs") {
    val edges = PageGen.edges(spark, 2000, seed = 42)
    val degs = edges.groupBy("dst").count().collect().map(_.getLong(1))
    assert(degs.max > 20 * (degs.sum / degs.length)) // in-degree hubs exist
  }
}

/** Cross-implementation replay oracle for the two rows-only driver queries
  * (`ingest_pages`, `ingest_edges`): DuckDB cannot rerun the page generator
  * or the extractor, so the repo carries its own exact check — a sequential
  * plain-JVM (scala-collections, zero Spark) replay of the ingest-pipeline
  * semantics, asserted row-identical against the distributed path at the
  * exact parameters the driver queries use (n=500, seed=42).
  */
class IngestReplayOracleSpec extends SparkTestBase {

  private val n = 500L
  private val seed = 42L

  test("ingest_edges replay: sequential JVM pipeline reproduces " +
      "LinkGraph.build nodes+edges row-identically") {
    // ---- sequential replay of LinkGraph.build's pinned semantics ----
    val pages = (0L until n).map(i => PageGen.page(seed, i, n))
    val linkPairs = pages.flatMap(p =>
      TextExtract.extractHrefs(p.html).map(h =>
        (TextExtract.normalizeUrl(p.url), TextExtract.normalizeUrl(h))))
    val pageUrls: Map[String, Long] = pages
      .groupBy(p => TextExtract.normalizeUrl(p.url))
      .map { case (u, ps) => u -> ps.map(_.warc_ts.getTime).min }
    val dangling = linkPairs.map(_._2).distinct
      .filterNot(pageUrls.contains).sorted
    // pinned ordering rule: pages by (warc_ts, url), then dangling by url
    val ordered = pageUrls.toSeq.sortBy { case (u, ts) => (ts, u) }
      .map(_._1) ++ dangling
    val id: Map[String, Long] =
      ordered.zipWithIndex.map { case (u, i) => u -> i.toLong }.toMap
    val wantNodes = id.map { case (u, i) => (i, u, pageUrls.contains(u)) }.toSet
    val wantEdges = linkPairs.groupBy(p => (id(p._1), id(p._2)))
      .map { case ((s, d), occ) => (s, d, occ.size.toDouble) }.toSet

    // ---- distributed path (exactly what `ingest_edges` runs) ----
    val s = spark
    import s.implicits._
    val (nodesD, edgesD) =
      LinkGraph.build(spark, PageGen.pages(spark, n, seed).toDF())
    val gotNodes = nodesD.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSet
    val gotEdges = edgesD.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(gotNodes == wantNodes)
    assert(gotEdges == wantEdges)
  }

  test("ingest_pages replay: sequential page construction reproduces the " +
      "driver query's rows") {
    val want = (0L until n).map(i => PageGen.page(seed, i, n))
      .map(p => (p.url, p.lang, p.text.length))
      .sortBy(_._1).toIndexedSeq
    val got = graft.SparkEntry.queries("ingest_pages")(spark, "unused")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
      .toIndexedSeq
    assert(got == want)
  }
}

class DenseIdSpec extends SparkTestBase {

  test("dense 0..n-1 ids in sort order, stable across partitionings") {
    val s = spark
    import s.implicits._
    val data = (0 until 1000).map(i => ((i * 7919) % 1000).toString)
    val df = data.toDF("k").repartition(13)
    val ids = graft.core.DenseId.assign(df, "id", Seq("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = data.distinct.sorted.zipWithIndex
      .map { case (k, i) => k -> i.toLong }.toMap
    // duplicates get distinct ids but grouped; check rank of firsts
    assert(ids.values.toSeq.sorted == (0L until 1000L))
    val sortedPairs = ids.toSeq.sortBy(_._2).map(_._1)
    assert(sortedPairs == data.sorted)
  }
}
