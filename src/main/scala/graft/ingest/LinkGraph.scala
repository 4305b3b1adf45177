package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.DenseId

/** Pages → link graph: the web-tier ingestion pipeline (SURVEY.md §2.1 "New
  * web tier" row). Input is the Common-Crawl-style table
  * `(url string, warc_ts timestamp, html binary, text string, lang string)`;
  * output is the canonical edge table `(src, dst, weight)` over dense node
  * ids plus the `nodes(id, url)` dictionary.
  *
  * Id assignment rule (pinned, deterministic — cf. SURVEY.md §1.2 on the
  * reference's first-appearance remap): pages are ordered by
  * `(warc_ts, url)` ("file order" of the crawl); page urls get ids
  * `0..nPages-1` in that order; urls that appear only as link targets
  * (dangling pages) follow with ids `nPages..n-1` ordered by url. Implemented
  * with the scalable two-phase dense-id scheme (graft.core.DenseId) — no
  * global single-partition window.
  */
object LinkGraph {

  /** `(url, warc_ts, html, ...)` → `(src_url, dst_url)` link pairs,
    * urls normalized. One row per (page, href occurrence).
    */
  def links(spark: SparkSession, pages: DataFrame): DataFrame = {
    IngestFunctions.register(spark)
    pages
      .select(
        call_function("graft_normalize_url", col("url")).as("src_url"),
        explode(call_function("graft_extract_hrefs", col("html"))).as("href"))
      .select(col("src_url"),
        call_function("graft_normalize_url", col("href")).as("dst_url"))
  }

  /** Node dictionary `(id, url, is_page)` per the pinned ordering rule. */
  def nodeDictionary(spark: SparkSession, pages: DataFrame,
                     linkPairs: DataFrame): DataFrame = {
    IngestFunctions.register(spark)
    val pageUrls = pages.select(
      call_function("graft_normalize_url", col("url")).as("url"),
      col("warc_ts"))
      .groupBy("url").agg(min("warc_ts").as("warc_ts"))
    val danglingUrls = linkPairs.select(col("dst_url").as("url")).distinct()
      .join(pageUrls.select("url"), Seq("url"), "left_anti")
    // pages first (ordered by warc_ts, url), then dangling targets (by url):
    // encode the two groups with a rank prefix so one dense-id pass suffices.
    val all = pageUrls.select(lit(0).as("grp"), col("warc_ts"), col("url"))
      .unionByName(danglingUrls.select(
        lit(1).as("grp"),
        lit(java.sql.Timestamp.valueOf("9999-01-01 00:00:00")).as("warc_ts"),
        col("url")))
    DenseId.assign(all, "id", Seq("grp", "warc_ts", "url"))
      .select(col("id"), col("url"), (col("grp") === 0).as("is_page"))
  }

  /** Full pipeline: pages → (nodes, edges). Edge weight = number of times
    * the link occurs on the page (duplicate hrefs aggregate), self-links
    * kept (the algorithms define their own self-loop policy).
    */
  def build(spark: SparkSession, pages: DataFrame): (DataFrame, DataFrame) = {
    val linkPairs = links(spark, pages).persist()
    val nodes = nodeDictionary(spark, pages, linkPairs).persist()
    val edges = linkPairs
      .join(nodes.select(col("url").as("src_url"), col("id").as("src")), Seq("src_url"))
      .join(nodes.select(col("url").as("dst_url"), col("id").as("dst")), Seq("dst_url"))
      .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("weight"))
    (nodes, edges)
  }
}
