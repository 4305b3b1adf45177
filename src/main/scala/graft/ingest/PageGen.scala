package graft.ingest

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** One synthetic Common-Crawl-style page (BASELINE.json input_hint schema). */
case class Page(url: String, warc_ts: Timestamp, html: Array[Byte],
                text: String, lang: String)

/** Deterministic synthetic crawl generator (FIXTURES.md §1): every field is
  * a pure function of `(seed, pageId)` via counter-based hashing (splitmix64)
  * — no RNG state, so output is identical across runs, partitionings and
  * parallelism levels (the property the two-cluster-size scaling evidence
  * depends on). Replaces the reference's seeded stateful generators
  * (`networkit/cpp/generators/`, RNG via `auxiliary/Random.h:32`) with a
  * splittable construction that parallelizes embarrassingly via
  * `spark.range(n)`.
  *
  * Link structure: out-degree is Zipf-ish heavy-tailed (exponent ~2.1,
  * bounded by `maxOutDeg`), targets are skewed toward low page-ids
  * (`target = floor(n * u^hubExp)`) so low ids become high in-degree hubs —
  * deliberately exercising the power-law skew paths (salting, AQE) of the
  * algorithms downstream.
  */
object PageGen {

  /** splitmix64 finalizer — the counter-based hash primitive. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d4ddcfb0888cc1L
    z ^ (z >>> 31)
  }

  private def h(seed: Long, parts: Long*): Long =
    parts.foldLeft(mix64(seed))((acc, p) => mix64(acc ^ p))

  /** uniform double in [0,1) from a hash value */
  private def u01(x: Long): Double = (x >>> 11).toDouble / (1L << 53).toDouble

  val langs: Array[String] = Array("en", "de", "fr", "es", "it")

  private val wordsEn = Array("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "crawl", "web", "graph", "page", "link", "rank", "data",
    "engine", "spark", "scale", "node", "edge")
  private val wordsDe = Array("der", "die", "das", "und", "schnell", "braun",
    "fuchs", "springt", "hund", "seite", "netz", "graph", "daten", "knoten")
  private val wordsFr = Array("le", "la", "les", "et", "rapide", "brun",
    "renard", "saute", "chien", "page", "toile", "graphe", "sommet")
  private val wordsEs = Array("el", "la", "los", "y", "rapido", "zorro",
    "salta", "perro", "pagina", "red", "grafo", "datos", "nodo")
  private val wordsIt = Array("il", "la", "gli", "e", "veloce", "volpe",
    "salta", "cane", "pagina", "rete", "grafo", "dati", "nodo")
  private val wordsByLang = Array(wordsEn, wordsDe, wordsFr, wordsEs, wordsIt)

  def url(seed: Long, i: Long, nSites: Int): String =
    s"https://site${java.lang.Long.remainderUnsigned(h(seed, 1L, i), nSites.toLong)}.test/p/$i"

  /** Zipf-ish out-degree: floor(xmin * u^(-1/(alpha-1))) capped. alpha=2.1 */
  def outDegree(seed: Long, i: Long, maxOutDeg: Int): Int = {
    val u = math.max(u01(h(seed, 2L, i)), 1e-12)
    val d = math.floor(1.0 * math.pow(u, -1.0 / 1.1)).toLong
    math.min(d, maxOutDeg.toLong).toInt
  }

  /** k-th link target of page i: skewed toward low ids (hubs). */
  def target(seed: Long, i: Long, k: Int, n: Long): Long = {
    val u = u01(h(seed, 3L, i, k.toLong))
    val t = math.floor(n.toDouble * math.pow(u, 2.5)).toLong
    math.min(t, n - 1)
  }

  def lang(seed: Long, i: Long): String =
    langs(java.lang.Long.remainderUnsigned(h(seed, 4L, i), langs.length.toLong).toInt)

  private def sentence(seed: Long, i: Long, langIdx: Int, s: Int): String = {
    val words = wordsByLang(langIdx)
    val len = 4 + java.lang.Long.remainderUnsigned(h(seed, 5L, i, s.toLong), 8L).toInt
    (0 until len).map { w =>
      words(java.lang.Long.remainderUnsigned(h(seed, 6L, i, s.toLong, w.toLong), words.length.toLong).toInt)
    }.mkString(" ")
  }

  /** Assemble the html for page i — fixed template with title, paragraphs,
    * anchor links, a script block and an html comment (so the extractor spec
    * is exercised on every page).
    */
  def html(seed: Long, i: Long, n: Long, nSites: Int, maxOutDeg: Int): String = {
    val langIdx = java.lang.Long.remainderUnsigned(h(seed, 4L, i), langs.length.toLong).toInt
    val deg = outDegree(seed, i, maxOutDeg)
    val nSent = 2 + java.lang.Long.remainderUnsigned(h(seed, 7L, i), 4L).toInt
    val sb = new StringBuilder
    sb.append("<html><head><title>Page ").append(i).append("</title>")
    sb.append("<script>var x = ").append(i).append("; // not text</script>")
    sb.append("<style>body { color: black; }</style></head><body>")
    sb.append("<!-- crawl page ").append(i).append(" -->")
    sb.append("<h1>Page ").append(i).append("</h1>")
    var s = 0
    while (s < nSent) {
      sb.append("<p>").append(sentence(seed, i, langIdx, s)).append("</p>")
      s += 1
    }
    var k = 0
    while (k < deg) {
      val t = target(seed, i, k, n)
      sb.append("<a href=\"").append(url(seed, t, nSites))
        .append("\">link ").append(k).append("</a> ")
      k += 1
    }
    sb.append("</body></html>")
    sb.toString
  }

  /** Pure single-page constructor (used by generator and by test oracles). */
  def page(seed: Long, i: Long, n: Long, nSites: Int = 97,
           maxOutDeg: Int = 256): Page = {
    val htmlBytes = html(seed, i, n, nSites, maxOutDeg).getBytes("UTF-8")
    Page(
      url = url(seed, i, nSites),
      warc_ts = new Timestamp(1700000000000L + i * 1000L),
      html = htmlBytes,
      text = TextExtract.extract(htmlBytes),
      lang = lang(seed, i))
  }

  /** Distributed generation: `spark.range` is splittable — each partition
    * materializes its id range independently, zero shuffle.
    */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L,
            nSites: Int = 97, maxOutDeg: Int = 256,
            numPartitions: Int = 0): Dataset[Page] = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
               else spark.range(n)
    base.map(i => page(seed, i, n, nSites, maxOutDeg))
  }

  /** Edge list straight from the pure link function — used by benchmarks
    * that need the graph without paying html assembly/parsing (same edges as
    * `pages` → LinkGraph, by construction target ids == page ids).
    */
  def edges(spark: SparkSession, n: Long, seed: Long = 42L,
            maxOutDeg: Int = 256, numPartitions: Int = 0): DataFrame = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0L, n, 1L, numPartitions)
               else spark.range(n)
    base.flatMap { i =>
      val d = outDegree(seed, i, maxOutDeg)
      (0 until d).iterator.map(k => (i, target(seed, i, k, n), 1.0))
    }.toDF("src", "dst", "weight")
  }
}
