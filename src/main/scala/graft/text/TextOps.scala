package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language-ID, quality scoring, fingerprinting. All are
  * compositions of built-in (whole-stage-codegen'd) Spark SQL functions —
  * no UDFs — so the exact same logic is expressible in ANSI-ish SQL for the
  * DuckDB oracle (see SparkEntry.oracleSql) and stays in Tungsten on the
  * 100 TB path.
  *
  * Everything is deterministic; where a downstream consumer needs a pinned
  * contract (e.g. the tokenizer used for dedup shingles), the definitions
  * here are the spec.
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped (leading/trailing whitespace
    * would otherwise produce empties). The pinned tokenizer for all
    * token-level ops.
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= lit(""))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword segmentation via regex: runs of letters, runs of
    * digits, or single other non-space symbols — the classic pre-tokenizer
    * shape (GPT-2-style pre-split without merges).
    */
  def bpeIshTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  def bpeIshTokenCount(text: Column): Column = size(bpeIshTokens(text))

  /** Character n-grams of the raw text (for Jaccard shingling). */
  def charNgrams(text: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(text) - (n - 1), lit(0))),
      i => substring(text, i, lit(n)))

  /** Word k-shingles: space-joined k-grams of the token stream. */
  def wordShingles(text: Column, k: Int): Column = {
    val toks = tokens(text)
    transform(sequence(lit(1), greatest(size(toks) - (k - 1), lit(0))),
      i => concat_ws(" ", slice(toks, i, lit(k))))
  }

  // ---- language id ----------------------------------------------------
  /** Tiny pinned stopword lists per language (the n-gram/stopword heuristic;
    * deliberately small so the rule is auditable and SQL-portable).
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it"),
    "es" -> Seq("el", "los", "las", "y", "que", "en", "un", "una", "por"),
    "fr" -> Seq("le", "les", "et", "des", "est", "une", "du", "dans", "pour"),
    "it" -> Seq("il", "gli", "e", "di", "che", "per", "con", "del", "una"))

  private def stopwordHits(text: Column, lang: String): Column = {
    val list = array(stopwords(lang).map(lit): _*)
    size(filter(tokens(lower(text)), t => array_contains(list, t)))
  }

  /** Language guess: argmax of per-language stopword hit counts, ties
    * broken alphabetically; no hits → "und". Deterministic.
    */
  def langId(text: Column): Column = {
    val hits = stopwords.keys.toSeq.sorted.map(l => l -> stopwordHits(text, l))
    val m = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und"): Column) { case ((l, h), acc) =>
      when(h === m && m > 0, lit(l)).otherwise(acc)
    }
  }

  // ---- quality --------------------------------------------------------
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") / length(text))

  def punctRatio(text: Column): Column =
    when(length(text) === 0, 0.0).otherwise(
      length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") / length(text))

  def stopwordRatio(text: Column): Column = {
    val tc = tokenCount(text)
    when(tc === 0, 0.0).otherwise(
      stopwordHits(text, "en").cast("double") / tc)
  }

  def meanTokenLength(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, 0.0).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
        size(toks))
  }

  /** Pinned composite quality score in [0,1] — length prior, letter ratio,
    * low punctuation, English-stopword signal.
    */
  def qualityScore(text: Column): Column = {
    val lengthScore = least(length(text).cast("double") / 500.0, lit(1.0))
    val alpha = alphaRatio(text)
    val punct = lit(1.0) - least(punctRatio(text) * 5.0, lit(1.0))
    val stop = least(stopwordRatio(text) * 5.0, lit(1.0))
    round(lit(0.25) * lengthScore + lit(0.35) * alpha + lit(0.2) * punct +
      lit(0.2) * stop, 6)
  }

  // ---- fingerprinting -------------------------------------------------
  /** Deterministic document fingerprint: minimum md5 over word 3-shingles
    * (winnowing-lite: the min-hash of the shingle set — stable under
    * whitespace normalization; empty/short docs fall back to md5 of the
    * whole text).
    */
  def fingerprint(text: Column): Column = {
    val shingleHashes = transform(wordShingles(text, 3), s => md5(s))
    coalesce(array_min(shingleHashes), md5(text))
  }

  /** MinHash signature entry j (j = 0..k-1): min over distinct tokens of
    * md5(j || '|' || token). String-min over a uniform hash ≡ a permutation
    * min-hash; k entries form the signature (SIGMOD-standard MinHash, SQL-
    * portable because it needs only md5 + min).
    */
  def minhash(text: Column, j: Int): Column =
    array_min(transform(array_distinct(tokens(text)),
      t => md5(concat(lit(j.toString), lit("|"), t))))

  /** LSH band b over an r-row signature: md5 of the concatenated member
    * hashes. Docs sharing any band value are near-dup candidates.
    */
  def minhashBand(text: Column, band: Int, rowsPerBand: Int): Column = {
    val members = (0 until rowsPerBand).map(r => minhash(text, band * rowsPerBand + r))
    md5(concat(members: _*))
  }

  /** 16-bit SimHash from per-token 16-bit md5 prefixes: bit j of the
    * fingerprint is 1 iff the sum over tokens of (2·bit_j(h(token)) − 1) is
    * positive. Hamming-close fingerprints ⇒ similar token multisets.
    * Returns the fingerprint as a BIGINT in [0, 65536).
    */
  def simhash16(text: Column): Column = {
    // per-token 16-bit hash: first 4 hex chars of md5
    val toks = tokens(text)
    val hashes = transform(toks, t =>
      conv(substring(md5(t), 1, 4), 16, 10).cast("long"))
    val bits = (0 until 16).map { j =>
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + (shiftright(h, j).bitwiseAND(1) * 2 - 1))
      when(bitSum > 0, lit(1L) * (1L << j)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }
}
