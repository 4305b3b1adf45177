package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.charset.CodingErrorAction
import java.nio.ByteBuffer
import scala.collection.mutable.ArrayBuffer

/** Deterministic pure-function HTML → text extractor (the pinned "reference
  * extractor" of FIXTURES.md §3; the byte-identical-per-url invariant of
  * BASELINE.json's input_hint is enforced against exactly this spec).
  *
  * Spec (applied in order, all steps pure):
  *  1. decode bytes as UTF-8 with U+FFFD replacement for malformed sequences
  *  2. replace HTML comments `<!-- ... -->` with one space (non-greedy;
  *     unterminated comment runs to end of input)
  *  3. replace `<script>...</script>` and `<style>...</style>` subtrees,
  *     case-insensitive, including their content, with one space
  *     (unterminated runs to end)
  *  4. replace every remaining tag `<...>` with a single space
  *     (unterminated `<` runs to end of input)
  *  5. decode exactly these entities, one pass, `&amp;` last:
  *     `&lt; &gt; &quot; &apos; &nbsp;`(→ space) `&amp;`
  *  6. collapse every run of whitespace (incl. U+00A0) to one space; trim.
  *
  * The reference repo (NetworKit) has no HTML ingestion — this extractor is
  * new surface required by the web tier; its stability is pinned by golden
  * sha-256 fixtures in `TextExtractSpec`.
  */
object TextExtract {

  def decodeUtf8Lossy(bytes: Array[Byte]): String = {
    val dec = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    dec.decode(ByteBuffer.wrap(bytes)).toString
  }

  /** Remove a region delimited by `open`..`close` (case-insensitive scan),
    * unterminated region runs to end. Single linear pass.
    */
  private def stripRegions(s: String, open: String, close: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val lower = s.toLowerCase
    while (i < s.length) {
      val start = lower.indexOf(open, i)
      if (start < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, start).append(' ')
        val end = lower.indexOf(close, start + open.length)
        i = if (end < 0) s.length else end + close.length
      }
    }
    sb.toString
  }

  /** Drop <script>/<style> elements with content. Matches the opening tag
    * loosely (`<script` up to its `>` then through `</script>`).
    */
  private def stripElement(s: String, name: String): String = {
    val lower = s.toLowerCase
    val openTok = "<" + name
    val closeTok = "</" + name
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val start = lower.indexOf(openTok, i)
      // must be a real tag boundary: next char is '>', whitespace or '/'
      val isTag = start >= 0 && {
        val p = start + openTok.length
        p >= s.length || s.charAt(p) == '>' || s.charAt(p) == '/' ||
          Character.isWhitespace(s.charAt(p))
      }
      if (start < 0) { sb.append(s, i, s.length); i = s.length }
      else if (!isTag) { sb.append(s, i, start + openTok.length); i = start + openTok.length }
      else {
        sb.append(s, i, start).append(' ')
        val close = lower.indexOf(closeTok, start)
        if (close < 0) { i = s.length }
        else {
          val gt = s.indexOf('>', close)
          i = if (gt < 0) s.length else gt + 1
        }
      }
    }
    sb.toString
  }

  /** Replace every `<...>` tag with one space; unterminated `<` eats the
    * rest of the input.
    */
  private def stripTags(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val lt = s.indexOf('<', i)
      if (lt < 0) { sb.append(s, i, s.length); i = s.length }
      else {
        sb.append(s, i, lt).append(' ')
        val gt = s.indexOf('>', lt)
        i = if (gt < 0) s.length else gt + 1
      }
    }
    sb.toString
  }

  private def decodeEntities(s: String): String = {
    // single left-to-right pass; &amp; decodes to a literal '&' that is NOT
    // re-scanned (so "&amp;lt;" → "&lt;" as text).
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '&') {
        val rest = s.substring(i, math.min(s.length, i + 6))
        if (rest.startsWith("&lt;")) { sb.append('<'); i += 4 }
        else if (rest.startsWith("&gt;")) { sb.append('>'); i += 4 }
        else if (rest.startsWith("&quot;")) { sb.append('"'); i += 6 }
        else if (rest.startsWith("&apos;")) { sb.append('\''); i += 6 }
        else if (rest.startsWith("&nbsp;")) { sb.append(' '); i += 6 }
        else if (rest.startsWith("&amp;")) { sb.append('&'); i += 5 }
        else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def collapseWs(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c) || c == ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** The pinned extractor: html bytes → text. */
  def extract(html: Array[Byte]): String = {
    val s0 = decodeUtf8Lossy(html)
    val s1 = stripRegions(s0, "<!--", "-->")
    val s2 = stripElement(stripElement(s1, "script"), "style")
    val s3 = stripTags(s2)
    val s4 = decodeEntities(s3)
    collapseWs(s4)
  }

  /** Extract href targets of `<a ...>` tags, in document order. Quoted
    * (single or double) href values only; entity-decode `&amp;` in the URL.
    */
  def extractHrefs(html: Array[Byte]): Seq[String] = {
    val s = decodeUtf8Lossy(html)
    val lower = s.toLowerCase
    val out = ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      val a = lower.indexOf("<a", i)
      if (a < 0) { i = s.length }
      else {
        val boundaryOk = a + 2 >= s.length || s.charAt(a + 2) == '>' ||
          Character.isWhitespace(s.charAt(a + 2))
        val gt = s.indexOf('>', a)
        val end = if (gt < 0) s.length else gt
        if (boundaryOk) {
          val tag = s.substring(a, end)
          val tagLower = tag.toLowerCase
          val h = tagLower.indexOf("href")
          if (h >= 0) {
            var j = h + 4
            while (j < tag.length && (tag.charAt(j) == ' ' || tag.charAt(j) == '=')) j += 1
            if (j < tag.length && (tag.charAt(j) == '"' || tag.charAt(j) == '\'')) {
              val quote = tag.charAt(j)
              val close = tag.indexOf(quote, j + 1)
              if (close > j) out += decodeEntities(tag.substring(j + 1, close))
            }
          }
        }
        i = if (gt < 0) s.length else gt + 1
      }
    }
    out.toSeq
  }

  /** Pinned URL normalization for vertex identity: trim, drop `#fragment`,
    * drop one trailing '/' (but keep a bare "scheme://host/" root slash
    * removal too — spec: any single trailing slash is removed).
    */
  def normalizeUrl(url: String): String = {
    var u = url.trim
    val hash = u.indexOf('#')
    if (hash >= 0) u = u.substring(0, hash)
    if (u.endsWith("/")) u = u.substring(0, u.length - 1)
    u
  }
}
