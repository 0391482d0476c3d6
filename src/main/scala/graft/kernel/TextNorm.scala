package graft.kernel

import java.nio.charset.StandardCharsets

/** Deterministic HTML→text extraction + tokenization.
  *
  * ≅ the reference's disassembly/escaping front-end: SMDA gives it a stable
  * instruction stream per binary; we must give the pipeline a byte-identical
  * extracted text per url (BASELINE input_hint "per-row invariant"). Pure
  * function of the html bytes — no locale, no library, UTF-8 only.
  *
  * The instruction-escaping analog (IntelInstructionEscaper via
  * /root/reference/mcrit/shinglers/EscapedBlockShingler.py:17-23) is
  * `normalizeToken`: lowercase + digit-run wildcarding, so near-identical
  * tokens land on identical shingles.
  */
object TextNorm {
  private val BlockTags = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "tr", "table", "blockquote", "section", "article", "header", "footer", "pre")
  private val SkipTags = Set("script", "style", "head", "noscript")

  /** html bytes → normalized text: tags stripped, entities decoded, lines
    * whitespace-collapsed, blank-line-separated paragraphs.
    */
  def extract(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    extract(new String(html, StandardCharsets.UTF_8))
  }

  def extract(raw: String): String = {
    if (raw == null || raw.isEmpty) return ""
    normalizeStripped(stripTags(raw))
  }

  /** Entity decode + whitespace collapse + paragraph assembly in ONE scan
    * over the tag-stripped text (the previous form — six String.replace
    * passes, a blank-line split and a per-paragraph \s+ regex — re-scanned
    * the document ~10× and showed up in the signature-stage profile).
    *
    * Byte-identical to the sequential form (property-tested against it):
    *  - entity decoding is equivalent to the ordered replace chain because
    *    no entity's replacement contains '&' (so an earlier replacement can
    *    neither form nor feed a later match) and matches can't overlap;
    *  - a paragraph break is a run of ≥2 CONSECUTIVE '\n' (the \n{2,}
    *    split), any other whitespace run collapses to one space, and
    *    leading/trailing runs trim away (empty paragraphs drop).
    */
  private[graft] def normalizeStripped(s: String): String = {
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    var nlRun = 0          // consecutive '\n' seen in the current ws run
    var sawWs = false      // inside a whitespace run
    var paraPending = false
    while (i < n) {
      var c = s.charAt(i)
      var step = 1
      if (c == '&') {
        // decode the six supported entities via direct lookahead
        if (s.regionMatches(i, "&lt;", 0, 4)) { c = '<'; step = 4 }
        else if (s.regionMatches(i, "&gt;", 0, 4)) { c = '>'; step = 4 }
        else if (s.regionMatches(i, "&quot;", 0, 6)) { c = '"'; step = 6 }
        else if (s.regionMatches(i, "&#39;", 0, 5)) { c = '\''; step = 5 }
        else if (s.regionMatches(i, "&nbsp;", 0, 6)) { c = ' '; step = 6 }
        else if (s.regionMatches(i, "&amp;", 0, 5)) { c = '&'; step = 5 }
      }
      // \s = [ \t\n\x0B\f\r] exactly (Java regex, no UNICODE flag)
      if (c == '\n') { nlRun += 1; sawWs = true }
      else if (c == ' ' || c == '\t' || c == '\u000B' || c == '\f' || c == '\r') {
        if (nlRun >= 2) paraPending = true
        nlRun = 0; sawWs = true
      } else {
        if (nlRun >= 2) paraPending = true
        nlRun = 0
        if (paraPending) {
          if (out.length > 0) out.append("\n\n")
          paraPending = false
        } else if (sawWs && out.length > 0) out.append(' ')
        sawWs = false
        out.append(c)
      }
      i += step
    }
    out.toString
  }

  /** Single-pass tag stripper (the regex form re-scanned the document four
    * times and dominated the per-doc pipeline cost): comments and
    * script/style/head/noscript blocks drop, block-level tags become
    * paragraph breaks, other tags become spaces.
    */
  private def stripTags(raw: String): String = {
    val n = raw.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = raw.charAt(i)
      if (c != '<') { sb.append(c); i += 1 }
      else if (raw.regionMatches(i, "<!--", 0, 4)) {
        val e = raw.indexOf("-->", i + 4)
        sb.append(' ')
        i = if (e < 0) n else e + 3
      } else {
        val close = i + 1 < n && raw.charAt(i + 1) == '/'
        val nameStart = if (close) i + 2 else i + 1
        var j = nameStart
        while (j < n && (Character.isLetterOrDigit(raw.charAt(j)))) j += 1
        val name = raw.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
        val gt = raw.indexOf('>', j)
        val tagEnd = if (gt < 0) n else gt + 1
        if (!close && SkipTags.contains(name)) {
          // skip to the matching close tag (case-insensitive)
          val closeTag = "</" + name
          var k = tagEnd
          var found = -1
          while (found < 0 && k < n) {
            if (raw.regionMatches(true, k, closeTag, 0, closeTag.length)) found = k
            else k += 1
          }
          sb.append(' ')
          i = if (found < 0) n
          else {
            val g = raw.indexOf('>', found)
            if (g < 0) n else g + 1
          }
        } else if (BlockTags.contains(name)) {
          sb.append("\n\n")
          i = tagEnd
        } else {
          sb.append(' ')
          i = tagEnd
        }
      }
    }
    sb.toString
  }

  // precompiled: String.split/replaceAll compile their pattern per call,
  // which dominates the signature stage at ~260 tokens/doc
  private val ParaSplit = java.util.regex.Pattern.compile("\n\n")
  private val WsSplit = java.util.regex.Pattern.compile("\\s+")

  /** Paragraphs of a normalized text (the reference's "basic blocks"). */
  def paragraphs(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else ParaSplit.split(text).filter(_.nonEmpty)

  /** Raw whitespace tokens of one paragraph. */
  def rawTokens(para: String): Array[String] =
    WsSplit.split(para).filter(_.nonEmpty)

  /** Escaped token: lowercase, strip edge punctuation, digit runs → '0'.
    * Hand-rolled single pass (hot path: once per token per doc).
    */
  def normalizeToken(tok: String): String = {
    val n = tok.length
    // strip edges (non letter-or-digit)
    var s = 0
    var e = n - 1
    while (s < n && !Character.isLetterOrDigit(tok.charAt(s))) s += 1
    while (e >= s && !Character.isLetterOrDigit(tok.charAt(e))) e -= 1
    val from = if (s > e) 0 else s
    val to = if (s > e) n - 1 else e
    val sb = new java.lang.StringBuilder(to - from + 1)
    var i = from
    var inDigits = false
    while (i <= to) {
      val c = Character.toLowerCase(tok.charAt(i))
      if (c >= '0' && c <= '9') {
        if (!inDigits) { sb.append('0'); inDigits = true }
      } else {
        sb.append(c)
        inDigits = false
      }
      i += 1
    }
    sb.toString
  }

  /** A tokenized document: per-paragraph normalized tokens + raw tokens. */
  final case class Tokenized(paraTokens: Array[Array[String]], rawToks: Array[String]) {
    def allTokens: Iterator[String] = paraTokens.iterator.flatten
    def numTokens: Int = paraTokens.iterator.map(_.length).sum
  }

  /** Single-scan tokenization, byte-identical to splitting on the literal
    * "\n\n" then \s+ per paragraph then normalizing (property-tested
    * against that composition): paragraph boundaries are non-overlapping
    * "\n\n" pairs consumed left-to-right (so "\n\n\n" = one boundary + a
    * leftover '\n' that collapses as in-paragraph whitespace), tokens are
    * maximal non-\s runs, and a paragraph whose normalized tokens all
    * vanish drops from `paraTokens` while its raw tokens stay in
    * `rawToks` — exactly what the split-based form produced.
    */
  def tokenize(text: String): Tokenized = {
    if (text == null || text.isEmpty) return Tokenized(Array.empty, Array.empty)
    val n = text.length
    val rawAll = new scala.collection.mutable.ArrayBuffer[String](64)
    val paras = new scala.collection.mutable.ArrayBuffer[Array[String]](8)
    var paraNorm = new scala.collection.mutable.ArrayBuffer[String](32)
    var tokStart = -1
    def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'
    def endToken(end: Int): Unit = if (tokStart >= 0) {
      val raw = text.substring(tokStart, end)
      rawAll += raw
      val norm = normalizeToken(raw)
      if (norm.nonEmpty) paraNorm += norm
      tokStart = -1
    }
    def endPara(): Unit = {
      if (paraNorm.nonEmpty) { paras += paraNorm.toArray; paraNorm = new scala.collection.mutable.ArrayBuffer[String](32) }
    }
    var i = 0
    while (i < n) {
      val c = text.charAt(i)
      if (c == '\n' && i + 1 < n && text.charAt(i + 1) == '\n') {
        endToken(i); endPara(); i += 2
      } else if (isWs(c)) {
        endToken(i); i += 1
      } else {
        if (tokStart < 0) tokStart = i
        i += 1
      }
    }
    endToken(n); endPara()
    Tokenized(paras.toArray, rawAll.toArray)
  }
}
