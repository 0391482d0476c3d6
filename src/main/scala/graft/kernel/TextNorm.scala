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

  private val BlankLines = java.util.regex.Pattern.compile("\n{2,}")
  private val InnerWs = java.util.regex.Pattern.compile("\\s+")

  def extract(raw: String): String = {
    if (raw == null || raw.isEmpty) return ""
    val s = stripTags(raw)
    // collapse whitespace within paragraphs, then blank-line paragraphs
    val paras = BlankLines.split(unescapeEntities(s)).iterator
      .map(p => InnerWs.matcher(p).replaceAll(" ").trim)
      .filter(_.nonEmpty)
    paras.mkString("\n\n")
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

  private def unescapeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

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

  def tokenize(text: String): Tokenized = {
    val paras = paragraphs(text)
    // split each paragraph ONCE and reuse for both views (the old form
    // ran the whitespace regex twice per paragraph — pure waste in the
    // hottest per-doc path)
    val rawPer = paras.map(rawTokens)
    val norm = rawPer.map(_.map(normalizeToken).filter(_.nonEmpty))
    Tokenized(norm.filter(_.nonEmpty), rawPer.flatten)
  }
}
