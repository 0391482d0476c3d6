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
  private val ScriptStyle =
    "(?is)<(script|style|head|noscript)\\b[^>]*>.*?</\\1\\s*>".r
  private val Comment = "(?s)<!--.*?-->".r
  private val BlockTag =
    "(?i)</?(p|div|br|h[1-6]|li|ul|ol|tr|table|blockquote|section|article|header|footer|pre)\\b[^>]*>".r
  private val AnyTag = "(?s)<[^>]*>".r

  /** html bytes → normalized text: tags stripped, entities decoded, lines
    * whitespace-collapsed, blank-line-separated paragraphs.
    */
  def extract(html: Array[Byte]): String = {
    if (html == null || html.isEmpty) return ""
    extract(new String(html, StandardCharsets.UTF_8))
  }

  def extract(raw: String): String = {
    if (raw == null || raw.isEmpty) return ""
    var s = Comment.replaceAllIn(raw, " ")
    s = ScriptStyle.replaceAllIn(s, " ")
    s = BlockTag.replaceAllIn(s, "\n\n")
    s = AnyTag.replaceAllIn(s, " ")
    s = unescapeEntities(s)
    // collapse horizontal whitespace within lines, then blank-line paragraphs
    val paras = s.split("\n{2,}").iterator
      .map(_.replaceAll("[\\s&&[^\n]]+", " ").replace("\n", " ")
        .replaceAll(" +", " ").trim)
      .filter(_.nonEmpty)
    paras.mkString("\n\n")
  }

  private def unescapeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
      .replace("&#39;", "'").replace("&nbsp;", " ").replace("&amp;", "&")

  /** Paragraphs of a normalized text (the reference's "basic blocks"). */
  def paragraphs(text: String): Array[String] =
    if (text == null || text.isEmpty) Array.empty
    else text.split("\n\n").filter(_.nonEmpty)

  /** Raw whitespace tokens of one paragraph. */
  def rawTokens(para: String): Array[String] =
    para.split("\\s+").filter(_.nonEmpty)

  /** Escaped token: lowercase, strip edge punctuation, digit runs → '0'. */
  def normalizeToken(tok: String): String = {
    val lower = tok.toLowerCase(java.util.Locale.ROOT)
    val stripped = lower.dropWhile(c => !c.isLetterOrDigit)
      .reverse.dropWhile(c => !c.isLetterOrDigit).reverse
    val base = if (stripped.isEmpty) lower else stripped
    base.replaceAll("[0-9]+", "0")
  }

  /** A tokenized document: per-paragraph normalized tokens + raw tokens. */
  final case class Tokenized(paraTokens: Array[Array[String]], rawToks: Array[String]) {
    def allTokens: Iterator[String] = paraTokens.iterator.flatten
    def numTokens: Int = paraTokens.iterator.map(_.length).sum
  }

  def tokenize(text: String): Tokenized = {
    val paras = paragraphs(text)
    val raw = paras.flatMap(rawTokens)
    val norm = paras.map(p => rawTokens(p).map(normalizeToken).filter(_.nonEmpty))
    Tokenized(norm.filter(_.nonEmpty), raw)
  }
}
