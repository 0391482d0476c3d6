package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.TextNorm

/** Text analysis operators for a training-data pipeline over the `documents`
  * table (doc_id, text, lang, source, n_chars). Column-first: everything
  * expressible with built-in (codegen'd) functions is; only language-ID uses
  * a typed UDF (character-n-gram scoring needs a loop).
  */
object TextOps {

  /** Token count via whitespace split; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Deterministic document fingerprint: md5 of the whitespace-normalized
    * lowercase text (the whole-doc exact-hash analog of pichash, P3).
    * Native single-pass codegen expression — semantics identical to
    * `md5(regexp_replace(lower(trim(text)), "\\s+", " "))` (property-tested
    * against it) without the per-row regex.
    */
  def fingerprint(text: Column): Column =
    graft.expr.NormalizedMd5.normalizedMd5(text)

  /** Quality stats per doc — length/punct/stopword/uniq ratios, scaled to
    * integers (floor(1000×ratio)) so they are engine-portable exactly.
    */
  def qualityStats(df: DataFrame): DataFrame = {
    val toks = tokenCount(col("text"))
    df.select(
      col("doc_id"),
      length(col("text")).as("n_chars_calc"),
      toks.as("n_tokens"),
      when(toks === 0, lit(0))
        .otherwise(floor(lit(1000) * (length(regexp_replace(col("text"), "\\s", "")).cast("double") / toks)).cast("long"))
        .as("avg_token_len_x1000"),
      floor(lit(1000) * (length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("double") /
        greatest(length(col("text")), lit(1)))).cast("long").as("punct_ratio_x1000"))
  }

  /** Character-trigram language identification (n-gram heuristic): scores
    * text against per-language trigram profiles learned from small fixed
    * seed phrases; returns the argmax language code. Deterministic, no
    * external model.
    */
  def langIdUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((text: String) => LangId.detect(text))

  def withLangId(df: DataFrame): DataFrame =
    df.withColumn("lang_pred", langIdUdf(col("text")))

  /** BPE-ish token estimate: word pieces split at letter/digit boundaries and
    * every 6 chars — a cheap stand-in for subword token counting.
    */
  def subwordCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")) +
        (length(regexp_replace(text, "\\s", "")) / lit(6)).cast("int"))
}

/** Tiny deterministic trigram language scorer (public standard technique). */
object LangId {
  private val seeds: Map[String, String] = Map(
    "en" -> "the quick brown fox jumps over the lazy dog and this is a test of the english language with many common words that people use every day",
    "de" -> "der schnelle braune fuchs springt ueber den faulen hund und dies ist ein test der deutschen sprache mit vielen haeufigen woertern die menschen jeden tag verwenden",
    "fr" -> "le renard brun rapide saute par dessus le chien paresseux et ceci est un test de la langue francaise avec beaucoup de mots courants que les gens utilisent chaque jour",
    "es" -> "el rapido zorro marron salta sobre el perro perezoso y esta es una prueba del idioma espanol con muchas palabras comunes que la gente usa cada dia",
    "zh" -> "quick fox test language common words people day zhongwen hanyu pinyin shi yi ge ce shi de yu yan")

  private lazy val profiles: Map[String, Map[String, Int]] =
    seeds.map { case (lang, s) => lang -> trigrams(s) }

  private def trigrams(s: String): Map[String, Int] = {
    val t = " " + s.toLowerCase.replaceAll("[^a-z ]", "").replaceAll(" +", " ") + " "
    t.sliding(3).toSeq.groupBy(identity).view.mapValues(_.size).toMap
  }

  def detect(text: String): String = {
    if (text == null || text.trim.isEmpty) return "und"
    val tg = trigrams(text.take(2000))
    if (tg.isEmpty) return "und"
    val scored = profiles.toSeq.map { case (lang, prof) =>
      var s = 0L
      for ((g, c) <- tg) s += c.toLong * prof.getOrElse(g, 0)
      (lang, s)
    }
    // deterministic tie-break by language code; a zero best score means NO
    // profile matched anything (non-Latin scripts, symbol-only text — the
    // [^a-z ] strip can leave pseudo-grams that defeat the isEmpty guard)
    // → undetermined, not alphabetically-first
    val best = scored.sortBy { case (l, s) => (-s, l) }.head
    if (best._2 == 0L) "und" else best._1
  }
}
