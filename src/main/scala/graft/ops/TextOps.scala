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

  /** Text with ALL whitespace stripped at both edges. Spark's trim()
    * strips only ' ': a trailing newline/tab would survive it and the
    * \s+ split keeps trailing empty strings (limit -1), so every
    * word-based metric would count phantom empty tokens on real web text
    * (trailing newlines are ubiquitous). regexp form is engine-portable.
    */
  private def wsTrim(text: Column): Column =
    regexp_replace(text, "^\\s+|\\s+$", "")

  /** Whitespace word array of a doc — THE word-split convention for every
    * column-level text metric (tokenCount, gopherQuality,
    * repetitionSignals): \s+ split of the \s-trimmed text; blank → empty.
    */
  private[ops] def wsWords(text: Column): Column = {
    val t = wsTrim(text)
    when(length(t) === 0, array().cast("array<string>"))
      .otherwise(split(t, "\\s+"))
  }

  /** Non-blank, \s-trimmed parts of a `sep`-regex split — THE line/paragraph
    * convention for the rule batteries. Per-part wsTrim (not plain trim)
    * matters twice: a CRLF line keeps its \r through a "\n" split and a
    * space-only trim, where (a) Java's `$` anchor matches BEFORE a final \r
    * while RE2's does not (a silent Spark-vs-oracle divergence on any
    * crawled corpus), and (b) a tab-prefixed line grows a phantom empty
    * token under a \s+ word split.
    */
  private[ops] def wsParts(text: Column, sep: String): Column =
    filter(transform(split(text, sep), p => wsTrim(p)), p => length(p) > 0)

  /** Token count via whitespace split; empty/blank text counts 0. */
  def tokenCount(text: Column): Column = size(wsWords(text))

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

  /** REAL subword token count: the committed deterministic BPE tokenizer
    * (`kernel.Bpe` — 512 merges trained in-repo on the seeded corpus,
    * merges table a freshness-gated classpath fixture). UDF justified: the
    * greedy merge loop is per-word iterative; the tokenizer object ships
    * once per executor via the UDF closure and memoizes per thread.
    */
  def subwordCountUdf: org.apache.spark.sql.expressions.UserDefinedFunction = {
    val bpe = graft.kernel.Bpe.default
    udf((text: String) => bpe.countTokens(text).toLong)
  }

  /** Canonical URL for revisit/mirror dedup keys — the standard web-pipeline
    * normalizations, applied as one deterministic column expression (pure
    * regexp_replace/regexp_extract chain, codegen, RE2-compatible patterns
    * so an independent SQL engine reproduces it exactly):
    *   1. trim; strip the #fragment;
    *   2. lowercase the scheme and host; strip the SCHEME'S default port
    *      (":80" for http, ":443" for https — an explicit :443 on http is
    *      a different resource and is kept) and a leading "www.";
    *   3. drop tracking query params (utm_*, gclid, fbclid, msclkid) and
    *      re-normalize separators (no "?&", "&&", or trailing "?"/"&");
    *   4. drop trailing slashes on the path (before "?" and at the end).
    * Path case and remaining param order are preserved — reordering params
    * can change server behavior; this is a conservative mirror key, not a
    * crawler politeness canonicalizer.
    */
  def canonicalUrl(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*", "")
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport0 = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noDefaultPort = when(scheme === "http", regexp_replace(hostport0, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport0, ":443$", ""))
      .otherwise(hostport0)
    val hostport = regexp_replace(noDefaultPort, "^www\\.", "")
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val noTrack = regexp_replace(pathq,
      "([?&])(utm_[A-Za-z0-9_]+|gclid|fbclid|msclkid)=[^&]*", "$1")
    val collapsed = regexp_replace(
      regexp_replace(regexp_replace(noTrack, "\\?&+", "?"), "&&+", "&"),
      "[?&]+$", "")
    val noSlash = regexp_replace(regexp_replace(collapsed, "/+\\?", "?"), "/+$", "")
    when(scheme === "", concat(hostport, noSlash))
      .otherwise(concat(scheme, lit("://"), hostport, noSlash))
  }

  /** Deterministic stratified sampling for dataset MIXING: each stratum
    * (e.g. language) keeps its configured fraction of docs, decided by a
    * seeded multiplicative hash of doc_id — no RNG state, so the keep set
    * is reproducible run-to-run, job-to-job, and engine-to-engine (pure
    * bounded BIGINT arithmetic: `((doc_id + seed) % 1000003) * 2654435761
    * % 999983`, never overflowing a signed 64-bit in ANY engine — an
    * unbounded product would wrap in Spark but ERROR in DuckDB, breaking
    * the oracle contract). Returns every doc with its stratum, bucket,
    * and keep verdict; callers filter `keep = 1`.
    *
    * The doc_id % 1000003 stage makes the bucket sequence periodic with
    * cycle ~10^6: ids exactly 1000003 apart share a verdict. Fine for
    * mixing (each stratum still keeps its rate to within ~10^-6 at any
    * scale); a pipeline needing cryptographic-grade independence at
    * 10^12 ids should swap in xxhash64 and give up SQL-oracle exactness.
    *
    * Rates are floored to integer thresholds out of 999983, so the
    * contract is exact: keep ⇔ bucket < floor(rate · 999983).
    */
  def stratifiedSample(docs: DataFrame, strataCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0,
      seed: Long = 0L): DataFrame = {
    require(seed >= 0, s"seed must be non-negative, got $seed")
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val bucket = ((col("doc_id") + lit(seed)) % lit(1000003L)) *
      lit(2654435761L) % lit(999983L)
    def thr(r: Double): Long = (r * 999983L).toLong
    val threshold = rates.foldLeft(lit(thr(defaultRate))) {
      case (acc, (k, v)) => when(col(strataCol) === k, lit(thr(v))).otherwise(acc)
    }
    docs.select(col("doc_id"), col(strataCol).as("stratum"),
        bucket.as("bucket"), threshold.as("thr"))
      .select(col("doc_id"), col("stratum"), col("bucket"),
        when(col("bucket") < col("thr"), lit(1)).otherwise(lit(0)).as("keep"))
  }

  /** PII patterns for `piiRedact` — the standard web-pipeline regexes
    * (emails, IPv4 addresses, US-style phone numbers; the same three
    * classes Dolma/BigScience-ROOTS redact). Engine-portable by
    * construction: every construct (char classes, bounded repetition,
    * non-capturing groups, \b) means the same thing to Java regex and RE2,
    * so an independent SQL engine reproduces the redaction exactly.
    */
  val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PiiIpv4 = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PiiPhone = "\\b[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\\b"

  /** PII redaction (emails → `<EMAIL>`, IPv4 → `<IP>`, phones → `<PHONE>`)
    * plus per-class match counts. Pure codegen regexp chain — zero shuffle,
    * scales with scan parallelism. Replacement order is email → ip → phone
    * and counts are taken at the same point in that chain the replacement
    * runs, so counts always equal replacements even if a later pattern
    * could overlap an earlier one's match. Idempotent: the placeholder
    * tokens contain no pattern characters.
    */
  def piiRedact(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t0 = coalesce(col(textCol), lit(""))
    val t1 = regexp_replace(t0, PiiEmail, "<EMAIL>")
    val t2 = regexp_replace(t1, PiiIpv4, "<IP>")
    val t3 = regexp_replace(t2, PiiPhone, "<PHONE>")
    df.withColumn("n_emails", regexp_count(t0, lit(PiiEmail)).cast("long"))
      .withColumn("n_ips", regexp_count(t1, lit(PiiIpv4)).cast("long"))
      .withColumn("n_phones", regexp_count(t2, lit(PiiPhone)).cast("long"))
      .withColumn("text_redacted", t3)
  }

  /** RefinedWeb-style URL filter: host extraction + blocklist-domain
    * verdict + soft keyword score, as one codegen column battery.
    *
    *  - `host`: lowercased authority without port or userinfo;
    *  - `domain_blocked`: host equals a blocked domain or is a subdomain
    *    of one (suffix match on ".domain" — the registered-domain rule);
    *  - `kw_hits`: how many blocked keywords occur in the lowercased URL
    *    (RefinedWeb scores softly rather than hard-matching);
    *  - `pass`: not blocked and zero keyword hits.
    *
    * The Seq-based form compiles the blocklist into the plan (right for
    * curated lists up to ~10^4 entries); `urlFilterTable` joins a
    * DataFrame blocklist for the millions-of-domains case.
    */
  def urlFilter(df: DataFrame, urlCol: String, blockedDomains: Seq[String],
      blockedKeywords: Seq[String]): DataFrame = {
    val host = hostOf(col(urlCol))
    val blocked = blockedDomains.map(_.toLowerCase)
      .foldLeft(lit(false)) { (acc, d) =>
        acc || host === d || host.endsWith("." + d)
      }
    val kwHits =
      if (blockedKeywords.isEmpty) lit(0L)
      else size(filter(
        lit(blockedKeywords.map(_.toLowerCase).toArray),
        k => contains(lower(col(urlCol)), k))).cast("long")
    df.withColumn("host", host)
      .withColumn("domain_blocked", when(blocked, lit(1)).otherwise(lit(0)))
      .withColumn("kw_hits", kwHits)
      .withColumn("pass",
        when(!blocked && kwHits === 0, lit(1)).otherwise(lit(0)))
  }

  /** Millions-of-domains variant: the blocklist is a table with a `domain`
    * column; the verdict joins on the EXACT host plus every parent domain
    * (a host `a.b.example.com` probes `a.b.example.com`, `b.example.com`,
    * `example.com` — bounded by the host's label count), so the semantics
    * match `urlFilter`'s suffix rule. The probe side explodes to a few
    * rows per doc and the blocklist side stays as-is: Catalyst broadcasts
    * it while it fits and falls back to a shuffle join beyond that — no
    * driver-side list ever materializes.
    */
  def urlFilterTable(df: DataFrame, urlCol: String, blocklist: DataFrame,
      blockedKeywords: Seq[String]): DataFrame = {
    val host = hostOf(col(urlCol))
    val spark = df.sparkSession
    import spark.implicits._
    val withHost = df.withColumn("host", host)
    // parent-domain candidates: the host itself plus EVERY dot-suffix,
    // including the last label (a single-label blocklist domain must catch
    // its subdomains exactly like urlFilter's endsWith rule). split keeps
    // trailing empties (-1) so a trailing-dot FQDN "a.b.com." yields
    // candidates "a.b.com."/"b.com."/"com."/"" — never the undotted
    // "b.com", matching the literal variant, which does not block it.
    val suffixes = withHost.select(col("host"))
      .where(col("host") =!= "").distinct()
      .as[String]
      .flatMap { h =>
        val parts = h.split("\\.", -1)
        parts.indices.map(i => (h, parts.drop(i).mkString(".")))
      }
      .toDF("host", "candidate")
    val blockedHosts = suffixes
      .join(blocklist.select(lower(col("domain")).as("candidate")), "candidate")
      .select(col("host")).distinct()
      .withColumn("domain_blocked", lit(1))
    val kwHits =
      if (blockedKeywords.isEmpty) lit(0L)
      else size(filter(
        lit(blockedKeywords.map(_.toLowerCase).toArray),
        k => contains(lower(col(urlCol)), k))).cast("long")
    withHost.join(blockedHosts, Seq("host"), "left")
      .withColumn("domain_blocked", coalesce(col("domain_blocked"), lit(0)))
      .withColumn("kw_hits", kwHits)
      .withColumn("pass",
        when(col("domain_blocked") === 0 && kwHits === 0, lit(1)).otherwise(lit(0)))
  }

  /** Lowercased host of a URL: authority up to the first `/`, `?` or `#`,
    * minus userinfo and port. Scheme-relative (`//host/...` — common in
    * crawled markup) and bare URLs work too. */
  private def hostOf(url: Column): Column = {
    val noScheme = regexp_replace(trim(url), "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // scheme-relative: a leading "//" would otherwise make the authority
    // extract match zero chars and return "" — a blocklist bypass
    val rest = regexp_replace(noScheme, "^//", "")
    val auth = lower(regexp_extract(rest, "^([^/?#]*)", 1))
    regexp_replace(regexp_replace(auth, "^[^@]*@", ""), ":[0-9]+$", "")
  }

  /** Deterministic train/val/test split assignment, content-stable: the
    * bucket is the first 4 hex chars of md5(key) COMPARED AS STRINGS
    * against hex thresholds — lowercase hex sorts lexicographically like
    * the number it encodes (fixed width, one case), so the contract is
    * engine-exact in any SQL dialect with md5: split is a pure function of
    * the key, independent of partitioning, row order, engine, or corpus
    * growth (a doc keeps its split forever as the corpus evolves — the
    * property row_number()-based splits lack). 4 hex chars = 65,536
    * buckets → rates land within 1/65536 of the request.
    */
  def splitAssign(df: DataFrame, keyCol: String,
      valFrac: Double = 0.01, testFrac: Double = 0.01): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0,
      s"fractions must be non-negative and sum <= 1, got $valFrac/$testFrac")
    // a fraction that rounds to 65536 would encode as the 5-char "10000",
    // breaking the fixed-width comparison ("8000" < "10000" is FALSE
    // lexicographically); "g" sorts above every hex char, so it is the
    // exact all-buckets-below sentinel
    def thr(f: Double): String = {
      val t = math.round(f * 65536).toInt
      if (t >= 65536) "g" else f"$t%04x"
    }
    val valThr = thr(valFrac)
    val valTestThr = thr(valFrac + testFrac)
    val bucket = substring(md5(col(keyCol).cast("string")), 1, 4)
    df.withColumn("bucket_hex", bucket)
      .withColumn("split",
        when(bucket < valThr, lit("val"))
          .when(bucket < valTestThr, lit("test"))
          .otherwise(lit("train")))
  }

  /** Gopher-rule stopwords (Rae et al. 2021, Appendix A1.1). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style quality rule battery (Rae et al. 2021 "Scaling Language
    * Models: ... Gopher", Appendix A1.1 — public filter rules): per-doc
    * metrics plus the composite keep verdict. All ratios are
    * floor(1000×ratio) integers so the contract is engine-exact, and all
    * metrics are computed with built-in array/higher-order functions
    * (codegen, no UDF fence) except the top-bigram count, which is an
    * explode + two-level aggregate — per-doc array ops would be O(len²)
    * on long docs, while the explode shuffles exactly the bigram postings
    * (the same volume the shingling stages already move at scale).
    *
    * Rules enforced (thresholds are the published ones where applicable):
    * 50 ≤ n_words ≤ 100000; mean word length in [3, 10]; ≥ 80% of words
    * contain a letter; ≥ 2 DISTINCT stop words present (the usual A1.1
    * reading — `stop_hits`, total occurrences, ships alongside as a
    * diagnostic but a doc containing only "the the" no longer passes);
    * duplicate-line fraction ≤ 30%; top-bigram token coverage
    * (2·count/n_words upper bound) ≤ 20%.
    */
  def gopherQuality(docs: DataFrame): DataFrame = {
    val words = wsWords(col("text"))
    val lines = wsParts(col("text"), "\n")
    val base = docs.select(col("doc_id"), words.as("words"), lines.as("lines"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("sum_word_len",
        coalesce(aggregate(col("words"), lit(0L), (acc, w) => acc + length(w)), lit(0L)))
      .withColumn("n_alpha",
        size(filter(col("words"), w => w.rlike("[A-Za-z]"))).cast("long"))
      .withColumn("stop_hits",
        size(filter(col("words"), w => lower(w).isin(GopherStopwords: _*))).cast("long"))
      // array_intersect dedups: distinct stop words PRESENT, not occurrences
      .withColumn("stop_distinct",
        size(array_intersect(transform(col("words"), w => lower(w)),
          lit(GopherStopwords.toArray))).cast("long"))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_dup_lines",
        (size(col("lines")) - size(array_distinct(col("lines")))).cast("long"))
      .withColumn("bigrams",
        when(size(col("words")) >= 2,
          zip_with(
            slice(col("words"), lit(1), size(col("words")) - 1),
            slice(col("words"), lit(2), size(col("words")) - 1),
            (a, b) => concat_ws(" ", a, b)))
          .otherwise(array().cast("array<string>")))

    val topBigram = base
      .select(col("doc_id"), explode(col("bigrams")).as("bg"))
      .groupBy("doc_id", "bg").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("top_bigram_count"))

    // join only the scalar counters — carrying the words/lines/bigrams
    // arrays through the doc_id exchange would shuffle ~4x the corpus text
    val metrics = base.select(col("doc_id"), col("n_words"), col("sum_word_len"),
      col("n_alpha"), col("stop_hits"), col("stop_distinct"), col("n_lines"),
      col("n_dup_lines"))
    metrics.join(topBigram, Seq("doc_id"), "left")
      .withColumn("top_bigram_count", coalesce(col("top_bigram_count"), lit(0L)))
      .withColumn("mean_word_len_x1000",
        when(col("n_words") > 0, expr("(1000 * sum_word_len) div n_words")).otherwise(lit(0L)))
      .withColumn("alpha_ratio_x1000",
        when(col("n_words") > 0, expr("(1000 * n_alpha) div n_words")).otherwise(lit(0L)))
      .withColumn("dup_line_frac_x1000",
        when(col("n_lines") > 0, expr("(1000 * n_dup_lines) div n_lines")).otherwise(lit(0L)))
      .withColumn("top_bigram_frac_x1000",
        when(col("n_words") > 0,
          least(lit(1000L), expr("(2000 * top_bigram_count) div n_words"))).otherwise(lit(0L)))
      .select(col("doc_id"), col("n_words"), col("mean_word_len_x1000"),
        col("alpha_ratio_x1000"), col("stop_hits"), col("stop_distinct"),
        col("dup_line_frac_x1000"), col("top_bigram_frac_x1000"),
        when(col("n_words").between(50L, 100000L) &&
          col("mean_word_len_x1000").between(3000L, 10000L) &&
          col("alpha_ratio_x1000") >= 800L &&
          col("stop_distinct") >= 2L &&
          col("dup_line_frac_x1000") <= 300L &&
          col("top_bigram_frac_x1000") <= 200L, lit(1)).otherwise(lit(0)).as("pass"))
  }

  /** C4 cleaning battery (Raffel et al. 2020 §2.2 — the public C4 rules),
    * as line-level filtering plus page-level verdicts in one codegen
    * column battery (array HOFs, no UDF, no shuffle):
    *
    *  - a LINE is kept iff it ends in terminal punctuation (`.!?"`), has
    *    ≥ 5 words, and does not contain "javascript" (case-insensitive);
    *  - `text_clean` re-joins kept lines with single newlines;
    *  - page verdicts: `n_sentences` (terminal punctuation marks in kept
    *    lines — the standard cheap sentence proxy, documented), `has_
    *    lorem_ipsum`, `has_curly_brace` (code marker), `has_bad_word`
    *    (TOKEN match of the lowercased word stream against the list — C4
    *    matches its public blocklist at word level);
    *  - `pass` = ≥ 3 sentences, no lorem ipsum, no `{`, no bad word.
    *
    * C4's three-sentence-span dedup is deliberately NOT here — it is a
    * corpus-level operator this engine already provides better via
    * `SpanDedup.removeDuplicateSpans` / `DedupOps.paragraphDedup`.
    */
  def c4Rules(docs: DataFrame, badWords: Seq[String] = Nil): DataFrame = {
    val lines = wsParts(col("text"), "\n")
    val kept = filter(lines, l =>
      l.rlike("[.!?\"]$") &&
        size(split(l, "\\s+")) >= 5 &&
        !contains(lower(l), lit("javascript")))
    val nSentences = coalesce(
      aggregate(kept, lit(0L),
        (acc, l) => acc + (length(l) - length(regexp_replace(l, "[.!?]", "")))),
      lit(0L))
    // boundary-normalized token match: strip leading/trailing non-
    // alphanumerics before comparing, so the sentence-final "badword." and
    // the shouted "badword!" both match — the \W-boundary behavior of C4's
    // published regex, without a per-blocklist-entry regex
    val hasBad =
      if (badWords.isEmpty) lit(0)
      else when(arrays_overlap(
        transform(wsWords(col("text")),
          w => regexp_replace(lower(w), "^[^a-z0-9]+|[^a-z0-9]+$", "")),
        lit(badWords.map(_.toLowerCase).toArray)), lit(1)).otherwise(lit(0))
    docs.select(col("doc_id"), lines.as("lines"), kept.as("kept"),
        nSentences.as("n_sentences"), hasBad.as("has_bad_word"),
        when(contains(lower(col("text")), lit("lorem ipsum")), lit(1)).otherwise(lit(0))
          .as("has_lorem_ipsum"),
        when(contains(col("text"), lit("{")), lit(1)).otherwise(lit(0))
          .as("has_curly_brace"))
      .select(col("doc_id"),
        array_join(col("kept"), "\n").as("text_clean"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept_lines"),
        col("n_sentences"), col("has_lorem_ipsum"), col("has_curly_brace"),
        col("has_bad_word"),
        when(col("n_sentences") >= 3 && col("has_lorem_ipsum") === 0 &&
          col("has_curly_brace") === 0 && col("has_bad_word") === 0, lit(1))
          .otherwise(lit(0)).as("pass"))
  }

  /** The FULL Gopher repetition-signal battery (Rae et al. 2021, Table A1
    * — the companion to the A1.1 quality rules in `gopherQuality`): per-doc
    * duplicate line/paragraph fractions, duplicate line/paragraph CHARACTER
    * fractions, top-{2,3,4}-gram character fractions and duplicate-
    * {5..10}-gram character fractions, plus the composite keep verdict at
    * the published thresholds (0.30/0.30/0.20/0.20 · 0.20/0.18/0.16 ·
    * 0.15/0.14/0.13/0.12/0.11/0.10).
    *
    * Conventions (documented because the paper leaves them open; each is a
    * widely-used public reading and all are engine-exact):
    *  - "duplicates" = occurrences beyond the first of an identical
    *    line/paragraph (n − n_distinct), and their char fraction divides by
    *    the total chars of all lines/paragraphs;
    *  - the top n-gram is the most frequent one, ties broken toward the
    *    LONGEST (only count x char-length feeds the metric, so equal-length
    *    ties cannot affect the output);
    *  - duplicate-n-gram char fractions count every occurrence of grams
    *    appearing more than once (count x gram length — the RedPajama-v2
    *    convention, overlaps not position-deduplicated), capped at 1.0;
    *  - n-gram char lengths and the denominator live in the single-space-
    *    joined word stream (sum of word lengths + n_words − 1), making the
    *    fractions independent of raw whitespace runs.
    * All ratios ship as floor(1000 x ratio) integers.
    *
    * Plan shape: one projection builds every n-gram for n=2..10 in a single
    * pass (flatten over a nested HOF — no UDF), ONE explode ships the gram
    * postings (≈9 rows per word, the same volume class the shingling stages
    * move), and two scalar aggregates come back; line/paragraph metrics are
    * pure array expressions that never leave the scan.
    */
  def repetitionSignals(docs: DataFrame): DataFrame = {
    val words = wsWords(col("text"))
    def charSum(a: Column) = coalesce(aggregate(a, lit(0L), (acc, x) => acc + length(x)), lit(0L))

    val base = docs.select(col("doc_id"), words.as("words"),
        wsParts(col("text"), "\n").as("lines"),
        wsParts(col("text"), "\n{2,}").as("paras"))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("sum_word_len", charSum(col("words")))
      .withColumn("n_lines", size(col("lines")).cast("long"))
      .withColumn("n_dup_lines",
        (size(col("lines")) - size(array_distinct(col("lines")))).cast("long"))
      .withColumn("line_chars", charSum(col("lines")))
      .withColumn("dup_line_chars", charSum(col("lines")) - charSum(array_distinct(col("lines"))))
      .withColumn("n_paras", size(col("paras")).cast("long"))
      .withColumn("n_dup_paras",
        (size(col("paras")) - size(array_distinct(col("paras")))).cast("long"))
      .withColumn("para_chars", charSum(col("paras")))
      .withColumn("dup_para_chars", charSum(col("paras")) - charSum(array_distinct(col("paras"))))

    // every n-gram for n = 2..10 in ONE projection: flatten over a nested
    // higher-order transform (outer over n, inner over window starts)
    val allGrams = flatten(transform(sequence(lit(2), lit(10)), n =>
      when(size(col("words")) >= n,
        transform(sequence(lit(1), size(col("words")) - n + 1),
          i => struct(n.as("n"), array_join(slice(col("words"), i, n), " ").as("gram"))))
        .otherwise(array().cast("array<struct<n:int,gram:string>>"))))

    val gramCounts = base.select(col("doc_id"), explode(allGrams).as("g"))
      .select(col("doc_id"), col("g.n").as("n"), col("g.gram").as("gram"),
        length(col("g.gram")).cast("long").as("glen"))
      .groupBy("doc_id", "n", "glen", "gram")
      .agg(count(lit(1)).as("c"))

    val perN = gramCounts.groupBy("doc_id", "n").agg(
      // max by (count, gram length): only c x glen feeds the metric, so
      // the remaining tie (same count AND length) cannot change the output
      max(struct(col("c"), col("glen"))).as("top"),
      sum(when(col("c") > 1, col("c") * col("glen")).otherwise(lit(0L))).as("dupchars"))
    val pivotCols = Seq(2, 3, 4).map(n =>
      max(when(col("n") === n, col("top.c") * col("top.glen"))).as(s"top${n}chars")) ++
      (5 to 10).map(n =>
        max(when(col("n") === n, col("dupchars"))).as(s"dup${n}chars"))
    val pivoted = perN.groupBy("doc_id").agg(pivotCols.head, pivotCols.tail: _*)

    def frac1000(num: Column, den: Column): Column =
      when(den > 0, least(lit(1000L), floor(lit(1000L) * num / den).cast("long"))).otherwise(lit(0L))

    val joinedLen = when(col("n_words") > 0, col("sum_word_len") + col("n_words") - 1).otherwise(lit(0L))
    val withGrams = base.select("doc_id", "n_words", "sum_word_len",
        "n_lines", "n_dup_lines", "line_chars", "dup_line_chars",
        "n_paras", "n_dup_paras", "para_chars", "dup_para_chars")
      .join(pivoted, Seq("doc_id"), "left")

    val metricCols = Seq(
      frac1000(col("n_dup_lines"), col("n_lines")).as("dup_line_frac_x1000"),
      frac1000(col("n_dup_paras"), col("n_paras")).as("dup_para_frac_x1000"),
      frac1000(col("dup_line_chars"), col("line_chars")).as("dup_line_char_frac_x1000"),
      frac1000(col("dup_para_chars"), col("para_chars")).as("dup_para_char_frac_x1000")) ++
      Seq(2, 3, 4).map(n =>
        frac1000(coalesce(col(s"top${n}chars"), lit(0L)), joinedLen).as(s"top_${n}gram_char_frac_x1000")) ++
      (5 to 10).map(n =>
        frac1000(coalesce(col(s"dup${n}chars"), lit(0L)), joinedLen).as(s"dup_${n}gram_char_frac_x1000"))

    val thresholds = Seq(
      "dup_line_frac_x1000" -> 300L, "dup_para_frac_x1000" -> 300L,
      "dup_line_char_frac_x1000" -> 200L, "dup_para_char_frac_x1000" -> 200L,
      "top_2gram_char_frac_x1000" -> 200L, "top_3gram_char_frac_x1000" -> 180L,
      "top_4gram_char_frac_x1000" -> 160L,
      "dup_5gram_char_frac_x1000" -> 150L, "dup_6gram_char_frac_x1000" -> 140L,
      "dup_7gram_char_frac_x1000" -> 130L, "dup_8gram_char_frac_x1000" -> 120L,
      "dup_9gram_char_frac_x1000" -> 110L, "dup_10gram_char_frac_x1000" -> 100L)

    val projected = withGrams.select(col("doc_id") +: metricCols: _*)
    projected.withColumn("pass",
      when(thresholds.map { case (c, t) => col(c) <= t }.reduce(_ && _), lit(1))
        .otherwise(lit(0)))
  }
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
