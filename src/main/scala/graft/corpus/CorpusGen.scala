package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.sql.Timestamp

/** Deterministic synthetic Common-Crawl-style corpus with known dup clusters
  * (BASELINE input_hint shape: url, warc_ts, html, text, lang — plus golden
  * columns cluster_gold/mutation used only by tests/bench, never by the
  * pipeline).
  *
  * Structure per cluster c of size m: one base document, m-1 near-duplicate
  * members produced by token-level mutation at ≤3% (LSH-detectable under the
  * reference config: 64×8-bit signature, bands {4:20}, ≥2 band matches,
  * threshold 50), a fraction of members being byte-identical (exact-dup
  * channel), singleton documents as negatives, plus degenerate rows (empty
  * text, shared boilerplate paragraph) to exercise skew handling.
  *
  * All randomness is java.util.Random seeded per (seed, cluster, member) —
  * splittable, order-independent, reproducible across JVMs.
  */
object CorpusGen {

  final case class Doc(
      url: String,
      warc_ts: Timestamp,
      html: Array[Byte],
      text: String,
      lang: String,
      cluster_gold: Long,
      is_dup_member: Boolean)

  /** Sizing derived from a scale factor: sf=0.01 → ~2k docs. */
  def params(sf: Double): (Int, Int) = {
    val clusters = math.max(20, (sf * 20000).toInt) // avg cluster size ~5
    val singletons = math.max(20, (sf * 10000).toInt)
    (clusters, singletons)
  }

  def generate(spark: SparkSession, sf: Double, seed: Long = 42L): DataFrame = {
    import spark.implicits._
    val (numClusters, numSingletons) = params(sf)
    val parallelism = spark.sparkContext.defaultParallelism
    // distribute cluster generation across the cluster: one task per slice of
    // cluster ids; each doc derives all content from its own seeded RNG
    val clusterIds = spark.range(0, numClusters, 1, parallelism)
    val clustered = clusterIds.flatMap { c => clusterDocs(seed, c) }
    val singletonIds = spark.range(0, numSingletons, 1, parallelism)
    val singles = singletonIds.map { s => singletonDoc(seed, s, numClusters) }
    // two mega-clusters of byte-identical boilerplate pages (the FIXTURES.md
    // skew case: a verbatim-dup group far larger than any band-group cap —
    // must flow through the exact channel, never the quadratic LSH path)
    val megaSize = math.max(50, (sf * 2000).toInt)
    val mega = spark.range(0, 2L * megaSize, 1, parallelism).map { i =>
      val m = i / megaSize // mega cluster 0 or 1
      val idx = i % megaSize
      val rng = new java.util.Random(seed * 555557L + m)
      val text = render(genBaseDoc(rng, 2000000L + m))
      val clusterId = 2000000L + numClusters + m
      Doc(s"https://mega-$m.example.com/copy-$idx",
        new java.sql.Timestamp(1700000000000L + i * 1000L),
        toHtml(text, s"mega-$m").getBytes("UTF-8"), text, "en", clusterId, true)
    }
    clustered.union(singles).union(mega).toDF()
  }

  /** Cluster size: 60% size 2-4, 30% size 5-8, 10% size 9-24 (skewed tail). */
  private def clusterSize(rng: java.util.Random): Int = {
    val p = rng.nextDouble()
    if (p < 0.6) 2 + rng.nextInt(3)
    else if (p < 0.9) 5 + rng.nextInt(4)
    else 9 + rng.nextInt(16)
  }

  def clusterDocs(seed: Long, c: Long): Seq[Doc] = {
    val rng = new java.util.Random(seed * 1000003L + c)
    val size = clusterSize(rng)
    val baseTokens = genBaseDoc(rng, c)
    (0 until size).map { m =>
      val mrng = new java.util.Random(seed * 7777777L + c * 131L + m)
      val tokens =
        if (m == 0) baseTokens
        else if (mrng.nextDouble() < 0.25) baseTokens // exact duplicate member
        else mutate(baseTokens, mrng, rate = 0.03)
      val text = render(tokens)
      val url = s"https://cluster-$c.example.org/doc-$m"
      mkDoc(url, text, c, lang = "en", isDup = true, tsSeed = c * 131L + m)
    }
  }

  def singletonDoc(seed: Long, s: Long, numClusters: Long): Doc = {
    val rng = new java.util.Random(seed * 424243L + s)
    val clusterId = numClusters + s
    if (s % 37 == 0) {
      // degenerate: empty/near-empty doc (sentinel-shingle path, skew test)
      val text = if (s % 74 == 0) "" else "ok"
      mkDoc(s"https://singleton-$s.example.net/", text, clusterId, "en", isDup = false, tsSeed = s)
    } else {
      val tokens = genBaseDoc(rng, 1000000L + s)
      val withBoiler =
        if (s % 5 == 0) Vector(Boilerplate) ++ tokens // hot shared paragraph
        else tokens
      val lang = if (s % 11 == 0) "de" else "en"
      mkDoc(s"https://singleton-$s.example.net/page", render(withBoiler), clusterId, lang, isDup = false, tsSeed = s)
    }
  }

  private val Boilerplate: Vector[String] = Vector(
    "copyright", "notice", "all", "rights", "reserved", "terms", "of",
    "service", "privacy", "policy", "contact", "us", "subscribe", "to",
    "our", "newsletter", "follow", "on", "social", "media")

  /** Base doc: 2-5 paragraphs × 20-80 tokens from a cluster-local vocab mixed
    * with a global zipfian common vocab.
    */
  private def genBaseDoc(rng: java.util.Random, tag: Long): Vector[Vector[String]] = {
    val nPara = 2 + rng.nextInt(4)
    Vector.fill(nPara) {
      val n = 20 + rng.nextInt(61)
      Vector.fill(n)(genToken(rng, tag))
    }
  }

  private val Common = Vector("the", "and", "for", "with", "from", "that",
    "this", "page", "site", "new", "more", "time", "year", "people", "world",
    "data", "report", "news", "about", "into")

  /** Letter-encode an int (content words must be alphabetic: the extractor's
    * token normalizer wildcards digit runs, so digit-bearing synthetic words
    * would all collapse to one token and degenerate the corpus).
    */
  private def letters(n: Long): String = {
    var v = math.abs(n)
    val sb = new StringBuilder
    do { sb += ('a' + (v % 26)).toChar; v /= 26 } while (v > 0)
    sb.toString
  }

  private def genToken(rng: java.util.Random, tag: Long): String = {
    val p = rng.nextDouble()
    if (p < 0.35) Common(rng.nextInt(Common.length))
    else if (p < 0.40) (1 + rng.nextInt(2000)).toString // numbers
    else s"${letters(tag)}q${letters(rng.nextInt(4000))}" // cluster-local content words
  }

  /** Token-level mutation at the given rate (substitute/delete/duplicate). */
  private def mutate(paras: Vector[Vector[String]], rng: java.util.Random, rate: Double): Vector[Vector[String]] =
    paras.map { toks =>
      toks.flatMap { t =>
        val p = rng.nextDouble()
        if (p < rate * 0.5) Vector.empty // delete
        else if (p < rate) Vector(s"mut${letters(rng.nextInt(100000))}") // substitute
        else if (p < rate * 1.2) Vector(t, t) // duplicate
        else Vector(t)
      }
    }

  private def render(paras: Vector[Vector[String]]): String =
    paras.map(_.mkString(" ")).mkString("\n\n")

  /** html wraps the text so TextNorm.extract(html) == text byte-identically. */
  def toHtml(text: String, title: String): String = {
    val body = graft.kernel.TextNorm.paragraphs(text)
      .map(p => s"  <p>${escapeHtml(p)}</p>")
      .mkString("\n")
    s"<html><head><title>${escapeHtml(title)}</title>" +
      "<script>var analytics = 'ignored';</script></head>\n<body>\n" +
      body + "\n</body></html>"
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def mkDoc(url: String, text: String, cluster: Long, lang: String,
      isDup: Boolean, tsSeed: Long): Doc = {
    val ts = new Timestamp(1700000000000L + (tsSeed % 100000L) * 60000L)
    Doc(url, ts, toHtml(text, url).getBytes("UTF-8"), text, lang, cluster, isDup)
  }

  /** Generate and persist as parquet (the local stand-in for the Iceberg
    * input table), partitioned for downstream parallel scans.
    */
  def writeCorpus(spark: SparkSession, sf: Double, path: String, seed: Long = 42L): Unit = {
    generate(spark, sf, seed).write.mode("overwrite").parquet(path)
  }
}
