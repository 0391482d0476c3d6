package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction
import graft.kernel._
import graft.hash.SimHash
import graft.cluster.ConnectedComponents
import graft.ledger.Ledger

/** End-to-end near-duplicate detection + clustering over a Common-Crawl-style
  * table (url, warc_ts, html, text, lang) — the Spark-native rebuild of the
  * reference's match pipeline (/root/reference/mcrit/matchers/MatcherInterface.py:150-236):
  *
  *   extract → shingle → MinHash(64×8-bit segmented) + SimHash64 →
  *   exact-hash channel (pichash analog, implies-match pruning) →
  *   LSH band explode {4:20} → skew-aware candidate generation (group caps,
  *   map-side partial counts, AQE skew join) → signature verification
  *   (positional equality > 50) [+ exact k-gram Jaccard] →
  *   large-star/small-star connected components → (url, cluster_id).
  *
  * Scale design notes (100 TB / 10^12 docs):
  *  - One typed mapPartitions computes signature+simhash+exact hash per doc;
  *    everything downstream is DataFrame/Catalyst (pruned, codegen'd).
  *  - Exact-dup docs collapse to one representative BEFORE banding
  *    (≅ PICHASH_IMPLIES_MINHASH_MATCH, MinHashConfig.py:35) — verbatim dups
  *    (a large share of web text) never enter the quadratic path.
  *  - Candidate generation: per-(band_id, band_hash) groups; group sizes are
  *    counted with a partial-aggregating groupBy (hot keys combine map-side),
  *    groups above `maxBandGroupSize` are dropped as stop-bands (boilerplate
  *    collisions would be quadratic; other bands + the exact channel keep
  *    recall), remaining pairs emitted via sorted-group flatMap.
  *  - Verification joins pick broadcast vs sort-merge via Catalyst/AQE stats.
  */
final case class PipelineOptions(
    maxBandGroupSize: Int = 500,
    simHashChannel: Boolean = true,
    // the banding below GUARANTEES this radius (chunk tables are derived
    // from it): maxHamming+2 blocks, all C(blocks,2) chunk-pair tables.
    // Default 2, the widest radius whose ~32-bit keys keep average bucket
    // size under the stop-band cap at the 10^12-doc design point (radius 3
    // needs 5 blocks → ~25.6-bit keys → every bucket over cap at 10^12;
    // settable for smaller corpora, and hamming-3 near-identicals are
    // covered by the MinHash channel regardless)
    simHashMaxHamming: Int = 2,
    // simhash-rescued pairs (hamming ≤ max but minhash score ≤ threshold)
    // must still clear this signature-score floor — guards precision when a
    // corpus is boilerplate-heavy and simhash bit-majorities collapse
    simHashScoreFloor: Double = 30.0,
    jaccardVerify: Boolean = false,
    jaccardThreshold: Double = 0.3,
    // detect+repair 64-bit doc_id birthday collisions (≈27k expected at the
    // 10^12-doc design point) — one cheap partial-aggregated count shuffle
    auditIds: Boolean = true,
    // opt-in EXACT two-phase heavy-hitter exclusion before the candidate
    // shuffle: catches over-cap band keys whose postings are spread so thin
    // that no single map partition proves them hot. Mega-hot bands
    // (provably over cap within one partition) are ALWAYS auto-excluded,
    // flag or not — see pairsFromBands' provably-hot pass.
    hotBandPrefilter: Boolean = false,
    numPartitions: Int = 0 // 0 = leave to session default
)

/** Per-doc computed features (one row per input url). The exact-dup identity
  * is 128-bit (exact_hash, exact_hash2): a single 64-bit content hash at the
  * 10^12-doc design scale expects ~27k birthday collisions = silent false
  * exact merges. doc_id stays a 64-bit join/shuffle key (narrow hot-path
  * rows); its collisions are repaired by `resolveIdCollisions`.
  */
final case class DocSig(
    doc_id: Long,
    url: String,
    n_tokens: Int,
    hashable: Boolean,
    exact_hash: Long,
    exact_hash2: Long,
    has_exact: Boolean,
    sig: Array[Byte],
    simhash: Long)

object DocSig {
  /** Per-executor signature kernel: generates each shingle set once, hashes
    * it once, and feeds the same hashed k-gram set to BOTH the MinHash
    * signature and the SimHash channel (the naive form re-shingled the doc
    * twice — measured ~35% of the dominant stage).
    */
  final class Kernel(c: GraftConfig) extends Serializable {
    private val hasher = new MinHasher(c)
    private val kgram = new KGramShingler(c, 1)
    private val fuzzy = new FuzzyStatShingler(c, 1)
    private val HashMax = 0xffffffffL

    private var normScratch = new Array[Byte](1024)

    /** UTF-8 bytes of `paraTokens.map(_.mkString(" ")).mkString("\n")`
      * assembled directly from token bytes into a reusable scratch (UTF-8
      * is concatenative per code point, and ' '/'\n' are single-byte) —
      * the exact-hash path otherwise materializes the full normalized
      * String and converts it to bytes TWICE (once per hash seed pair).
      * Returns the byte length in scratch.
      */
    private def normalizedBytes(paraTokens: Array[Array[String]]): Int = {
      var total = if (paraTokens.length > 0) paraTokens.length - 1 else 0
      var p = 0
      while (p < paraTokens.length) {
        val toks = paraTokens(p)
        if (toks.length > 0) total += toks.length - 1
        var i = 0
        while (i < toks.length) {
          val t = toks(i)
          // ASCII fast path: tokens are overwhelmingly ASCII post-normalize
          var ascii = true
          var j = 0
          while (ascii && j < t.length) { if (t.charAt(j) >= 0x80) ascii = false; j += 1 }
          total += (if (ascii) t.length
            else t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
          i += 1
        }
        p += 1
      }
      if (normScratch.length < total)
        normScratch = new Array[Byte](math.max(total, normScratch.length * 2))
      var pos = 0
      p = 0
      while (p < paraTokens.length) {
        if (p > 0) { normScratch(pos) = '\n'; pos += 1 }
        val toks = paraTokens(p)
        var i = 0
        while (i < toks.length) {
          if (i > 0) { normScratch(pos) = ' '; pos += 1 }
          val t = toks(i)
          var ascii = true
          var j = 0
          while (ascii && j < t.length) { if (t.charAt(j) >= 0x80) ascii = false; j += 1 }
          if (ascii) {
            j = 0
            while (j < t.length) { normScratch(pos) = t.charAt(j).toByte; pos += 1; j += 1 }
          } else {
            val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
            System.arraycopy(b, 0, normScratch, pos, b.length)
            pos += b.length
          }
          i += 1
        }
        p += 1
      }
      pos
    }

    def compute(url: String, text: String): DocSig = {
      val tok = TextNorm.tokenize(if (text == null) "" else text)
      val n = tok.numTokens
      val hashable = n > c.minTokens
      val docId = SimHash.hash64("doc:" + url)
      val hasExact = n >= c.exactHashMinTokens
      val normLen = if (hasExact) normalizedBytes(tok.paraTokens) else 0
      val exactHash = if (hasExact) SimHash.hash64Bytes(normScratch, normLen) else 0L
      val exactHash2 = if (hasExact) SimHash.hash64bBytes(normScratch, normLen) else 0L
      if (!hashable)
        return DocSig(docId, url, n, hashable = false, exactHash, exactHash2,
          hasExact, Array.emptyByteArray, 0L)
      // one shingling pass, zero per-window allocation (≅ process(seed=0,
      // weights off) incl. the empty→0xFFFFFFFF sentinel)
      val kgHashes = kgram.hashedShingles(tok)
      val fzHashes = fuzzy.process(tok, 0, useWeights = false)(0)
      val sigInts = hasher.signatureFromShingles(
        Map(kgram.name -> kgHashes, fuzzy.name -> fzHashes))
      // hashable docs always have ≥1 token ⇒ ≥1 real k-gram shingle
      val sh = SimHash.ofHashes(kgHashes)
      DocSig(docId, url, n, hashable = true, exactHash, exactHash2, hasExact,
        hasher.pack(sigInts), sh)
    }
  }

  /** Deterministic total order on same-url rows for the S1 key-dedup
    * (compare content fields; the winner is the lexicographically largest —
    * any fixed rule works, it just must not depend on partitioning).
    */
  def rowOrder(a: DocSig, b: DocSig): Int = {
    if (a.exact_hash != b.exact_hash) return java.lang.Long.compare(a.exact_hash, b.exact_hash)
    if (a.exact_hash2 != b.exact_hash2) return java.lang.Long.compare(a.exact_hash2, b.exact_hash2)
    if (a.simhash != b.simhash) return java.lang.Long.compare(a.simhash, b.simhash)
    if (a.n_tokens != b.n_tokens) return Integer.compare(a.n_tokens, b.n_tokens)
    java.util.Arrays.compareUnsigned(a.sig, b.sig)
  }

  /** Deterministic fingerprint of the kernel's OUTPUT behavior under `c`:
    * one fixed probe document signed with the live kernel, hashed. Any
    * change to tokenization, shingling, MinHash, SimHash or exact hashing
    * that alters outputs changes this stamp — persisted-index descriptors
    * fold it in so a kernel change forces a rebuild without a hand-bumped
    * version (see QueryMatch.buildOrLoadIndex).
    */
  def kernelFingerprint(c: GraftConfig): String = {
    val probe =
      """the quick brown fox jumps over the lazy dog while seventeen green
        |bottles hang quietly on the old stone wall near the harbor
        |
        |every kernel change that alters tokenization shingling minhash or
        |simhash output must move this fingerprint to invalidate indexes""".stripMargin
    val d = new Kernel(c).compute("kernel-fingerprint-probe", probe)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(d.sig)
    val buf = java.nio.ByteBuffer.allocate(24)
    buf.putLong(d.simhash).putLong(d.exact_hash).putLong(d.exact_hash2)
    md.update(buf.array())
    md.digest().map("%02x".format(_)).mkString.take(12)
  }
}

final class DedupPipeline(
    spark: SparkSession,
    cfg: GraftConfig = GraftConfig.default,
    opts: PipelineOptions = PipelineOptions(),
    ledger: Option[Ledger] = None) {

  import spark.implicits._

  /** Extraction: html → normalized text (deterministic, byte-stable per url).
    * When `fromHtml` is false the `text` column is trusted as pre-extracted.
    */
  def extractStage(input: DataFrame, fromHtml: Boolean): DataFrame = {
    if (fromHtml) {
      val extractUdf = udf((html: Array[Byte]) => TextNorm.extract(html))
      input.withColumn("text", extractUdf(col("html"))).select("url", "text")
    } else input.select("url", "text")
  }

  /** One typed pass per doc: tokenize, shingle, sign (MinHash + SimHash),
    * exact hash, then S1 key-dedup — re-crawled duplicate urls COLLAPSE to
    * one deterministic row (max over the full row struct; ≅ the reference
    * inserting by sha256 key, MemoryStorage.py:369). Without the collapse a
    * duplicate url ships its doc_id twice into every band group, emitting
    * (x, x) self-pairs and duplicate output rows — `resolveIdCollisions`
    * deliberately skips same-url ids on the premise this stage removed
    * them. One narrow-row shuffle (~100 B/doc), only paid by the batch
    * path (the streaming path dedups in state).
    */
  def signatureStage(docs: DataFrame): Dataset[DocSig] = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val signed = docs.select("url", "text").as[(String, String)].mapPartitions { it =>
      val k = new DocSig.Kernel(bcCfg.value)
      it.map { case (url, text) => k.compute(url, text) }
    }
    signed.groupByKey(_.url).reduceGroups((a, b) => if (DocSig.rowOrder(a, b) >= 0) a else b)
      .map(_._2)
  }

  // ---- exact channel (pichash analog) ---------------------------------

  /** Representative per exact-hash group + member→rep edges, keyed by the
    * 128-bit (exact_hash, exact_hash2) identity.
    * ≅ V6/V7: exact dups match at score 100 and are pruned from the fuzzy
    * path (MatcherInterface.py:137-148,273-308). Feed this the UNFILTERED
    * signature table: docs in the [exactHashMinTokens, minTokens] gap are
    * not minhashable but byte-identical short docs must still exact-dedup.
    */
  def exactGroups(sigs: DataFrame,
      precomputedReps: Option[DataFrame] = None): (DataFrame, DataFrame) = {
    val withExact = sigs.where(col("has_exact"))
    // precomputedReps: callers whose reps table feeds SEVERAL
    // separately-materialized jobs pass a checkpointed/cached copy so the
    // 128-bit groupBy runs once, not once per consuming job
    val reps = precomputedReps.getOrElse(
      withExact.groupBy("exact_hash", "exact_hash2")
        .agg(min("doc_id").as("rep_id"), count(lit(1)).as("group_size")))
    val exactEdges = withExact.select("exact_hash", "exact_hash2", "doc_id")
      .join(reps.select("exact_hash", "exact_hash2", "rep_id"),
        Seq("exact_hash", "exact_hash2"))
      .where(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id").as("src"), col("doc_id").as("dst"))
    (reps, exactEdges)
  }

  /** Detect and deterministically repair doc_id birthday collisions: ids
    * claimed by more than one distinct url are re-keyed with a salted
    * re-hash, iterating until clean (expected 1 round; collision sets are
    * tiny — ~27k at 10^12 docs — so the fix-up join broadcasts). Duplicate
    * input urls are NOT collisions: they collapse by design (S1 dedup by
    * key, ≅ sha256 dedup, MemoryStorage.py:369) and stay untouched.
    */
  def resolveIdCollisions(sigs0: DataFrame, urlUnique: Boolean = false): DataFrame = {
    val rehash = udf((url: String, round: Int) => SimHash.hash64(s"doc:$round:$url"))
    var cur = sigs0
    var round = 1
    var clean = false
    while (!clean && round <= 5) {
      // cheap common path: a pure long-key count shuffle (map-side combined);
      // url disambiguation — duplicate urls collapse by design, only distinct
      // urls on one id are collisions — runs only over the suspicious ids
      val suspicious = cur.groupBy("doc_id").agg(count(lit(1)).as("n"))
        .where(col("n") > 1).select("doc_id")
      // urlUnique: the caller guarantees one row per url (signatureStage's S1
      // reduceGroups output — run()'s case). Then ANY doc_id with >1 row is
      // >1 DISTINCT urls, i.e. a collision, and the disambiguation pass
      // (broadcast build + join + second aggregate — two more chained stage
      // barriers per audit) is provably redundant. Misuse is loud, not
      // silent: duplicate urls rehash to the SAME id every round, so the
      // loop cannot converge and throws below.
      val collided =
        if (urlUnique) suspicious
        else cur.join(broadcast(suspicious), "doc_id")
          .groupBy("doc_id")
          .agg(min("url").as("u_min"), max("url").as("u_max"))
          .where(col("u_min") =!= col("u_max"))
          .select("doc_id")
      if (collided.isEmpty) clean = true
      else {
        cur = cur.join(broadcast(collided.withColumn("_hit", lit(true))), Seq("doc_id"), "left")
          .withColumn("doc_id",
            when(col("_hit"), rehash(col("url"), lit(round))).otherwise(col("doc_id")))
          .drop("_hit")
        round += 1
      }
    }
    if (!clean) throw new IllegalStateException(
      "doc_id collision repair did not converge after 5 rounds")
    cur
  }

  // ---- LSH banding ----------------------------------------------------

  /** Explode band hashes for the representative signatures:
    * (band_id, band_hash, doc_id). ≅ L2/L3 band table
    * (StorageInterface.py:731-746, MongoDbStorage.py:868-895).
    */
  def bandStage(repSigs: DataFrame): DataFrame = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val bandsUdf = udf((sig: Array[Byte]) => {
      val c = bcCfg.value
      val b = new Bands(c)
      val unpacked = new MinHasher(c).unpack(sig)
      b.bandHashes(unpacked)
    })
    repSigs.select(col("doc_id"), posexplode(bandsUdf(col("sig"))).as(Seq("band_id", "band_hash")))
  }

  /** SimHash banding: chunk-pair tables DERIVED from the configured Hamming
    * radius, so the structural guarantee always matches the verify gate:
    * blocks = simHashMaxHamming + 2 equal-ish chunks, one table per
    * C(blocks, 2) chunk pair — ≤ maxHamming flips leave ≥ 2 chunks intact,
    * hence some intact pair (the same derivation `phashDupPairs` uses).
    * At the default radius 2 that is C(4,2)=6 tables of paired 16-bit
    * chunks: single-chunk keys collide randomly at ~n²/2^17 pairs (measured
    * as millions of junk candidates at 300k docs), chunk PAIRS at ~n²/2^33.
    * Raising the radius buys guarantee at the price of key entropy
    * (radius 3 → 5 blocks → ~25.6-bit keys), which the stop-band cap then
    * bounds — see the PipelineOptions note.
    */
  def simhashBandStage(repSigs: DataFrame): DataFrame = {
    val blocks = opts.simHashMaxHamming + 2
    val combosUdf = udf((v: Long) => SimHash.chunkCombos(v, blocks, 2))
    repSigs.select(col("doc_id"),
        posexplode(combosUdf(col("simhash"))).as(Seq("band_id", "band_hash")))
      .select(col("doc_id"),
        (col("band_id") + lit(100)).as("band_id"), // disjoint id space vs minhash bands
        col("band_hash"))
  }

  /** THE rep-only band table recipe — the single definition of what the
    * persisted/probed band table contains: one banded signature per exact
    * group (the min-doc_id representative, V7 exact-implies-match pruning),
    * non-exact hashable docs banded individually, simhash chunk tables
    * unioned when that channel is on. `run()`, the persisted dedup index,
    * the probe fallback and the rename cascade ALL call this — the probe-vs-
    * batch equivalence of incremental mode depends on there being exactly
    * one copy of this invariant. Pass `precomputedReps` when `exactGroups`
    * was already evaluated to avoid a second aggregation.
    */
  def repBandTable(sigs0: DataFrame, precomputedReps: Option[DataFrame] = None): DataFrame = {
    val reps = precomputedReps.getOrElse(exactGroups(sigs0)._1)
    val hashable = sigs0.where(col("hashable"))
    val repSigs = hashable
      .join(reps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(hashable.where(!col("has_exact")))
    val mh = bandStage(repSigs)
    if (opts.simHashChannel) mh.unionByName(simhashBandStage(repSigs)) else mh
  }

  // ---- candidate generation (the load-bearing shuffle) ----------------

  /** Per-band-group pair emission with stop-band capping; pair kept when it
    * collides in ≥ bandMatchesRequired bands (≅ L4,
    * MongoDbStorage.py:897-930 with BAND_MATCHES_REQUIRED=2).
    *
    * Group sizes are bounded by `maxBandGroupSize`: a hotter group is
    * boilerplate-degenerate (cf. the reference's unbounded Mongo
    * function_ids arrays, a non-issue at 10^5 but quadratic death at 10^12)
    * and is dropped; its members still pair through their other 19 bands or
    * the exact channel.
    */
  def candidateStage(bands: DataFrame, bandMatchesRequired: Int): DataFrame =
    DedupPipeline.pairsFromBands(spark, bands, opts.maxBandGroupSize, bandMatchesRequired,
      prefilterHot = opts.hotBandPrefilter)

  // ---- verification ---------------------------------------------------

  /** Join candidates back to signatures and keep pairs above the matching
    * threshold (strict >, ≅ MINHASH_MATCHING_THRESHOLD=50 at
    * MinHasher.py:108-124). Broadcast-vs-SMJ picked by Catalyst/AQE stats.
    */
  def verifyStage(candidates: DataFrame, sigs: DataFrame): DataFrame = {
    val sigCols = sigs.select(col("doc_id"), col("sig"), col("simhash"))
    val joined = candidates
      .join(sigCols.withColumnRenamed("doc_id", "a")
        .withColumnRenamed("sig", "sig_a").withColumnRenamed("simhash", "sh_a"), "a")
      .join(sigCols.withColumnRenamed("doc_id", "b")
        .withColumnRenamed("sig", "sig_b").withColumnRenamed("simhash", "sh_b"), "b")
    // native expressions → the scoring stays inside whole-stage codegen
    // (a Scala UDF here would fence the span around the verify join)
    val scored = joined
      .withColumn("score", graft.expr.SignatureScore.sigScore(col("sig_a"), col("sig_b")))
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("int"))
    // a pair survives via the minhash threshold OR the simhash hamming ball
    val minhashOk = col("score") > lit(cfg.matchingThreshold)
    val simhashOk =
      if (opts.simHashChannel)
        col("hamming") <= lit(opts.simHashMaxHamming) &&
          col("score") > lit(opts.simHashScoreFloor)
      else lit(false)
    scored.where(minhashOk || simhashOk)
      .select(col("a"), col("b"), col("score"), col("hamming"), col("n_bands"))
  }

  /** Optional exact k-gram Jaccard verification for surviving pairs
    * (north_rule upgrade over the reference's signature-only check).
    */
  def jaccardStage(pairs: DataFrame, docs: DataFrame, sigs: DataFrame): DataFrame = {
    val bcCfg = spark.sparkContext.broadcast(cfg)
    val shingleSetUdf = udf((text: String) => {
      val c = bcCfg.value
      val kg = new KGramShingler(c, 1)
      kg.generateSequences(TextNorm.tokenize(text)).distinct.toArray
    })
    val texts = docs.join(sigs.select("doc_id", "url"), "url")
      .select(col("doc_id"), shingleSetUdf(col("text")).as("shingles"))
    val j = pairs
      .join(texts.withColumnRenamed("doc_id", "a").withColumnRenamed("shingles", "sh_set_a"), "a")
      .join(texts.withColumnRenamed("doc_id", "b").withColumnRenamed("shingles", "sh_set_b"), "b")
      .withColumn("jaccard",
        when(size(array_union(col("sh_set_a"), col("sh_set_b"))) === 0, lit(1.0))
          .otherwise(size(array_intersect(col("sh_set_a"), col("sh_set_b"))).cast("double") /
            size(array_union(col("sh_set_a"), col("sh_set_b")))))
    j.where(col("jaccard") >= lit(opts.jaccardThreshold))
      .select("a", "b", "score", "hamming", "n_bands", "jaccard")
  }

  // ---- full run -------------------------------------------------------

  /** Returns (url, doc_id, cluster_id): cluster_id is the min doc_id of the
    * near-duplicate component (singletons cluster with themselves).
    */
  def run(input: DataFrame, fromHtml: Boolean = true): DataFrame = {
    val shuffleN =
      if (opts.numPartitions > 0) opts.numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt

    def runStage(name: String, params: String, upstream: Seq[String])(f: => DataFrame): DataFrame =
      ledger match {
        case Some(l) => l.stage(name, l.descriptor(name, params, upstream))(f)
        case None => f
      }

    val docs = extractStage(input, fromHtml)
    // cache the FULL signature table: it feeds banding, verification and the
    // final assignment join — without this the typed signature pass (the
    // dominant CPU cost) would run twice
    val sigsRaw = runStage("signatures", s"fromHtml=$fromHtml", Nil) {
      signatureStage(docs).toDF()
    }.cache()

    // doc_id collision audit (opts.auditIds). Ledger-less runs OVERLAP the
    // audit action with the pipeline's own materialization (guide §2.6:
    // independent jobs back-fill each other): the audit's verdict is clean
    // for every real corpus (a dirty verdict needs a 64-bit birthday
    // collision), so the pipeline is built OPTIMISTICALLY on the unaudited
    // table while the audit runs concurrently — the block-level cache locks
    // share the signature fill between the two job chains — and only a
    // dirty verdict (checked after the optimistic build materialized)
    // discards that work and rebuilds on the repaired ids. Measured: the
    // serial audit was ~1-1.5 s of the ~10 s bench-corpus run, a full
    // barrier chain that the candidate stage now hides entirely. Ledgered
    // runs keep the sequential audit: stage descriptors are
    // content-independent, so an optimistic "candidates" stage written from
    // unrepaired ids would be served VERBATIM to the rebuild.
    val auditFuture: Option[scala.concurrent.Future[Boolean]] =
      if (opts.auditIds && ledger.isEmpty) {
        import scala.concurrent.ExecutionContext.Implicits.global
        Some(scala.concurrent.Future { hasIdCollisions(sigsRaw) })
      } else None
    val sigs0First =
      if (!opts.auditIds) sigsRaw
      else if (ledger.isDefined) resolveIdCollisions(sigsRaw, urlUnique = true)
      else sigsRaw // optimistic; auditFuture decides below

    // `run()`'s pipeline from an (audited or optimistically-unaudited)
    // signature table to the (url, doc_id, cluster_id) assignment
    def runFromAudited(sigs0: DataFrame): DataFrame = {
    val sigs = sigs0.where(col("hashable"))

    // exact channel over ALL has_exact docs (incl. short non-minhashable ones).
    // reps feeds TWO separately-materialized jobs (the bands/candidates
    // checkpoint and the exact-edges/CC job); a LAZY localCheckpoint makes
    // the first consumer materialize the small rep table once and the
    // second reuse the stored blocks instead of re-running the 128-bit
    // groupBy over the signature cache (guide §1.2: one aggregation, not
    // two; no extra job — eager=false rides the first consumer's action)
    val reps = exactGroups(sigs0)._1.localCheckpoint(eager = false)
    val exactEdges = runStage("exact_edges", "", Seq("signatures")) {
      exactGroups(sigs0, Some(reps))._2
    }

    val bandTable = runStage("bands",
        s"bands=${cfg.bands},sh=${opts.simHashChannel},shmax=${opts.simHashMaxHamming},bandsv=2",
        Seq("signatures")) {
      val all = repBandTable(sigs0, Some(reps))
      // co-locate by band key only when the table is being persisted for
      // probes/resume (TableStore.bandLayout — THE band-table layout
      // contract); in the fused run candidateStage shuffles on the packed
      // band key anyway — an extra exchange here would be pure waste
      if (ledger.isDefined) graft.storage.TableStore.bandLayout(all, shuffleN)
      else all
    }

    val candidates = runStage("candidates",
        s"cap=${opts.maxBandGroupSize},r=${cfg.bandMatchesRequired}", Seq("bands")) {
      candidateStage(bandTable, cfg.bandMatchesRequired)
    }

    val verified0 = verifyStage(candidates, sigs)
    val verified = runStage("verified",
        s"thr=${cfg.matchingThreshold},jac=${opts.jaccardVerify}," +
          s"jthr=${opts.jaccardThreshold},shfloor=${opts.simHashScoreFloor}," +
          s"shmax=${opts.simHashMaxHamming}",
        Seq("candidates")) {
      if (opts.jaccardVerify) jaccardStage(verified0, docs, sigs)
      else verified0.withColumn("jaccard", lit(null).cast("double"))
    }

    val lshEdges = verified.select(col("a").as("src"), col("b").as("dst"))
    val edges = exactEdges.select("src", "dst").unionByName(lshEdges)

    val components = runStage("components", "", Seq("verified")) {
      ConnectedComponents.run(edges.withColumnRenamed("src", "lo").withColumnRenamed("dst", "hi")
        .select(col("lo").as("src"), col("hi").as("dst")))
    }

    // every doc: component if present, else itself
    val allDocs = sigs0.select("url", "doc_id")
    allDocs.join(components.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("component"), col("doc_id")))
      .select("url", "doc_id", "cluster_id")
    }

    val optimistic = runFromAudited(sigs0First)
    auditFuture match {
      case None => optimistic
      case Some(f) =>
        val collided =
          scala.concurrent.Await.result(f, scala.concurrent.duration.Duration.Inf)
        if (!collided) optimistic
        else runFromAudited(resolveIdCollisions(sigsRaw, urlUnique = true))
    }
  }

  /** Any doc_id claimed by more than one row? On url-unique input (S1
    * output) this is exactly "collisions exist" — the gate the optimistic
    * audit overlap in `run()` awaits. */
  private[graft] def hasIdCollisions(sigs: DataFrame): Boolean =
    !sigs.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .where(col("n") > 1).isEmpty

  /** Verified duplicate pairs only (no clustering) — used by tests/bench. */
  def dupPairs(input: DataFrame, fromHtml: Boolean = true): DataFrame = {
    val docs = extractStage(input, fromHtml)
    val sigs0 = signatureStage(docs).toDF().cache()
    // eager cut-over: verified pairs are cap-bounded and small; release the
    // signature cache instead of pinning one per call
    val out = dupPairsFromSigs(sigs0).localCheckpoint(true)
    sigs0.unpersist()
    out
  }

  /** PROBE-ONLY incremental pair production — the scale-correct shape for
    * "a small new batch lands on a 10^12-doc corpus" (≅ the reference's
    * addBinarySample → matchSample flow, which probes ONLY the new sample's
    * band hashes against the stored band index,
    * /root/reference/mcrit/storage/MongoDbStorage.py:897-930; it never
    * re-runs candidate generation over the resident corpus).
    *
    * Output contract (tested batch-equivalent): EXACTLY
    * `dupPairsFromSigs(oldSigs0 ∪ newSigs0)` restricted to pairs touching
    * ≥1 new doc — same caps, same channels, same scores. Candidate work is
    * ∝ the new batch, never the corpus:
    *
    *  - Exact channel: old signatures are probed on the new batch's 128-bit
    *    exact hashes (a broadcast semi-join ≡ point lookups on an
    *    Iceberg bloom/zorder layout); group reps are re-elected over the
    *    touched groups only.
    *  - LSH channel: only NEW reps band. The old band table — passed in
    *    from its persisted form, or derived here with one linear rep-banding
    *    pass over `oldSigs0` when absent — is semi-joined on the new reps'
    *    band keys (broadcast: ~26 keys per new rep), so every candidate
    *    group contains a new doc by construction; the group membership for
    *    a probed key equals the full-batch group (old postings + new reps),
    *    hence stop-band cap and ≥2-band semantics are bit-identical.
    *  - Rep re-election across the old/new boundary (a new doc with a
    *    smaller doc_id joins an old exact group): the replaced old rep's
    *    postings are anti-joined out and the new rep's are emitted fresh —
    *    the signatures are identical (same content), so this is a pure
    *    doc_id rekey, exactly what the full batch would have banded.
    *
    * `oldBands`, when given, must be the rep-only band table of `oldSigs0`
    * under the same cfg/opts (minhash bands plus the simhash chunk tables
    * when `simHashChannel` is on) — i.e. what `run()`'s "bands" ledger stage
    * or `MaintenanceOps.buildOrLoadDedupIndex` persists.
    *
    * Assumes `newSigs0` doc_ids are disjoint from the old corpus (re-sent
    * urls should be excluded first via `MaintenanceOps.newDocs`).
    */
  /** What a probe-style incremental step computes, split out for state
    * maintenance: `candInput` feeds candidate generation; `exactEdges` are
    * the exact-channel pairs touching new docs; `newBands` are the NEW
    * reps' band postings (what a rolling index must append); `replacedReps`
    * are old rep doc_ids whose groups re-elected a new rep (what a rolling
    * index must tombstone so the stored band table stays rep-only).
    */
  final case class ProbeParts(candInput: DataFrame, exactEdges: DataFrame,
      newBands: DataFrame, replacedReps: DataFrame)

  def probeDupPairs(oldSigs0: DataFrame, newSigs0: DataFrame,
      oldBands: Option[DataFrame] = None): DataFrame =
    probeDupPairsFrom(probeParts(oldSigs0, newSigs0, oldBands), oldSigs0, newSigs0)

  /** As `probeDupPairs` over an ALREADY-BUILT `ProbeParts` — callers that
    * also consume the state deltas (DedupJob's rolling mode) must not pay
    * the probe-plan construction (old-side exact-group aggregation, band
    * probe) twice.
    */
  private[graft] def probeDupPairsFrom(parts: ProbeParts,
      oldSigs0: DataFrame, newSigs0: DataFrame): DataFrame = {
    val newIds = newSigs0.select("doc_id")
    val ProbeParts(candInput, exactEdges, _, _) = parts

    // ---- candidate generation over the probed subset only ----
    val candidates = candidateStage(candInput, cfg.bandMatchesRequired)
    val candTouchingNew = candidates
      .join(broadcast(newIds).withColumnRenamed("doc_id", "a"), Seq("a"), "left_semi")
      .unionByName(candidates
        .join(broadcast(newIds).withColumnRenamed("doc_id", "b"), Seq("b"), "left_semi")
        .join(broadcast(newIds).withColumnRenamed("doc_id", "a"), Seq("a"), "left_anti"))

    val allHashable = oldSigs0.where(col("hashable")).unionByName(newSigs0.where(col("hashable")))
    val lsh = verifyStage(candTouchingNew, allHashable)
      .select(col("a").as("src"), col("b").as("dst"), col("score"), col("hamming"))
    DedupPipeline.unionDisjointChannels(lsh, exactEdges)
  }

  /** The probe plan's inputs and state deltas (see `ProbeParts`) — split
    * out so tests can assert the candidate volume scales with the batch,
    * and so `DedupJob`'s rolling incremental mode can append `newBands` /
    * tombstone `replacedReps` into its persisted index.
    */
  private[graft] def probeParts(oldSigs0: DataFrame, newSigs0: DataFrame,
      oldBands: Option[DataFrame]): ProbeParts = {
    val newIds = newSigs0.select("doc_id")

    // ---- exact channel, touched groups only ----
    val newExact = newSigs0.where(col("has_exact"))
    val touchedHashes = newExact.select("exact_hash", "exact_hash2").distinct()
    val oldTouched = oldSigs0.where(col("has_exact"))
      .join(broadcast(touchedHashes), Seq("exact_hash", "exact_hash2"), "left_semi")
    val exactInput = oldTouched.unionByName(newExact)
    val (touchedReps, exactEdgesAll) = exactGroups(exactInput)
    val exactEdges = exactEdgesAll
      .join(broadcast(newIds).withColumnRenamed("doc_id", "src"), Seq("src"), "left_semi")
      .unionByName(exactEdgesAll
        .join(broadcast(newIds).withColumnRenamed("doc_id", "dst"), Seq("dst"), "left_semi")
        .join(broadcast(newIds).withColumnRenamed("doc_id", "src"), Seq("src"), "left_anti"))

    // ---- rep re-election bookkeeping ----
    // old-state rep per touched group (what the old band table banded)
    val oldReps = oldTouched.groupBy("exact_hash", "exact_hash2")
      .agg(min("doc_id").as("old_rep"))
    // groups whose union rep differs from their old rep: the union rep is a
    // new doc; the old rep's postings must be rekeyed (drop + fresh emit)
    val replacedOldReps = touchedReps
      .join(oldReps, Seq("exact_hash", "exact_hash2"))
      .where(col("rep_id") =!= col("old_rep"))
      .select(col("old_rep").as("doc_id"))

    // ---- new-side banding: ONLY new docs that are union reps (or have no
    // exact hash) band, mirroring the batch rep-only banding ----
    val newHashable = newSigs0.where(col("hashable"))
    val newRepSigs = newHashable
      .join(touchedReps.select(col("rep_id").as("doc_id")), Seq("doc_id"), "left_semi")
      .unionByName(newHashable.where(!col("has_exact")))
    val mhNew = bandStage(newRepSigs)
    val newBands = if (opts.simHashChannel) mhNew.unionByName(simhashBandStage(newRepSigs)) else mhNew

    // ---- probe the old band table on the new batch's band keys ----
    def packKey(df: DataFrame): DataFrame = df.select(
      DedupPipeline.packedBandKey(col("band_id"), col("band_hash")).as("band_key"),
      col("band_id"), col("band_hash"), col("doc_id"))
    val probeKeys = packKey(newBands).select("band_key").distinct()
    val oldBandTable = oldBands.getOrElse {
      // no persisted band table: rep-banding the old corpus here pays
      // exactGroups' CORPUS-WIDE groupBy(exact_hash, exact_hash2) shuffle
      // on every probe — candidate volume stays ∝ batch, but this
      // re-aggregation is exactly what the persisted band table
      // (buildOrLoadDedupIndex / run()'s bands stage) exists to avoid.
      // Acceptable for one-shot index-less probes; at scale, pass oldBands.
      System.err.println("[graft] probeParts: no persisted band table — " +
        "re-aggregating the old corpus to rep-band it (pass oldBands from " +
        "buildOrLoadDedupIndex to avoid this per-batch shuffle)")
      repBandTable(oldSigs0)
    }
    val oldProbe = packKey(oldBandTable)
      .join(broadcast(probeKeys), Seq("band_key"), "left_semi")
      .join(broadcast(replacedOldReps), Seq("doc_id"), "left_anti")
      .select("band_id", "band_hash", "doc_id")

    ProbeParts(
      oldProbe.unionByName(newBands.select("band_id", "band_hash", "doc_id")),
      exactEdges,
      newBands.select("doc_id", "band_id", "band_hash"),
      replacedOldReps)
  }

  /** As `dupPairs`, but over a precomputed (ideally cached) signature table —
    * callers that already materialized `signatureStage` (the dominant CPU
    * cost of the whole pipeline) must not pay it a second time.
    */
  def dupPairsFromSigs(sigs0: DataFrame): DataFrame = {
    val sigs = sigs0.where(col("hashable"))
    // exact channel sees ALL has_exact docs, incl. the short non-minhashable
    // gap. Lazy-checkpoint reps: the band table (candidates job) and the
    // exact edges (merge job) materialize in different jobs — one 128-bit
    // groupBy instead of two (see run()'s identical pattern)
    val reps = exactGroups(sigs0)._1.localCheckpoint(eager = false)
    val exactEdges = exactGroups(sigs0, Some(reps))._2
    val all = repBandTable(sigs0, Some(reps))
    val candidates = candidateStage(all, cfg.bandMatchesRequired)
    val lsh = verifyStage(candidates, sigs)
      .select(col("a").as("src"), col("b").as("dst"), col("score"), col("hamming"))
    DedupPipeline.unionDisjointChannels(lsh, exactEdges)
  }
}

object DedupPipeline {
  /** Single-long shuffle key for a (band_id, band_hash) posting — xxhash64
    * over both columns, preserving the FULL 64-bit band-hash entropy. The
    * old `band_id << 32 | low32(band_hash)` packing truncated the hash to
    * 32 bits: fatal at the 10^12-doc design point (≈250 unrelated postings
    * per bucket of pure junk) and, for the structured low bits of the
    * simhash chunk-combo fold, an ~150× aliasing even at bench scale. An
    * xxhash64 key collision merges two buckets — junk candidates that
    * exact verification removes — at a ~2^-64 birthday rate.
    */
  def packedBandKey(bandId: org.apache.spark.sql.Column,
      bandHash: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.xxhash64(bandId, bandHash)

  /** Channel flags bitmask, ≅ MatcherFlags
    * (/root/reference/mcrit/matchers/MatcherFlags.py:4-6). */
  val FlagMinhash = 1
  val FlagExact = 2

  /** Minimal open-addressed long→int counter for the map-side local cap:
    * a java.util.HashMap would box a Long key and Integer value per
    * posting on the hottest shuffle-input path. Power-of-two capacity,
    * linear probing, mixed keys, no deletion.
    */
  private[graft] final class LongCounter(initialCapacity: Int) {
    private var cap = Integer.highestOneBit(math.max(16, initialCapacity)) * 2
    private var keys = new Array[Long](cap)
    private var used = new Array[Boolean](cap)
    private var counts = new Array[Int](cap)
    private var n = 0
    def size: Int = n

    private def slot(k: Long, c: Int): Int =
      (graft.hash.SimHash.mix64(k) & (c - 1)).toInt

    /** Increment `k` and return its new count — unless the map already
      * tracks `maxTracked` distinct keys and `k` is new, in which case
      * return -1 and track nothing (the caller's reducer-side cap remains
      * the backstop for untracked keys).
      */
    def incrBounded(k: Long, maxTracked: Int): Int = {
      var i = slot(k, cap)
      while (used(i)) {
        if (keys(i) == k) { counts(i) += 1; return counts(i) }
        i = (i + 1) & (cap - 1)
      }
      if (n >= maxTracked) return -1
      if ((n + 1) * 4 >= cap * 3) { grow(); return incrBounded(k, maxTracked) }
      used(i) = true; keys(i) = k; counts(i) = 1; n += 1
      1
    }

    private def grow(): Unit = {
      val oldKeys = keys; val oldUsed = used; val oldCounts = counts
      cap *= 2
      keys = new Array[Long](cap)
      used = new Array[Boolean](cap)
      counts = new Array[Int](cap)
      var i = 0
      while (i < oldKeys.length) {
        if (oldUsed(i)) {
          var j = slot(oldKeys(i), cap)
          while (used(j)) j = (j + 1) & (cap - 1)
          used(j) = true; keys(j) = oldKeys(i); counts(j) = oldCounts(i)
        }
        i += 1
      }
    }
  }

  /** Band keys PROVABLY over the global stop-band cap: local count in some
    * single map partition exceeds `cap` (⇒ global count does too). One
    * narrow no-shuffle pass; per partition at most rows/(cap+1) keys can
    * qualify, so the result is small and broadcastable. Package-private for
    * the auto-prefilter test.
    */
  private[graft] def provablyHotKeys(spark: SparkSession,
      keyed: Dataset[(Long, Long)], cap: Int): DataFrame = {
    import spark.implicits._
    val maxTracked = 4 << 20
    // NO .distinct(): each partition emits a key at most once (exactly when
    // its local count crosses cap+1), so duplicates are bounded by the map
    // count — and the only consumer is a broadcast LEFT ANTI join, whose
    // semantics ignore build-side duplicates. The former distinct() was one
    // full exchange per pairsFromBands call (guide §2.4).
    keyed.mapPartitions { it =>
      val counts = new DedupPipeline.LongCounter(1 << 16)
      val hot = scala.collection.mutable.ArrayBuffer.empty[Long]
      it.foreach { case (k, _) =>
        if (counts.incrBounded(k, maxTracked) == cap + 1) hot += k
      }
      hot.iterator
    }.toDF("band_key")
  }

  /** Shared skew-capped pair emission from a band table
    * (band_id, band_hash, doc_id) — used by the LSH candidate stage, the
    * phash Hamming channel and the ANN bucket channel.
    *
    * One shuffle, streamed groups: hot groups are dropped at `cap` while
    * streaming (stop-band policy — boilerplate bands would be quadratic), so
    * no group ever materializes unbounded. Measured faster than both the
    * sort-scan variant and a fully-declarative self-join (the SMJ buffers
    * massive equal-key runs and sorts the band table twice). The
    * (band_id, band_hash) key packs into one long (band hashes are 32-bit)
    * — narrower shuffle rows, single-long grouping key.
    */
  def pairsFromBands(spark: SparkSession, bands: DataFrame,
      cap: Int, bandMatchesRequired: Int, prefilterHot: Boolean = false): DataFrame = {
    import spark.implicits._
    val keyed = bands
      .select(DedupPipeline.packedBandKey(col("band_id"), col("band_hash")).as("band_key"),
        col("doc_id"))
      .as[(Long, Long)]
    // two-phase heavy-hitter prefilter: over-cap band keys are detected
    // map-side (pigeonhole: a key with global count > cap has local count
    // > cap/numMapTasks in at least one map partition), exactly counted on
    // that tiny candidate superset, and anti-joined out BEFORE the shuffle —
    // so a 10^7-member boilerplate band never sends its postings to one
    // reducer just to be dropped there. Off by default: at bench scale the
    // extra passes cost more than the skew they remove; turn on when the
    // corpus has mega-hot bands (the 10^12-doc web path).
    val input =
      if (!prefilterHot) keyed
      else {
        val nParts = math.max(1, keyed.rdd.getNumPartitions)
        val localT = math.max(2, cap / nParts)
        val candidates = keyed.mapPartitions { it =>
          val counts = new java.util.HashMap[Long, Int]()
          it.foreach { case (k, _) => counts.merge(k, 1, (a, b) => a + b) }
          import scala.jdk.CollectionConverters._
          counts.entrySet().iterator().asScala
            .filter(_.getValue >= localT).map(_.getKey)
        }.toDF("band_key").distinct()
        val hot = keyed.toDF("band_key", "doc_id")
          .join(broadcast(candidates), "band_key")
          .groupBy("band_key").agg(count(lit(1)).as("n"))
          .where(col("n") > cap)
          .select("band_key")
        keyed.toDF("band_key", "doc_id")
          .join(broadcast(hot), Seq("band_key"), "left_anti")
          .as[(Long, Long)]
      }
    val maxTracked = 4 << 20
    // AUTO heavy-hitter exclusion, ALWAYS on (no flag) and exactly
    // output-preserving: a key whose LOCAL count in any single map partition
    // exceeds `cap` is PROVABLY over the global cap, and the reducer would
    // drop its group regardless — so detect such keys with one narrow
    // no-shuffle pass (the same LongCounter the local cap uses, emitting a
    // key once when it crosses cap+1) and anti-join them out BEFORE the
    // shuffle. A 10^7-member boilerplate band then ships ZERO postings
    // instead of (cap+1)·numMapPartitions to one reducer. Keys over cap
    // globally but under cap in every partition still ship (≤ cap+1 rows per
    // map via the local cap below) and die at the reducer — catching those
    // too is what the opt-in exact-count prefilter above is for. Untracked
    // keys (tracking map overflow) can't be proven hot and pass through.
    //
    // The detection pass and the main pass both consume the band explode, so
    // cache it (serialized: 16-byte rows) around the two passes — measured
    // ~2 s of duplicated banding UDF work at bench scale otherwise. Cache is
    // best-effort by design: at the 10^12 design point partitions that don't
    // fit memory+disk silently recompute from the (ledger-materialized)
    // signature table, which is exactly the no-cache behavior.
    val cached =
      if (prefilterHot) input // the exact-count phase already removed a superset
      else input.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val preFiltered =
      if (prefilterHot) input
      else cached.toDF("band_key", "doc_id")
        .join(broadcast(provablyHotKeys(spark, cached, cap)), Seq("band_key"), "left_anti")
        .as[(Long, Long)]
    // map-side stop-band combiner, ALWAYS on and exactly output-preserving:
    // a key whose LOCAL count exceeds `cap` is globally over cap, and cap+1
    // delivered rows are already enough to make the reducer drop the group —
    // so suppress everything past cap+1 per key per map partition. A
    // boilerplate band that dodged the provable-hot pass (e.g. untracked on
    // map overflow) still ships ≤ (cap+1)·numMapPartitions postings instead
    // of its full volume. Equivalence: a group is dropped iff its
    // reducer-side count exceeds cap — if any partition crossed cap it alone
    // delivers cap+1 (> cap ⇒ dropped, same as before); if none crossed,
    // delivery is complete and the reducer count is the true count. Tracking
    // map is size-bounded; on overflow new keys pass through untracked (the
    // reducer-side cap stays the backstop).
    val localCapped = preFiltered.mapPartitions { it =>
      val counts = new DedupPipeline.LongCounter(1 << 16)
      it.filter { case (k, _) =>
        val c = counts.incrBounded(k, maxTracked)
        c == -1 || c <= cap + 1
      }
    }
    val pairs = localCapped
      .groupByKey(_._1)
      .flatMapGroups { (_: Long, rows: Iterator[(Long, Long)]) =>
        val ids = new scala.collection.mutable.ArrayBuffer[Long](64)
        var overflow = false
        while (rows.hasNext) {
          val id = rows.next()._2
          if (!overflow) {
            ids += id
            if (ids.length > cap) overflow = true
          }
        }
        if (overflow || ids.length < 2) Iterator.empty
        else {
          val arr = ids.toArray
          java.util.Arrays.sort(arr)
          arr.indices.iterator.flatMap(i =>
            ((i + 1) until arr.length).iterator.map(j => (arr(i), arr(j))))
        }
      }
      .toDF("a", "b")
    val result = pairs.groupBy("a", "b").agg(count(lit(1)).as("n_bands"))
      .where(col("n_bands") >= bandMatchesRequired)
    if (prefilterHot) result
    else {
      // eager cut-over so the band-explode cache can be dropped NOW: without
      // this every candidateStage/phash/ANN call leaks one pinned serialized
      // explode (16 B × postings) for the session lifetime. The ≥r-band pair
      // table is cap-bounded and far smaller than the cache it frees; at the
      // 10^12 design point the candidates stage is ledger-staged to reliable
      // parquet anyway, so the ephemeral localCheckpoint is bench/local-only
      // state.
      val out = result.localCheckpoint(eager = true)
      cached.unpersist()
      out
    }
  }

  /** A4 analog — per-pair elementwise merge of the fuzzy and exact channels:
    * best score wins, channel flags OR together
    * (≅ _craftResultDict's per-key max(score, is_pic, is_min) merge,
    * /root/reference/mcrit/matchers/MatcherInterface.py:558-600). The same
    * pair rarely appears in both channels (exact members never band), but
    * the report row must carry "best score + which channels" when it does.
    */
  def mergeChannels(lsh: DataFrame, exactEdges: DataFrame): DataFrame = {
    val l = lsh.select(col("src"), col("dst"), col("score"), col("hamming"),
      lit(FlagMinhash).as("flags"))
    val e = exactEdges.select(col("src"), col("dst"),
      lit(100.0).as("score"), lit(0).as("hamming"), lit(FlagExact).as("flags"))
    l.unionByName(e).groupBy("src", "dst")
      .agg(max("score").as("score"), min("hamming").as("hamming"),
        bit_or(col("flags")).cast("int").as("flags"))
  }

  /** `mergeChannels` for callers whose two channels are DISJOINT by
    * construction, where the per-pair merge aggregate is the identity and
    * its exchange is pure overhead (guide §2.4: a distinct/merge over data
    * that is already unique). The rep-only banding invariant makes the
    * batch and probe pair producers exactly such callers: an LSH pair's
    * BOTH endpoints sit in the band table = {exact-group reps} ∪ {hashable
    * docs with no exact hash}, while an exact edge's dst is a NON-rep
    * member of an exact group — a doc that, having an exact hash and not
    * being its group's rep, is excluded from the band table. No (src, dst)
    * can therefore appear in both inputs, and within each channel pairs are
    * already unique (verifyStage's candidates arrive grouped on (a, b);
    * exactGroups emits one edge per member). Same schema and rows as
    * `mergeChannels`, one less shuffle. (A 64-bit doc_id birthday collision
    * could break the premise; `run()` repairs those ids before pairing, and
    * the pair surfaces inherit the same astronomical-rarity trade the rest
    * of the unaudited pair path already makes.)
    */
  def unionDisjointChannels(lsh: DataFrame, exactEdges: DataFrame): DataFrame = {
    val l = lsh.select(col("src"), col("dst"), col("score"), col("hamming"),
      lit(FlagMinhash).as("flags"))
    val e = exactEdges.select(col("src"), col("dst"),
      lit(100.0).as("score"), lit(0).as("hamming"), lit(FlagExact).as("flags"))
    l.unionByName(e)
  }
}
