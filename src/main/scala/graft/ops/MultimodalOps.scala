package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/video
  * travel as opaque `binary` columns with typed metadata; decode /
  * feature-extract / resize / frame-sample run as batched typed stages
  * (`mapPartitions` — the Scala analog of `mapInPandas`: one iterator pass
  * per partition, batch-shaped work, no per-row overhead).
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * container): `StubCodec` derives deterministic fake pixels/samples from
  * the bytes, so schema, partitioning, batch shape and downstream feature
  * logic are real and tested while the codec is swappable.
  */
object MultimodalOps {

  final case class MediaMeta(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Int)
  final case class MediaRow(media_id: Long, kind: String, width: Int,
      height: Int, duration_ms: Int, payload: Array[Byte])
  final case class MediaFeatures(media_id: Long, kind: String,
      byte_len: Int, mean_intensity: Double, intensity_hist: Array[Long],
      phash: Long)
  final case class FrameSample(media_id: Long, frame_idx: Int,
      ts_ms: Int, frame_phash: Long)

  /** STUB codec — deterministic fake decode. Replace `decodeIntensities`
    * with a real codec (e.g. javax.imageio / ffmpeg bindings) in production;
    * everything downstream is codec-agnostic.
    */
  object StubCodec {
    /** Fake per-pixel/sample intensities derived from payload bytes. */
    def decodeIntensities(payload: Array[Byte], n: Int): Array[Int] = {
      val out = new Array[Int](n)
      var h = 1469598103934665603L // FNV offset
      var i = 0
      while (i < n) {
        h = (h ^ payload(i % math.max(payload.length, 1))) * 1099511628211L
        out(i) = ((h >>> 32) & 0xff).toInt
        i += 1
      }
      out
    }
  }

  /** Deterministic synthetic media table (binary payload + metadata) — the
    * test stand-in for an ingested media corpus. Derives all content from
    * (seed, media_id).
    */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism).map { id =>
      val rng = new java.util.Random(seed * 31337L + id)
      val kind = Seq("image", "audio", "video")(rng.nextInt(3))
      val w = 16 + rng.nextInt(64)
      val h = 16 + rng.nextInt(64)
      val dur = if (kind == "image") 0 else 1000 + rng.nextInt(60000)
      val payload = new Array[Byte](256 + rng.nextInt(1024))
      rng.nextBytes(payload)
      MediaRow(id, kind, w, h, dur, payload)
    }
  }

  /** Feature extraction: one batched pass per partition (decode → mean /
    * histogram / perceptual hash). Binary payload never leaves the stage —
    * downstream sees only compact features (column pruning keeps the scan
    * narrow when features are what's selected).
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val n = math.min(m.width * m.height, 4096)
        val px = StubCodec.decodeIntensities(m.payload, math.max(n, 64))
        var sum = 0L
        val hist = new Array[Long](16)
        var i = 0
        while (i < px.length) {
          sum += px(i)
          hist(px(i) >>> 4) += 1
          i += 1
        }
        val mean = sum.toDouble / px.length
        // pHash-style: bit per bucket, set when bucket mass above average
        var ph = 0L
        val avg = px.length / 16.0
        i = 0
        while (i < 16) { if (hist(i) > avg) ph |= (1L << i); i += 1 }
        // fold in coarse 4x4 mean-block bits for 64-bit shape
        var b = 16
        while (b < 64) {
          val lo = (b - 16) * px.length / 48
          val hi = math.max(lo + 1, (b - 15) * px.length / 48)
          var s = 0L
          var j = lo
          while (j < hi) { s += px(j); j += 1 }
          if (s.toDouble / (hi - lo) > mean) ph |= (1L << b)
          b += 1
        }
        MediaFeatures(m.media_id, m.kind, m.payload.length, mean, hist, ph)
      }
    }
  }

  /** Frame sampling for video/audio rows: one row per sampled frame at the
    * given interval (the explode pattern: media → frames is the shuffle-free
    * row expansion; downstream groupBys key on media_id).
    */
  def sampleFrames(media: Dataset[MediaRow], intervalMs: Int = 5000): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(m => m.kind != "image").flatMap { m =>
      val n = math.max(1, m.duration_ms / intervalMs)
      (0 until math.min(n, 64)).iterator.map { f =>
        val ts = f * intervalMs
        val px = StubCodec.decodeIntensities(m.payload :+ f.toByte, 64)
        var ph = 0L
        val mean = px.sum.toDouble / px.length
        var i = 0
        while (i < 64) { if (px(i % px.length) > mean) ph |= (1L << i); i += 1 }
        FrameSample(m.media_id, f, ts, ph)
      }
    }
  }

  /** Near-dup media pairs by perceptual-hash Hamming ball. Candidate
    * generation: C(blocks, keep) chunk-combination tables
    * (SimHash.chunkCombos) — any pair within Hamming distance blocks − keep
    * is GUARANTEED a shared band key, so the defaults (6 blocks, keep 2)
    * cover maxHamming = 4 exactly; keys are ~21-bit chunk concatenations
    * (vs the old single-16-bit-chunk scheme whose junk collisions were
    * ~n²/2^17 and whose guarantee silently stopped at Hamming 3). Hot keys
    * are capped through the shared skew-capped pair emitter.
    */
  def phashDupPairs(features: DataFrame, maxHamming: Int = 4,
      blocks: Int = 6, maxGroup: Int = 500): DataFrame = {
    val keep = math.min(blocks - 1, blocks - maxHamming)
    require(keep >= 1, s"blocks=$blocks cannot guarantee maxHamming=$maxHamming")
    val combosUdf = udf((v: Long) => graft.hash.SimHash.chunkCombos(v, blocks, keep))
    val banded = features.select(col("media_id").as("doc_id"),
        posexplode(combosUdf(col("phash"))).as(Seq("band_id", "band_hash")))
    val spark = features.sparkSession
    val cand = graft.pipeline.DedupPipeline
      .pairsFromBands(spark, banded, cap = maxGroup, bandMatchesRequired = 1)
    val ph = features.select(col("media_id"), col("phash"))
    cand
      .join(ph.withColumnRenamed("media_id", "a").withColumnRenamed("phash", "ph_a"), "a")
      .join(ph.withColumnRenamed("media_id", "b").withColumnRenamed("phash", "ph_b"), "b")
      .select(col("a").as("media_id_a"), col("b").as("media_id_b"),
        bit_count(col("ph_a").bitwiseXOR(col("ph_b"))).cast("int").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }
}
