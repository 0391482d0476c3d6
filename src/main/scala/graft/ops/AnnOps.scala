package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Brute-force cosine top-k is the exactness baseline (a broadcast
  * cross-join scoring with built-in higher-order functions — codegen'd, no
  * UDF). The scale path is LSH bucketing: random-hyperplane signs partition
  * vectors into buckets; neighbors are only scored within a bucket
  * (candidate generation exactly like the text LSH band path).
  */
object AnnOps {

  /** Cosine similarity of two float-array columns via zip_with/aggregate. */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0d), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0d), (acc, v) => acc + v * v))
    dot / (na * nb + lit(1e-12))
  }

  /** Exact top-k cosine neighbors for the query vectors (broadcast the query
    * side — it is small by construction; the corpus side streams).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic pseudo-random hyperplane component for (table t, plane p,
    * dim i): a fixed hash → uniform in [-1, 1). No RNG state, reproducible.
    */
  private def planeComponent(t: Int, p: Int, i: Int): Double = {
    val h = graft.hash.Murmur3.hashU(s"plane-$t-$p-$i", 7)
    (h.toDouble / 2147483648.0) - 1.0
  }

  /** Multi-table sign-LSH banding: `tables` independent hyperplane tables of
    * `planes` sign bits each → (band_id, band_hash, doc_id) rows, exactly
    * the text-LSH band-table shape. A single wide table (the old design)
    * had 2^planes total buckets and unbounded all-pairs inside each — at
    * 10^9 vectors one bucket holds ~10^7 rows → ~10^13 pairs. Multiple
    * narrower tables trade that for L·n postings with per-bucket caps and a
    * recall knob: P(collide in ≥1 table) = 1 − (1 − (1 − θ/π)^planes)^tables.
    */
  def bandTable(df: DataFrame, tables: Int, planes: Int, dim: Int): DataFrame = {
    // hyperplane tensor is tiny (tables × planes × dim) → literals, codegen'd
    val tableCols = (0 until tables).map { t =>
      val bits = (0 until planes).map { p =>
        val comps = array((0 until dim).map(i => lit(planeComponent(t, p, i))): _*)
        val dot = aggregate(zip_with(col("embedding"), comps, (x, y) => x * y),
          lit(0.0d), (acc, v) => acc + v)
        when(dot >= 0, lit(1L << p)).otherwise(lit(0L))
      }
      bits.reduce(_ + _)
    }
    df.select(col("vec_id").as("doc_id"),
      posexplode(array(tableCols: _*)).as(Seq("band_id", "band_hash")))
  }

  /** Candidate pairs from the multi-table banding, bucket-capped through the
    * shared skew-capped pair emitter (a hot sign-bucket is a degenerate
    * direction in embedding space — the boilerplate analog).
    */
  def candidatePairs(df: DataFrame, tables: Int, planes: Int, dim: Int,
      maxBucket: Int): DataFrame = {
    val spark = df.sparkSession
    graft.pipeline.DedupPipeline.pairsFromBands(
      spark, bandTable(df, tables, planes, dim), cap = maxBucket, bandMatchesRequired = 1)
  }

  /** LSH approximate top-k: score only candidate pairs from the multi-table
    * banding. Defaults (10 tables × 12 bits) give ≥0.95 expected recall for
    * cos ≥ 0.95 neighbors (1−(1−0.899^12)^10 ≈ 0.96); tune tables/planes
    * for the recall/cost point.
    */
  def lshTopK(df: DataFrame, k: Int, tables: Int = 10, planes: Int = 12,
      dim: Int = 64, maxBucket: Int = 2000): DataFrame = {
    val cand = candidatePairs(df, tables, planes, dim, maxBucket)
    val e = df.select(col("vec_id"), col("embedding"))
    // symmetric: each unordered candidate pair serves both directions
    val sym = cand.select(col("a"), col("b"))
      .unionByName(cand.select(col("b").as("a"), col("a").as("b")))
    val scored = sym
      .join(e.withColumnRenamed("vec_id", "a").withColumnRenamed("embedding", "e_a"), "a")
      .join(e.withColumnRenamed("vec_id", "b").withColumnRenamed("embedding", "e_b"), "b")
      .select(col("a").as("query_id"), col("b").as("neighbor_id"),
        cosine(col("e_a"), col("e_b")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * generated from the multi-table banding (the embedding channel of dedup).
    */
  def cosineDupPairs(df: DataFrame, threshold: Double, tables: Int = 10,
      planes: Int = 12, dim: Int = 64, maxBucket: Int = 2000): DataFrame = {
    val cand = candidatePairs(df, tables, planes, dim, maxBucket)
    val e = df.select(col("vec_id"), col("embedding"))
    cand
      .join(e.withColumnRenamed("vec_id", "a").withColumnRenamed("embedding", "e_a"), "a")
      .join(e.withColumnRenamed("vec_id", "b").withColumnRenamed("embedding", "e_b"), "b")
      .withColumn("cos", cosine(col("e_a"), col("e_b")))
      .where(col("cos") >= threshold)
      .select(col("a").as("vec_id_a"), col("b").as("vec_id_b"), col("cos"))
  }
}
