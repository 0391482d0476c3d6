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

  /** Deterministic pseudo-random hyperplane component for (plane p, dim i):
    * a fixed hash → uniform in [-1, 1). No RNG state, fully reproducible.
    */
  private def planeComponent(p: Int, i: Int): Double = {
    val h = graft.hash.Murmur3.hashU(s"plane-$p-$i", 7)
    (h.toDouble / 2147483648.0) - 1.0
  }

  /** Sign-bucket signature: `planes` random-hyperplane dot-product signs
    * packed into an int — the ANN analog of an LSH band hash.
    */
  def withBucket(df: DataFrame, planes: Int, dim: Int): DataFrame = {
    // hyperplane matrix is tiny (planes × dim) → literal arrays, codegen'd
    val planeCols = (0 until planes).map { p =>
      val comps = array((0 until dim).map(i => lit(planeComponent(p, i))): _*)
      val dot = aggregate(zip_with(col("embedding"), comps, (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      when(dot >= 0, lit(1 << p)).otherwise(lit(0))
    }
    df.withColumn("bucket", planeCols.reduce(_ + _))
  }

  /** LSH-bucketed approximate top-k: score only within matching sign
    * buckets. Recall grows with fewer planes / multiple probes; this single
    * probe variant is the scale skeleton (bucket = shuffle key).
    */
  def lshTopK(df: DataFrame, k: Int, planes: Int = 8, dim: Int = 64): DataFrame = {
    val b = withBucket(df, planes, dim)
      .select(col("vec_id"), col("embedding"), col("bucket"))
    val pairs = b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") =!= col("y.vec_id"))
      .select(col("x.vec_id").as("query_id"), col("y.vec_id").as("neighbor_id"),
        cosine(col("x.embedding"), col("y.embedding")).as("cos"))
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    pairs.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding-cosine near-duplicate pairs above a similarity threshold,
    * generated within LSH buckets (the embedding channel of dedup).
    */
  def cosineDupPairs(df: DataFrame, threshold: Double, planes: Int = 6, dim: Int = 64): DataFrame = {
    val b = withBucket(df, planes, dim).select(col("vec_id"), col("embedding"), col("bucket"))
    b.as("x").join(b.as("y"),
        col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
      .withColumn("cos", cosine(col("x.embedding"), col("y.embedding")))
      .where(col("cos") >= threshold)
      .select(col("x.vec_id").as("vec_id_a"), col("y.vec_id").as("vec_id_b"), col("cos"))
  }
}
