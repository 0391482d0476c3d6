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

  /** Cosine similarity of two float-array columns — the native codegen
    * expression (`expr.CosineSim`): one static `ArrayData` call per row
    * inside the whole-stage-codegen span. Bitwise-identical to the
    * higher-order-function form below and to `cosineKernel` (asserted).
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    graft.expr.CosineSim.cos(a, b)

  /** The declarative zip_with/aggregate form — kept as the independent
    * reference implementation for the bitwise-parity test (HOF lambdas are
    * re-interpreted per element, so the hot paths use `cosine` above).
    */
  private[graft] def cosineHof(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
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

  /** The full hyperplane tensor (tables × planes × dim) — tiny (≤ ~60 KB at
    * the defaults), built once on the driver and broadcast to the kernel.
    */
  private[graft] def planeTensor(tables: Int, planes: Int, dim: Int): Array[Array[Array[Double]]] =
    Array.tabulate(tables, planes, dim)((t, p, i) => planeComponent(t, p, i))

  /** The primitive-array cosine loop (shared with the native expression;
    * see `expr.CosineKernel` for the arithmetic contract). */
  private[graft] def cosineKernel(a: Array[Float], b: Array[Float]): Double =
    graft.expr.CosineKernel.score(a, b)

  /** Multi-table sign-LSH banding: `tables` independent hyperplane tables of
    * `planes` sign bits each → (band_id, band_hash, doc_id) rows, exactly
    * the text-LSH band-table shape. A single wide table (the old design)
    * had 2^planes total buckets and unbounded all-pairs inside each — at
    * 10^9 vectors one bucket holds ~10^7 rows → ~10^13 pairs. Multiple
    * narrower tables trade that for L·n postings with per-bucket caps and a
    * recall knob: P(collide in ≥1 table) = 1 − (1 − (1 − θ/π)^planes)^tables.
    *
    * Computed by a typed mapPartitions kernel over a broadcast plane tensor
    * (the `signatureStage` pattern): the earlier declarative form expanded
    * the tensor into ~tables·planes·dim literal expression terms in one
    * projection — per-row interpretive bloat that cost ~10× on the widest
    * stage. Sign math is bit-identical (float·double products accumulated
    * in index order), so outputs are unchanged.
    */
  def bandTable(df: DataFrame, tables: Int, planes: Int, dim: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(planeTensor(tables, planes, dim))
    df.select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val tensor = bc.value
        it.flatMap { case (id, emb) =>
          (0 until tables).iterator.map { t =>
            val planesT = tensor(t)
            var hash = 0L
            var p = 0
            while (p < planes) {
              val comps = planesT(p)
              val n = math.min(emb.length, dim)
              var dot = 0.0
              var i = 0
              while (i < n) { dot += emb(i).toDouble * comps(i); i += 1 }
              if (dot >= 0) hash |= (1L << p)
              p += 1
            }
            (id, t, hash)
          }
        }
      }
      .toDF("doc_id", "band_id", "band_hash")
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
    // join + score each UNORDERED pair once, then emit both directions with
    // a generator: the earlier form unioned cand with its swap BEFORE the
    // embedding joins, so every pair probed the joins and evaluated the
    // cosine twice (guide §1.2 "don't compute things twice"; cos is
    // symmetric, so the duplicated row carries the identical score)
    val scored = cand.select(col("a"), col("b"))
      .join(e.withColumnRenamed("vec_id", "a").withColumnRenamed("embedding", "e_a"), "a")
      .join(e.withColumnRenamed("vec_id", "b").withColumnRenamed("embedding", "e_b"), "b")
      .select(explode(array(
          struct(col("a").as("query_id"), col("b").as("neighbor_id")),
          struct(col("b").as("query_id"), col("a").as("neighbor_id")))).as("p"),
        cosine(col("e_a"), col("e_b")).as("cos"))
      .select(col("p.query_id"), col("p.neighbor_id"), col("cos"))
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

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540 — public): k-means partitions the embedding space
    * (the deterministic IVF coarse quantizer reused), within each cell the
    * pairs with cosine ≥ 1−eps are edges, connected components over those
    * edges are the ε-similar groups, and ONE survivor is kept per group —
    * the member LEAST similar to its cell centroid (the paper's
    * diversity-preserving choice), ties broken by min vec_id.
    *
    * Output: (vec_id, cell, group_id, keep) for every input vector;
    * `group_id` is the component's min vec_id (own id for singletons),
    * `keep=false` rows are the semantic duplicates to drop.
    *
    * Scale shape: one shuffle on the cell key via the shared skew-capped
    * pair emitter (a hot cell is a degenerate embedding direction — same
    * boilerplate policy as text LSH), nlist grows √n-ish so cells stay
    * bounded, verification is the native codegen cosine on candidate pairs
    * only, and components run through the heap-gated CC (edges within a
    * cell only, so components never span cells). No full pairwise matrix
    * is ever materialized, unlike the paper's per-cluster GPU matrix.
    */
  def semDedup(df: DataFrame, eps: Double, nlist: Int = 16, dim: Int = 64,
      maxCell: Int = 2000): DataFrame = {
    val spark = df.sparkSession
    val centroids = trainCentroids(df, nlist, dim)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearestCentroid(v.toArray, bc.value))
    val cdistUdf = udf((v: Seq[Float], c: Int) =>
      1.0 - cosineKernel(v.toArray, bc.value(c)))
    val assigned = df.select(col("vec_id"), col("embedding"))
      .withColumn("cell", assignUdf(col("embedding")))
      .withColumn("cdist", cdistUdf(col("embedding"), col("cell")))
    val cand = graft.pipeline.DedupPipeline.pairsFromBands(spark,
      assigned.select(col("vec_id").as("doc_id"), lit(0).as("band_id"),
        col("cell").cast("long").as("band_hash")),
      cap = maxCell, bandMatchesRequired = 1)
    // verification only needs the raw vectors — don't re-run the assign
    // UDFs on the join branches
    val e = df.select(col("vec_id"), col("embedding"))
    val edges = cand
      .join(e.withColumnRenamed("vec_id", "a").withColumnRenamed("embedding", "e_a"), "a")
      .join(e.withColumnRenamed("vec_id", "b").withColumnRenamed("embedding", "e_b"), "b")
      .where(cosine(col("e_a"), col("e_b")) >= lit(1.0 - eps))
      .select(col("a").as("src"), col("b").as("dst"))
    val comp = graft.cluster.ConnectedComponents.run(edges)
      .withColumnRenamed("id", "vec_id")
    val grouped = assigned.join(comp, Seq("vec_id"), "left")
      .withColumn("group_id", coalesce(col("component"), col("vec_id")))
    val w = Window.partitionBy("group_id").orderBy(col("cdist").desc, col("vec_id").asc)
    grouped.withColumn("keep", row_number().over(w) === 1)
      .select("vec_id", "cell", "group_id", "keep")
  }

  // ---- IVF (inverted-file) variant -------------------------------------

  /** Deterministic driver-side Lloyd's k-means over a fixed sample — the IVF
    * coarse quantizer. Init = the lexicographically-first `nlist` sampled
    * vectors (by vec_id); a fixed iteration count and driver-side float
    * arithmetic make the centroids bit-stable across partitionings (MLlib's
    * distributed k-means sums floats in partition order and is not).
    * Centroid count is small by design (√n-ish) — this never sees the full
    * table, only the sample.
    */
  def trainCentroids(df: DataFrame, nlist: Int, dim: Int,
      sampleCap: Int = 4096, iters: Int = 10): Array[Array[Float]] = {
    // the sample must comfortably exceed nlist or cells train degenerate:
    // grow it with nlist (≥8 sample vectors per centroid) so large-nlist
    // configs (√n-ish at 10^9 vectors) are not silently bounded by the
    // default cap; the sample is still a driver-side O(sample·dim) array
    val effCap = math.max(sampleCap, 8 * nlist)
    val sample = df.select(col("vec_id"), col("embedding"))
      .orderBy(col("vec_id")).limit(effCap)
      .collect().map(r => r.getSeq[Float](1).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    var centroids = sample.take(nlist).map(_.clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(nlist)(new Array[Double](dim))
      val counts = new Array[Int](nlist)
      sample.foreach { v =>
        val c = nearestCentroid(v, centroids)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = Array.tabulate(nlist) { c =>
        if (counts(c) == 0) centroids(c)
        else Array.tabulate(dim)(i => (sums(c)(i) / counts(c)).toFloat)
      }
    }
    centroids
  }

  private def nearestCentroid(v: Array[Float], centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < centroids.length) {
      var d = 0.0
      var i = 0
      val ct = centroids(c)
      while (i < v.length) { val x = v(i) - ct(i); d += x * x; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  private def rankedCentroids(v: Array[Float], centroids: Array[Array[Float]], n: Int): Array[Int] = {
    centroids.indices.map { c =>
      var d = 0.0
      var i = 0
      val ct = centroids(c)
      while (i < v.length) { val x = v(i) - ct(i); d += x * x; i += 1 }
      (d, c)
    }.sortBy(t => (t._1, t._2)).take(n).map(_._2).toArray
  }

  /** IVF approximate top-k: corpus vectors live in their nearest-centroid
    * bucket (the inverted file — ONE posting per vector, vs L postings for
    * multi-table LSH); queries probe their `nprobe` nearest buckets. The
    * bucket is the shuffle key; recall is the probability the true neighbor
    * shares one of the probed cells. Standard IVF-flat.
    */
  def ivfTopK(df: DataFrame, k: Int, nlist: Int = 16, nprobe: Int = 4,
      dim: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val centroids = trainCentroids(df, nlist, dim)
    val bc = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Float]) => nearestCentroid(v.toArray, bc.value))
    val probeUdf = udf((v: Seq[Float]) => rankedCentroids(v.toArray, bc.value, nprobe))
    val corpus = df.select(col("vec_id").as("neighbor_id"), col("embedding").as("e_c"),
      assignUdf(col("embedding")).as("cell"))
    val queries = df.select(col("vec_id").as("query_id"), col("embedding").as("e_q"),
      explode(probeUdf(col("embedding"))).as("cell"))
    val scored = queries.join(corpus, "cell")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("e_q"), col("e_c")).as("cos"))
      // a (query, neighbor) pair can meet in at most one cell (corpus side
      // is single-assigned), so no dedup needed before ranking
    val w = Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }
}
