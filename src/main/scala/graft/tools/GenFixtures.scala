package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Regenerates the committed golden-fixture parquet under
  * /root/repo/fixtures/ for the kernel-dependent queries that no SQL engine
  * can reproduce independently (minhash/simhash/langid/substring/ANN/phash —
  * all seeded deterministic kernels).
  *
  * The fixtures are PINNED OUTPUTS of the tested kernel at a green commit:
  * the driver's DuckDB compare then verifies run-to-run determinism and
  * regression-stability of those operators, while the kernels' correctness
  * itself is established by the sbt golden/parity suites (mmh3 vectors,
  * MT19937 parity, band-collision semantics, recall vs golden clusters).
  * Regenerate ONLY after kernel changes that intentionally alter outputs,
  * with `sbt -batch test` green.
  */
object GenFixtures {
  /** queries whose results depend on the documents/embeddings tables. */
  val perSf: Seq[String] = Seq(
    "q_minhash_pairs", "q_minhash_clusters", "q_simhash", "q_langid",
    "q_substring", "q_dedup_spans", "q_cross_compare", "q_query_match",
    "q_subword",
    "q_ann_lsh", "q_ann_ivf", "q_cosine_dups", "q_semdedup")

  /** dir-independent queries (synthetic media corpus). */
  val anySf: Seq[String] = Seq("q_media_features", "q_media_frames", "q_phash_dups")

  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else "/root/repo/fixtures"
    // optional filter: remaining args name the only queries to regenerate
    // (kernel changes rarely touch every fixture family; a full regen also
    // churns byte-identical parquet in git)
    val only: Option[Set[String]] =
      if (args.length > 1) Some(args.drop(1).toSet) else None
    def wanted(n: String) = only.forall(_.contains(n))
    // the BPE merges resource first: q_subword's fixture below is computed
    // THROUGH the committed tokenizer (`Bpe.default`, a CLASSPATH resource),
    // which GenBpeMerges regenerates on disk. A changed merges file needs a
    // recompile before the new resource is on the classpath, so a one-shot
    // run after a trainer/corpus change would silently pin q_subword
    // fixtures computed with the OLD tokenizer next to NEW committed
    // merges. Guard: abort before writing any fixture if the classpath
    // copy differs from what the trainer produces now.
    if (only.forall(_.contains("q_subword"))) {
      // regenerate the on-disk resource on FILTERED runs too — otherwise a
      // `GenFixtures <root> q_subword` after a trainer change could never
      // satisfy the guard below (sbt compile would just re-package the
      // stale resource forever)
      GenBpeMerges.main(Array.empty)
      val fresh = graft.kernel.Bpe.render(graft.kernel.Bpe.trainDefault())
      require(graft.kernel.Bpe.committedResourceText() == fresh,
        "classpath bpe_merges.txt is stale vs the current trainer — " +
          "run `sbt compile` to refresh the resource, then re-run GenFixtures")
    }
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for (sf <- Seq("sf0.001", "sf0.01"); name <- perSf if wanted(name)) {
      val out = s"$root/$sf/$name"
      SparkEntry.queries(name)(spark, s"/root/testdata/$sf")
        .coalesce(1).write.mode("overwrite").parquet(out)
      println(s"[fixtures] wrote $out")
    }
    for (name <- anySf if wanted(name)) {
      val out = s"$root/any/$name"
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .coalesce(1).write.mode("overwrite").parquet(out)
      println(s"[fixtures] wrote $out")
    }
    spark.stop()
  }
}

/** Writes the committed BPE merges resource (see `kernel.Bpe`). Spark-free;
  * run this, `sbt compile` (so the classpath resource reloads), then
  * GenFixtures for q_subword. */
object GenBpeMerges {
  def main(args: Array[String]): Unit = {
    val mergesPath = java.nio.file.Paths.get(
      "/root/repo/src/main/resources/graft/bpe_merges.txt")
    java.nio.file.Files.createDirectories(mergesPath.getParent)
    java.nio.file.Files.write(mergesPath,
      graft.kernel.Bpe.render(graft.kernel.Bpe.trainDefault()).getBytes("UTF-8"))
    println(s"[fixtures] wrote $mergesPath")
  }
}
