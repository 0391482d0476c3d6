package graft

import org.apache.spark.sql.DataFrame

/** Freshness gate for the committed golden-fixture oracles: regenerates every
  * fixture family from the CURRENT kernel (same queries, same inputs as
  * tools/GenFixtures at the smallest SF) and asserts row-multiset equality
  * with the committed parquet under /root/repo/fixtures/.
  *
  * This closes the one hole in the golden-oracle scheme: a stale fixture plus
  * a matching stale driver output would green-light silently. With this gate,
  * any kernel change that alters outputs fails loudly here until the fixtures
  * are intentionally regenerated (sbt test green first, then
  * `runMain graft.tools.GenFixtures`).
  */
class FixtureFreshnessSpec extends SparkTestBase {

  private val FixRoot = "/root/repo/fixtures"

  /** Row-multiset equality, order-free: fixtures are written coalesce(1) but
    * the recomputation may produce rows in any partition order.
    */
  private def assertSameRows(name: String, fresh: DataFrame, committedPath: String): Unit = {
    val committed = spark.read.parquet(committedPath)
    assert(fresh.schema.map(f => (f.name, f.dataType)) ==
      committed.schema.map(f => (f.name, f.dataType)),
      s"$name: schema drift vs committed fixture")
    val a = fresh.collect().map(_.toString).sorted.toSeq
    val b = committed.collect().map(_.toString).sorted.toSeq
    assert(a.length == b.length, s"$name: ${a.length} fresh rows vs ${b.length} committed")
    val firstDiff = a.zip(b).indexWhere { case (x, y) => x != y }
    assert(a == b, s"$name: fixture is STALE relative to the current kernel " +
      s"(first diff at sorted row $firstDiff: ${a.lift(firstDiff)} vs ${b.lift(firstDiff)}); " +
      "if the kernel change is intentional, regenerate with runMain graft.tools.GenFixtures")
  }

  for (sf <- Seq("sf0.001", "sf0.01"); name <- graft.tools.GenFixtures.perSf)
    test(s"committed fixture is fresh: $name ($sf)") {
      assertSameRows(name,
        SparkEntry.queries(name)(spark, s"/root/testdata/$sf"),
        s"$FixRoot/$sf/$name")
    }

  for (name <- graft.tools.GenFixtures.anySf)
    test(s"committed fixture is fresh: $name (any)") {
      assertSameRows(name,
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.01"),
        s"$FixRoot/any/$name")
    }

  test("committed BPE merges resource is fresh") {
    // same closure as the parquet gate: a stale merges table would make
    // q_subword's fixture and the driver output agree on stale counts
    val fresh = graft.kernel.Bpe.trainDefault()
    val committed = graft.kernel.Bpe.default.merges
    val firstDiff = fresh.zip(committed).indexWhere { case (a, b) => a != b }
    assert(fresh == committed,
      s"bpe_merges.txt is STALE relative to the current trainer/corpus " +
        s"(${fresh.length} fresh vs ${committed.length} committed merges; first diff " +
        s"at $firstDiff); if intentional, regenerate with runMain " +
        "graft.tools.GenFixtures, then RECOMPILE so the resource reloads")
  }
}
