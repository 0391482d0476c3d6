package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface parity: the extension-registered functions must produce the
  * SAME plans/values as the Scala Column helpers. Uses its own session
  * (extensions bind at session construction), restoring the default
  * session state afterwards so other suites are unaffected.
  */
class GraftExtensionsSpec extends AnyFunSuite {

  private def withExtSession[T](f: SparkSession => T): T = {
    // extensions bind at session construction, so this needs its own
    // SparkSession — but it must SHARE the suite-wide SparkContext (and
    // never stop it: the context is JVM-global and stopping it kills every
    // other suite's shared session). Forcing the shared base session first
    // guarantees getOrCreate below attaches to the live context.
    SparkTestBase.session
    val prevActive = SparkSession.getActiveSession
    val prevDefault = SparkSession.getDefaultSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // programmatic route: `spark.sql.extensions` is a STATIC conf read from
    // the SparkContext at first-session construction, so it cannot bind to
    // a later session on a shared test context — `withExtensions` is the
    // equivalent in-process hook (spark-submit users set the conf)
    val spark = SparkSession.builder()
      .withExtensions(new graft.expr.GraftExtensions)
      .getOrCreate()
    try f(spark)
    finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }

  test("extension registers graft_cosine / sig_score / normalized_md5 for SQL") {
    withExtSession { spark =>
      // graft_cosine: SQL result bitwise-equals the kernel
      val cos = spark.sql(
        """SELECT graft_cosine(array(cast(1.0 as float), cast(2.0 as float)),
          |                    array(cast(2.0 as float), cast(4.0 as float))) AS c""".stripMargin)
        .collect()(0).getDouble(0)
      val kern = graft.expr.CosineKernel.score(Array(1.0f, 2.0f), Array(2.0f, 4.0f))
      assert(java.lang.Double.doubleToRawLongBits(cos) ==
        java.lang.Double.doubleToRawLongBits(kern))

      // sig_score: "x0" vs "y0" → second byte equal → 50.0
      val score = spark.sql(
        "SELECT sig_score(encode('x0', 'UTF-8'), encode('y0', 'UTF-8')) AS s")
        .collect()(0).getDouble(0)
      assert(score == 50.0)

      // normalized_md5: SQL equals the Column helper on the same input
      import spark.implicits._
      val df = Seq("Some  Text\n\nhere", "other").toDF("text")
      df.createOrReplaceTempView("docs")
      val viaSql = spark.sql("SELECT normalized_md5(text) AS fp FROM docs")
        .as[String].collect().toSeq
      val viaCol = df.select(
        graft.expr.NormalizedMd5.normalizedMd5(org.apache.spark.sql.functions.col("text")).as("fp"))
        .as[String].collect().toSeq
      assert(viaSql == viaCol)

      // the SQL route compiles to the same native expression (codegen span,
      // no UDF) — same plan shape as the Scala API. Non-local input: a
      // local Seq relation would be constant-folded to a LocalTableScan.
      spark.range(4).selectExpr("concat('t', id) AS text")
        .createOrReplaceTempView("docs_range")
      val plan = spark.sql("SELECT normalized_md5(text) AS fp FROM docs_range")
        .queryExecution.executedPlan.toString
      assert(plan.contains("normalized_md5"), s"native expression missing:\n$plan")
      assert(!plan.toLowerCase.contains("scalaudf"), s"UDF in SQL route:\n$plan")
    }
  }

  test("input-type contract: doubles cast, strings cast, null elements → NULL") {
    withExtSession { spark =>
      // DOUBLE literals (the default SQL fractional type) implicitly CAST
      // to array<float> — without declared inputTypes this reinterpreted
      // 8-byte slots as floats and returned silent garbage
      val viaDoubles = spark.sql(
        "SELECT graft_cosine(array(1.0, 2.0), array(2.0, 4.0)) AS c")
        .collect()(0).getDouble(0)
      val kern = graft.expr.CosineKernel.score(Array(1.0f, 2.0f), Array(2.0f, 4.0f))
      assert(java.lang.Double.doubleToRawLongBits(viaDoubles) ==
        java.lang.Double.doubleToRawLongBits(kern))

      // a null ELEMENT yields SQL NULL (HOF parity), not a 0.0-padded score
      val nullRow = spark.sql(
        """SELECT graft_cosine(array(cast(1.0 as float), cast(null as float)),
          |                    array(cast(1.0 as float), cast(1.0 as float))) AS c""".stripMargin)
        .collect()(0)
      assert(nullRow.isNullAt(0), s"null element must produce NULL, got $nullRow")

      // strings implicitly cast to their UTF-8 bytes for sig_score
      val viaStrings = spark.sql("SELECT sig_score('x0', 'y0') AS s")
        .collect()(0).getDouble(0)
      assert(viaStrings == 50.0)
    }
  }

  test("wrong arity is rejected with a clear message") {
    withExtSession { spark =>
      val e = intercept[Exception] {
        spark.sql("SELECT graft_cosine(array(cast(1.0 as float)))").collect()
      }
      assert(e.getMessage.contains("graft_cosine expects 2 arguments"))
    }
  }
}
