package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator analogs of the reference's reporting/query layer
  * (SURVEY.md §2.7-2.8): aggregation rollups, argmax, top-k per group,
  * filter batteries with HAVING, keyset pagination, frequency-penalty
  * scalar — expressed as plain Catalyst plans over the TPC-H-ish tables.
  */
object RelOps {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** A1/A3 analog: grouped rollup with exact decimal money sums. */
  def aggRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).as("sum_base_price"),
        sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))

  /** V4 analog (parallel scoring + argmax): per group keep the max-score
    * element, deterministic tie-break by smallest key.
    *
    * Single-pass aggregation: `max_by` over the ordering key
    * (price, −orderkey) picks the max-price row and, among price ties, the
    * smallest key — ONE exchange instead of the former aggregate +
    * self-join + re-aggregate (3 exchanges + a join; r7 in-session A/B
    * 0.64 s → 0.19 s at sf0.1). Deterministic because the ordering key is
    * unique per row (o_orderkey is unique); keys are non-negative so the
    * negation cannot overflow.
    */
  def argmaxPerCustomer(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(max("o_totalprice").as("max_price"),
        max_by(col("o_orderkey"),
          struct(col("o_totalprice"), negate(col("o_orderkey")))).as("best_order"))

  /** F2 analog: top-1 per group. Struct-max aggregation — max over
    * (price, −key) ≡ row_number()=1 under ORDER BY price DESC, key ASC,
    * without shuffling + sorting every row under a window (one aggregate
    * exchange; r7 in-session A/B 0.28 s → 0.19 s at sf0.1; top-k for k > 1
    * would go back to the window form).
    */
  def topPerGroup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .groupBy("o_custkey")
      .agg(max(struct(col("o_totalprice").as("p"),
        negate(col("o_orderkey")).as("nk"))).as("m"))
      .select(col("o_custkey"), negate(col("m.nk")).as("o_orderkey"),
        col("m.p").as("o_totalprice"))

  /** F1 analog: composable filter battery + HAVING-style group filter. */
  def filterBattery(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .where(col("o_orderstatus") === "F" && col("o_totalprice") > 1000)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
      .where(col("cnt") >= 2)

  /** F6 analog: keyset pagination — cursor predicate (a > a0) OR (a = a0 AND
    * b > b0), total order, limit. Pushes to the scan as a plain filter.
    */
  def keysetPage(spark: SparkSession, dir: String,
      afterPrice: Double = 5000.0, afterKey: Long = 0L, pageSize: Int = 20): DataFrame =
    t(spark, dir, "orders")
      .where(col("o_totalprice") > afterPrice ||
        (col("o_totalprice") === afterPrice && col("o_orderkey") > afterKey))
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
      .limit(pageSize)
      .select("o_orderkey", "o_custkey", "o_totalprice")

  /** A2 analog: family-frequency penalty `1 if n<3 else 1+floor(log2 n)`,
    * expressed as integer bit length (engine-exact, no float log) — shares
    * MatchReportOps.familyAdjustment's unbounded ladder.
    */
  def frequencyPenalty(spark: SparkSession, dir: String): DataFrame = {
    val counts = t(spark, dir, "orders").groupBy("o_custkey")
      .agg(count(lit(1)).as("n"))
    counts.withColumn("adjustment", MatchReportOps.familyAdjustment(col("n")))
  }

  /** Windowed event aggregation (tumbling processing-hour) over `events`. */
  def eventWindowAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      // group on the truncated TIMESTAMP (8-byte shuffle key, no per-row
      // string render) and format once per group after the aggregate —
      // date_format is injective on hour-truncated UTC timestamps, so the
      // (w, event_type) groups are identical to grouping on the string
      // (window key stays a string in the output: engine-portable exact
      // compare — timestamp physical representations differ between engines)
      .groupBy(date_trunc("hour", col("ts")).as("tw"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        max(col("value")).as("max_value"),
        min(col("value")).as("min_value"))
      .select(date_format(col("tw"), "yyyy-MM-dd HH:mm:ss").as("w"),
        col("event_type"), col("cnt"), col("max_value"), col("min_value"))

  /** F3 analog (unique-score): per order, number of parts appearing in no
    * other order, and the exclusive quantity share.
    */
  def uniqueScore(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val partOrders = li.groupBy("l_partkey")
      .agg(countDistinct("l_orderkey").as("n_orders"))
    li.join(partOrders, "l_partkey")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("n_orders") === 1, 1).otherwise(0)).as("n_unique_parts"))
  }
}
