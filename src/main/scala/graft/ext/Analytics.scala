package graft.ext

import graft.io.Sources
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytical query pack over the TPC-H-ish tables — the join/aggregate
  * workload that exercises the engine at its largest test scale
  * (lineitem = 600 k rows at sf0.1; ~100 TB-class fact table in
  * production).
  *
  * Determinism rule for money sums: aggregate in DECIMAL (exact,
  * order-independent — a double sum differs in the last ulp depending on
  * partition merge order) and cast the final value to double once.
  * Counts/int sums are exact already.
  *
  * Plan posture: dims broadcast (explicit hint where cardinality is
  * known-tiny), fact table never re-shuffled except by its groupBy keys;
  * top-k via TakeOrderedAndProject (no global sort).
  */
object Analytics {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** TPC-H Q1-shaped pricing summary over lineitem. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val l = Sources.table(spark, dir, "lineitem")
    l.groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Revenue per region through the full dim chain (flagship shape). */
  def regionalRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Sources.table(spark, dir, "lineitem")
    val orders   = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val nation   = Sources.table(spark, dir, "nation")
    val region   = Sources.table(spark, dir, "region")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  /** Region → nation ROLLUP of revenue: per-nation rows, per-region
    * subtotals, and the grand total from ONE aggregation. Spark executes
    * rollup as Expand + a single hash aggregate — one shuffle covers all
    * three levels (vs 3× the fact scan for self-unioned GROUP BYs), the
    * shape that matters when the fact side is 100 TB. Grouping flags are
    * emitted as columns and lead the ORDER BY so subtotal rows order
    * deterministically without relying on engine NULL-sort defaults
    * (NULL key columns are constant within each flag combination).
    */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Sources.table(spark, dir, "lineitem")
    val orders   = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val nation   = Sources.table(spark, dir, "nation")
    val region   = Sources.table(spark, dir, "region")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .select(col("r_name"), col("n_name"), col("g_region"), col("g_nation"),
        col("revenue"), col("n_items"))
      .orderBy("g_region", "g_nation", "r_name", "n_name")
  }

  /** Per-nation supplier shipment volume: fact joined through the
    * supplier dim chain (both dims broadcast — supplier is 10 k rows at
    * sf1, nation is 25). The fact shuffles once, on the groupBy key.
    */
  def supplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Sources.table(spark, dir, "lineitem")
    val supplier = Sources.table(spark, dir, "supplier")
    val nation   = Sources.table(spark, dir, "nation")
    lineitem
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("volume"),
        countDistinct(col("s_suppkey")).as("n_suppliers"),
        count(lit(1)).as("n_items"))
      .orderBy("n_name")
  }

  /** Monthly order revenue trend: time-bucketed aggregate over orders —
    * the canonical reporting shape a date-partitioned layout serves with
    * partition pruning at 100 TB. Month keyed as a portable string.
    */
  def monthlyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val orders = Sources.table(spark, dir, "orders")
    orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(
        sum(dec(col("o_totalprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
      .orderBy("month")
  }

  /** Top-10 customers by revenue — join + agg + TakeOrderedAndProject. */
  def topCustomers(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val lineitem = Sources.table(spark, dir, "lineitem")
    val orders   = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name")
      .agg(sum(dec(col("l_extendedprice"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)
  }

  /** Rank orders inside each priority class by price — window surface. */
  def orderPriorityRank(spark: SparkSession, dir: String, topN: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val orders = Sources.table(spark, dir, "orders")
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders
      .withColumn("price_rank", row_number().over(w))
      .filter(col("price_rank") <= topN)
      .select("o_orderpriority", "price_rank", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "price_rank")
  }

  /** JSON-typed column extraction from events.props + rollup. */
  def eventProps(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    events
      .withColumn("k_value", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k_value").as("sum_k"),
        max("k_value").as("max_k"))
      .orderBy("event_type")
  }

  /** Winsorize `value` within each event_type: clip to the per-group
    * [p_lo, p_hi] DISCRETE order statistics (value at rank ⌈q·n⌉ — an
    * existing value, picked by rank, not interpolated: no float
    * arithmetic, so the result is oracle-exact across engines).
    * Plan: one window shuffle on the group key for the ranks, a tiny
    * per-group bounds table broadcast back. Standard outlier clipping
    * before model-feature extraction.
    */
  def winsorize(
      spark: SparkSession,
      dir: String,
      lo: Double = 0.05,
      hi: Double = 0.95): DataFrame = {
    val events = Sources.table(spark, dir, "events")
      .select("event_id", "event_type", "value")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("value", "event_id")
    val ranked = events
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("event_type")))
    val bounds = ranked.groupBy("event_type").agg(
      max(when(col("rn") === ceil(lit(lo) * col("n")), col("value"))).as("lo_v"),
      max(when(col("rn") === ceil(lit(hi) * col("n")), col("value"))).as("hi_v"))
    events.join(broadcast(bounds), Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"),
        least(greatest(col("value"), col("lo_v")), col("hi_v")).as("clipped_value"))
      .orderBy("event_id")
  }
}
