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

  /** Event types pivoted to columns per day — the wide-format activity
    * report. The pivot value list is EXPLICIT (the closed event-type
    * vocabulary), so Spark plans ONE conditional-count aggregate over
    * one scan; an unlisted pivot would first run a distinct-values job
    * — a second full scan just to learn the columns, which at 100 TB
    * doubles the query. Types OUTSIDE the declared vocabulary land in
    * an `n_other` column instead of being silently dropped (an
    * explicit-values pivot alone eats drifted feeds without a trace —
    * the partition invariant Σcells = Σevents must hold on ANY data).
    * Day is derived arithmetically from the µs epoch (no
    * session-timezone dependence — a TZ-sensitive date bucket hashes
    * differently across engines/configs).
    */
  val EventTypes: Seq[String] = Seq("click", "error", "purchase", "signup", "view")
  val PivotOther: String = "other"

  def eventPivot(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    // integral DIV, not double `/`+floor: a double quotient one ulp shy
    // of an integer would mis-bucket the µs exactly on midnight.
    // Positive-epoch assumption (here and in userRetention/dailyAnomaly):
    // DIV truncates toward zero while the oracle's `//` floors, so the
    // two disagree on PRE-1970 timestamps — fine for event data, not a
    // general date kernel
    val day = date_add(
      to_date(lit("1970-01-01")),
      expr("ts DIV 86400000000").cast("int"))
    val bucketed = when(col("event_type").isin(EventTypes: _*), col("event_type"))
      .otherwise(lit(PivotOther))
    val cols = EventTypes :+ PivotOther
    events
      .select(day.cast("string").as("day"), bucketed.as("event_type"))
      .groupBy("day")
      .pivot("event_type", cols)
      .agg(count(lit(1)))
      .select(col("day") +: cols.map(t =>
        coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
      .orderBy("day")
  }

  /** Customers with NO order above `minPrice` — the anti-join surface
    * (left_anti: one shuffle of the customer keys against the FILTERED
    * order keys). The price predicate reaches the orders parquet scan
    * (PushedFilters), so the right side of the anti-join is the
    * high-value minority, not the fact table — at scale AQE turns the
    * post-filter side into a broadcast and the customer table never
    * shuffles at all.
    */
  def dormantCustomers(
      spark: SparkSession, dir: String, minPrice: Double = 400000.0): DataFrame = {
    val customer = Sources.table(spark, dir, "customer")
    val bigOrders = Sources.table(spark, dir, "orders")
      .filter(col("o_totalprice") > minPrice)
      .select(col("o_custkey"))
    customer
      .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal")
      .orderBy("c_custkey")
  }

  /** Monthly revenue with a trailing `window`-month sum and
    * month-over-month delta — the frame-bounded window surface. The
    * window runs over the PRE-AGGREGATED month domain (bounded by the
    * calendar, ~1200 rows for a century), never raw orders, so the
    * single-partition global window Spark warns about is a constant-
    * size frame at any corpus scale — the same histogram-first shape
    * as [[graft.ext.TextStats.lengthQuantiles]]. All window arithmetic
    * stays in DECIMAL (exact, order-independent); one double cast at
    * the end. First month's delta is 0 by the COALESCE-to-self rule
    * (portable: no engine-specific null-arithmetic).
    */
  def revenueTrend(spark: SparkSession, dir: String, window: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(window >= 1, s"trailing window must be >= 1: $window")
    val orders = Sources.table(spark, dir, "orders")
    val monthly = orders
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
      .agg(sum(dec(col("o_totalprice"))).as("_rev"), count(lit(1)).as("n_orders"))
    val wTrail = Window.orderBy("month").rowsBetween(-(window - 1), 0)
    val wLag = Window.orderBy("month")
    monthly
      .withColumn("_trail", sum(col("_rev")).over(wTrail))
      .withColumn("_prev", lag(col("_rev"), 1).over(wLag))
      .select(
        col("month"),
        col("_rev").cast("double").as("revenue"),
        col("n_orders"),
        col("_trail").cast("double").as("revenue_trailing"),
        (col("_rev") - coalesce(col("_prev"), col("_rev")))
          .cast("double").as("mom_delta"))
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

  /** Top-`topN` parts per brand by lineitem revenue. The window ranks
    * the PRE-AGGREGATED part domain (bounded by |part|, not the fact
    * table) and the rank bound is a CONSTANT, so Spark's
    * WindowGroupLimit pushdown keeps only topN rows per brand on the
    * map side before the window's shuffle — the two properties that
    * keep a per-group top-k from funneling raw fact rows through
    * per-brand reducer tasks at 100 TB (spec-asserted).
    */
  def brandLeaders(spark: SparkSession, dir: String, topN: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = Sources.table(spark, dir, "lineitem")
    val p = Sources.table(spark, dir, "part")
    val perPart = l
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_partkey", "p_name")
      .agg(sum(dec(col("l_extendedprice")) *
        (lit(1).cast("decimal(18,2)") - dec(col("l_discount")))).as("_rev"))
    // rank on the exact DECIMAL (engine-portable ordering); the double
    // cast happens only in the projected output
    val w = Window.partitionBy("p_brand")
      .orderBy(col("_rev").desc, col("p_partkey"))
    perPart
      .withColumn("brand_rank", row_number().over(w))
      .filter(col("brand_rank") <= topN)
      .select(col("p_brand"), col("brand_rank"), col("p_partkey"), col("p_name"),
        col("_rev").cast("double").as("revenue"))
      .orderBy("p_brand", "brand_rank")
  }

  /** Day-over-day user retention: per day, the distinct active users
    * and how many were also active the previous day. The product-
    * analytics companion to sessionize. Shape: one (day, user)
    * de-duplication (map-side partial distinct), then a SELF semi-join
    * co-partitioned on the same (day, user) key — day arithmetic on
    * the µs epoch keeps both engines timezone-free, and every
    * aggregate's output is bounded by the day domain.
    */
  def userRetention(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    // the (day,user) distinct feeds THREE consumers (DAU, the shifted
    // side, and the semi-join probe); without pinning, each re-scans
    // the fact table — plan-audited: Spark does not exchange-reuse
    // across the differing parent projections
    val daily = graft.core.CacheScope.persist(events
      .select(expr("ts DIV 86400000000").as("day_idx"), col("user_id"))
      .distinct())
    val dau = daily.groupBy("day_idx").agg(count(lit(1)).as("n_users"))
    val prev = daily.select((col("day_idx") + 1).as("day_idx"), col("user_id"))
    val retained = daily.join(prev, Seq("day_idx", "user_id"), "left_semi")
      .groupBy("day_idx").agg(count(lit(1)).as("n_retained"))
    dau.join(retained, Seq("day_idx"), "left")
      .select(col("day_idx"), col("n_users"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        round(coalesce(col("n_retained"), lit(0L)).cast("double") / col("n_users"), 4)
          .as("retention"))
      .orderBy("day_idx")
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

  /** TPC-H Q6-shaped revenue forecast: a pure scan-filter-aggregate
    * whose three predicates (date range, discount band, quantity cap)
    * ALL reach the parquet scan as PushedFilters — at 100 TB with a
    * date-partitioned layout the range predicate prunes partitions
    * before any row is read, and the one-row DECIMAL aggregate ships
    * a single partial per task. The canonical "is pushdown working"
    * probe: if this query's scan shows no PushedFilters, the engine
    * is reading 100 TB to sum a sliver.
    */
  def revenueForecast(
      spark: SparkSession, dir: String,
      yearStart: String = "1995-01-01", yearEnd: String = "1996-01-01",
      discLo: Double = 0.05, discHi: Double = 0.07,
      maxQty: Double = 24.0): DataFrame = {
    val l = Sources.table(spark, dir, "lineitem")
    l.filter(col("l_shipdate") >= lit(yearStart) && col("l_shipdate") < lit(yearEnd)
        && col("l_discount").between(discLo, discHi)
        && col("l_quantity") < maxQty)
      .agg(
        sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("revenue")
  }

  /** Small-lot revenue (TPC-H Q17 shape): total revenue from lineitems
    * whose quantity is below 20% of their part's average quantity —
    * the canonical CORRELATED-SUBQUERY pattern, decorrelated the way
    * Catalyst (or a careful author) rewrites it: compute the per-part
    * average ONCE as an aggregate, join it back by part key, filter,
    * sum. Both sides of the join are keyed on l_partkey (the aggregate
    * reuses the fact's own key), so the join co-partitions with the
    * aggregate's shuffle; no per-row subquery ever executes. The avg
    * is exact-decimal (sum/count both exact; one portable division
    * per part at 6 dp).
    */
  def smallLotRevenue(spark: SparkSession, dir: String, frac: Double = 0.2): DataFrame = {
    val l = Sources.table(spark, dir, "lineitem")
      .select("l_partkey", "l_quantity", "l_extendedprice")
    val avgQty = l.groupBy("l_partkey")
      .agg(round(sum(dec(col("l_quantity"))).cast("double") / count(lit(1)), 6)
        .as("_avg_qty"))
    l.join(avgQty, Seq("l_partkey"))
      .filter(col("l_quantity") < col("_avg_qty") * lit(frac))
      .agg(
        sum(dec(col("l_extendedprice"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("revenue")
  }

  /** RFM customer segmentation: per customer the recency (days since
    * their last order, measured against the CORPUS's max order date —
    * a data-derived reference, never the wall clock, so the result is
    * reproducible), frequency (order count), monetary (exact DECIMAL
    * spend), and a literal segment bin. One customer-keyed aggregate
    * plus a broadcast 1-row corpus-max join; integer day arithmetic
    * end-to-end.
    */
  def customerSegments(
      spark: SparkSession, dir: String,
      activeDays: Int = 365, bigSpend: Double = 1500000.0): DataFrame = {
    val orders = Sources.table(spark, dir, "orders")
    val perCust = orders.groupBy("o_custkey").agg(
      max(col("o_orderdate")).as("_last"),
      count(lit(1)).as("n_orders"),
      sum(dec(col("o_totalprice"))).as("_spend"))
    val corpusMax = orders.agg(max(col("o_orderdate")).as("_ref"))
    perCust
      .join(broadcast(corpusMax))
      .select(
        col("o_custkey"),
        datediff(col("_ref"), col("_last")).cast("bigint").as("recency_days"),
        col("n_orders"),
        col("_spend").cast("double").as("total_spend"),
        when(datediff(col("_ref"), col("_last")) <= activeDays,
          when(col("_spend") >= lit(bigSpend).cast("decimal(18,2)"), "active_big")
            .otherwise("active"))
          .otherwise(
            when(col("_spend") >= lit(bigSpend).cast("decimal(18,2)"), "lapsed_big")
              .otherwise("lapsed")).as("segment"))
      .orderBy("o_custkey")
  }

  /** Priority fulfillment (TPC-H Q4 shape): per priority class, how
    * many orders contain at least one bulk lineitem — the EXISTS
    * correlated-subquery pattern as its physical best self: a LEFT
    * SEMI join (first match short-circuits; no duplicate inflation, no
    * distinct needed) against the quantity-FILTERED lineitem side,
    * with the filter pushed to the parquet scan. One key-shuffle of
    * the filtered minority + a ≤|priorities|-group aggregate.
    */
  def priorityFulfillment(
      spark: SparkSession, dir: String, minQty: Double = 45.0): DataFrame = {
    val orders = Sources.table(spark, dir, "orders")
    val bulk = Sources.table(spark, dir, "lineitem")
      .filter(col("l_quantity") > minQty)
      .select(col("l_orderkey"))
    orders
      .join(bulk, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")
  }

  /** Event-transition matrix: counts of (event_type → next event_type)
    * within each user's timeline — the Markov-chain view of user
    * behavior (what follows a signup? where do error loops sit?).
    * One window `lead` over the user-keyed sort (the SAME shuffle
    * sessionize pays — grouping by user is the floor), then a
    * ≤|types|²-group aggregate; a self-join on (user, rank+1) would
    * shuffle the fact twice for the same adjacency. Timeline ends
    * (lead = NULL) are dropped: the matrix counts transitions, not
    * terminations.
    */
  def eventTransitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val events = Sources.table(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy("event_type", "next_type")
  }

  /** Daily ingest-volume anomaly scores: per (day, event_type) count
    * with its z-score against that type's daily distribution — the
    * drift monitor an ingestion pipeline alarms on (a collapsed or
    * doubled feed shows as |z| spikes). Portability: mean/variance are
    * derived from EXACT integer sums (Σn, Σn²) in a fixed expression
    * order, so both engines run the identical IEEE double ops —
    * no streaming-variance accumulator whose merge order could drift.
    * Shape: one fact aggregate to the (day, type) domain, a per-type
    * 3-number stats broadcast back over it; nothing after the first
    * aggregate scales with the corpus.
    */
  def dailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    val daily = events
      .select(expr("ts DIV 86400000000").as("day_idx"), col("event_type"))
      .groupBy("day_idx", "event_type").agg(count(lit(1)).as("n"))
    val stats = daily.groupBy("event_type").agg(
      count(lit(1)).as("_days"),
      sum("n").as("_sum"),
      sum(col("n") * col("n")).as("_sumsq"))
    val mean = col("_sum").cast("double") / col("_days")
    val variance = col("_sumsq").cast("double") / col("_days") - mean * mean
    daily.join(broadcast(stats), Seq("event_type"))
      .select(col("day_idx"), col("event_type"), col("n"),
        when(variance > 0,
          round((col("n").cast("double") - mean) / sqrt(variance), 4))
          .otherwise(lit(0.0)).as("z_score"))
      .orderBy("day_idx", "event_type")
  }

  /** Cross-nation trade flows (TPC-H Q7 shape): revenue by (customer
    * nation → supplier nation) pair, excluding domestic trade. The
    * fact table resolves BOTH dimension chains — customer-side and
    * supplier-side — in one pass with every dim broadcast, so the only
    * fact shuffle is the final groupBy on the 2-nation key (≤ |n|²
    * groups survive map-side combine). The join-graph shape (one fact,
    * two independent dim chains meeting in the same row) is the one
    * the earlier analytics queries don't cover.
    */
  def tradeFlows(spark: SparkSession, dir: String): DataFrame = {
    val lineitem = Sources.table(spark, dir, "lineitem")
    val orders   = Sources.table(spark, dir, "orders")
    val customer = Sources.table(spark, dir, "customer")
    val supplier = Sources.table(spark, dir, "supplier")
    val nation   = Sources.table(spark, dir, "nation")
    val custNation = nation.select(col("n_nationkey").as("_cnk"),
      col("n_name").as("cust_nation"))
    val suppNation = nation.select(col("n_nationkey").as("_snk"),
      col("n_name").as("supp_nation"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("_cnk"))
      .join(broadcast(supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("_snk"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy("cust_nation", "supp_nation")
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("cust_nation", "supp_nation")
  }

  /** Signup → view → purchase funnel off each user's FIRST event of
    * each type: one conditional-min aggregate keyed by user (single
    * fact shuffle, map-side combined), then a one-row rollup — the
    * strict-order conversion report. NULL first-times fall out of the
    * strict `<` comparisons on both engines identically (NULL → no
    * credit), so no explicit null plumbing is needed.
    */
  def eventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val events = Sources.table(spark, dir, "events")
    val firsts = events
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "signup", col("ts"))).as("t_signup"),
        min(when(col("event_type") === "view", col("ts"))).as("t_view"),
        min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    firsts
      .agg(
        count(lit(1)).as("n_users"),
        sum(when(col("t_signup").isNotNull, 1L).otherwise(0L)).as("n_signup"),
        sum(when(col("t_signup") < col("t_view"), 1L).otherwise(0L))
          .as("n_signup_then_view"),
        sum(when(col("t_signup") < col("t_view") && col("t_view") < col("t_purchase"),
          1L).otherwise(0L)).as("n_full_funnel"))
      .select(col("n_users"), col("n_signup"), col("n_signup_then_view"),
        col("n_full_funnel"),
        when(col("n_signup") > 0,
          round(col("n_full_funnel").cast("double") / col("n_signup"), 4))
          .otherwise(lit(0.0)).as("conversion"))
      .orderBy("n_users")
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

  /** Pre-flight join-skew report: per-key row counts of BOTH sides of a
    * planned join and the output rows each key would produce
    * (n_left × n_right) — the number you read BEFORE launching a 100 TB
    * shuffle join to decide salting / AQE skew handling / a broadcast.
    * A key at 10⁶ × 10⁶ is a 10¹²-row partition no executor survives;
    * this report names it for the cost of two aggregates.
    *
    * Scale shape: each side collapses to its distinct-key count first
    * (map-side combine — the FACT tables never shuffle whole), the two
    * count tables full-outer-join on key (keys present on one side only
    * produce 0 join rows but still matter for outer/anti planning), and
    * the top-N cut is a TakeOrderedAndProject (per-partition heaps, one
    * N-row driver merge). (join_rows DESC, key) is a total order.
    */
  def joinSkewReport(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      topN: Int = 20): DataFrame = {
    val l = left.groupBy(col(leftKey).as("key")).agg(count(lit(1)).as("n_left"))
    val r = right.groupBy(col(rightKey).as("key")).agg(count(lit(1)).as("n_right"))
    l.join(r, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_left"), lit(0L)).as("n_left"),
        coalesce(col("n_right"), lit(0L)).as("n_right"))
      .withColumn("join_rows", col("n_left") * col("n_right"))
      .orderBy(col("join_rows").desc, col("key"))
      .limit(topN)
  }
}
