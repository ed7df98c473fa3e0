package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scan → filter → project → aggregate operators (SURVEY.md §2.2/§2.4/§2.5).
  *
  * Reference semantics pinned here (file:line are in `/root/reference/`):
  *  - P4/P5 compound row predicates — Flight1/src/main/java/hw3/PLAIN.java:86–109,
  *    Flight2/src/main/java/hw4/Secondary.java:69–91.
  *  - P6 null/empty→0 then Java `(int)` TRUNCATION (not rounding) —
  *    Secondary.java:57–58.
  *  - A5 global count+sum+avg (the reference's Hadoop-counter side channel,
  *    PLAIN.java:192–209) — here a one-row aggregate.
  *  - A6 per-group `ceil(avg)` as int — Secondary.java:213–221.
  *  - A7 dense month fill 1–12 with 0 for missing — Secondary.java:181–200.
  *  - A12/O6 top-k — final/src/main/java/calc/Summarizer.java:81–86.
  *
  * All builders are plain declarative DataFrame transforms: filters and
  * projections reach the parquet scan (PushedFilters/ReadSchema), grouped
  * aggregates get map-side partial aggregation (HashAggregateExec
  * partial→final) — the combiner variants the reference hand-codes
  * (WordCount2) are subsumed by that machinery (SURVEY.md §4).
  *
  * Every query ends in an explicit total-order `orderBy`: MR reducers emit
  * key-sorted output (§2 O5); Spark `groupBy` does not, and the driver's
  * oracle compare needs a deterministic row order.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: filter → groupBy → multi-agg.
    * Exercises S1/S6 (pushed-down scan), P4 (date predicate), A1/A6.
    * `sum_qty` is exact (integral doubles); `sum_price` is rounded because
    * float addition order differs across engines.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum("l_quantity").as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_price"),
        avg("l_quantity").as("avg_qty"),
        ceil(avg("l_quantity")).cast("int").as("ceil_avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** P3/P4/P5: compound predicate + narrow projection. The .explain plan
    * must show both the filter and the 4-column ReadSchema pushed to the
    * parquet scan — at 100 TB this is the difference between reading 4
    * columns of a few row groups and reading everything.
    */
  def filterProject(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(
        col("l_returnflag") === "R" &&
        col("l_quantity").between(10, 20) &&
        col("l_shipdate").between(
          lit("1996-01-01").cast("timestamp_ntz"),
          lit("1996-12-31").cast("timestamp_ntz")))
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** A5: one-row global aggregate (count/sum/avg/min/max). The reference's
    * Hadoop-counter side channel becomes the aggregate itself.
    */
  def globalStats(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_returnflag") =!= "N")
      .agg(
        count(lit(1)).as("n_rows"),
        sum("l_quantity").as("sum_qty"),
        avg("l_quantity").as("avg_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"))

  /** A6: per (flag, month) `ceil(avg)` as int — the airline/month delay
    * query of Flight2 Secondary.java re-keyed to the harness tables.
    * The reference's secondary sort (O3/O4) vanishes: groupBy needs no
    * in-group ordering.
    */
  private def ceilAvgAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_returnflag").as("flag"),
               month(col("l_shipdate")).as("mon"))
      .agg(ceil(avg("l_quantity")).cast("int").as("avg_qty"))

  def ceilAvgByMonth(lineitem: DataFrame): DataFrame =
    ceilAvgAgg(lineitem).orderBy("flag", "mon")

  /** A7: dense domain fill — every (flag, month 1–12) cell, 0 where no
    * data. The reference streams sorted months in the reducer and emits
    * gaps (Secondary.java:181–200); relationally it is a cross join with a
    * dense month dimension + left join + fill.
    */
  def denseMonthFill(lineitem: DataFrame): DataFrame = {
    val spark = lineitem.sparkSession
    val months = spark.range(1, 13).select(col("id").cast("int").as("mon"))
    val flags = lineitem.select(col("l_returnflag").as("flag")).distinct()
    val agg = ceilAvgAgg(lineitem) // A6 semantics defined once
    flags.crossJoin(broadcast(months))
      .join(agg, Seq("flag", "mon"), "left")
      .na.fill(0, Seq("avg_qty"))
      .orderBy("flag", "mon")
  }

  /** A12/O6: top-k with a deterministic tiebreak. Spark plans
    * TakeOrderedAndProject — per-partition heaps then a k-row merge on the
    * driver, no global sort. That is the plan that survives 100 TB.
    */
  def topKOrders(orders: DataFrame, k: Int = 10): DataFrame =
    orders
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(k)

  /** Cohort REVENUE curve (LTV table): customers grouped by their
    * first-order month, revenue attributed to months-since-acquisition
    * — the revenue sibling of the q104 retention table, and the input
    * every LTV projection reads. Month arithmetic is the integer
    * `year·12 + month − 1` index (identical both engines); cents
    * exact.
    *
    * Shape: a per-customer min (the cohort), one fact join keyed on
    * custkey, one (cohort, offset) agg — the q104 discipline.
    */
  def cohortRevenue(orders: DataFrame, maxOffset: Int = 3): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be >= 0")
    val mIdx = (year(col("o_orderdate")) * 12 +
      month(col("o_orderdate")) - 1).cast("long")
    val fo = orders.select(col("o_custkey"), mIdx.as("__m"))
      .groupBy("o_custkey").agg(min("__m").as("cohort_m"))
    orders.select(col("o_custkey"), mIdx.as("__m"),
        round(col("o_totalprice") * 100).cast("long").as("__cents"))
      .join(fo, "o_custkey")
      .withColumn("offset_m", col("__m") - col("cohort_m"))
      .filter(col("offset_m") <= maxOffset)
      .groupBy("cohort_m", "offset_m")
      .agg(count(lit(1)).as("n_orders"), sum("__cents").as("rev_cents"))
      .orderBy("cohort_m", "offset_m")
  }

  /** Supplier REDUNDANCY census — parts by how many distinct suppliers
    * ship them: the supply-risk histogram whose low end (single-sourced
    * parts) is what a procurement review hunts. Two-level distinct
    * aggregate, |distinct counts| rows out.
    */
  def supplierRedundancy(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_partkey")
      .agg(countDistinct(col("l_suppkey")).as("n_suppliers"))
      .groupBy("n_suppliers")
      .agg(count(lit(1)).as("n_parts"))
      .orderBy("n_suppliers")

  /** Repeat-customer REVENUE census — the one-row retention economics
    * table: customers, repeat customers (≥ `minOrders` orders), total
    * and repeat-attributed revenue in exact cents, and the repeat
    * share — "what fraction of revenue comes from customers who came
    * back". Two-level aggregate (per-customer partials → one row), all
    * integer cents.
    */
  def repeatCustomerCensus(orders: DataFrame,
                           minOrders: Long = 2L): DataFrame = {
    require(minOrders >= 1, "minOrders must be >= 1")
    orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        sum(round(col("o_totalprice") * 100).cast("long"))
          .as("rev_cents"))
      .agg(count(lit(1)).as("n_customers"),
        coalesce(sum(when(col("n_orders") >= minOrders, 1L)), lit(0L))
          .as("n_repeat"),
        sum("rev_cents").as("rev_cents_total"),
        coalesce(sum(when(col("n_orders") >= minOrders,
          col("rev_cents"))), lit(0L)).as("rev_cents_repeat"))
      .select(col("n_customers"), col("n_repeat"),
        col("rev_cents_total"), col("rev_cents_repeat"),
        expr("rev_cents_repeat * 1000L div nullif(rev_cents_total, 0L)")
          .as("repeat_share_permille"))
  }

  /** Discount EFFECTIVENESS curve: lineitems, quantity, and discounted
    * revenue (exact cents — the q151 round-to-cents device, identical
    * expression shape in both engines) per whole-percent discount
    * level — the table a pricing review reads before trusting any
    * discount. One map-side-combined aggregate, |levels| rows out.
    */
  def discountCurve(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(round(col("l_discount") * 100).cast("long")
        .as("discount_pct"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100).cast("long")).as("revenue_cents"))
      .orderBy("discount_pct")

  /** Fulfillment SHIP-LAG census: per order priority, lineitems, the
    * count shipping more than `lateDays` after the order date, and the
    * exact total/max lag in days — the operational SLA table behind
    * "are urgent orders actually shipping faster". Day arithmetic on
    * CAST-to-DATE values so both engines count identical day
    * boundaries; all integers.
    *
    * Scale shape: the fact join keys on orderkey (the q06 discipline —
    * at scale a shuffle join on the fact keys, with the per-priority
    * aggregation map-side combined); |priorities| rows out.
    */
  def shipLagCensus(orders: DataFrame, lineitem: DataFrame,
                    lateDays: Int = 90): DataFrame = {
    require(lateDays >= 0, "lateDays must be >= 0")
    orders
      .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
        col("o_orderdate").cast("date").as("__od"))
      .join(lineitem.select(col("l_orderkey"),
        col("l_shipdate").cast("date").as("__sd")),
        col("o_orderkey") === col("l_orderkey"))
      .withColumn("lag_days", datediff(col("__sd"), col("__od"))
        .cast("long"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_items"),
        coalesce(sum(when(col("lag_days") > lateDays, 1L)), lit(0L))
          .as("n_late"),
        sum("lag_days").as("sum_lag_days"),
        max("lag_days").as("max_lag_days"))
      .orderBy("priority")
  }

  /** P6: null→default coercion then Java `(int)` truncation-toward-zero
    * (NOT rounding — Secondary.java:57–58), followed by a grouped sum.
    */
  def truncatedDelaySum(events: DataFrame): DataFrame =
    events
      .withColumn("delay", coalesce(col("value"), lit(0.0)).cast("int"))
      .groupBy("event_type")
      .agg(sum("delay").as("sum_delay"), count(lit(1)).as("n"))
      .orderBy("event_type")

  /** P9: composite rowkey synthesis by string concat (HPopulate.java:92–97).
    * Only string/int inputs — float formatting differs across engines.
    */
  def rowkeyConcat(customer: DataFrame): DataFrame =
    customer
      .select(concat_ws("-", col("c_mktsegment"), col("c_nationkey"),
                        col("c_custkey")).as("rowkey"))
      .orderBy("rowkey")

  /** Grouped exact quantiles (linear interpolation — the same convention
    * as DuckDB's quantile_cont, pinned globally by q40). Spark's exact
    * `percentile` aggregates a value→count map per group, so memory scales
    * with DISTINCT values per group, not row count — cheap for bounded
    * domains like l_quantity (50 values) at any corpus size; for unbounded
    * high-cardinality doubles at 100 TB, switch to `approx_percentile`
    * (t-digest, fixed memory) and accept the documented error bound.
    */
  def groupedQuantiles(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("median_qty"),
           expr("percentile(l_quantity, 0.9)").as("p90_qty"),
           count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  /** Incremental-view maintenance: coarsen a pre-aggregated partials
    * table to a coarser grain by MERGING the algebraic aggregates (sums
    * add, counts add) — never rescanning the facts. The daily→monthly
    * rollup every metrics pipeline runs: correctness rests on every
    * merged aggregate being algebraic (sum/count/min/max merge; avg must
    * travel as sum+count and divide at read time, which is why `sumCols`
    * is the only merge this operator offers).
    *
    * At 100 TB the fact scan is the cost — a partials table is smaller
    * by the fine-grain group count, and re-aggregating it is the only
    * way period-over-period reporting stays O(|partials|).
    */
  def mergePartials(partials: DataFrame, keys: Seq[String],
                    sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && sumCols.nonEmpty,
      "need at least one key and one mergeable aggregate")
    val aggs = sumCols.map(c => sum(col(c)).as(c))
    partials.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(keys.map(col): _*)
  }

  /** Market-basket part-pair lift over orders: unordered part pairs
    * co-occurring in ≥ `minSupport` orders, with the same exact integer
    * lift as `Behavior.sessionAffinity` (`n_both·n_orders·10⁶ div
    * (n_a·n_b)`) — the cross-sell report, TPC-H face of the session
    * affinity formula. The two deliberately share arithmetic so one
    * oracle convention covers both.
    *
    * Shape: DISTINCT (order, part) first — the self-join is then bounded
    * by orders × (parts/order)², never lineitem×lineitem (parts per
    * order is a small constant at any corpus size); margins and the
    * total are census-sized broadcasts; the product chain runs in
    * decimal(38,0) (Long overflows past ~9e12 order·pair mass).
    */
  /** Shared basket core for the pair-census operators: per-order
    * DISTINCT part sets via one collect_set (the in-row equivalent of
    * `SELECT DISTINCT l_orderkey, l_partkey`), the per-part margin from
    * exploding those sets, and the i<j pair counts from an IN-ROW pair
    * expansion of the sorted array — two exchanges total where the
    * distinct + self-join formulation paid four and a join (r19;
    * identical counts by construction). Per-order fan-out is
    * basket²/2 rows either way. `baskets` comes back persisted (margin
    * + pair expansion both read it); callers own the lifetime.
    */
  private def basketCore(lineitem: DataFrame, minSupport: Long)
      : (DataFrame, DataFrame, DataFrame) = {
    val baskets = lineitem
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("l_partkey"))).as("ps"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val margin = baskets.select(explode(col("ps")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("__n"))
    val pairs = baskets
      .select(explode(flatten(transform(col("ps"), (x, i) =>
        transform(slice(col("ps"), i + lit(2), size(col("ps"))),
          y => struct(x.as("pa"), y.as("pb")))))).as("p"))
      .groupBy(col("p.pa").as("pa"), col("p.pb").as("pb"))
      .agg(count(lit(1)).as("n_both"))
      .filter(col("n_both") >= minSupport)
    (baskets, margin, pairs)
  }

  def basketPairs(lineitem: DataFrame, minSupport: Long = 2L): DataFrame = {
    require(minSupport >= 1, "minSupport must be >= 1")
    val (baskets, margin, pairs0) = basketCore(lineitem, minSupport)
    val total = baskets.agg(count(lit(1)).as("n_orders"))
    val pairs = pairs0
      .select(col("pa").as("part_a"), col("pb").as("part_b"),
        col("n_both"))
    // the part margin scales with |parts| (billions at TPC-H SF100k):
    // plain equi-joins — AQE broadcasts them when they measure small
    pairs
      .join(margin.select(col("l_partkey").as("part_a"),
        col("__n").as("n_a")), "part_a")
      .join(margin.select(col("l_partkey").as("part_b"),
        col("__n").as("n_b")), "part_b")
      .crossJoin(broadcast(total))
      .select(col("part_a"), col("part_b"), col("n_both"),
        expr("cast(n_both as decimal(38,0)) * n_orders * 1000000" +
          " div (cast(n_a as decimal(38,0)) * n_b)")
          .as("lift_q6"))
      .orderBy("part_a", "part_b")
  }

  /** Order-priority mix per customer nation, exact per-mille shares —
    * the service-level composition table ("is NATION_7 skewing urgent?")
    * behind priority-based capacity planning. customer scales with the
    * corpus → shuffle equi-join on custkey (projected to 2 columns
    * first); nation is the genuine 25-row broadcast; then one (nation,
    * priority) partial agg and a |nations|-row margin join; integer
    * division only.
    */
  def priorityMix(orders: DataFrame, customer: DataFrame,
                  nation: DataFrame): DataFrame = {
    val cnt = orders.select(col("o_custkey"), col("o_orderpriority"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("nation", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
    val tot = cnt.groupBy("nation").agg(sum("n_orders").as("__n_nation"))
    cnt.join(broadcast(tot), "nation")
      .select(col("nation"), col("o_orderpriority").as("priority"),
        col("n_orders"),
        expr("n_orders * 1000L div nullif(__n_nation, 0L)")
          .as("share_permille"))
      .orderBy("nation", "priority")
  }

  /** Nation-pair trade flows (the TPC-H Q7 join topology): revenue in
    * exact cents between each (supplier nation, customer nation) pair
    * by ship year, excluding domestic flow. The two-dimension join —
    * lineitem→supplier→nation on one leg, lineitem→orders→customer→
    * nation on the other — is the topology none of the single-hop
    * queries (q06/q199/q206) exercise.
    *
    * Shuffle profile: lineitem equi-joins supplier (corpus-scaled,
    * suppkey shuffle) and orders (orderkey shuffle); customer joins
    * through o_custkey; both nation joins are genuine 25-row
    * broadcasts, as is nothing else. Revenue is quantized to cents
    * PER ROW before the sum (the q01 discipline), so the aggregate is
    * exact integer arithmetic and the partial agg combines map-side.
    */
  def tradeFlows(lineitem: DataFrame, orders: DataFrame,
                 customer: DataFrame, supplier: DataFrame,
                 nation: DataFrame): DataFrame = {
    val cents = expr(
      "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
    lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        cents.as("cents"))
      .join(supplier.select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("__sn"),
        col("n_name").as("supp_nation"))), col("s_nationkey") === col("__sn"))
      .join(broadcast(nation.select(col("n_nationkey").as("__cn"),
        col("n_name").as("cust_nation"))), col("c_nationkey") === col("__cn"))
      .filter(col("__sn") =!= col("__cn"))
      .groupBy("supp_nation", "cust_nation", "l_year")
      .agg(sum("cents").as("revenue_cents"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** RFM segmentation — the classic customer-value grid: each customer
    * scored by Recency (last order day), Frequency (order count) and
    * Monetary (lifetime cents), each bucketed into `k` equal-frequency
    * tiers, then the (r, f, m) segment census with segment revenue.
    * Bucket k on each axis = top tier (most recent / most frequent /
    * highest spend); custkey breaks every tie deterministically.
    *
    * Scale shape: one orders partial-agg to the per-customer frame,
    * then THREE `Profiling.quantileBuckets` passes — the sharded-rank
    * NTILE (q155's bit-identical contract), so no single-task global
    * sort anywhere — joined back on custkey (three customer-sized
    * equi-joins), and a ≤k³-group census. The per-customer frame is
    * persisted across the three rank passes.
    */
  def rfmSegments(orders: DataFrame, k: Int = 4): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val usPerDay = 86400000000L
    val rfm = orders.groupBy(col("o_custkey").as("custkey"))
      // parquet timestamps arrive NTZ; the UTC session makes the LTZ
      // cast a wall-clock no-op, so unix_micros == the oracle's epoch_us
      .agg(max(unix_micros(col("o_orderdate").cast("timestamp_ltz")))
          .as("__last"),
        count(lit(1)).as("n_orders"),
        sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("cents"))
      .select(col("custkey"),
        expr(s"__last div ${usPerDay}L").as("last_day"),
        col("n_orders"), col("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def tier(valueCol: String, name: String): DataFrame =
      Profiling.quantileBuckets(rfm, "custkey", valueCol, "custkey", k)
        .select(col("custkey"), col("bucket").as(name))
    rfm
      .join(tier("last_day", "r"), "custkey")
      .join(tier("n_orders", "f"), "custkey")
      .join(tier("cents", "m"), "custkey")
      .groupBy("r", "f", "m")
      .agg(count(lit(1)).as("n_custs"), sum("cents").as("revenue_cents"))
      .orderBy("r", "f", "m")
  }

  /** Large-order report (the TPC-H Q18 topology): orders whose TOTAL
    * line quantity exceeds `minQty`, joined back to the order header
    * and customer — the group-HAVING-then-rejoin shape, top-`k` by
    * order value.
    *
    * Scale shape: the HAVING census is one lineitem partial agg to
    * order-sized rows; survivors (a tiny fraction by construction —
    * the threshold is the point) equi-join orders then customer, both
    * key-shuffles on already-filtered cardinality. The final top-k is
    * TakeOrderedAndProject, never a global sort.
    */
  def largeOrders(lineitem: DataFrame, orders: DataFrame,
                  customer: DataFrame, minQty: Long = 300L,
                  k: Int = 100): DataFrame = {
    val qty = lineitem
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("long")).as("total_qty"))
      .filter(col("total_qty") > minQty)
    qty
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          .as("order_us"),
        expr("cast(round(o_totalprice * 100) as bigint)")
          .as("total_cents"),
        col("total_qty"))
      .orderBy(col("total_cents").desc, col("o_orderkey"))
      .limit(k)
  }

  /** Dormant high-balance customers by nation (the TPC-H Q22 shape on
    * this schema): customers whose balance exceeds the positive-balance
    * average AND who placed no order since `sinceYear` — the scalar-
    * aggregate broadcast + anti-join composition.
    *
    * Scale shape: the average is a 1-row broadcast; the "recent
    * customer" set is one orders partial agg (year filter pushed to
    * the scan) distinct-projected to custkeys; the anti join shuffles
    * only customer-sized keys; the nation census ends ≤25 rows.
    */
  def dormantHighBalance(customer: DataFrame, orders: DataFrame,
                         nation: DataFrame,
                         sinceYear: Int = 2000): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0)
      .agg(avg("c_acctbal").as("__ab"))
    val recent = orders
      .filter(year(col("o_orderdate")) >= sinceYear)
      .select(col("o_custkey")).distinct()
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation.select(col("n_nationkey"),
        col("n_name").as("nation"))),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("nation")
      .agg(count(lit(1)).as("n_custs"),
        sum(expr("cast(round(c_acctbal * 100) as bigint)"))
          .as("bal_cents"))
      .orderBy("nation")
  }

  /** Top supplier(s) by revenue in one ship year (the TPC-H Q15 shape,
    * ties KEPT — the view-max-view composition): per-supplier revenue,
    * then every supplier matching the global max.
    *
    * Scale shape: one lineitem partial agg (year filter pushed down)
    * to supplier-sized rows, a 1-row max broadcast back onto it, and a
    * supplier equi-join on the (≤ handful of) winners.
    */
  def topSupplierByRevenue(lineitem: DataFrame, supplier: DataFrame,
                           shipYear: Int = 1996): DataFrame = {
    val rev = lineitem
      .filter(year(col("l_shipdate")) === shipYear)
      .groupBy("l_suppkey")
      .agg(sum(expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)"))
        .as("rev_cents"))
    val mx = rev.agg(max("rev_cents").as("__mx"))
    rev.crossJoin(broadcast(mx))
      .filter(col("rev_cents") === col("__mx"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("rev_cents"))
      .orderBy("s_suppkey")
  }

  /** Revenue-share gate per brand (the TPC-H Q11 shape: groups whose
    * share of the GLOBAL total clears a threshold): brand revenue,
    * kept when `rev * 1000 ≥ thresholdPermille * total`.
    *
    * Scale shape: lineitem equi-joins part on partkey (both corpus-
    * scaled; the join is the price), one partial agg to brand-sized
    * rows, a 1-row total broadcast, and an integer-exact gate — the
    * share product runs in decimal(38,0) (HUGEINT in the oracle)
    * because rev·1000 exceeds Long headroom near 10^16 cents.
    */
  def brandRevenueShare(lineitem: DataFrame, part: DataFrame,
                        thresholdPermille: Long = 15L): DataFrame = {
    val rev = lineitem
      .select(col("l_partkey"), expr(
        "cast(round(l_extendedprice * (1 - l_discount) * 100) as bigint)")
        .as("cents"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum("cents").as("rev"))
    val tot = rev.agg(sum(col("rev").cast("decimal(38,0)")).as("__tot"))
    rev.crossJoin(broadcast(tot))
      .filter(expr(s"cast(rev as decimal(38,0)) * 1000 >= " +
        s"$thresholdPermille * __tot"))
      .select(col("p_brand"), col("rev").as("revenue_cents"),
        expr("cast(cast(rev as decimal(38,0)) * 1000 div __tot as bigint)")
          .as("share_permille"))
      .orderBy(col("revenue_cents").desc, col("p_brand"))
  }

  /** Min-cost supplier per part (the TPC-H Q2 argmin, re-expressed on
    * this schema from observed line prices): per (part, supplier) the
    * best observed unit price, the per-part winner (lowest price,
    * suppkey breaks ties), then the per-supplier census of parts won.
    *
    * Scale shape: two stacked partial aggs (lineitem → part×supplier →
    * part) — the argmin is min(struct(price, suppkey)), never a
    * window — then a supplier-sized census joined to the supplier dim.
    */
  def minCostSupplierCensus(lineitem: DataFrame,
                            supplier: DataFrame): DataFrame = {
    val cell = lineitem
      .select(col("l_partkey"), col("l_suppkey"),
        expr("""cast(round(l_extendedprice * 100 /
          nullif(cast(l_quantity as bigint), 0)) as bigint)""")
          .as("unit_cents"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(min("unit_cents").as("unit_cents"))
    val win = cell
      .groupBy("l_partkey")
      .agg(min(struct(col("unit_cents"), col("l_suppkey"))).as("__w"))
      .select(col("__w.l_suppkey").as("best_supp"),
        col("__w.unit_cents").as("best"))
    win
      .groupBy("best_supp")
      .agg(count(lit(1)).as("n_parts_won"),
        sum("best").as("sum_best_cents"))
      .join(supplier, col("best_supp") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_parts_won"),
        col("sum_best_cents"))
      .orderBy(col("n_parts_won").desc, col("s_suppkey"))
  }

  /** Late-order census (the TPC-H Q4 EXISTS topology on this schema):
    * orders having AT LEAST ONE lineitem shipped more than `lateDays`
    * after the order date, counted by priority. The semi-join keeps
    * order rows intact — a plain join would double-count multi-late
    * orders and an aggregate-then-join would lose the EXISTS shape.
    *
    * Scale shape: the lag predicate needs o_orderdate, so the fact
    * join ships only (l_orderkey, l_shipdate) against a 2-column
    * orders projection; the qualifying set distinct-projects to bare
    * orderkeys before the left-semi, and the census ends ≤|priorities|
    * rows. Day-granularity lag (datediff on DATE) keeps the compare
    * integer-exact cross-engine.
    */
  def lateOrderCensus(orders: DataFrame, lineitem: DataFrame,
                      lateDays: Int = 365): DataFrame = {
    val late = lineitem.select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate")), col("l_orderkey") === col("__ok"))
      .filter(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")) > lateDays)
      .select("l_orderkey").distinct()
    orders
      .join(late, col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy("priority")
  }

  /** Customer order-count distribution (the TPC-H Q13 shape): how many
    * customers placed exactly N orders, INCLUDING the zero-order
    * customers a plain inner join would silently drop — the standard
    * engagement histogram.
    *
    * Scale shape: orders partial-aggregates to one row per customer
    * BEFORE the join (the q06 convention — the left join ships
    * pre-aggregated counts, never raw orders); the histogram is a
    * second two-level aggregate over customer-sized rows, and the
    * top-k cut is TakeOrderedAndProject.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame,
                             k: Int = 40): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("__n"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("__n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
      .limit(k)
  }

  /** Dominant-supplier census (the TPC-H Q20 excess-threshold shape
    * re-expressed from observed shipments): suppliers shipping more
    * than `thresholdPermille`/1000 of a part's total quantity, counted
    * per nation with the number of parts each dominates.
    *
    * Scale shape: two chained partial aggs — (part, supplier) then
    * part totals — so the threshold join compares aggregated rows
    * only; nation broadcasts. Integer headroom: q·1000 stays in Long
    * until per-(part,supplier) quantity tops ~9·10¹⁵ units.
    */
  def dominantSuppliers(lineitem: DataFrame, supplier: DataFrame,
                        nation: DataFrame,
                        thresholdPermille: Long = 200L): DataFrame = {
    val sq = lineitem.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val tq = sq.groupBy(col("l_partkey").as("__pk"))
      .agg(sum("q").as("__tot"))
    val dom = sq.join(tq, col("l_partkey") === col("__pk"))
      .filter(col("q") * 1000L > lit(thresholdPermille) * col("__tot"))
      .groupBy("l_suppkey").agg(count(lit(1)).as("n_parts"))
    dom.join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum("n_parts").as("parts_dominated"))
      .orderBy("nation")
  }

  /** Sole-late-supplier ranking (the TPC-H Q21 topology): on orders
    * sourced from ≥2 suppliers, the suppliers who were the ONLY late
    * one — per-order blame attribution, top `k` by count. The two
    * conjuncts (others on the order were on time; this one was not)
    * are Q21's semi + anti pair, expressed here as one per-order
    * census joined back to the per-supplier lags.
    *
    * Scale shape: the fact join carries 3 columns; everything after
    * the (order, supplier) max-lag partial agg is order-sized. The
    * rejoin reuses the orderkey partitioning; supplier resolution
    * happens after the filter, on the surviving rows only.
    */
  def soleLateSuppliers(lineitem: DataFrame, orders: DataFrame,
                        supplier: DataFrame, lateDays: Int = 365,
                        k: Int = 20): DataFrame = {
    val lag = lineitem.select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"))
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate")), col("l_orderkey") === col("__ok"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date"))).as("lag_d"))
    val m = lag.groupBy(col("l_orderkey").as("__k"))
      .agg(count(lit(1)).as("__n_supp"),
        sum(when(col("lag_d") > lateDays, 1L).otherwise(0L))
          .as("__n_late"))
    lag.join(m, col("l_orderkey") === col("__k"))
      .filter(col("__n_supp") >= 2 && col("__n_late") === 1 &&
        col("lag_d") > lateDays)
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("n_waits"))
      .orderBy(col("n_waits").desc, col("s_suppkey"))
      .limit(k)
  }

  /** Brand market share by order year (the TPC-H Q8 share shape): one
    * brand's revenue as a permille of ALL brands' revenue, per year —
    * exact cents; the share product runs decimal(38,0) (HUGEINT in the
    * oracle) because year-total cents × 1000 brushes Long at corpus
    * scale.
    *
    * Scale shape: revenue partial-aggregates to (year, brand) before
    * the share math; the year-totals side is a years-sized frame
    * joined back on the year. `part` joins pre-projected to two
    * columns (broadcast-able at any realistic |part|-dimension size).
    */
  def brandMarketShare(lineitem: DataFrame, orders: DataFrame,
                       part: DataFrame,
                       brand: String = "Brand#1"): DataFrame = {
    val rev = lineitem
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate")), col("l_orderkey") === col("__ok"))
      .join(part.select(col("p_partkey").as("__pk"), col("p_brand")),
        col("l_partkey") === col("__pk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("year"),
        col("p_brand"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint)")).as("cents"))
    val tot = rev.groupBy(col("year").as("__y"))
      .agg(sum(col("cents").cast("decimal(38,0)")).as("__t"))
    rev.filter(col("p_brand") === brand)
      .join(tot, col("year") === col("__y"))
      .select(col("year"), col("cents").as("brand_cents"),
        col("__t").cast("long").as("total_cents"),
        expr("cast(cents as decimal(38,0)) * 1000 div __t")
          .as("share_permille"))
      .orderBy("year")
  }

  /** Orders above their own customer's average order value (the
    * classic correlated-scalar-subquery decorrelation): per-customer
    * average broadcast back onto the orders, exact-cents compare
    * (cents·n > total avoids any division), census by priority.
    * Single-order customers are excluded (`minOrders`) — their only
    * order can never exceed its own average.
    *
    * Scale shape: one orders partial agg to customer-sized (n, total)
    * rows, one custkey equi-join that reuses the agg's partitioning,
    * and a ≤|priorities| census. cents·n stays in Long until a
    * customer's order count × max cents tops ~9·10¹⁸.
    */
  def aboveAverageOrders(orders: DataFrame,
                         minOrders: Long = 2L): DataFrame = {
    val oc = orders.select(col("o_custkey"), col("o_orderpriority"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val ca = oc.groupBy(col("o_custkey").as("__ck"))
      .agg(count(lit(1)).as("__n"), sum("cents").as("__tot"))
    oc.join(ca, col("o_custkey") === col("__ck"))
      .filter(col("cents") * col("__n") > col("__tot") &&
        col("__n") >= minOrders)
      .groupBy(col("o_orderpriority").as("priority"))
      .agg(count(lit(1)).as("n_above"), sum("cents").as("cents_above"))
      .orderBy("priority")
  }

  /** Monthly order backlog: orders placed vs orders FULLY shipped
    * (month of the last lineitem ship date) per month, dense-filled
    * (A7 semantics) across the union of both spans, with the running
    * net backlog — the operations dashboard's open-order series.
    *
    * Scale shape: two partial aggs (orders by month; lineitem to
    * per-order last-ship then months) bound everything at a
    * months-sized frame; the cumulative window ranks MONTHS (the
    * q209/q220 audit-view regime), never rows.
    */
  def orderBacklog(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    // both censuses pinned: each is read twice — once for the month-
    // extent bounds, once in the dense-month join (the q53 pattern,
    // plan-audit sweep round 15); unpinned, both FACT scans ran twice
    val placed = orders
      .groupBy((year(col("o_orderdate")).cast("long") * 12 +
        month(col("o_orderdate")) - 1).as("m"))
      .agg(count(lit(1)).as("placed"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shipped = lineitem
      .groupBy("l_orderkey").agg(max("l_shipdate").as("last_ship"))
      .groupBy((year(col("last_ship")).cast("long") * 12 +
        month(col("last_ship")) - 1).as("__m"))
      .agg(count(lit(1)).as("shipped"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ext = placed.select(col("m"))
      .union(shipped.select(col("__m")))
      .agg(min("m").as("m0"), max("m").as("m1"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("month_idx")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    ext.select(explode(expr("sequence(m0, m1)")).as("month_idx"))
      .join(placed, col("month_idx") === col("m"), "left")
      .join(shipped, col("month_idx") === col("__m"), "left")
      .select(col("month_idx"),
        coalesce(col("placed"), lit(0L)).as("placed"),
        coalesce(col("shipped"), lit(0L)).as("shipped"))
      .withColumn("backlog",
        sum(col("placed") - col("shipped")).over(w))
      .orderBy("month_idx")
  }

  /** Revenue concentration (Herfindahl–Hirschman) over brands, per
    * order year: hhi_q6 = 10⁶·Σ cents_b² / (Σ cents_b)² — the market-
    * structure number behind q227's single-brand share. Exact: both
    * the squared sum and the square of the sum run decimal(38,0)
    * (HUGEINT in the oracle); ONE integer division at the end.
    *
    * Scale shape: identical to q227's — (year, brand) partial agg,
    * then a years-sized census; safe while a year-brand's cents stay
    * under ~10¹⁸ (decimal38 headroom for the square).
    */
  def revenueConcentration(lineitem: DataFrame, orders: DataFrame,
                           part: DataFrame): DataFrame = {
    val rev = lineitem
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate")), col("l_orderkey") === col("__ok"))
      .join(part.select(col("p_partkey").as("__pk"), col("p_brand")),
        col("l_partkey") === col("__pk"))
      .groupBy(year(col("o_orderdate")).cast("long").as("year"),
        col("p_brand"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint)")).as("cents"))
    rev.groupBy("year")
      .agg(count(lit(1)).as("n_brands"),
        sum(col("cents").cast("decimal(38,0)") * col("cents"))
          .as("__sq"),
        sum(col("cents").cast("decimal(38,0)")).as("__t"))
      .select(col("year"), col("n_brands"),
        expr("cast(__sq * 1000000 div (__t * __t) as bigint)")
          .as("hhi_q6"))
      .orderBy("year")
  }

  /** Header-vs-lines price reconciliation: does o_totalprice equal the
    * sum of its lineitems' extended prices — the cross-table
    * consistency audit every warehouse runs on ingest. One row: order
    * count, exact matches, mismatches, max and total absolute drift in
    * cents. Orders with no lines compare against 0 (the left join —
    * an orphan header IS a mismatch).
    *
    * Scale shape: lineitem partial-aggregates to one row per order
    * before the join (the q06 convention); the compare is a
    * projection; the census is one row.
    */
  def priceReconciliation(orders: DataFrame,
                          lineitem: DataFrame): DataFrame = {
    val lt = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
        .as("__lc"))
    orders
      .join(lt, col("o_orderkey") === col("l_orderkey"), "left")
      .select(expr("cast(round(o_totalprice * 100) as bigint)")
        .as("hdr"), coalesce(col("__lc"), lit(0L)).as("lin"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("hdr") === col("lin"), 1L).otherwise(0L))
          .as("n_exact"),
        sum(when(col("hdr") =!= col("lin"), 1L).otherwise(0L))
          .as("n_mismatch"),
        max(abs(col("hdr") - col("lin"))).as("max_abs_diff_cents"),
        sum(abs(col("hdr") - col("lin"))).as("sum_abs_diff_cents"))
  }

  /** Shipping-priority report (the TPC-H Q3 topology): for one market
    * segment, orders placed before the cutoff with lines still
    * unshipped after it — revenue per order, top `k`. The classic
    * three-way join with predicates pushed to all three scans.
    *
    * Scale shape: segment and both date predicates reach the parquet
    * readers; the join chain is customer (semi-reduced by segment) →
    * orders → lineitem; the revenue agg is per-order partial before
    * the TakeOrderedAndProject cut.
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String, k: Int = 10): DataFrame = {
    val c = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey").as("__ck"))
    val o = orders.filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
      .select(col("o_custkey"), col("o_orderkey").as("__ok"),
        col("o_orderdate"), col("o_orderpriority"))
    val l = lineitem.filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    l.join(o, col("l_orderkey") === col("__ok"))
      .join(c, col("o_custkey") === col("__ck"), "left_semi")
      .groupBy(col("l_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          .as("order_us"),
        col("o_orderpriority").as("priority"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint)")).as("revenue_cents"))
      .select(col("l_orderkey"), col("revenue_cents"), col("order_us"),
        col("priority"))
      .orderBy(col("revenue_cents").desc, col("l_orderkey"))
      .limit(k)
  }

  /** Local-supplier volume (the TPC-H Q5 topology): revenue from
    * orders where the customer and the line's supplier share the
    * nation, restricted to one region and order year — the same-
    * nation join chain that distinguishes Q5 from the cross-nation Q7
    * (q210 tradeFlows).
    *
    * Scale shape: region→nation is a ≤25-row broadcast spine; the
    * supplier join carries the same-nation conjunct as an equi pair
    * (s_suppkey AND s_nationkey), so no post-join filter sees a
    * cross-nation blow-up; the year predicate is pushed to orders.
    */
  def localSupplierVolume(region: DataFrame, nation: DataFrame,
                          customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          regionName: String, year0: Int): DataFrame = {
    val n = nation.join(broadcast(region.filter(
        col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("__nk"), col("n_name"))
    val c = customer.join(broadcast(n),
        col("c_nationkey") === col("__nk"))
      .select(col("c_custkey").as("__ck"), col("n_name"),
        col("c_nationkey").as("__cn"))
    val o = orders.filter(year(col("o_orderdate")) === year0)
      .select(col("o_custkey"), col("o_orderkey").as("__ok"))
    val s = supplier.select(col("s_suppkey").as("__sk"),
      col("s_nationkey").as("__sn"))
    lineitem
      .join(o, col("l_orderkey") === col("__ok"))
      .join(c, col("o_custkey") === col("__ck"))
      .join(s, col("l_suppkey") === col("__sk") &&
        col("__cn") === col("__sn"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint)")).as("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("nation"))
  }

  /** Forecast-revenue-change probe (the TPC-H Q6 shape): the pure
    * filter-aggregate — one ship year, a discount band, a quantity
    * cap; revenue = Σ extendedprice·discount in exact cents. Every
    * predicate reaches the scan; no join, no shuffle beyond the
    * 1-row final agg.
    */
  def forecastRevenue(lineitem: DataFrame, shipYear: Int,
                      discLo: Double, discHi: Double,
                      maxQty: Double): DataFrame =
    lineitem
      .filter(year(col("l_shipdate")) === shipYear &&
        col("l_discount") >= discLo && col("l_discount") <= discHi &&
        col("l_quantity") < maxQty)
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("cast(round(l_extendedprice * l_discount * 100)" +
          " as bigint)")).as("revenue_cents"))

  /** Product-profit census (the TPC-H Q9 topology on this schema):
    * profit per supplier nation per order year over parts matching a
    * name filter. The fixture has no partsupp supply cost, so cost is
    * the DOCUMENTED proxy quantity·p_retailprice·0.6 — the topology
    * (4-way join + name filter + two-key census) is Q9's; the cost
    * constant is not.
    */
  def productProfit(lineitem: DataFrame, orders: DataFrame,
                    part: DataFrame, supplier: DataFrame,
                    nation: DataFrame, nameSubstr: String): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate")), col("l_orderkey") === col("__ok"))
      .join(part.filter(col("p_name").contains(nameSubstr))
        .select(col("p_partkey").as("__pk"), col("p_retailprice")),
        col("l_partkey") === col("__pk"))
      .join(supplier.select(col("s_suppkey").as("__sk"),
        col("s_nationkey")), col("l_suppkey") === col("__sk"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint) - cast(round(l_quantity * p_retailprice" +
        " * 60) as bigint)")).as("profit_cents"))
      .orderBy(col("nation"), col("yr").desc)

  /** Returned-item top customers (the TPC-H Q10 topology): revenue
    * lost to 'R'-flag returns per customer in one order year, top
    * `k` with the nation resolved.
    *
    * Scale shape: the returnflag and year predicates push to their
    * scans; revenue partial-aggregates per customer before the
    * ≤25-row nation broadcast and the top-k cut.
    */
  def returnedItemCustomers(customer: DataFrame, orders: DataFrame,
                            lineitem: DataFrame, nation: DataFrame,
                            year0: Int, k: Int = 20): DataFrame = {
    val o = orders.filter(year(col("o_orderdate")) === year0)
      .select(col("o_custkey"), col("o_orderkey").as("__ok"))
    val rev = lineitem.filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("__ok"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
        " * 100) as bigint)")).as("revenue_cents"))
    rev.join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"),
        col("n_name").as("nation"), col("revenue_cents"))
      .orderBy(col("revenue_cents").desc, col("c_custkey"))
      .limit(k)
  }

  /** Priority-class line counts by return flag (the TPC-H Q12 CASE-
    * census topology; the fixture has no shipmode column, so the
    * grouping rides l_returnflag): among lines shipped more than
    * `lateDays` after the order date, how many belong to high- vs
    * low-priority orders.
    */
  def priorityClassCensus(orders: DataFrame, lineitem: DataFrame,
                          lateDays: Int = 365): DataFrame =
    lineitem
      .join(orders.select(col("o_orderkey").as("__ok"),
        col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("__ok"))
      .filter(datediff(col("l_shipdate").cast("date"),
        col("o_orderdate").cast("date")) > lateDays)
      .groupBy(col("l_returnflag").as("returnflag"))
      .agg(sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
          0L).otherwise(1L)).as("low_line_count"))
      .orderBy("returnflag")

  /** Promo revenue share (the TPC-H Q14 shape): the permille of one
    * ship-year's revenue carried by PROMO-type parts — one fact join,
    * one conditional sum, the share in HUGEINT-parity integers.
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame,
                        shipYear: Int,
                        promoType: String = "PROMO"): DataFrame =
    lineitem.filter(year(col("l_shipdate")) === shipYear)
      .join(part.select(col("p_partkey").as("__pk"), col("p_type")),
        col("l_partkey") === col("__pk"))
      .agg(sum(when(col("p_type") === promoType,
          expr("cast(round(l_extendedprice * (1 - l_discount) * 100)" +
            " as bigint)")).otherwise(0L)).as("promo_cents"),
        sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
          " * 100) as bigint)")).as("total_cents"))
      .select(col("promo_cents"), col("total_cents"),
        expr("cast(promo_cents as decimal(38,0)) * 1000" +
          " div total_cents").as("promo_permille"))

  /** Supplier count by part attributes (the TPC-H Q16 topology):
    * distinct suppliers observed shipping each (brand, size) among
    * selected sizes, EXCLUDING suppliers on a denylist (negative
    * account balance here — the fixture has no complaint strings) —
    * the NOT-IN anti leg plus a distinct-count census.
    *
    * Scale shape: the denylist is a tiny broadcast anti join on the
    * distinct (part, supplier) pairs; the census is ids-only after
    * that; part attributes broadcast onto aggregated rows.
    */
  def supplierCountByPart(lineitem: DataFrame, part: DataFrame,
                          supplier: DataFrame, sizes: Seq[Int],
                          k: Int = 40): DataFrame = {
    val excl = supplier.filter(col("s_acctbal") < 0.0)
      .select(col("s_suppkey").as("__xs"))
    val ps = lineitem.select(col("l_partkey"), col("l_suppkey"))
      .distinct()
      .join(broadcast(excl), col("l_suppkey") === col("__xs"),
        "left_anti")
    ps.join(part.filter(col("p_size").isin(sizes.map(Int.box): _*))
        .select(col("p_partkey").as("__pk"), col("p_brand"),
          col("p_size")), col("l_partkey") === col("__pk"))
      .groupBy(col("p_brand"), col("p_size").cast("long").as("p_size"))
      .agg(count_distinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_size"))
      .limit(k)
  }

  /** Small-quantity revenue probe (the TPC-H Q17 shape): lines whose
    * quantity is below half their part's average — the correlated
    * per-part average decorrelated into a partial agg + rejoin, one
    * row out. The compare is qty·2 < avg (no division).
    */
  def smallQuantityRevenue(lineitem: DataFrame): DataFrame = {
    val a = lineitem.groupBy(col("l_partkey").as("__pk"))
      .agg(avg("l_quantity").as("__aq"))
    lineitem.join(a, col("l_partkey") === col("__pk"))
      .filter(col("l_quantity") * 2 < col("__aq"))
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("cast(round(l_extendedprice * 100) as bigint)"))
          .as("revenue_cents"))
  }

  /** Disjunctive-predicate revenue (the TPC-H Q19 shape): three
    * brand/size/quantity bands OR-ed together — the classic test that
    * a planner pushes a disjunction of conjuncts into the join rather
    * than materializing the full product. Bands are (brand, minSize,
    * maxSize, minQty, maxQty).
    */
  def brandBandRevenue(lineitem: DataFrame, part: DataFrame,
                       bands: Seq[(String, Int, Int, Double, Double)])
      : DataFrame = {
    require(bands.nonEmpty, "need at least one band")
    val p = part.select(col("p_partkey").as("__pk"), col("p_brand"),
      col("p_size"))
    val cond = bands.map { case (b, s0, s1, q0, q1) =>
      col("p_brand") === b && col("p_size").between(s0, s1) &&
        col("l_quantity") >= q0 && col("l_quantity") <= q1
    }.reduce(_ || _)
    lineitem.join(p, col("l_partkey") === col("__pk"))
      .filter(cond)
      .agg(count(lit(1)).as("n_lines"),
        sum(expr("cast(round(l_extendedprice * (1 - l_discount)" +
          " * 100) as bigint)")).as("revenue_cents"))
  }

  /** Decile lift / cumulative-gains curve on customer lifetime value:
    * customers ranked by revenue DESC into 10 equal-frequency tiers
    * (the q155 sharded-ntile contract on the NEGATED cents, custkey
    * tiebreak), each tier's revenue share and running cumulative share
    * vs the uniform 100‰ baseline — the gains chart every targeting
    * model is judged against.
    *
    * Scale shape: one orders partial agg to customer-sized revenue,
    * quantileBuckets' range-partitioned ranks, a k-row census, a
    * 1-row total broadcast, and a k-bounded cumulative window.
    */
  def decileLiftCurve(orders: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cr = orders.groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("cents"))
      .withColumn("neg", -col("cents"))
    val buckets = Profiling.quantileBuckets(cr.select("o_custkey",
      "neg", "cents").withColumnRenamed("o_custkey", "id"),
      "id", "neg", "id", k)
    // quantileBuckets projects (id, value, bucket): re-join the cents
    val agg = buckets
      .join(cr.select(col("o_custkey").as("id"), col("cents")), "id")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_custs"), sum("cents").as("cents"))
    val tot = cr.agg(sum("cents").cast("decimal(38,0)").as("__t"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    agg.crossJoin(broadcast(tot))
      .withColumn("cum", sum("cents").over(w))
      .select(col("bucket"), col("n_custs"), col("cents"),
        expr("cast(cast(cents as decimal(38,0)) * 1000 div __t" +
          " as bigint)").as("share_permille"),
        expr("cast(cast(cum as decimal(38,0)) * 1000 div __t" +
          " as bigint)").as("cum_share_permille"))
      .orderBy("bucket")
  }

  /** Inter-order survival curve: for consecutive same-customer order
    * gaps bucketed into mean months (gap div 2 629 746 000 000 µs,
    * capped), S(k) = share of gaps lasting ≥ k months — the discrete
    * repurchase-survival function behind churn models. The census
    * formulation keeps both engines boundary-identical.
    *
    * Scale shape: one customer-keyed lag window (per-customer
    * partitions), a ≤13-bucket census, and the k-suffix sums on that
    * census — everything after the window is constant-sized.
    */
  def orderGapSurvival(orders: DataFrame,
                       maxMonths: Int = 12): DataFrame = {
    require(maxMonths >= 1, "need a positive month cap")
    val usPerMonth = 2629746000000L
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey").orderBy(col("qts"), col("o_orderkey"))
    val cen = orders
      .select(col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp_ltz"))
          .as("qts"))
      .withColumn("gap", col("qts") - lag("qts", 1).over(w))
      .filter(col("gap").isNotNull)
      .select(least(expr(s"gap div ${usPerMonth}L"),
        lit(maxMonths.toLong)).as("bm"))
      .groupBy("bm").agg(count(lit(1)).as("n"))
    val tot = cen.agg(sum("n").as("__tot"))
    val ks = cen.sparkSession.range(0, maxMonths)
      .select(col("id").as("month_k"))
    ks.crossJoin(cen).crossJoin(broadcast(tot))
      .groupBy("month_k", "__tot")
      .agg(sum(when(col("bm") >= col("month_k"), col("n"))
        .otherwise(0L)).as("n_surviving"))
      .select(col("month_k"), col("n_surviving"),
        expr("n_surviving * 1000 div __tot").as("survival_permille"))
      .orderBy("month_k")
  }

  /** New-vs-returning revenue by month: each order's cents attributed
    * to "new" (the customer's first month) or "returning" (any later
    * month), with the returning share permille — the growth-
    * accounting series behind every revenue chart.
    *
    * Scale shape: one orders partial agg to customer-sized first
    * months, a custkey equi-join that reuses the agg partitioning,
    * and a months-sized census.
    */
  def newVsReturningRevenue(orders: DataFrame): DataFrame = {
    val o = orders.select(col("o_custkey"),
      (year(col("o_orderdate")).cast("long") * 12 +
        month(col("o_orderdate")) - 1).as("m"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val f = o.groupBy(col("o_custkey").as("__ck"))
      .agg(min("m").as("__fm"))
    o.join(f, col("o_custkey") === col("__ck"))
      .groupBy(col("m").as("month_idx"))
      .agg(sum(when(col("m") === col("__fm"), col("cents"))
          .otherwise(0L)).as("new_cents"),
        sum(when(col("m") > col("__fm"), col("cents"))
          .otherwise(0L)).as("returning_cents"))
      .select(col("month_idx"), col("new_cents"),
        col("returning_cents"),
        expr("returning_cents * 1000 div" +
          " nullif(new_cents + returning_cents, 0)")
          .as("returning_permille"))
      .orderBy("month_idx")
  }

  /** Distinct (customer, part) purchase pairs — the shared spine of the
    * recommender family (customerOverlap / cfRecommend): orders resolves
    * custkey, lineitem brings the parts, one distinct bounds everything
    * downstream by |customer×assortment|, never raw lineitem rows.
    */
  private def custParts(orders: DataFrame, lineitem: DataFrame): DataFrame =
    // key-hashed at the configured width BEFORE the distinct: the
    // aggregate reuses the user exchange (no extra shuffle) and the
    // CPU-bound dedup of the fact-sized frame stays wide under
    // byte-targeted AQE coalescing (the Dedup.wideBy rationale)
    Dedup.wideBy(
      orders.select(col("o_orderkey"), col("o_custkey"))
        .join(lineitem.select(col("l_orderkey"), col("l_partkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), col("l_partkey").as("part")),
      col("cust"), col("part"))
      .distinct()

  /** "Also bought" item-item table: for each part, the top-k co-purchased
    * parts by co-occurrence cosine (n_both / √(n_a·n_b), ×10⁶ rounded) —
    * the classic item-based collaborative-filtering similarity model,
    * batch-built from order baskets.
    *
    * Scale shape: the same bounded self-join as `basketPairs` — DISTINCT
    * (order, part) first, so the pair stage is orders × (parts/order)²,
    * never lineitem×lineitem; margins are part-census-sized equi-joins
    * (AQE broadcasts when small); the top-k window partitions by part
    * (co-purchase-degree-bounded partitions, no global sort). The sqrt
    * runs on exact integer operands in double (correctly rounded, the
    * q165/pearson rule).
    */
  def alsoBought(lineitem: DataFrame, minSupport: Long = 2L,
                 k: Int = 5): DataFrame = {
    require(minSupport >= 1 && k >= 1, "minSupport and k must be >= 1")
    // pinned: the symmetrizing union reads the pair aggregate TWICE —
    // unpinned, the basket pair expansion ran once per direction
    val (_, margin, pairs) = {
      val (b, m, p) = basketCore(lineitem, minSupport)
      (b, m,
        p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    val sym = pairs.select(col("pa").as("part"), col("pb").as("rec"),
        col("n_both"))
      .unionByName(pairs.select(col("pb").as("part"), col("pa").as("rec"),
        col("n_both")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("part")
      .orderBy(col("cosine_q6").desc, col("rec"))
    sym
      .join(margin.select(col("l_partkey").as("part"),
        col("__n").as("n_part")), "part")
      .join(margin.select(col("l_partkey").as("rec"),
        col("__n").as("n_rec")), "rec")
      .withColumn("cosine_q6",
        expr("cast(round(n_both * 1000000 /" +
          " (sqrt(cast(n_part as double)) * sqrt(cast(n_rec as double))))" +
          " as bigint)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("part"), col("rec"), col("n_both"), col("cosine_q6"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("part", "rnk")
  }

  /** Top-k most-similar customer pairs by purchased-assortment overlap:
    * Jaccard over distinct part sets, hot parts (df > maxDf) dropped from
    * the postings — the user-user neighborhood model, and the same
    * inverted-index + df-cap discipline as `Dedup.pairsBySetOverlap` (a
    * part half the customer base bought proposes |customers|²/4 pairs and
    * carries no signal; capping bounds the join by maxDf²·|parts|).
    * Sizes are computed on the CAPPED sets so jaccard stays
    * self-consistent on both engines. Integer-exact: jaccard_q6 =
    * n_common·10⁶ div (sz_a+sz_b−n_common); final cut is one
    * TakeOrderedAndProject(k) on (n_common↓, jaccard_q6↓, ids).
    */
  def customerOverlap(orders: DataFrame, lineitem: DataFrame,
                      minOverlap: Long = 3L, maxDf: Long = 200L,
                      k: Int = 50): DataFrame = {
    require(minOverlap >= 1 && k >= 1, "minOverlap and k must be >= 1")
    // cp feeds the df census AND the capped postings; keep feeds the
    // sizes census plus both self-join sides — pin each once
    val cp = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = cp.groupBy("part").agg(count(lit(1)).as("__df"))
    val keep = cp.join(dfc.filter(col("__df") > maxDf), Seq("part"),
      "left_anti")
    overlapPairsTopK(keep, minOverlap, k)
  }

  /** `customerOverlap` with the df cap set as a QUANTILE of the part-df
    * census instead of an absolute count: parts above the
    * `capPermille`-th permille of the df distribution (rank computed
    * integer-exactly — `rn·1000 ≤ p·n`, ties on part id) are dropped
    * from the postings. The DevScale x16 run showed why this variant
    * exists: an absolute cap under a CONSTANT catalog and growing
    * customer base eventually swallows every part (rows → 0 at 16× the
    * fixture), while the popularity *distribution* is scale-free — a
    * permille cut keeps the same catalog fraction at every corpus size.
    *
    * Scale shape: the census and its rank window are parts-sized
    * (vocabulary-bounded — the one global window rides |catalog| rows,
    * not facts); the cap is a one-row broadcast; everything after is
    * the customerOverlap pair stage on the surviving postings. The
    * pair stage costs Σ df² over surviving parts, so the permille cut
    * is the right guard exactly when the df DISTRIBUTION is scale-free
    * (catalog grows with the corpus — true of the harness fixtures:
    * measured mean part-df is ~30 at BOTH sf0.01 and sf0.1). When the
    * catalog is constant and popularity densifies (the DevScale
    * inflation regime), Σ df² grows quadratically no matter which
    * fraction survives — that regime needs the `maxDf` absolute rail
    * below (composed as least(quantile, rail)), or DIMSUM-style
    * posting-list sampling, which trades exactness away and so lives
    * outside this oracle-checked operator.
    */
  def customerOverlapQuantileCap(orders: DataFrame, lineitem: DataFrame,
                                 minOverlap: Long = 3L,
                                 capPermille: Long = 990L,
                                 k: Int = 50,
                                 maxDf: Long = Long.MaxValue,
                                 railSharePermille: Long = 100L): DataFrame = {
    require(minOverlap >= 1 && k >= 1, "minOverlap and k must be >= 1")
    require(capPermille >= 1 && capPermille <= 1000,
      "capPermille in [1, 1000]")
    require(railSharePermille >= 1 && railSharePermille <= 1000,
      "railSharePermille in [1, 1000]")
    val cp = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfc = cp.groupBy("part").agg(count(lit(1)).as("__df"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wr = org.apache.spark.sql.expressions.Window
      .orderBy(col("__df"), col("part"))
    // the cap is ONE value over the catalog-sized census — collect it
    // (the SQ8-codebook bounded-collect discipline) instead of wiring
    // the window+count subtree into the plan as nested broadcasts,
    // which serialized five extra tiny jobs per run
    val capRow = dfc.withColumn("__rn", row_number().over(wr))
      .crossJoin(broadcast(dfc.agg(count(lit(1)).as("__np"))))
      .filter(col("__rn") * 1000 <= lit(capPermille) * col("__np"))
      .agg(max("__df")).collect()(0)
    // the rail is population-relative (see scaladoc): max(maxDf,
    // railShare‰ of the distinct customer count) — one bounded count,
    // skipped entirely when no rail is armed
    val railDf =
      if (maxDf == Long.MaxValue) Long.MaxValue
      else {
        val nCust = cp.select("cust").distinct().count()
        math.max(maxDf, nCust * railSharePermille / 1000L)
      }
    val keep =
      if (capRow.isNullAt(0)) cp.filter(lit(false))
      else cp.join(dfc, "part")
        .filter(col("__df") <= lit(math.min(capRow.getLong(0), railDf)))
        .select(col("cust"), col("part"))
    overlapPairsTopK(keep, minOverlap, k)
  }

  /** DIMSUM-style SAMPLED overlap estimator — `customerOverlap`'s
    * sub-quadratic twin for the DENSE-popularity regime (constant
    * catalog, growing customers), where Σ df² grows quadratically no
    * matter which catalog fraction a cap keeps. Instead of DROPPING hot
    * parts (the cap's trade), every posting of a part with df >
    * `maxPostings` survives with probability ≈ maxPostings/df — decided
    * by a DETERMINISTIC md5 bucket of (cust, part), the
    * Sampling.splitBucket device, so the "sample" is a pure function of
    * the data and reproduces bit-identically on any engine — and each
    * surviving co-occurrence carries the inverse-probability weight
    * (df/maxPostings)² in permille. est_pm is then the
    * Horvitz–Thompson-style estimate of 1000·n_common (exact — weight
    * 1000 — wherever df ≤ maxPostings, which is every part on
    * catalog-growing fixtures; the estimator differs from exact only on
    * parts the cap would have DELETED). The DIMSUM reference is Zadeh &
    * Goel, "Dimension Independent Matrix Square using MapReduce"
    * (arXiv:1304.1467): sample pair contributions ∝ 1/popularity so the
    * pair stage cost is popularity-independent.
    *
    * Scale shape: pair work is Σ min(df, maxPostings)² ≤
    * maxPostings²·|catalog| — flat under densifying inflation (the
    * DevScale regime that grows q264's Σ df² quadratically). The
    * accuracy contract is adjudicated by `customerOverlapSampleAudit`
    * (the q153 sketch-audit device).
    */
  def customerOverlapSampled(orders: DataFrame, lineitem: DataFrame,
                             maxPostings: Long = 64L,
                             minEstPermille: Long = 3000L,
                             k: Int = 50): DataFrame = {
    require(maxPostings >= 1 && k >= 1, "maxPostings and k must be >= 1")
    val cp = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sampledOverlapPairs(cp, maxPostings)
      .filter(col("est_pm") >= minEstPermille)
      .orderBy(col("est_pm").desc, col("n_parts_sampled").desc,
        col("cust_a"), col("cust_b"))
      .limit(k)
  }

  /** The sampled pair stage shared by the estimator and its audit:
    * md5-bucket posting survival + inverse-probability permille weights,
    * summed per customer pair. `cp` must be distinct (cust, part).
    */
  private def sampledOverlapPairs(cp: DataFrame,
                                  maxPostings: Long): DataFrame = {
    val dfc = cp.groupBy("part").agg(count(lit(1)).as("__df"))
    // 16-bit md5 bucket of the POSTING (cust, part) — finer than the
    // permille split so small survival fractions stay representable;
    // integer-exact survival test: bucket·df < 65536·maxPostings
    val bucket = conv(substring(md5(concat(
        col("cust").cast("string"), lit("_"),
        col("part").cast("string"))), 1, 4), 16, 10).cast("long")
    val sampled = cp.join(dfc, "part")
      .filter(col("__df") <= maxPostings ||
        bucket * col("__df") < lit(65536L * maxPostings))
      .withColumn("__w_pm",
        when(col("__df") <= maxPostings, lit(1000L))
          .otherwise(expr(
            "cast(cast(__df as decimal(38,0)) * __df * 1000 div " +
              s"(${maxPostings}L * ${maxPostings}L) as bigint)")))
      .select(col("cust"), col("part"), col("__w_pm"))
      // part-hashed at full width (Dedup.wideBy, the overlapPairsTopK
      // rationale): the sampled self-join stays CPU-wide under AQE
      .transform(df => Dedup.wideBy(df, col("part")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sampled.as("x")
      .join(sampled.as("y"),
        col("x.part") === col("y.part") && col("x.cust") < col("y.cust"))
      .groupBy(col("x.cust").as("cust_a"), col("y.cust").as("cust_b"))
      .agg(sum(col("x.__w_pm")).as("est_pm"),
        count(lit(1)).as("n_parts_sampled"))
  }

  /** Error-bound audit of `customerOverlapSampled` against the EXACT
    * overlap — the q153 sketch-audit device: one row of
    * (n_pairs, n_found, sum_abs_err_pm, max_abs_err_pm) comparing
    * est_pm to 1000·n_common over every exact pair with n_common ≥
    * `minOverlap`. The exact leg is all-pairs by construction, so the
    * audit rides the q275 referee discipline: both legs run inside a
    * deterministic md5 CUSTOMER slice of ~`refereeCustomers` (permille
    * from one bounded count — full fixture when it already fits), which
    * keeps the audit oracle-checkable at any corpus size.
    */
  def customerOverlapSampleAudit(orders: DataFrame, lineitem: DataFrame,
                                 maxPostings: Long = 8L,
                                 minOverlap: Long = 3L,
                                 refereeCustomers: Long = 300L): DataFrame = {
    require(minOverlap >= 1 && refereeCustomers >= 1 && maxPostings >= 1,
      "minOverlap, refereeCustomers and maxPostings must be >= 1")
    val cp0 = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCust = math.max(cp0.select("cust").distinct().count(), 1L)
    val permille =
      math.min(1000L, (1000L * refereeCustomers + nCust - 1) / nCust)
    val cp = cp0.filter(Sampling.splitBucket(col("cust")) < permille)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exact = cp.as("x")
      .join(cp.as("y"),
        col("x.part") === col("y.part") && col("x.cust") < col("y.cust"))
      .groupBy(col("x.cust").as("cust_a"), col("y.cust").as("cust_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
    val est = sampledOverlapPairs(cp, maxPostings)
      .select(col("cust_a"), col("cust_b"), col("est_pm"))
    exact.join(est, Seq("cust_a", "cust_b"), "left")
      .select(col("n_common"),
        coalesce(col("est_pm"), lit(0L)).as("__est"))
      .agg(count(lit(1)).as("n_pairs"),
        count(when(col("__est") > 0, 1)).as("n_found"),
        coalesce(sum(abs(col("__est") - col("n_common") * 1000L)),
          lit(0L)).as("sum_abs_err_pm"),
        coalesce(max(abs(col("__est") - col("n_common") * 1000L)),
          lit(0L)).as("max_abs_err_pm"))
  }

  /** REGIME-GUARDED overlap: pre-estimate the pair-stage cost Σ df²
    * from the part-df census (one bounded 1-row collect — the q138
    * join-audit device) and route automatically: EXACT overlap while
    * Σ df² ≤ `df2Budget`, the DIMSUM-style sampled estimator past it.
    * The r17 verdict item 2 — the choice q264's exclusion note used to
    * leave to the operator's caller is now a measured, pinned decision.
    *
    * Both branches are the SAME plan (`sampledOverlapPairs`): the exact
    * branch sets maxPostings to the census max-df, under which every
    * posting survives with weight 1000 and est_pm ≡ 1000·n_common,
    * n_parts_sampled ≡ n_common — so the routed output is one schema
    * and the oracle replicates the routing arithmetic verbatim (path +
    * Σ df² ride every row; sum_df2 ships as the decimal's string form,
    * the q300 u2x device, since Σ df² passes int64 at corpus scale).
    *
    * The canonical regime decision record (DevScale, sf0.1 inflated
    * with a CONSTANT part catalog — part df densifies F×, so Σ df²
    * grows F² by construction; measured r17, PLANS.md):
    *
    *   | query              | t(x1) | t(x4)  | t(x16)  | t16/t1 |
    *   |--------------------|-------|--------|---------|--------|
    *   | q264 exact, capped | 3.59 s| 52.61 s| 426.48 s| 118.7× |
    *   | q334 DIMSUM sampled| 2.65 s|  4.47 s|  12.54 s|   4.73× |
    *
    * At x16 the sampled estimator is 34× faster in exactly the regime
    * the exact form degenerates in, while the REAL fixtures (catalog
    * growing with the corpus, mean part-df ≈ 30 and Σ df² = 1.8e6 at
    * sf0.01 / 1.9e7 at sf0.1) stay far under the default budget and
    * route exact. The default 1e8 budget is ~the x2 densification
    * point of sf0.1 — past it the exact pair stage exceeds ~1e8
    * candidate rows per shuffle and the estimator's bounded error
    * (adjudicated by `customerOverlapSampleAudit`) is the better trade.
    *
    * Scale shape: the df census is a parts-sized partial agg; the
    * routing collect is ONE row; the chosen branch rides the measured
    * q264/q334 shapes above.
    */
  def customerOverlapAuto(orders: DataFrame, lineitem: DataFrame,
                          maxPostings: Long = 64L,
                          minEstPermille: Long = 3000L,
                          k: Int = 50,
                          df2Budget: Long = 100000000L): DataFrame = {
    require(maxPostings >= 1 && k >= 1 && df2Budget >= 1,
      "maxPostings, k and df2Budget must be >= 1")
    val cp = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val row = cp.groupBy("part").agg(count(lit(1)).as("__df"))
      .agg(sum(expr("cast(__df as decimal(38,0)) * __df")).as("__sd2"),
        max(col("__df")).as("__mx"))
      .collect()(0)
    val sd2 =
      if (row.isNullAt(0)) java.math.BigDecimal.ZERO else row.getDecimal(0)
    val mx = if (row.isNullAt(1)) 1L else math.max(row.getLong(1), 1L)
    val exact =
      sd2.compareTo(java.math.BigDecimal.valueOf(df2Budget)) <= 0
    sampledOverlapPairs(cp, if (exact) mx else maxPostings)
      .filter(col("est_pm") >= minEstPermille)
      .select(lit(if (exact) "1_exact" else "2_sampled").as("path"),
        lit(sd2.toBigInteger.toString).as("sum_df2"),
        col("cust_a"), col("cust_b"), col("est_pm"),
        col("n_parts_sampled"))
      .orderBy(col("est_pm").desc, col("n_parts_sampled").desc,
        col("cust_a"), col("cust_b"))
      .limit(k)
  }

  /** Shared tail of the customer-overlap family: sizes census on the
    * surviving postings, the part-bucketed pair self-join, and the
    * deterministic global top-k. `keep` must be distinct (cust, part).
    */
  private def overlapPairsTopK(keep0: DataFrame, minOverlap: Long,
                               k: Int): DataFrame = {
    // part-hashed at full width (Dedup.wideBy): the overlap self-join
    // is CPU-quadratic per part group — byte-targeted AQE coalescing
    // must not serialize it, and the self-join reuses this exchange on
    // both sides
    val keep = Dedup.wideBy(keep0, col("part"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // force: the size census + both self-join sides read this cache
    // (the q298 cache-population-race note)
    keep.count()
    val sz = keep.groupBy("cust").agg(count(lit(1)).as("__sz"))
    keep.as("x")
      .join(keep.as("y"),
        col("x.part") === col("y.part") && col("x.cust") < col("y.cust"))
      .groupBy(col("x.cust").as("cust_a"), col("y.cust").as("cust_b"))
      .agg(count(lit(1)).as("n_common"))
      .filter(col("n_common") >= minOverlap)
      .join(sz.select(col("cust").as("cust_a"), col("__sz").as("sz_a")),
        "cust_a")
      .join(sz.select(col("cust").as("cust_b"), col("__sz").as("sz_b")),
        "cust_b")
      .select(col("cust_a"), col("cust_b"), col("n_common"),
        expr("n_common * 1000000 div (sz_a + sz_b - n_common)")
          .as("jaccard_q6"))
      .orderBy(col("n_common").desc, col("jaccard_q6").desc,
        col("cust_a"), col("cust_b"))
      .limit(k)
  }

  /** Item-based CF recommendations: each customer's top-`topN` unowned
    * parts by summed also-bought cosine over their purchase history —
    * the end-to-end "customers who bought X also bought Y" batch scorer.
    *
    * Scale shape: history ⋈ similarity-list is an equi-join on part
    * (similarity list is |parts|·k rows — shuffle join at scale, AQE
    * broadcasts when small); candidate scores partial-aggregate per
    * (customer, candidate) BEFORE the ownership anti-join; the top-N
    * window partitions by customer. Nothing driver-side, no all-pairs.
    */
  def cfRecommend(orders: DataFrame, lineitem: DataFrame,
                  minSupport: Long = 2L, simK: Int = 5,
                  topN: Int = 3): DataFrame = {
    require(topN >= 1, "topN must be >= 1")
    val sim = alsoBought(lineitem, minSupport, simK)
      .select(col("part"), col("rec"), col("cosine_q6"))
    // cp is read twice (scoring join + ownership anti-join): pin it so
    // the orders⋈lineitem distinct runs once
    val cp = custParts(orders, lineitem)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cust")
      .orderBy(col("score_q6").desc, col("rec"))
    cp.join(sim, "part")
      .groupBy(col("cust"), col("rec"))
      .agg(sum("cosine_q6").as("score_q6"),
        count(lit(1)).as("n_paths"))
      .join(cp.select(col("cust"), col("part").as("rec")),
        Seq("cust", "rec"), "left_anti")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("cust"), col("rec"), col("score_q6"), col("n_paths"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("cust", "rnk")
  }

  /** Top-N groups by value plus an OTHER rollup — the reporting shape
    * that stays a (N+1)-row table no matter how the group cardinality
    * grows (a bare top-N silently drops the tail; this conserves the
    * total, so shares are OF THE WHOLE). Ranks break ties on the group
    * label; shares are integer permille of the conserved total.
    *
    * Scale shape: one partial-agg census per group, a census-sized rank
    * window, a one-row total broadcast. `groupCol` is cast to string so
    * the OTHER label unions type-safely.
    */
  def topNWithOther(df: DataFrame, groupCol: String,
                    valueCents: org.apache.spark.sql.Column,
                    k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val cens = df.select(col(groupCol).cast("string").as("grp"),
        valueCents.cast("long").as("__v"))
      .groupBy("grp").agg(sum("__v").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cents").desc, col("grp"))
    val total = cens.agg(sum("cents").as("__t"))
    cens.withColumn("rn", row_number().over(w))
      .select(
        when(col("rn") <= k, col("grp")).otherwise(lit("OTHER"))
          .as("label"),
        when(col("rn") <= k, col("rn").cast("long"))
          .otherwise(lit(k + 1L)).as("rnk"),
        col("cents"))
      .groupBy("label", "rnk").agg(sum("cents").as("cents"))
      .crossJoin(broadcast(total))
      .select(col("label"), col("cents"),
        expr("cents * 1000 div nullif(__t, 0)").as("share_pm"),
        col("rnk"))
      .orderBy("rnk", "label")
  }

  /** Wilson lower-bound ranking of per-group proportions — here: brand
    * return rates. Ranking by the RAW rate promotes 1-of-1 flukes over
    * 90-of-1000 problems; the Wilson score interval's lower bound is
    * the standard fix (rank by "the worst rate the data still
    * supports"). The bound is computed as ONE fixed-shape double
    * expression over exact integer (r, n) — identical literal parse,
    * identical IEEE ops, identical order on both engines — then
    * quantized to q6 for the output; ties break on the group key.
    *
    * Scale shape: one partial-agg census per group (fact scan collapses
    * to |brands| rows), the bound is a projection, the rank is a window
    * over the census. Nothing scales past the group cardinality.
    */
  def wilsonReturnRank(lineitem: DataFrame, part: DataFrame,
                       z: Double = 1.96): DataFrame = {
    val cens = lineitem
      .select(col("l_partkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("__r"))
      .join(part.select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"), sum("__r").as("r"))
    // z² is written as (z · z) so BOTH engines derive it from the same
    // parsed double literal — a Scala-side product could print a longer
    // literal than the oracle's and drift a ulp. The literal is wrapped
    // in CAST(… AS DOUBLE) on BOTH sides: a bare `1.96` parses as
    // DECIMAL(3,2), and Spark's decimal division then a cast to double
    // is not the same operation as DuckDB's native double division —
    // the q6 rounding could drift by 1 at .5 boundaries without the pin.
    val zd = s"CAST($z AS DOUBLE)"
    val wilson = expr(
      s"""(r / n + ($zd * $zd) / (2 * n) - $zd * sqrt(
         |  r / n * (1 - r / n) / n + ($zd * $zd) / (4 * n * n)))
         | / (1 + ($zd * $zd) / n)""".stripMargin)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("wilson_q6").desc, col("brand"))
    cens
      .withColumn("__wl", wilson)
      .withColumn("wilson_q6",
        expr("cast(round(__wl * 1000000) as bigint)"))
      .select(col("brand"), col("n"), col("r"),
        expr("r * 1000 div n").as("rate_pm"), col("wilson_q6"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .orderBy("rnk")
  }

  /** Month-over-month revenue-rank movers: every part is ranked by
    * monthly revenue (cents; dense position by rev DESC, part id tie),
    * and each consecutive-month pair reports the rank delta — positive
    * = climbed. The top-`k` climbers per month is the "what's suddenly
    * selling" dial that absolute-revenue top-k can't see (a #500→#20
    * jump matters; a #1 staying #1 doesn't). Only parts present in
    * BOTH months compare — an absent month is no rank, not rank-last
    * (the q106 gap law applied to ranks).
    *
    * Scale shape: the fact scan collapses to the (month, part) revenue
    * table in one partial agg (months × |catalog| bounded); ranks are
    * a per-month window on that table (partitions sized by catalog);
    * the month-pair self-join is keyed (month+1, part); the top-k
    * window partitions by month.
    */
  def rankMovers(orders: DataFrame, lineitem: DataFrame,
                 k: Int = 5): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val mIdx = (year(col("o_orderdate")) * 12 +
      month(col("o_orderdate")) - 1).cast("long")
    val rev = orders.select(col("o_orderkey"), mIdx.as("m"))
      .join(lineitem.select(col("l_orderkey"), col("l_partkey"),
        round(col("l_extendedprice") * 100).cast("long").as("__cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("m"), col("l_partkey").as("part"))
      .agg(sum("__cents").as("rev_cents"))
    val wRank = org.apache.spark.sql.expressions.Window.partitionBy("m")
      .orderBy(col("rev_cents").desc, col("part"))
    // pinned: the month-pair self-join reads this frame on BOTH sides —
    // unpinned, the fact agg + rank window ran twice (plan-audited)
    val ranked = rev.withColumn("rank", row_number().over(wRank).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val prev = ranked.select((col("m") + 1).as("m"), col("part"),
      col("rank").as("rank_prev"))
    val wTop = org.apache.spark.sql.expressions.Window.partitionBy("m")
      .orderBy(col("delta").desc, col("part"))
    ranked.join(prev, Seq("m", "part"))
      .withColumn("delta", col("rank_prev") - col("rank"))
      .withColumn("rnk", row_number().over(wTop).cast("long"))
      .filter(col("rnk") <= k)
      .select(col("m").as("month_idx"), col("part"), col("rank"),
        col("rank_prev"), col("delta"), col("rnk"))
      .orderBy("month_idx", "rnk")
  }

  /** Per-nation SPEARMAN rank correlation between a customer's order
    * count and their total spend — the monotone-association complement
    * to the Pearson device (q230): Pearson on raw values is leverage-
    * dominated by whale customers; Spearman asks only "do frequent
    * buyers spend more", robust to any monotone rescaling.
    *
    * Engine-exact by construction: ties get AVERAGE ranks computed as
    * INTEGERS via doubling — 2·avgrank = 2·minrank + (ties − 1) (a rank
    * window plus a same-value count window, both per nation) — so every
    * sum entering the Pearson formula on ranks is an exact integer in
    * decimal(38,0)/HUGEINT; the single division runs on the same two
    * doubles in both engines and is q6-quantized (the q230/q165 sqrt
    * rule). rho is invariant to the doubling (scale cancels).
    *
    * Scale shape: the customer census is one keyed partial agg over
    * orders; rank windows partition by nation (customer-bounded, the
    * q108 aggregated-window posture — at 100 TB a per-nation partition
    * is |customers|/|nations|, and a heavier key set would move to
    * Layout.shardedRanks); the Pearson fold is one partial agg per
    * nation.
    */
  def spearmanOrderSpend(orders: DataFrame,
                         customer: DataFrame): DataFrame = {
    val cens = orders
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_ord"),
        sum(expr("cast(round(o_totalprice * 100) as long)")).as("cents"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("nation"), col("n_ord"), col("cents"))
    def rank2x(c: String): org.apache.spark.sql.Column = {
      val wo = org.apache.spark.sql.expressions.Window
        .partitionBy("nation").orderBy(col(c))
      val we = org.apache.spark.sql.expressions.Window
        .partitionBy(col("nation"), col(c))
      (lit(2L) * rank().over(wo) + count(lit(1)).over(we) - lit(1L))
        .cast("long")
    }
    val ranked = cens
      .withColumn("rx", rank2x("n_ord"))
      .withColumn("ry", rank2x("cents"))
    ranked.groupBy("nation")
      .agg(count(lit(1)).as("n_cust"),
        sum(col("rx").cast("decimal(38,0)")).as("sx"),
        sum(col("ry").cast("decimal(38,0)")).as("sy"),
        sum((col("rx") * col("ry")).cast("decimal(38,0)")).as("sxy"),
        sum((col("rx") * col("rx")).cast("decimal(38,0)")).as("sxx"),
        sum((col("ry") * col("ry")).cast("decimal(38,0)")).as("syy"))
      .select(col("nation").cast("long").as("nation"), col("n_cust"),
        expr("""cast(round(1000000 *
          cast(n_cust * sxy - sx * sy as double) /
          nullif(sqrt(cast(n_cust * sxx - sx * sx as double)) *
                 sqrt(cast(n_cust * syy - sy * sy as double)), 0d))
          as bigint)""").as("rho_q6"))
      .orderBy("nation")
  }

  /** Association rules over order baskets: directed (ante → cons) pairs
    * with support, confidence and lift — the market-basket trio that
    * separates "bought together because both are popular" (lift ≈ 1)
    * from genuine affinity (lift ≫ 1). Everything is integer-exact:
    * confidence_pm = n_both·1000 div n_ante, and
    * lift_q6 = n_both·N·10⁶ div (n_ante·n_cons) with the products taken
    * in decimal(38,0) so cluster-scale basket counts cannot wrap int64
    * (the q237 discipline). The ORACLE must cast its operands to
    * HUGEINT explicitly: DuckDB's BIGINT·BIGINT does NOT auto-promote —
    * it errors on overflow (only sum() aggregates return HUGEINT) — so
    * the q272 SQL writes CAST(… AS HUGEINT) on both products; with that
    * pin both engines are exact and `div` agrees bit-for-bit.
    *
    * Scale shape: the q202/q263 bounded pair stage (DISTINCT
    * (order, part) first — pairs are orders × (parts/order)², never
    * lineitem²); margins and the basket total N are partial-agg censuses
    * (N broadcasts as one row); the top-k window partitions by ante.
    */
  def associationRules(lineitem: DataFrame, minSupport: Long = 2L,
                       k: Int = 5): DataFrame = {
    require(minSupport >= 1 && k >= 1, "minSupport and k must be >= 1")
    // pinned: the directed union reads the pair aggregate twice (the
    // alsoBought note)
    val (baskets, margin0, pairs) = {
      val (b, m, p) = basketCore(lineitem, minSupport)
      (b, m,
        p.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    }
    val total = baskets.agg(count(lit(1)).as("__n"))
    val margin = margin0.withColumnRenamed("__n", "__m")
    val directed = pairs.select(col("pa").as("ante"), col("pb").as("cons"),
        col("n_both"))
      .unionByName(pairs.select(col("pb").as("ante"), col("pa").as("cons"),
        col("n_both")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("ante")
      .orderBy(col("lift_q6").desc, col("cons"))
    directed
      .join(margin.select(col("l_partkey").as("ante"),
        col("__m").as("n_ante")), "ante")
      .join(margin.select(col("l_partkey").as("cons"),
        col("__m").as("n_cons")), "cons")
      .crossJoin(broadcast(total))
      .withColumn("confidence_pm",
        expr("n_both * 1000 div n_ante"))
      .withColumn("lift_q6",
        expr("cast(n_both as decimal(38,0)) * __n * 1000000" +
          " div (cast(n_ante as decimal(38,0)) * n_cons)"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("ante"), col("cons"), col("n_both"), col("n_ante"),
        col("confidence_pm"), col("lift_q6"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("ante", "rnk")
  }

  /** Content-based recommender: each query customer's taste PROFILE is
    * the per-dimension sum of the embeddings of the parts they bought
    * (quantized to q6 integers FIRST, so the profile is an exact integer
    * vector — group-sum order cannot perturb a float bit and the oracle
    * reconstructs it exactly); recommendations are the top-`topN`
    * unowned parts by cosine(profile, part embedding). Parts map to the
    * embeddings table by `p_partkey mod |embeddings|` — the q74/q86
    * synthetic-domain device, identical in the oracle. Complements
    * `cfRecommend`: CF needs co-purchase support, this scores any part
    * with an embedding (the cold-start side of a recommender pair).
    *
    * Scale shape: profile build is linear (history ⋈ part-vector map,
    * one partial agg per (cust, dim)); scoring is the EXACT brute-force
    * baseline over a bounded query-customer set (`maxQueryCust`, the
    * q26 vec_id<10 convention) — profiles broadcast, the corpus scan
    * streams through one codegen'd cosine per (query, part). Batch
    * scoring of ALL customers at 100 TB rides `Similarity.annIvf` with
    * the profile frame as the query side (same schema); this operator
    * is its recall baseline, like q26 is for q27/q44.
    */
  def embeddingProfileRecommend(orders: DataFrame, lineitem: DataFrame,
                                part: DataFrame, embeddings: DataFrame,
                                maxQueryCust: Long = 100L,
                                topN: Int = 3): DataFrame = {
    import graft.ops.Similarity.{asDouble, cosine}
    require(topN >= 1, "topN must be >= 1")
    graft.functions.GraftFunctions.register(orders.sparkSession)
    val nv = embeddings.agg(count(lit(1)).as("__nv"))
    val ev = embeddings
      .select(col("vec_id"), asDouble(col("embedding")).as("emb"))
      .filter(cosine(col("emb"), col("emb")) > 0)
    // catalog part → vector map; parts mapped to a zero embedding drop
    // out on both engines (the q26 nonzero filter)
    val pv = part.select(col("p_partkey").as("part"))
      .crossJoin(broadcast(nv))
      .join(ev, col("part") % col("__nv") === col("vec_id"))
      .select(col("part"), col("emb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // purchase history of the query customers: feeds the profile build
    // AND the ownership anti-join (pin once, the cfRecommend discipline)
    val cp = custParts(orders, lineitem)
      .filter(col("cust") < maxQueryCust)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // exact integer profile: quantize each dim to q6 BEFORE the group
    // sum, so addition order cannot perturb a bit on either engine
    val prof = cp.join(pv, "part")
      .select(col("cust"), posexplode(col("emb")).as(Seq("d", "e")))
      .groupBy(col("cust"), col("d"))
      .agg(sum(expr("cast(round(e * 1000000) as long)")).as("v"))
      .groupBy("cust")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("v")))),
        x => x.getField("v").cast("double")).as("pemb"))
      .filter(cosine(col("pemb"), col("pemb")) > 0)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cust")
      .orderBy(col("score_q6").desc, col("rec"))
    broadcast(prof).crossJoin(pv)
      .select(col("cust"), col("part").as("rec"),
        expr("cast(round(graft_cosine(pemb, emb) * 1000000) as bigint)")
          .as("score_q6"))
      .join(cp.select(col("cust"), col("part").as("rec")),
        Seq("cust", "rec"), "left_anti")
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= topN)
      .select(col("cust"), col("rec"), col("score_q6"),
        col("rnk").cast("long").as("rnk"))
      .orderBy("cust", "rnk")
  }

  /** One-way ANOVA F over order value by nation — does ANY nation's
    * mean differ, in one test (running 25 pairwise z-tests inflates
    * false positives; F is the family-wise readout that gates them).
    *
    * Exactness discipline: F is SCALE-INVARIANT, so the value
    * quantizes to whole DOLLARS — chosen so every quantity entering a
    * double (group sums ~1e9, group mean squares, Σd² ~1e13 at the
    * bench scale) stays BELOW 2⁵³, where integer→double conversion is
    * exact on both engines. The cents formulation was measured to
    * diverge at the last ulp: a >2⁵³ integer rounds differently
    * through Spark's Decimal.toDouble vs DuckDB's HUGEINT cast — the
    * unit-scaling rail (pick units so per-group Σv² < 2⁵³) is the
    * principled fix, documented here because the driver hash CAUGHT
    * it. Per-group SSB/SSW terms round to integer dollar² BEFORE the
    * order-free sums (the q305 device); F is one fixed-shape IEEE
    * expression, q6.
    *
    * Scale shape: one keyed partial agg to |groups| rows, a 1-row
    * broadcast of the grand totals, one fold. No window.
    */
  def anovaOrderValue(orders: DataFrame,
                      customer: DataFrame): DataFrame = {
    val fact = orders
      .select(col("o_custkey"),
        expr("cast(round(o_totalprice) as long)").as("__d"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").as("__g"), col("__d"))
    val per = fact.groupBy("__g")
      .agg(count(lit(1)).as("n_g"),
        sum(col("__d").cast("decimal(38,0)")).as("s_g"),
        sum(col("__d").cast("decimal(38,0)") * col("__d")).as("ss_g"))
    val tot = per.agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"))
    val terms = per.crossJoin(broadcast(tot))
      .select(
        expr("""cast(round(cast(n_g as double) *
          ((cast(s_g as double) / cast(n_g as double) -
            cast(s as double) / cast(n as double)) *
           (cast(s_g as double) / cast(n_g as double) -
            cast(s as double) / cast(n as double)))) as bigint)""")
          .as("b_g"),
        expr("""cast(ss_g as bigint) - cast(round(cast(n_g as double) *
          ((cast(s_g as double) / cast(n_g as double)) *
           (cast(s_g as double) / cast(n_g as double)))) as bigint)""")
          .as("w_g"),
        col("n_g"))
    terms.agg(count(lit(1)).as("k"), sum(col("n_g")).as("n"),
        sum(col("b_g")).as("ssb_d2"), sum(col("w_g")).as("ssw_d2"))
      .select(col("k"), col("n"), col("ssb_d2"), col("ssw_d2"),
        expr("""cast(round(1000000 * ((cast(ssb_d2 as double) /
          cast(k - 1 as double)) / nullif(cast(ssw_d2 as double) /
          cast(n - k as double), 0d))) as bigint)""").as("f_q6"))
  }

  /** Ordered top-k string aggregation: per nation, the top-k customer
    * names by account balance concatenated in rank order — the ORDERED
    * string_agg surface (report/export shape) that plain collect_list
    * can't give deterministically: Spark's collect_list order is
    * partition-dependent, so the list is collected as (rank, name)
    * structs, array_sort'ed on the rank (making the result a pure
    * function of the data), then projected and joined. Balance
    * compares in exact cents with a name tiebreak — no double ties.
    *
    * Scale shape: one per-nation rank window (customer-bounded
    * partitions — the q108 posture), rank ≤ k filter feeds
    * WindowGroupLimit pushdown, then a k-bounded per-nation collect.
    */
  def topNamesConcat(customer: DataFrame, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("c_nationkey")
      .orderBy(col("__cents").desc, col("c_name"))
    customer
      .select(col("c_nationkey"), col("c_name"),
        expr("cast(round(c_acctbal * 100) as long)").as("__cents"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .groupBy(col("c_nationkey").cast("long").as("nation"))
      .agg(concat_ws(",",
        transform(array_sort(collect_list(struct(col("__rk"),
          col("c_name")))), x => x.getField("c_name"))).as("top_names"))
      .orderBy("nation")
  }

  /** Leave-one-out target encoding: each order's nation feature becomes
    * the mean order value of the SAME nation's OTHER orders — the
    * standard high-cardinality categorical encoder with the standard
    * leakage fix (a plain group mean includes the row's own target;
    * LOO subtracts it, so the feature never sees its own label — the
    * q119/q152 leakage-audit posture applied at feature build time).
    *
    * Reported as an EXACT RATIONAL (loo_num = group cents − own cents,
    * loo_den = n − 1) instead of a rounded double: exact integers
    * cross engines bit for bit, and downstream can divide at whatever
    * precision it wants. Groups of one get NULL num (no peers — the
    * encoder's honest answer, not 0). Output restricted to a bounded
    * key sample; the encoding itself is corpus-wide.
    *
    * Scale shape: one keyed partial agg for the group sums, broadcast
    * back over the fact scan by the group key (|nations| rows — at
    * higher-cardinality keys the same plan shuffles on the key, still
    * one agg + one equi-join). No window.
    */
  def targetEncodeLoo(orders: DataFrame, customer: DataFrame,
                      maxOrderKey: Long = 500L): DataFrame = {
    val fact = orders
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as long)").as("__cents"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey").as("nation"),
        col("__cents"))
    val grp = fact.groupBy("nation")
      .agg(count(lit(1)).as("__n"),
        sum(col("__cents").cast("decimal(38,0)")).as("__sum"))
    fact.join(broadcast(grp), "nation")
      .filter(col("o_orderkey") < maxOrderKey)
      .select(col("o_orderkey"), col("nation").cast("long").as("nation"),
        when(col("__n") > 1L,
          (col("__sum") - col("__cents")).cast("decimal(38,0)"))
          .otherwise(lit(null)).cast("string").as("loo_num"),
        (col("__n") - 1L).as("loo_den"))
      .orderBy("o_orderkey")
  }

  /** VARIANT-typed semi-structured extraction (q386): a nested JSON
    * payload built deterministically from the event columns is parsed
    * ONCE into Spark 4's `VariantType` (`parse_json` — the binary
    * semi-structured encoding that replaces repeated
    * `get_json_object` string re-parsing; q45 is the string-path
    * form), then typed paths — top-level scalar, quoted string,
    * nested-object field, array elements — are extracted with
    * `variant_get` and aggregated. The oracle computes the SAME
    * census from the raw columns, never through JSON: the contract is
    * that encode → parse → typed-path extraction is lossless
    * (doubles survive because the JVM's shortest-round-trip
    * double↔string guarantee covers the encode, and variant parse is
    * exact on the decimal literal).
    *
    * At 100 TB this is the ingestion path for semi-structured event
    * payloads: one parse per row into a columnar-shreddable binary,
    * arbitrary typed paths after — versus one string re-parse PER
    * EXTRACTED PATH in the q45 form. Scale shape: codegen'd scan
    * projection + one keyed partial agg.
    */
  def variantExtractCensus(events: DataFrame): DataFrame = {
    val json = concat(
      lit("{\"u\":"), col("user_id"),
      lit(",\"e\":\""), col("event_type"),
      lit("\",\"m\":{\"v\":"), coalesce(col("value"), lit(0.0)),
      lit(",\"seq\":["), pmod(col("ts"), lit(7L)),
      lit(","), pmod(col("ts"), lit(11L)), lit("]}}"))
    events.withColumn("var", parse_json(json))
      .select(
        variant_get(col("var"), "$.e", "string").as("etype"),
        variant_get(col("var"), "$.u", "long").as("u"),
        variant_get(col("var"), "$.m.v", "double").as("v"),
        variant_get(col("var"), "$.m.seq[0]", "long").as("s0"),
        variant_get(col("var"), "$.m.seq[1]", "long").as("s1"))
      .groupBy("etype")
      .agg(count(lit(1)).as("n"),
        sum(col("u")).as("sum_u"),
        sum(round(col("v") * 100).cast("long")).as("v_cents"),
        sum(col("s0")).as("sum_s0"),
        sum(col("s1")).as("sum_s1"))
      .orderBy("etype")
  }
}
