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
}
