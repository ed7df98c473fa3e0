package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join operators (SURVEY.md §2.3).
  *
  * Reference semantics (paths in `/root/reference/`):
  *  - J1 reduce-side repartition equi-join — Flight1/src/main/java/hw3/PLAIN.java:135–194.
  *  - J2 theta conjunct on the join output (`leg1.ArrTime < leg2.DepTime`)
  *    — PLAIN.java:175–194. Strict `<`, both legs same key (airport, date).
  *  - J3 map-side broadcast join — final/src/main/java/calc/KMeans.java:75–103
  *    (centroids loaded in task setup) → `broadcast()` hint here.
  *  - semi/anti joins have no reference citation (§2.3 note) — they are part
  *    of the engine surface and come free from Spark.
  *
  * Scale notes: the two-leg join keys on (user, time-window) with a bounded
  * window conjunct so the per-key pair blow-up is bounded at 100 TB; the
  * nation roll-up pre-aggregates the fact table BEFORE the dimension joins
  * (Catalyst does not push partial aggs through joins on its own) and
  * broadcasts the small dimensions.
  */
object Joins {

  /** J1+J3: orders→customer→nation roll-up.
    * `orders` is pre-aggregated per customer first — at 100 TB this shrinks
    * the join's probe side from |orders| to |customers| before any wide
    * exchange — and `nation` (25 rows) is broadcast explicitly.
    */
  def ordersPerNation(orders: DataFrame, customer: DataFrame,
                      nation: DataFrame): DataFrame = {
    val perCust = orders
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cust_orders"), sum("o_totalprice").as("cust_spend"))
    perCust
      .join(customer, perCust("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(sum("cust_orders").as("n_orders"),
           round(sum("cust_spend"), 2).as("revenue"))
      .orderBy("n_name")
  }

  /** J1+J2: the Flight1 two-leg connection join, re-keyed to `events`:
    * a `view` followed by a `purchase` by the same user within `windowNs`.
    * Equi part (user_id) drives the shuffle; the strict `<` ordering and
    * the window bound are non-equi conjuncts evaluated post-match, exactly
    * how Catalyst plans a theta conjunct on an equi-join (SMJ/SHJ + filter).
    * `ts` is int64 nanoseconds (Tables.events).
    */
  def twoLegPairs(events: DataFrame,
                  firstType: String = "view",
                  secondType: String = "purchase",
                  windowNs: Long = 24L * 3600 * 1000000000L): DataFrame = {
    val leg1 = events.filter(col("event_type") === firstType)
      .select(col("user_id"), col("ts").as("ts1"), col("value").as("v1"))
    val leg2 = events.filter(col("event_type") === secondType)
      .select(col("user_id").as("uid2"), col("ts").as("ts2"),
              col("value").as("v2"))
    leg1.join(leg2,
      col("user_id") === col("uid2") &&
      col("ts1") < col("ts2") &&
      col("ts2") <= col("ts1") + lit(windowNs))
  }

  /** A5 over J2: global count + avg combined value of the two legs — the
    * Spark form of PLAIN.java's counter-based `count:N average:X` line.
    */
  def twoLegStats(events: DataFrame): DataFrame =
    twoLegPairs(events)
      .agg(count(lit(1)).as("pairs"),
           round(avg(col("v1") + col("v2")), 3).as("avg_combined"))

  /** Left-semi: customers that have at least one order. No payload from the
    * right side crosses the exchange — cheaper than join+distinct.
    */
  def customersWithOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")

  /** Left-anti: customers with no orders. */
  def customersWithoutOrders(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, customer("c_custkey") === orders("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
}
