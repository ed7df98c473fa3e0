package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the semantics SURVEY.md §7.5 calls out as fidelity risks:
  * ceil-vs-round averages (A6), Java truncation-vs-rounding casts (P6),
  * dense gap fill (A7), deterministic top-k tiebreak (O6).
  */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("cohortRevenue + supplierRedundancy: hand cases") {
    import java.sql.Timestamp
    // cust 1 acquired Jan-95 (2 orders: Jan + Mar); cust 2 in Mar-95
    val orders = Seq(
      (1L, 1L, 100.0, Timestamp.valueOf("1995-01-15 00:00:00")),
      (2L, 1L, 50.0, Timestamp.valueOf("1995-03-02 00:00:00")),
      (3L, 2L, 30.0, Timestamp.valueOf("1995-03-20 00:00:00")))
      .toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val ltv = Relational.cohortRevenue(orders, maxOffset = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val jan = 1995L * 12 + 0
    val mar = 1995L * 12 + 2
    assert(ltv == Seq((jan, 0L, 1L, 10000L), (jan, 2L, 1L, 5000L),
      (mar, 0L, 1L, 3000L)))
    // part 10 single-sourced, part 11 dual-sourced
    val li = Seq((10L, 1L), (10L, 1L), (11L, 1L), (11L, 2L))
      .toDF("l_partkey", "l_suppkey")
    assert(Relational.supplierRedundancy(li)
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("repeatCustomerCensus + discountCurve: cents-exact hand cases") {
    val orders = Seq(
      (1L, 10L, 10.005), (2L, 10L, 20.0), // cust 10: repeat, 3001 cents
      (3L, 11L, 5.0))                     // cust 11: one-time, 500
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val rc = Relational.repeatCustomerCensus(orders)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(rc == ((2L, 1L, 3501L, 3001L, 3001L * 1000 / 3501)))
    val li = Seq((1L, 2L, 100.0, 0.05), (2L, 3L, 200.0, 0.05),
      (3L, 1L, 50.0, 0.0))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val dc = Relational.discountCurve(li)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // 5%: revenues 9500 + 19000 cents; 0%: 5000 cents
    assert(dc == Seq((0L, 1L, 1L, 5000L), (5L, 2L, 5L, 28500L)))
  }

  test("shipLagCensus: day-exact lags, late gate strict") {
    import java.sql.Timestamp
    val orders = Seq(
      (1L, "1-URGENT", Timestamp.valueOf("1995-01-01 00:00:00")),
      (2L, "5-LOW", Timestamp.valueOf("1995-01-01 00:00:00")))
      .toDF("o_orderkey", "o_orderpriority", "o_orderdate")
    val li = Seq(
      (1L, Timestamp.valueOf("1995-01-11 23:59:59")), // lag 10
      (1L, Timestamp.valueOf("1995-04-02 00:00:00")), // lag 91 → late
      (2L, Timestamp.valueOf("1995-04-01 00:00:00"))) // lag 90 → NOT late
      .toDF("l_orderkey", "l_shipdate")
    val got = Relational.shipLagCensus(orders, li, lateDays = 90)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("1-URGENT", 2L, 1L, 101L, 91L),
      ("5-LOW", 1L, 0L, 90L, 90L)))
  }

  test("A6: grouped average uses ceil, not rounding") {
    // avg = 10.2 → ceil 11 (rounding would give 10)
    val li = Seq(("A", "F", 10.0), ("A", "F", 10.0), ("A", "F", 10.0),
                 ("A", "F", 10.0), ("A", "F", 11.0))
      .toDF("l_returnflag", "l_linestatus", "l_quantity")
      .withColumn("l_shipdate", lit("1996-03-15").cast("timestamp_ntz"))
    val r = Relational.ceilAvgByMonth(li).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Int]("avg_qty") == 11)
    assert(r.head.getAs[Int]("mon") == 3)
  }

  test("P6: cast-to-int truncates toward zero like Java (int), incl. negatives") {
    val ev = Seq(("a", Some(9.99)), ("a", Some(-9.99)), ("b", None))
      .toDF("event_type", "value")
    val r = Relational.truncatedDelaySum(ev).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r("a") == 0L) // 9 + (-9), NOT 10 + (-10)
    assert(r("b") == 0L) // null → 0 default
  }

  test("A7: dense month fill emits 0 for months with no data") {
    val li = Seq(("A", 5.0, "1996-01-10"), ("A", 7.0, "1996-07-01"))
      .toDF("l_returnflag", "l_quantity", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp_ntz")).drop("d")
    val r = Relational.denseMonthFill(li).collect()
    assert(r.length == 12)
    val byMon = r.map(x => x.getAs[Int]("mon") -> x.getAs[Int]("avg_qty")).toMap
    assert(byMon(1) == 5 && byMon(7) == 7)
    assert((2 to 6).forall(byMon(_) == 0) && (8 to 12).forall(byMon(_) == 0))
  }

  test("O6: top-k breaks price ties by order key") {
    val o = Seq((3L, 1L, 100.0), (1L, 1L, 100.0), (2L, 1L, 100.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = Relational.topKOrders(o, 2).collect().map(_.getLong(0))
    assert(r.toSeq == Seq(1L, 2L))
  }

  test("grouped quantiles interpolate linearly within each group") {
    val li = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("A", 10.0),
                 ("B", 5.0))
      .toDF("l_returnflag", "l_quantity")
    val r = Relational.groupedQuantiles(li).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2), x.getLong(3)))
      .toMap
    // A: median of [1,2,3,10] = 2.5; p90 = 3 + 0.7*(10-3) = 7.9
    assert(r("A")._1 == 2.5 && r("A")._3 == 4L)
    assert(math.abs(r("A")._2 - 7.9) < 1e-12)
    assert(r("B") == ((5.0, 5.0, 1L)))
  }

  test("mergePartials: merged partials equal the direct aggregate") {
    val facts = Seq((2024, 1, "a", 3L), (2024, 1, "a", 4L),
      (2024, 2, "a", 5L), (2024, 2, "b", 1L), (2025, 1, "a", 7L))
      .toDF("yr", "mon", "grp", "v")
    val partials = facts.groupBy("yr", "mon", "grp")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
    val merged = Relational.mergePartials(partials, Seq("yr", "grp"),
        Seq("n", "s"))
      .as[(Int, String, Long, Long)].collect().toSeq
    val direct = facts.groupBy("yr", "grp")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("v").as("s"))
      .orderBy("yr", "grp")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(merged == direct)
    assert(merged == Seq((2024, "a", 3L, 12L), (2024, "b", 1L, 1L),
      (2025, "a", 1L, 7L)))
    intercept[IllegalArgumentException] {
      Relational.mergePartials(partials, Seq.empty, Seq("n"))
    }
  }
  test("basketPairs: distinct-first, minSupport, exact lift") {
    // o1 {1,2,3} (part 1 listed twice -> distinct), o2 {1,2}, o3 {2,9}:
    // pair (1,2) in 2 orders; all others in 1 -> dropped at support 2.
    // lift = 2*3*1e6 div (2*3) = 1000000
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L), (2L, 1L),
      (2L, 2L), (3L, 2L), (3L, 9L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.basketPairs(li, minSupport = 2L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 1000000L)))
    // support 1 keeps every pair, ordered
    assert(Relational.basketPairs(li, minSupport = 1L).count() == 4L)
  }

  test("priorityMix: exact permille shares per nation") {
    val orders = Seq((1L, 10L, "1-URGENT"), (2L, 10L, "2-HIGH"),
      (3L, 20L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderpriority")
    val cust = Seq((10L, 1L), (20L, 2L)).toDF("c_custkey", "c_nationkey")
    val nat = Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
    val got = Relational.priorityMix(orders, cust, nat)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "1-URGENT", 1L, 500L),
      ("A", "2-HIGH", 1L, 500L), ("B", "1-URGENT", 1L, 1000L)))
  }

  test("tradeFlows: domestic flow excluded, exact cents by year") {
    import java.sql.Timestamp
    val li = Seq(
      // order 1 (cust 10 in nation 1) shipped by supp 100 (nation 2)
      (1L, 100L, 10.0, 0.1, Timestamp.valueOf("1995-03-01 00:00:00")),
      (1L, 100L, 20.0, 0.0, Timestamp.valueOf("1996-03-01 00:00:00")),
      // order 2 (cust 20 in nation 2) shipped by supp 100 (nation 2):
      // domestic — must not appear
      (2L, 100L, 99.0, 0.0, Timestamp.valueOf("1995-05-01 00:00:00")))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
        "l_shipdate")
    val orders = Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
    val cust = Seq((10L, 1L), (20L, 2L)).toDF("c_custkey", "c_nationkey")
    val supp = Seq((100L, 2L)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1L, "A"), (2L, "B")).toDF("n_nationkey", "n_name")
    val got = Relational.tradeFlows(li, orders, cust, supp, nat)
      .as[(String, String, Long, Long)].collect().toSeq
    // 10.0 × 0.9 = 9.00 → 900 cents in 1995; 20.0 → 2000 in 1996
    assert(got == Seq(("B", "A", 1995L, 900L), ("B", "A", 1996L, 2000L)))
  }

  test("rfmSegments: dominant customers land in the top segment") {
    import java.sql.Timestamp
    // four customers, strictly increasing on every axis: cust i has i
    // orders, later last-order date, higher lifetime spend
    val orders = (1 to 4).flatMap { c =>
      (1 to c).map { j =>
        (c * 10L + j, c.toLong, c * 100.0,
          Timestamp.valueOf(s"1995-0$c-0$j 00:00:00"))
      }
    }.toDF("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    val got = Relational.rfmSegments(orders, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // customers 1,2 → bucket 1 on every axis; 3,4 → bucket 2.
    // revenue: c1 100.00 + c2 2×200.00 = 50000¢; c3 3×300 + c4 4×400
    // = 250000¢
    assert(got == Seq((1L, 1L, 1L, 2L, 50000L),
      (2L, 2L, 2L, 2L, 250000L)))
  }

  test("lateOrderCensus: one qualifying line marks the order, once") {
    import java.sql.Timestamp
    val d0 = Timestamp.valueOf("1995-01-01 00:00:00")
    val li = Seq(
      (1L, Timestamp.valueOf("1995-04-11 00:00:00")),  // +100d
      (1L, Timestamp.valueOf("1996-02-05 00:00:00")),  // +400d: late
      (2L, Timestamp.valueOf("1995-01-11 00:00:00")),  // +10d
      (3L, Timestamp.valueOf("1996-01-02 00:00:00")))  // +366d: late
      .toDF("l_orderkey", "l_shipdate")
    val orders = Seq((1L, d0, "P1"), (2L, d0, "P1"), (3L, d0, "P2"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val got = Relational.lateOrderCensus(orders, li, lateDays = 365)
      .as[(String, Long)].collect().toSeq
    // order 1 counts ONCE despite two lines; order 2 on time
    assert(got == Seq(("P1", 1L), ("P2", 1L)))
  }

  test("orderCountDistribution: zero-order customers included") {
    val cust = Seq(1L, 2L, 3L).toDF("c_custkey")
    val orders = Seq((10L, 1L), (11L, 1L), (12L, 2L), (13L, 2L))
      .toDF("o_orderkey", "o_custkey")
    val got = Relational.orderCountDistribution(cust, orders)
      .as[(Long, Long)].collect().toSeq
    // two 2-order customers, one 0-order customer
    assert(got == Seq((2L, 2L), (0L, 1L)))
  }

  test("dominantSuppliers: strict permille threshold per part") {
    val li = Seq(
      (1L, 100L, 30.0), (1L, 200L, 2.0),  // 100: 937 permille; 200: 62
      (2L, 200L, 10.0))                   // single-supplier part: 1000
      .toDF("l_partkey", "l_suppkey", "l_quantity")
    val supp = Seq((100L, 1), (200L, 2)).toDF("s_suppkey", "s_nationkey")
    val nat = Seq((1, "A"), (2, "B")).toDF("n_nationkey", "n_name")
    val got = Relational.dominantSuppliers(li, supp, nat,
      thresholdPermille = 200L)
      .as[(String, Long, Long)].collect().toSeq
    // supplier 100 dominates part 1; 200 dominates only part 2
    assert(got == Seq(("A", 1L, 1L), ("B", 1L, 1L)))
  }

  test("soleLateSuppliers: blame only when exactly one supplier late") {
    import java.sql.Timestamp
    val d0 = Timestamp.valueOf("1995-01-01 00:00:00")
    val late = Timestamp.valueOf("1996-02-05 00:00:00")   // +400d
    val ok = Timestamp.valueOf("1995-01-11 00:00:00")     // +10d
    val li = Seq(
      (1L, 100L, late), (1L, 200L, ok),   // S100 solely late: blamed
      (2L, 100L, late), (2L, 200L, late), // both late: excluded
      (3L, 300L, late))                   // single-supplier: excluded
      .toDF("l_orderkey", "l_suppkey", "l_shipdate")
    val orders = Seq((1L, d0), (2L, d0), (3L, d0))
      .toDF("o_orderkey", "o_orderdate")
    val supp = Seq((100L, "S100"), (200L, "S200"), (300L, "S300"))
      .toDF("s_suppkey", "s_name")
    val got = Relational.soleLateSuppliers(li, orders, supp,
      lateDays = 365, k = 10)
      .as[(Long, String, Long)].collect().toSeq
    assert(got == Seq((100L, "S100", 1L)))
  }

  test("brandMarketShare: permille of the year total, exact cents") {
    import java.sql.Timestamp
    val d95 = Timestamp.valueOf("1995-06-01 00:00:00")
    val li = Seq(
      (1L, 10L, 10.0, 0.0),   // Brand#1: 1000 cents
      (1L, 20L, 30.0, 0.0))   // Brand#2: 3000 cents
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    val orders = Seq((1L, d95)).toDF("o_orderkey", "o_orderdate")
    val part = Seq((10L, "Brand#1"), (20L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val got = Relational.brandMarketShare(li, orders, part, "Brand#1")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1995L, 1000L, 4000L, 250L)))
  }

  test("aboveAverageOrders: cents*n > total; singletons excluded") {
    val orders = Seq(
      (1L, "P1", 100.0), (1L, "P1", 300.0),  // avg 200: the 300 wins
      (2L, "P2", 999.0))                     // single order: excluded
      .toDF("o_custkey", "o_orderpriority", "o_totalprice")
    val got = Relational.aboveAverageOrders(orders, minOrders = 2L)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("P1", 1L, 30000L)))
  }

  test("orderBacklog: dense months, shipped on LAST line, running net") {
    import java.sql.Timestamp
    // orders placed in 1995-01 (x2) and 1995-03 (x1); order 1's lines
    // ship in 01 and 03 (fully shipped only in 03), order 2 in 01;
    // order 3 never ships. 1995-02 must dense-fill.
    val orders = Seq(
      (1L, Timestamp.valueOf("1995-01-05 00:00:00")),
      (2L, Timestamp.valueOf("1995-01-20 00:00:00")),
      (3L, Timestamp.valueOf("1995-03-10 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, Timestamp.valueOf("1995-01-10 00:00:00")),
      (1L, Timestamp.valueOf("1995-03-15 00:00:00")),
      (2L, Timestamp.valueOf("1995-01-25 00:00:00")))
      .toDF("l_orderkey", "l_shipdate")
    val got = Relational.orderBacklog(orders, li)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val m0 = 1995L * 12 + 0
    assert(got == Seq((m0, 2L, 1L, 1L), (m0 + 1, 0L, 0L, 1L),
      (m0 + 2, 1L, 1L, 1L)))
  }

  test("revenueConcentration: HHI exact - monopoly 1e6, 50/50 500k") {
    import java.sql.Timestamp
    val d95 = Timestamp.valueOf("1995-06-01 00:00:00")
    val d96 = Timestamp.valueOf("1996-06-01 00:00:00")
    val li = Seq(
      (1L, 10L, 10.0, 0.0),                       // 1995: only Brand#1
      (2L, 10L, 10.0, 0.0), (2L, 20L, 10.0, 0.0)) // 1996: 50/50
      .toDF("l_orderkey", "l_partkey", "l_extendedprice", "l_discount")
    val orders = Seq((1L, d95), (2L, d96)).toDF("o_orderkey", "o_orderdate")
    val part = Seq((10L, "Brand#1"), (20L, "Brand#2"))
      .toDF("p_partkey", "p_brand")
    val got = Relational.revenueConcentration(li, orders, part)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1995L, 1L, 1000000L), (1996L, 2L, 500000L)))
  }

  test("priceReconciliation: exact match, drift, and orphan header") {
    val orders = Seq((1L, 30.0), (2L, 10.0), (3L, 5.0))
      .toDF("o_orderkey", "o_totalprice")
    val li = Seq((1L, 10.0), (1L, 20.0), (2L, 9.0))
      .toDF("l_orderkey", "l_extendedprice")
    // order 1 reconciles (3000 = 1000+2000); order 2 drifts 100 cents;
    // order 3 has NO lines -> compares against 0, drift 500
    val got = Relational.priceReconciliation(orders, li)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(got == ((3L, 1L, 2L, 500L, 600L)))
  }

  test("shippingPriority: ordered-before AND unshipped-after the cutoff") {
    import java.sql.Timestamp
    val before = Timestamp.valueOf("1996-06-01 00:00:00")
    val after = Timestamp.valueOf("1997-06-01 00:00:00")
    val cust = Seq((1L, "BUILDING"), (2L, "MACHINERY"))
      .toDF("c_custkey", "c_mktsegment")
    val orders = Seq((10L, 1L, before, "P"), (11L, 1L, after, "P"),
      (12L, 2L, before, "P"))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Seq(
      (10L, 10.0, 0.0, after),   // qualifies
      (10L, 5.0, 0.0, before),   // shipped before cutoff: excluded
      (11L, 9.0, 0.0, after),    // order placed after cutoff: excluded
      (12L, 9.0, 0.0, after))    // wrong segment: excluded
      .toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val got = Relational.shippingPriority(cust, orders, li,
      "BUILDING", "1997-01-01", k = 10)
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((10L, 1000L)))
  }

  test("localSupplierVolume: cross-nation supplier excluded (Q5 vs Q7)") {
    import java.sql.Timestamp
    val d96 = Timestamp.valueOf("1996-06-01 00:00:00")
    val region = Seq((1, "ASIA"), (2, "EUROPE")).toDF("r_regionkey", "r_name")
    val nation = Seq((1, "JP", 1), (2, "FR", 2)).toDF("n_nationkey", "n_name", "n_regionkey")
    val cust = Seq((1L, 1)).toDF("c_custkey", "c_nationkey")
    val orders = Seq((10L, 1L, d96)).toDF("o_orderkey", "o_custkey", "o_orderdate")
    val li = Seq((10L, 100L, 10.0, 0.0), (10L, 200L, 99.0, 0.0))
      .toDF("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = Seq((100L, 1), (200L, 2)).toDF("s_suppkey", "s_nationkey")
    // supplier 200 is French: its 99.0 line must NOT count for JP
    val got = Relational.localSupplierVolume(region, nation, cust,
      orders, li, supp, "ASIA", 1996)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("JP", 1000L)))
  }

  test("priorityClassCensus: only late lines, exact class split") {
    import java.sql.Timestamp
    val d0 = Timestamp.valueOf("1995-01-01 00:00:00")
    val late = Timestamp.valueOf("1996-02-01 00:00:00")
    val ok = Timestamp.valueOf("1995-02-01 00:00:00")
    val orders = Seq((1L, d0, "1-URGENT"), (2L, d0, "5-LOW"))
      .toDF("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Seq((1L, "A", late), (1L, "A", ok), (2L, "A", late))
      .toDF("l_orderkey", "l_returnflag", "l_shipdate")
    val got = Relational.priorityClassCensus(orders, li, lateDays = 365)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", 1L, 1L))) // on-time line dropped
  }

  test("supplierCountByPart: denylisted supplier never counted") {
    val li = Seq((1L, 100L), (1L, 200L), (1L, 100L))
      .toDF("l_partkey", "l_suppkey")
    val part = Seq((1L, "Brand#1", 5)).toDF("p_partkey", "p_brand", "p_size")
    val supp = Seq((100L, 10.0), (200L, -1.0)).toDF("s_suppkey", "s_acctbal")
    val got = Relational.supplierCountByPart(li, part, supp, Seq(5))
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("Brand#1", 5L, 1L))) // 200 excluded, dup pair collapsed
  }

  test("smallQuantityRevenue: strict half-average gate") {
    // part avg qty = 4: the qty-1 line (2 < 4) counts; qty-2 does
    // not (4 < 4 false); revenue is extendedprice only
    val li = Seq((1L, 1.0, 10.0), (1L, 2.0, 20.0), (1L, 9.0, 30.0))
      .toDF("l_partkey", "l_quantity", "l_extendedprice")
    val got = Relational.smallQuantityRevenue(li)
      .as[(Long, Long)].collect().head
    assert(got == ((1L, 1000L)))
  }

  test("brandBandRevenue: a line outside every band is dropped") {
    val li = Seq(
      (1L, 5.0, 10.0, 0.0),   // Brand#1 size 10, qty 5: band 1
      (2L, 5.0, 99.0, 0.0))   // Brand#9: no band
      .toDF("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = Seq((1L, "Brand#1", 10), (2L, "Brand#9", 10))
      .toDF("p_partkey", "p_brand", "p_size")
    val got = Relational.brandBandRevenue(li, part,
      Seq(("Brand#1", 1, 15, 1.0, 11.0)))
      .as[(Long, Long)].collect().head
    assert(got == ((1L, 1000L)))
  }

  test("decileLiftCurve: DESC ranking, shares and running cumulative") {
    // four customers with revenue 40/30/20/10 -> k=2 buckets:
    // bucket 1 {40,30} = 70% (700 permille), bucket 2 {20,10} = 30%
    val orders = Seq((1L, 40.0), (2L, 30.0), (3L, 20.0), (4L, 10.0))
      .toDF("o_custkey", "o_totalprice")
    val got = Relational.decileLiftCurve(orders, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 7000L, 700L, 700L),
      (2L, 2L, 3000L, 300L, 1000L)))
  }

  test("orderGapSurvival: census suffix-sums, cap bucket absorbs tail") {
    import java.sql.Timestamp
    // one customer, orders at month 0, ~1.5 months, ~4 months:
    // gaps of ~1.5mo (bucket 1) and ~2.5mo (bucket 2):
    // S(0)=2/2, S(1)=2/2, S(2)=1/2, S(3..)=0
    val orders = Seq(
      (1L, 10L, Timestamp.valueOf("1995-01-01 00:00:00")),
      (1L, 11L, Timestamp.valueOf("1995-02-15 00:00:00")),
      (1L, 12L, Timestamp.valueOf("1995-05-01 00:00:00")))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val got = Relational.orderGapSurvival(orders, maxMonths = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 1000L), (1L, 2L, 1000L),
      (2L, 1L, 500L), (3L, 0L, 0L)))
  }

  test("newVsReturningRevenue: first month is new, later months return") {
    import java.sql.Timestamp
    val orders = Seq(
      (1L, 10.0, Timestamp.valueOf("1995-01-05 00:00:00")),
      (1L, 20.0, Timestamp.valueOf("1995-01-20 00:00:00")), // same month: new
      (1L, 30.0, Timestamp.valueOf("1995-03-10 00:00:00")), // returning
      (2L, 40.0, Timestamp.valueOf("1995-03-15 00:00:00"))) // new in 03
      .toDF("o_custkey", "o_totalprice", "o_orderdate")
    val got = Relational.newVsReturningRevenue(orders)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val m0 = 1995L * 12 + 0
    assert(got == Seq((m0, 3000L, 0L, 0L),
      (m0 + 2, 4000L, 3000L, 428L)))
  }

  test("alsoBought: distinct baskets, cosine margins, tie on rec id") {
    // baskets: o1={1,2,3}, o2={1,2}, o3={2,3}; the duplicate (1,1) row
    // pins the DISTINCT (co-occurrence counts baskets, not line items)
    val li = Seq((1L, 1L), (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (3L, 2L), (3L, 3L))
      .toDF("l_orderkey", "l_partkey")
    val got = Relational.alsoBought(li, minSupport = 1L, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // margins n1=2 n2=3 n3=2; pairs (1,2)=2 (1,3)=1 (2,3)=2
    // cos(1,2) = 2/(√2·√3) → 816497; cos(1,3) = 1/2 → 500000
    assert(got == Seq(
      (1L, 2L, 2L, 816497L, 1L), (1L, 3L, 1L, 500000L, 2L),
      (2L, 1L, 2L, 816497L, 1L), (2L, 3L, 2L, 816497L, 2L), // tie → id
      (3L, 2L, 2L, 816497L, 1L), (3L, 1L, 1L, 500000L, 2L)))
  }

  test("customerOverlap: df-cap drops hot part, capped-set jaccard") {
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("o_orderkey", "o_custkey")
    // c1={1,2,9}, c2={1,2}, c3={2}: part 2 has df 3 > maxDf 2 → dropped;
    // capped sets c1={1,9} c2={1} c3=∅ → only pair (c1,c2) via part 1
    val li = Seq((1L, 1L), (1L, 2L), (1L, 9L), (2L, 1L), (2L, 2L),
      (3L, 2L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.customerOverlap(orders, li,
        minOverlap = 1L, maxDf = 2L, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // jaccard_q6 = 1·10⁶ div (2 + 1 − 1) = 500000
    assert(got == Seq((1L, 2L, 1L, 500000L)))
  }

  test("customerOverlapSampled: exact (w=1000) below maxPostings, " +
      "deterministic and downweighted above it") {
    // c1..c4 all bought parts {1,2,3}; c4 also bought 9
    val orders = (1L to 4L).map(c => (c, c)).toDF("o_orderkey", "o_custkey")
    val li = (1L to 4L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L))) ++
      Seq((4L, 9L))
    val liDf = li.toDF("l_orderkey", "l_partkey")
    // maxPostings 4 ≥ every df → NO sampling: est_pm must be exactly
    // 1000·n_common for every pair, all C(4,2)=6 pairs at 3 shared parts
    val exact = Relational.customerOverlapSampled(orders, liDf,
        maxPostings = 4L, minEstPermille = 1000L, k = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(exact.length == 6)
    assert(exact.forall { case (_, _, est, n) => est == n * 1000 })
    assert(exact.forall(_._3 == 3000L))
    // maxPostings 2 < df 4 → sampling engages: surviving co-occurrences
    // carry the (df/L)² = 4 weight (4000 pm per shared sampled part),
    // and the result is bit-stable run to run (md5, not RNG)
    val s1 = Relational.customerOverlapSampled(orders, liDf,
        maxPostings = 2L, minEstPermille = 1L, k = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val s2 = Relational.customerOverlapSampled(orders, liDf,
        maxPostings = 2L, minEstPermille = 1L, k = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(s1 == s2)
    assert(s1.forall { case (_, _, est, n) => est == n * 4000 })
  }

  test("customerOverlapSampleAudit: zero error when sampling is idle, " +
      "full pair coverage counted") {
    val orders = (1L to 4L).map(c => (c, c)).toDF("o_orderkey", "o_custkey")
    val liDf = (1L to 4L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L)))
      .toDF("l_orderkey", "l_partkey")
    // maxPostings ≥ df and a covering referee slice → est ≡ exact:
    // 6 pairs, all found, zero error mass
    val got = Relational.customerOverlapSampleAudit(orders, liDf,
        maxPostings = 10L, minOverlap = 3L, refereeCustomers = 100L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((6L, 6L, 0L, 0L)))
  }

  test("customerOverlapAuto: Σdf² routes exact under the budget, " +
      "sampled past it — both pinned") {
    // c1..c4 all bought parts {1,2,3}: df = 4 per part, Σdf² = 48
    val orders = (1L to 4L).map(c => (c, c)).toDF("o_orderkey", "o_custkey")
    val liDf = (1L to 4L).flatMap(o => Seq((o, 1L), (o, 2L), (o, 3L)))
      .toDF("l_orderkey", "l_partkey")
    // budget 48 ≥ Σdf² → EXACT path: maxPostings lifts to the census
    // max-df, every weight is 1000, est_pm ≡ 1000·n_common = 3000 for
    // all C(4,2) = 6 pairs; sum_df2 ships as the decimal string
    val exact = Relational.customerOverlapAuto(orders, liDf,
        maxPostings = 2L, minEstPermille = 1000L, k = 50,
        df2Budget = 48L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    assert(exact.length == 6)
    assert(exact.forall(r => r._1 == "1_exact" && r._2 == "48" &&
      r._5 == 3000L && r._6 == 3L))
    // budget 47 < Σdf² → SAMPLED path: identical to the estimator at
    // the same maxPostings (the q334 operator), row for row
    val sampled = Relational.customerOverlapAuto(orders, liDf,
        maxPostings = 2L, minEstPermille = 1L, k = 50, df2Budget = 47L)
      .as[(String, String, Long, Long, Long, Long)].collect().toSeq
    val want = Relational.customerOverlapSampled(orders, liDf,
        maxPostings = 2L, minEstPermille = 1L, k = 50)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(sampled.forall(r => r._1 == "2_sampled" && r._2 == "48"))
    assert(sampled.map(r => (r._3, r._4, r._5, r._6)) == want)
  }

  test("cfRecommend: summed path scores, owned parts anti-joined") {
    // triangle: c1={1,2} c2={2,3} c3={1,3}; every pair co-occurs once,
    // all margins 2 → every sim edge 500000
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L), (3L, 1L),
      (3L, 3L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.cfRecommend(orders, li, minSupport = 1L,
        simK = 5, topN = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // each customer's one unowned part is reached via BOTH owned parts:
    // score 2·500000, n_paths 2; owned candidates are anti-joined away
    assert(got == Seq((1L, 3L, 1000000L, 2L, 1L),
      (2L, 1L, 1000000L, 2L, 1L), (3L, 2L, 1000000L, 2L, 1L)))
  }

  test("topNWithOther: tail conserved, shares of the whole") {
    val d = Seq(("a", 50L), ("b", 30L), ("c", 15L), ("d", 4L), ("e", 1L))
      .toDF("g", "v")
    val got = Relational.topNWithOther(d, "g",
        org.apache.spark.sql.functions.col("v"), k = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    // top-2 a/b; OTHER = 15+4+1 = 20 → shares 500/300/200 permille
    assert(got == Seq(("a", 50L, 500L, 1L), ("b", 30L, 300L, 2L),
      ("OTHER", 20L, 200L, 3L)))
  }

  test("wilsonReturnRank: small-n flukes rank below supported rates") {
    // brand A: 1 line, 1 return (raw rate 1000‰ — the fluke);
    // brand B: 100 lines, 90 returns (raw 900‰, strongly supported).
    // Wilson LB(1,1) = 1/(1+z²) ≈ 0.20654 < LB(90,100) ≈ 0.826 →
    // B outranks A despite the lower raw rate.
    val li = (Seq((1L, "R")) ++
      (1 to 90).map(i => (2L, "R")) ++ (1 to 10).map(i => (2L, "N")))
      .toDF("l_partkey", "l_returnflag")
    val part = Seq((1L, "A"), (2L, "B")).toDF("p_partkey", "p_brand")
    val got = Relational.wilsonReturnRank(li, part)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._6)) == Seq(
      ("B", 100L, 90L, 900L, 1L), ("A", 1L, 1L, 1000L, 2L)))
    // closed form at (r=n=1): 1/(1+z²) → 206543 q6
    assert(got(1)._5 == 206543L)
    assert(got.head._5 > 800000L && got.head._5 < 860000L)
  }

  test("rankMovers: rank deltas, absent months never compare") {
    import java.sql.Timestamp
    // month 0: p1 $3 (#1), p2 $2 (#2), p3 $1 (#3)
    // month 1: p3 $5 (#1), p1 $4 (#2) — p2 absent → no row for p2;
    //   p3 climbed +2, p1 dropped −1
    val orders = Seq(
      (1L, Timestamp.valueOf("1995-01-10 00:00:00")),
      (2L, Timestamp.valueOf("1995-02-10 00:00:00")))
      .toDF("o_orderkey", "o_orderdate")
    val li = Seq(
      (1L, 1L, 3.0), (1L, 2L, 2.0), (1L, 3L, 1.0),
      (2L, 3L, 5.0), (2L, 1L, 4.0))
      .toDF("l_orderkey", "l_partkey", "l_extendedprice")
    val got = Relational.rankMovers(orders, li, k = 5)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val m1 = 1995L * 12 + 1
    assert(got == Seq((m1, 3L, 1L, 3L, 2L, 1L),
      (m1, 1L, 2L, 1L, -1L, 2L)))
  }

  test("customerOverlapQuantileCap: permille cut tracks the df census") {
    val orders = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L))
      .toDF("o_orderkey", "o_custkey")
    // parts by df: p9 df1, p1 df2, p2 df4 — census n=3; cap at 700‰
    // keeps rn·1000 ≤ 700·3 = 2100 → rn ∈ {1,2} → cap df = 2: the hot
    // part 2 (bought by everyone, zero signal) is cut, p1/p9 survive
    val li = Seq((1L, 1L), (1L, 2L), (1L, 9L), (2L, 1L), (2L, 2L),
      (3L, 2L), (4L, 2L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.customerOverlapQuantileCap(orders, li,
        minOverlap = 1L, capPermille = 700L, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // capped sets: c1={1,9}, c2={1}; pair (c1,c2) n_common 1 →
    // jaccard 10⁶ div (2+1−1) = 500000
    assert(got == Seq((1L, 2L, 1L, 500000L)))
    // at 1000‰ nothing is cut: everyone shares part 2
    val all = Relational.customerOverlapQuantileCap(orders, li,
        minOverlap = 1L, capPermille = 1000L, k = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(all.length == 6) // C(4,2) pairs all share the hot part
  }

  test("associationRules: integer confidence permille and lift q6") {
    // baskets: o1={1,2}, o2={1,2}, o3={1,3}, o4={3}: N=4 baskets;
    // margins n1=3 n2=2 n3=2; pairs ≥2: only (1,2)=2
    val li = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 1L),
      (3L, 3L), (4L, 3L)).toDF("l_orderkey", "l_partkey")
    val got = Relational.associationRules(li, minSupport = 2L, k = 5)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toSeq
    // 1→2: conf 2000/3 = 666‰, lift 2·4·10⁶/(3·2) = 1333333
    // 2→1: conf 2000/2 = 1000‰, same lift
    assert(got == Seq(
      (1L, 2L, 2L, 3L, 666L, 1333333L, 1L),
      (2L, 1L, 2L, 2L, 1000L, 1333333L, 1L)))
  }

  test("embeddingProfileRecommend: integer profile, mod map, owned cut") {
    val orders = Seq((1L, 1L), (2L, 2L)).toDF("o_orderkey", "o_custkey")
    // c1 bought p0 (→vec 0 = [1,0]); c2 bought p2,p5 (both →vec 2 = [.6,.8])
    val li = Seq((1L, 0L), (2L, 2L), (2L, 5L))
      .toDF("l_orderkey", "l_partkey")
    val part = (0L to 5L).toDF("p_partkey")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 1.0f)),
      (2L, Array(0.6f, 0.8f))).toDF("vec_id", "embedding")
    val got = Relational.embeddingProfileRecommend(orders, li, part, emb,
        maxQueryCust = 100L, topN = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // c1 profile [10⁶, 0]: p3 (vec 0) cos 1; p2/p5 (vec 2) cos .6 — tie
    // broken on rec id; p1/p4 orthogonal (cos 0) lose.
    // c2 profile [1.2·10⁶, 1.6·10⁶] (‖·‖ = 2·10⁶ exactly): p1/p4 (vec 1)
    // cos .8; p0/p3 (vec 0) cos .6 — owned p2/p5 are anti-joined away.
    assert(got == Seq(
      (1L, 3L, 1000000L, 1L), (1L, 2L, 600000L, 2L), (1L, 5L, 600000L, 3L),
      (2L, 1L, 800000L, 1L), (2L, 4L, 800000L, 2L), (2L, 0L, 600000L, 3L)))
  }

  test("spearmanOrderSpend: perfect monotone -> 1e6; tie case -> 0") {
    import spark.implicits._
    // nation 0: (n_ord, cents) strictly co-monotone -> rho = 1.
    // nation 1: c4/c5 tie on n_ord (average ranks), arranged so the
    // rank covariance cancels exactly -> rho = 0.
    val orders = Seq(
      (1L, 1.00), (1L, 2.00), (2L, 1.00),
      (3L, 2.00), (3L, 2.00), (3L, 1.00),
      (4L, 2.00), (5L, 1.00), (6L, 1.00), (6L, 0.50))
      .toDF("o_custkey", "o_totalprice")
    val customer = Seq((1L, 0L), (2L, 0L), (3L, 0L),
      (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("c_custkey", "c_nationkey")
    val got = Relational.spearmanOrderSpend(orders, customer)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 1000000L), (1L, 3L, 0L)))
  }

  test("targetEncodeLoo: exact rational, own target excluded, " +
      "singleton gets NULL") {
    val orders = Seq(
      (1L, 10L, 1.00), (2L, 11L, 2.00), (3L, 12L, 3.00), // nation 0
      (4L, 13L, 1.50)                                    // nation 1
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((10L, 0L), (11L, 0L), (12L, 0L), (13L, 1L))
      .toDF("c_custkey", "c_nationkey")
    val got = Relational.targetEncodeLoo(orders, customer)
      .as[(Long, Long, Option[String], Long)].collect().toSeq
    // nation-0 cents sum = 600: each row's num is the OTHERS' sum
    assert(got == Seq(
      (1L, 0L, Some("500"), 2L),
      (2L, 0L, Some("400"), 2L),
      (3L, 0L, Some("300"), 2L),
      (4L, 1L, None, 0L)))
  }

  test("anovaOrderValue: hand F, and zero within-variance → NULL") {
    val customer = Seq((10L, 0L), (11L, 0L), (12L, 1L), (13L, 1L))
      .toDF("c_custkey", "c_nationkey")
    def o(rows: (Long, Long, Double)*) = rows
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    // {10,20} vs {30,40}: ssb = 400, ssw = 100, F = (400/1)/(100/2) = 8
    val got = Relational.anovaOrderValue(
        o((1L, 10L, 10.0), (2L, 11L, 20.0), (3L, 12L, 30.0),
          (4L, 13L, 40.0)), customer)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(got == ((2L, 4L, 400L, 100L, Some(8000000L))))
    // constant within groups: ssw = 0 → F undefined (NULL), not error
    val const = Relational.anovaOrderValue(
        o((1L, 10L, 10.0), (2L, 11L, 10.0), (3L, 12L, 30.0),
          (4L, 13L, 30.0)), customer)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(const == ((2L, 4L, 400L, 0L, None)))
  }

  test("topNamesConcat: rank order in the string, name tiebreak, k cap") {
    val customer = Seq(
      (1L, "Bob", 0L, 3.00), (2L, "Amy", 0L, 3.00),
      (3L, "Cal", 0L, 2.00), (4L, "Dan", 0L, 1.00),
      (5L, "Eve", 1L, 0.50))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    val got = Relational.topNamesConcat(customer, k = 3)
      .as[(Long, String)].collect().toSeq
    // 3.00 tie: Amy before Bob (name asc); Dan cut by k = 3
    assert(got == Seq((0L, "Amy,Bob,Cal"), (1L, "Eve")))
  }

  test("variantExtractCensus: typed-path extraction is lossless vs the " +
      "raw columns, incl. null value, array paths, and a round-trip " +
      "double") {
    val events = Seq(
      (7L, 16L, "view", Some(1.25)),
      (9L, 23L, "view", None), // null value → coalesced 0 in the payload
      // a double whose decimal rendering exercises shortest-round-trip
      (11L, 30L, "purchase", Some(0.1)))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Relational.variantExtractCensus(events)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // ts 16: s0=16%7=2, s1=16%11=5; ts 23: s0=2, s1=1; ts 30: s0=2, s1=8
    assert(got == Seq(
      ("purchase", 1L, 11L, 10L, 2L, 8L),
      ("view", 2L, 16L, 125L, 4L, 6L)), got.toString)
  }
}
