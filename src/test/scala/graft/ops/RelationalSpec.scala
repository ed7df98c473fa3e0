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
}
