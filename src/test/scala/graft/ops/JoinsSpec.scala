package graft.ops

import graft.SparkSpec

/** Pins the J2 theta-join conjuncts: strict `<` ordering (PLAIN.java's
  * ArrTime < DepTime) and the bounded window, plus semi/anti semantics.
  */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private val hourNs = 3600L * 1000000000L

  private def ev(rows: (Long, Long, String, Double)*) =
    rows.toDF("user_id", "ts", "event_type", "value")

  test("J2: two-leg join requires strictly increasing ts") {
    val e = ev((1L, 100L, "view", 1.0), (1L, 100L, "purchase", 2.0))
    assert(Joins.twoLegPairs(e).count() == 0) // equal ts: excluded
    val e2 = ev((1L, 100L, "view", 1.0), (1L, 101L, "purchase", 2.0))
    assert(Joins.twoLegPairs(e2).count() == 1)
  }

  test("J2: window bound excludes pairs beyond 24h") {
    val e = ev((1L, 0L, "view", 1.0), (1L, 25 * hourNs, "purchase", 2.0),
               (2L, 0L, "view", 1.0), (2L, 23 * hourNs, "purchase", 2.0))
    val pairs = Joins.twoLegPairs(e).select("user_id").as[Long].collect()
    assert(pairs.toSeq == Seq(2L))
  }

  test("J2: join is keyed per user") {
    val e = ev((1L, 100L, "view", 1.0), (2L, 200L, "purchase", 2.0))
    assert(Joins.twoLegPairs(e).count() == 0)
  }

  test("semi/anti partition customers exactly") {
    val c = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val o = Seq((10L, 1L), (11L, 1L), (12L, 3L)).toDF("o_orderkey", "o_custkey")
    val withO = Joins.customersWithOrders(c, o).select("c_custkey").as[Long].collect()
    val without = Joins.customersWithoutOrders(c, o).select("c_custkey").as[Long].collect()
    assert(withO.toSeq == Seq(1L, 3L))  // semi: no duplicate for cust 1
    assert(without.toSeq == Seq(2L))
    assert(withO.length + without.length == 3)
  }
}
