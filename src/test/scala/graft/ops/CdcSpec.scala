package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the CDC contracts: latest-wins ordering, tombstone deletion, and
  * the added/removed/changed/same classification (null-safe).
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def log(rows: (Long, Long, Long, String)*) =
    rows.toDF("key", "ts", "off", "op")

  private def compact(df: org.apache.spark.sql.DataFrame) =
    Cdc.compactChangelog(df, col("key"), col("ts"), col("off"),
      tombstone = col("op") === "D")

  test("compactChangelog keeps only the latest change per key") {
    val c = compact(log((1L, 10L, 0L, "U"), (1L, 20L, 1L, "U"),
      (2L, 5L, 2L, "U")))
    val got = c.select("key", "ts").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 20L), (2L, 5L)))
  }

  test("compactChangelog breaks ts ties by the tiebreak column") {
    val c = compact(log((1L, 10L, 0L, "U"), (1L, 10L, 1L, "D")))
    assert(c.count() == 0) // offset 1 wins and is a tombstone
    val c2 = compact(log((1L, 10L, 1L, "D"), (1L, 10L, 2L, "U")))
    assert(c2.select("off").as[Long].collect().toSeq == Seq(2L))
  }

  test("compactChangelog: a tombstone followed by a re-insert survives") {
    val c = compact(log((1L, 10L, 0L, "U"), (1L, 20L, 1L, "D"),
      (1L, 30L, 2L, "U")))
    assert(c.select("off").as[Long].collect().toSeq == Seq(2L))
  }

  test("snapshotAsOf replays only changes at or before the cutoff") {
    val c = log((1L, 10L, 0L, "U"), (1L, 20L, 1L, "U"), (1L, 30L, 2L, "D"),
      (2L, 25L, 3L, "U"))
    def asOf(t: Long) = Cdc.snapshotAsOf(c.toDF(), col("key"), col("ts"),
        col("off"), col("op") === "D", lit(t))
      .select("key", "off").as[(Long, Long)].collect().toSet
    assert(asOf(15L) == Set((1L, 0L)))           // key 2 not yet born
    assert(asOf(25L) == Set((1L, 1L), (2L, 3L))) // pre-delete state
    assert(asOf(40L) == Set((2L, 3L)))           // delete replayed
  }

  test("snapshotDiff classifies added/removed/changed and drops same") {
    val before = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
    val after = Seq((2L, 20L), (3L, 31L), (4L, 40L)).toDF("k", "v")
    val got = Cdc.snapshotDiff(before, after, "k", Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
  }

  test("snapshotDiff null-vs-value is changed, null-vs-null is same") {
    val before = Seq((1L, Some(10L)), (2L, None), (3L, None))
      .toDF("k", "v")
    val after = Seq((1L, None), (2L, None), (3L, Some(3L)))
      .toDF("k", "v")
    val got = Cdc.snapshotDiff(before, after, "k", Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 3L -> "changed")) // 2: same, dropped
  }

  test("scd2Build: tiling validity intervals, version ordinals, current flag") {
    val got = Cdc.scd2Build(
        log((1L, 10L, 0L, "U"), (1L, 20L, 1L, "U"), (1L, 30L, 2L, "U"),
          (2L, 5L, 3L, "U")),
        key = col("key"), ts = col("ts"), tiebreak = col("off"))
      .select("key", "version", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Long, Option[Long], Int)].collect().toSeq.sorted
    assert(got == Seq(
      (1L, 1L, 10L, Some(20L), 0), (1L, 2L, 20L, Some(30L), 0),
      (1L, 3L, 30L, None, 1), (2L, 1L, 5L, None, 1)))
  }

  test("scd2Build breaks ts ties by the tiebreak column") {
    val got = Cdc.scd2Build(log((1L, 10L, 1L, "U"), (1L, 10L, 0L, "U")),
        key = col("key"), ts = col("ts"), tiebreak = col("off"))
      .select("off", "version", "is_current")
      .as[(Long, Long, Int)].collect().toSeq.sorted
    // off=0 sorts first: version 1, superseded; off=1 is current
    assert(got == Seq((0L, 1L, 0), (1L, 2L, 1)))
  }

  test("forgetCascadeCensus: cascade counts follow the key chains") {
    import spark.implicits._
    // permille=1000 forgets EVERYONE → counts are just table sizes
    // along the chains; permille=0 forgets nobody → all zeros
    val cust = Seq(1L, 2L).toDF("c_custkey")
    val ord = Seq((10L, 1L), (11L, 1L), (12L, 9L)) // 12: foreign cust
      .toDF("o_orderkey", "o_custkey")
    val li = Seq((10L, 1), (10L, 2), (11L, 1), (12L, 1), (99L, 1))
      .toDF("l_orderkey", "l_linenumber")
    val ev = Seq((1L, 1L), (2L, 2L), (7L, 3L))
      .toDF("user_id", "event_id")
    val all = Cdc.forgetCascadeCensus(cust, ord, li, ev, permille = 1000L)
      .as[(Long, Long, Long, Long)].collect().head
    // custs {1,2}: orders 10,11 (12's cust 9 not in customer table);
    // lineitems of 10,11 = 3; events of users 1,2 = 2
    assert(all == ((2L, 2L, 3L, 2L)))
    val none = Cdc.forgetCascadeCensus(cust, ord, li, ev, permille = 0L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(none == ((0L, 0L, 0L, 0L)))
  }
}
