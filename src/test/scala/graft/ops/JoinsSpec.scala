package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions.{greatest, least}

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

  // ---- as-of join ----

  private def side(rows: (Long, Long, Long)*) =
    rows.toDF("id", "user_id", "ts")

  test("asOfJoin picks the latest right row at-or-before, per key") {
    val l = side((100L, 1L, 50L), (101L, 1L, 10L), (102L, 2L, 50L))
    val r = side((200L, 1L, 20L), (201L, 1L, 40L), (202L, 1L, 60L),
                 (203L, 2L, 50L))
    val got = Joins.asOfJoin(l, r, "user_id", "ts")
      .selectExpr("id", "asof.id").as[(Long, Long)].collect().toSet
    // left 100 (ts 50) → right 201 (ts 40, latest ≤ 50); left 101 (ts 10)
    // has no prior right → dropped (inner); left 102 matches equal-ts 203
    assert(got == Set((100L, 201L), (102L, 203L)))
  }

  test("asOfJoin strict excludes the equal-timestamp right row") {
    val l = side((100L, 1L, 50L))
    val r = side((200L, 1L, 50L), (201L, 1L, 30L))
    val inclusive = Joins.asOfJoin(l, r, "user_id", "ts")
      .selectExpr("asof.id").as[Long].collect().toSeq
    val strict = Joins.asOfJoin(l, r, "user_id", "ts", strict = true)
      .selectExpr("asof.id").as[Long].collect().toSeq
    assert(inclusive == Seq(200L))
    assert(strict == Seq(201L))
  }

  test("asOfJoin left keeps unmatched rows with null asof") {
    val l = side((100L, 1L, 10L), (101L, 1L, 50L))
    val r = side((200L, 1L, 20L))
    val got = Joins.asOfJoin(l, r, "user_id", "ts", joinType = "left")
      .selectExpr("id", "asof.id as rid").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) -1L else row.getLong(1)))
      .toSet
    assert(got == Set((100L, -1L), (101L, 200L)))
    assert(Joins.asOfJoin(l, r, "user_id", "ts").count() == 1)
  }

  // ---- binned range join ----

  test("rangeJoinBinned equals the naive inequality join") {
    val rnd = new scala.util.Random(7)
    val pts = (0 until 300).map(i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("pid", "user_id", "ts")
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextInt(1000).toLong
      (i.toLong, rnd.nextInt(5).toLong, s, s + 1 + rnd.nextInt(99))
    }.toDF("iid", "user_id", "w_start", "w_end")
    val binned = Joins.rangeJoinBinned(pts, ivs, "user_id", "ts",
        "w_start", "w_end", binWidth = 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val naive = pts.as("p").join(ivs.as("i"),
        $"p.user_id" === $"i.user_id" &&
        $"p.ts" >= $"i.w_start" && $"p.ts" < $"i.w_end")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(binned == naive)
    assert(naive.nonEmpty) // the fixture actually exercises matches
  }

  test("rangeJoinBinned end bound is exclusive across a bin boundary") {
    val pts = Seq((1L, 1L, 200L), (2L, 1L, 199L)).toDF("pid", "user_id", "ts")
    val ivs = Seq((10L, 1L, 100L, 200L)).toDF("iid", "user_id", "w_start", "w_end")
    val got = Joins.rangeJoinBinned(pts, ivs, "user_id", "ts",
        "w_start", "w_end", binWidth = 100L)
      .select("pid").as[Long].collect().toSeq
    assert(got == Seq(2L)) // ts 200 == w_end: excluded
  }

  test("rangeJoinBinned fails fast on an interval wider than the cap") {
    val pts = Seq((1L, 1L, 150L)).toDF("pid", "user_id", "ts")
    val ivs = Seq((10L, 1L, 100L, 400L)).toDF("iid", "user_id", "w_start", "w_end")
    val ex = intercept[Exception] {
      Joins.rangeJoinBinned(pts, ivs, "user_id", "ts", "w_start", "w_end",
        binWidth = 100L, maxIntervalWidth = 200L).count()
    }
    assert(ex.getMessage.contains("rangeJoinBinned") ||
      Option(ex.getCause).exists(_.getMessage.contains("rangeJoinBinned")))
  }

  test("asOfJoin equals the naive argmax join on random data") {
    val rnd = new scala.util.Random(11)
    val l = (0 until 200).map(i =>
      (i.toLong, rnd.nextInt(8).toLong, rnd.nextInt(500).toLong))
      .toDF("id", "user_id", "ts")
    // distinct (key, ts) on the right: the as-of determinism precondition
    val r = rnd.shuffle((0 until 8).flatMap(u =>
        rnd.shuffle((0 until 500).toList).take(60).map(t => (u, t))))
      .zipWithIndex
      .map { case ((u, t), i) => (1000L + i, u.toLong, t.toLong) }
      .toDF("id", "user_id", "ts")
    val got = Joins.asOfJoin(l, r, "user_id", "ts")
      .selectExpr("id", "asof.id").as[(Long, Long)].collect().toSet
    val naive = l.as("l").join(r.as("r"),
        $"l.user_id" === $"r.user_id" && $"r.ts" <= $"l.ts")
      .groupBy($"l.id")
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct($"r.ts", $"r.id")).as("m"))
      .selectExpr("id", "m.id").as[(Long, Long)].collect().toSet
    assert(got == naive)
    assert(naive.size > 100) // the fixture exercises real matches
  }

  test("prunedSemiJoin equals the plain semi join despite collisions") {
    val rnd = new scala.util.Random(7)
    val fact = (0 until 500).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("row_id", "k")
    val dim = Seq(3L, 17L, 42L, 99L).toDF("dk")
    // buckets=2: every dim bucket collides with ~half the fact keys, so
    // the exact stage must do real work for the results to match
    val got = Joins.prunedSemiJoin(fact, dim, "k", "dk", buckets = 2)
      .select("row_id").as[Long].collect().toSet
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == plain)
    assert(plain.nonEmpty && plain.size < 500)
  }

  test("prunedSemiJoin: mixed key types and same-named keys still exact") {
    // int fact key vs long dim key: the digest hashes the STRING form,
    // so the implicit-cast matches of the exact join survive prefilter
    val fact = (0 until 50).map(i => (i.toLong, i % 10)).toDF("row_id", "k")
    val dim = Seq(3L, 7L).toDF("dk")
    val got = Joins.prunedSemiJoin(fact, dim, "k", "dk", buckets = 8)
      .select("row_id").as[Long].collect().toSet
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == plain && plain.size == 10)
    // factKey == dimKey by name: must resolve, not throw
    val dimSame = Seq(3L).toDF("k")
    val same = Joins.prunedSemiJoin(fact, dimSame, "k", "k", buckets = 8)
      .select("row_id").as[Long].collect().toSet
    assert(same == fact.filter($"k" === 3).select("row_id")
      .as[Long].collect().toSet)
  }

  test("intervalOverlapJoin: equals the theta join, one row per pair") {
    // widths 1..30 over a 0..100 span, bins of 10: many pairs share
    // several bins — the responsibility-bin emit must still yield each
    // exactly once, and exactly the brute-force overlap set
    val iv = (0 until 40).map { i =>
      val s = (i * 37) % 100; (i.toLong, s.toLong, (s + 1 + i % 30).toLong)
    }.toDF("id", "s", "e")
    val got = Joins.intervalOverlapJoin(iv, iv, "id", "id", "s", "e",
        binWidth = 10L)
      .filter($"id_a" < $"id_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val brute = iv.as("a").join(iv.as("b"),
        $"a.id" < $"b.id" && $"a.s" < $"b.e" && $"b.s" < $"a.e")
      .select($"a.id", $"b.id",
        greatest($"a.s", $"b.s"), least($"a.e", $"b.e"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size) // no double emission
    assert(got.toSet == brute.toSet)
    assert(got.nonEmpty)
  }

  test("intervalOverlapJoin: half-open — touching intervals don't pair") {
    val iv = Seq((1L, 0L, 10L), (2L, 10L, 20L), (3L, 9L, 11L))
      .toDF("id", "s", "e")
    val got = Joins.intervalOverlapJoin(iv, iv, "id", "id", "s", "e",
        binWidth = 10L)
      .filter($"id_a" < $"id_b")
      .as[(Long, Long, Long, Long)].collect().toSet
    // 1–2 touch at 10: no overlap; 3 overlaps both
    assert(got == Set((1L, 3L, 9L, 10L), (2L, 3L, 10L, 11L)))
  }

  test("intervalOverlapJoin: maxIntervalWidth fails fast") {
    val iv = Seq((1L, 0L, 1000L), (2L, 0L, 5L)).toDF("id", "s", "e")
    val ex = intercept[Exception] {
      Joins.intervalOverlapJoin(iv, iv, "id", "id", "s", "e",
        binWidth = 10L, maxIntervalWidth = 100L).collect()
    }
    assert(ex.getMessage != null)
  }

  test("prunedSemiJoin broadcasts the digest ahead of the exact join") {
    val fact = (0 until 100).map(i => (i.toLong, i.toLong % 10)).toDF("row_id", "k")
    val dim = Seq(1L, 2L).toDF("dk")
    val plan = Joins.prunedSemiJoin(fact, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"))
  }

  test("bloomPrunedSemiJoin equals the plain semi join, even with a " +
      "deliberately undersized sketch forcing false positives") {
    val rnd = new scala.util.Random(11)
    val fact = (0 until 500).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("row_id", "k")
    val dim = Seq(3L, 17L, 42L, 99L).toDF("dk")
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("row_id").as[Long].collect().toSet
    // estItems=1 undersizes the sketch so the probe passes spurious
    // keys — the exact stage must remove every one of them
    for (est <- Seq(1L, 1L << 20)) {
      val got = Joins.bloomPrunedSemiJoin(fact, dim, "k", "dk", est)
        .select("row_id").as[Long].collect().toSet
      assert(got == plain, s"estItems=$est")
    }
    assert(plain.nonEmpty && plain.size < 500)
    // empty dim: no matches, and no NPE from a null sketch
    val none = Joins.bloomPrunedSemiJoin(fact, dim.filter($"dk" < 0),
      "k", "dk").count()
    assert(none == 0)
  }

  test("bloomPrunedSemiJoin: mixed key types exact; probe is a scan " +
      "filter, not a second join") {
    // int fact key vs long dim key: both sides hash the STRING form
    val fact = (0 until 50).map(i => (i.toLong, i % 10)).toDF("row_id", "k")
    val dim = Seq(3L, 7L).toDF("dk")
    val got = Joins.bloomPrunedSemiJoin(fact, dim, "k", "dk")
      .select("row_id").as[Long].collect().toSet
    val plain = fact.join(dim, $"k" === $"dk", "left_semi")
      .select("row_id").as[Long].collect().toSet
    assert(got == plain && plain.size == 10)
    // plan law: exactly ONE join operator — the bloom probe is a
    // might_contain Filter on the fact side, not a broadcast join.
    // Range-based fact, not a local Seq: ConvertToLocalRelation would
    // evaluate a Filter over LocalRelation away at optimization time
    // and the assertion would read a plan with no filter to find.
    val factR = spark.range(0, 50)
      .select($"id".as("row_id"), ($"id" % 10).as("k"))
    val plan = Joins.bloomPrunedSemiJoin(factR, dim, "k", "dk")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), plan.take(1200))
    val joins = "(?i)(broadcasthashjoin|sortmergejoin|shuffledhashjoin)"
      .r.findAllIn(plan).length
    assert(joins == 1, s"$joins join operators:\n${plan.take(1200)}")
  }

  test("fuzzyMatch: length blocking is lossless, incl. position-0 edits") {
    val left = Seq("kat", "dog", "zebra", "dogs").toDF("k")
    val right = Seq("cat", "dog", "cog", "horse").toDF("s")
    val got = Joins.fuzzyMatch(left, right, "k", "s", maxDist = 1)
      .as[(String, String, Int)].collect().toSeq
    // kat→cat is a FIRST-letter substitution (a prefix block would lose
    // it); dogs→dog crosses a length boundary (deletion); dog matches
    // itself at 0 and cog at 1; zebra matches nothing
    assert(got == Seq(("dog", "cog", 1), ("dog", "dog", 0),
      ("dogs", "dog", 1), ("kat", "cat", 1)))
    // maxDist 0 degenerates to exact distinct match
    assert(Joins.fuzzyMatch(left, right, "k", "s", maxDist = 0)
      .as[(String, String, Int)].collect().toSeq == Seq(("dog", "dog", 0)))
  }
}
