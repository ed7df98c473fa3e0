package graft.ops

import graft.SparkSpec

/** Pins funnel step ordering (strictly-after semantics) and the cohort
  * retention table's exact cells.
  */
class BehaviorSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.map { case (u, t, ty) => (u, t, ty, 1.0) }
      .toDF("user_id", "ts", "event_type", "value")

  test("funnel: steps must occur strictly after the previous step") {
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"), // full
      (2L, 10L, "view"), (2L, 10L, "click"),  // click NOT after view
      (3L, 10L, "view"), (3L, 20L, "click"),  // no purchase
      (4L, 20L, "click"), (4L, 30L, "purchase"), // no view: not in funnel
      (5L, 50L, "purchase"), (5L, 60L, "view"), (5L, 70L, "click"))
      // user 5's purchase precedes view→click: steps 1-2 only
    val got = Behavior.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((4L, 3L, 1L))) // views: 1,2,3,5; clicks after: 1,3,5
  }

  test("funnel uses the EARLIEST qualifying event per step") {
    // user's first view at 10; click at 5 (before) must not count, the
    // one at 15 does; purchase must then be after 15
    val e = ev((1L, 10L, "view"), (1L, 5L, "click"), (1L, 15L, "click"),
      (1L, 12L, "purchase"))
    val got = Behavior.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 0L))) // purchase at 12 ≤ t1=15: dropped
  }

  test("rollingPeriodCounts: gaps shorten the RANGE frame") {
    // periods 0,1,4 with period=10ms, trailing=3: period 4's frame is
    // [2,4] → only itself; a rows-frame would wrongly include 0 and 1
    val ts = Seq(0L, 5L, 12L, 41L, 43L).map(ms =>
      new java.sql.Timestamp(ms))
    val df = ts.toDF("t")
    val got = Behavior.rollingPeriodCounts(df, "t", periodMs = 10L,
        trailing = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L), (1L, 1L, 3L), (4L, 2L, 2L)))
  }

  test("intervalConcurrency: merged boundaries, no phantom overlap") {
    // [0,10) [5,15) overlap; [10,20) starts exactly where the first
    // ends — same-instant merge means t=10 nets -1+1 = 0 (no phantom)
    val iv = Seq((0L, 10L), (5L, 15L), (10L, 20L)).toDF("s", "e")
    val got = Behavior.intervalConcurrency(iv, "s", "e")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L), (5L, 1L, 2L), (10L, 0L, 2L),
      (15L, -1L, 1L), (20L, -1L, 0L)))
    assert(got.last._3 == 0L) // every interval closes
  }

  test("transitionCensus: per-user adjacency, deterministic tiebreak") {
    val df = Seq(
      (1L, 10L, 100L, "view"), (1L, 20L, 101L, "click"),
      (1L, 30L, 102L, "view"),
      (2L, 10L, 103L, "view"), (2L, 10L, 104L, "click"), // same ts: by id
      (3L, 5L, 105L, "purchase")) // single event: no transition
      .map { case (u, t, id, ty) => (u, t, id, ty, 1.0) }
      .toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.transitionCensus(df)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("click", "view", 1L), ("view", "click", 2L)))
  }

  test("conversionLatency: rank percentiles over converting users only") {
    val df = Seq(
      (1L, 0L, "view"), (1L, 100L, "purchase"),   // lat 100
      (2L, 0L, "view"), (2L, 200L, "purchase"),   // lat 200
      (3L, 0L, "view"), (3L, 300L, "purchase"),   // lat 300
      (4L, 50L, "view"),                          // never converts
      (5L, 80L, "purchase"))                      // purchase w/o view
      .map { case (u, t, ty) => (u, t, ty, 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.conversionLatency(df, "view", "purchase")
      .as[(Long, Long, Long)].collect().head
    // n=3: p50 rank ceil(1.5)=2 → 200; p90 rank ceil(2.7)=3 → 300
    assert(got == ((3L, 200L, 300L)))
    // a purchase BEFORE the first view is not a conversion
    val rev = Seq((1L, 100L, "purchase"), (1L, 200L, "view"))
      .map { case (u, t, ty) => (u, t, ty, 1.0) }
      .toDF("user_id", "ts", "event_type", "value")
    assert(Behavior.conversionLatency(rev, "view", "purchase")
      .as[(Long, Option[Long], Option[Long])].collect().head ==
      ((0L, None, None)))
  }

  test("sessionStats: gaps split sessions at >= gap, exact counts") {
    val G = 100L
    val df = Seq(
      (1L, 0L, 0L), (1L, 50L, 1L), (1L, 149L, 2L),  // one session (gaps<100)
      (1L, 249L, 3L),                               // gap 100: new session
      (2L, 0L, 4L))
      .toDF("user_id", "ts", "event_id")
    val got = Behavior.sessionStats(df, gapNs = G)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 4L, 3L), (2L, 1L, 1L, 1L)))
  }

  test("sessionStats quantization: sub-quantum gaps cannot split") {
    // raw gap 1999 ns >= gap 1000 would split un-quantized; with
    // quantum 1000 both events land on qts 0 and 1 → diff 1 < qgap 2?
    // gap 2000/quantum 1000 → qgap 2: diff 1 < 2 → same session
    val df = Seq((1L, 0L, 0L), (1L, 1999L, 1L))
      .toDF("user_id", "ts", "event_id")
    val q = Behavior.sessionStats(df, gapNs = 2000L, quantumNs = 1000L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(q == ((1L, 1L, 2L, 2L)))
    intercept[IllegalArgumentException] {
      Behavior.sessionStats(df, gapNs = 1500L, quantumNs = 1000L)
    }
  }

  test("cohortRetention: exact cells, offset capped") {
    val wk = 7L * 86400L * 1000000000L
    val e = ev(
      (1L, 0L, "view"), (1L, wk + 1, "view"), (1L, 5 * wk, "view"),
      (2L, 10L, "view"), (2L, 2 * wk, "view"),
      (3L, wk, "view"), (3L, wk * 2 + 5, "view"))
    val got = Behavior.cohortRetention(e, maxOffset = 3)
      .as[(Long, Int, Long)].collect().toSeq
    // cohort 0: users 1,2 → offset 0: 2; offset 1: {1}; offset 2: {2};
    // user 1's 5wk event exceeds maxOffset. cohort 1: user 3 → 0 and 1.
    assert(got == Seq((0L, 0, 2L), (0L, 1, 1L), (0L, 2, 1L),
      (1L, 0, 1L), (1L, 1, 1L)))
  }

  test("sessionStats ≡ session_window: both are gaps-and-islands") {
    import org.apache.spark.sql.functions.{count, lit, max, sum}
    // q31 (streaming session_window) and q113 (batch window sessionize)
    // are the same gaps-and-islands computation with OPPOSITE boundary
    // conventions: session_window merges at gap ≤ G (inclusive — an
    // event exactly G after its predecessor still merges), sessionStats
    // splits at gap ≥ its gapNs. The exact mapping, pinned here:
    //   session_window(G)  ≡  sessionStats(G + 1 quantum)
    // Fixture covers the exact-G boundary (merges in both), a G+1ms gap
    // (splits in both), sub-gap merges, same-µs ties, and a singleton.
    val M = 60L * 1000000000L // one minute in ns
    val G = 30 * M
    val df = Seq(
      (1L, 0L, 1L), (1L, 29 * M, 2L),         // 29 < 30: merge
      (1L, 59 * M, 3L), (1L, 60 * M, 4L),     // gap EXACTLY G: merges too
      (2L, 5 * M, 5L),                        // singleton
      (3L, 0L, 6L), (3L, 0L, 7L),             // same-instant tie
      (3L, 10 * M, 8L), (3L, 100 * M, 9L),    // 90 > 30: split
      (4L, 0L, 10L), (4L, G + 1000000L, 11L)) // 1 ms past G: split
      .toDF("user_id", "ts", "event_id")
      .withColumn("value", lit(1.0))
    val fromWin = graft.streaming.EventStreams
      .userSessions(df, gap = "30 minutes")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"),
        max("n_events").as("max_session_events"))
      .orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    val fromBatch = Behavior.sessionStats(df, gapNs = G + 1000L,
        quantumNs = 1000L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // equal to each other AND to the hand-computed truth (a shared bug
    // could not pass the literal expectation)
    val expect = Seq((1L, 1L, 4L, 4L), (2L, 1L, 1L, 1L),
      (3L, 2L, 4L, 3L), (4L, 2L, 2L, 1L))
    assert(fromWin == expect)
    assert(fromBatch == expect)
  }

  test("rollingActiveUsers: sliding distinct never sums daily partials") {
    val D = 86400L * 1000000000L
    // user 1 active days 0,1,8; user 2 day 0 (twice); user 3 day 8
    val df = Seq(
      (1L, 0L), (1L, D + 5L), (1L, 8 * D), (2L, 0L), (2L, 100L),
      (3L, 8 * D + 7L))
      .zipWithIndex.map { case ((u, t), i) =>
        (u, t, i.toLong, "view", 1.0)
      }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.rollingActiveUsers(df, windowDays = 7)
      .as[(Long, Long, Long)].collect().toSeq
    // day 0: dau 2 (u1,u2), wau(−6..0] = 2; day 1: dau 1, wau covers
    // days −5..1 → {u1,u2} = 2 — NOT dau-sum 3: u1 counted once;
    // day 8: dau 2 (u1,u3), window 2..8 → 2
    assert(got == Seq((0L, 2L, 2L), (1L, 1L, 2L), (8L, 2L, 2L)))
  }

  test("rollingActivesStickiness: same spine, DAU/WAU permille dial") {
    val D = 86400L * 1000000000L
    val df = Seq(
      (1L, 0L), (1L, D + 5L), (1L, 8 * D), (2L, 0L), (2L, 100L),
      (3L, 8 * D + 7L))
      .zipWithIndex.map { case ((u, t), i) =>
        (u, t, i.toLong, "view", 1.0)
      }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.rollingActivesStickiness(df, windowDays = 7)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // day 0: dau 2, active_wd {u1,u2} = 2 → 1000‰; day 1: dau 1,
    // active_wd still {u1,u2} → 500‰; day 8: dau 2 (u1,u3), the
    // 2..8 window holds exactly those two → 1000‰
    assert(got == Seq((0L, 2L, 2L, 1000L), (1L, 1L, 2L, 500L),
      (8L, 2L, 2L, 1000L)))
  }

  test("decayedPeriodSums: integer cents, dyadic decay, gaps skipped") {
    // periods (width 10 ms): p0 = 100+200 = 300¢, p1 = 300¢, p4 = 200¢;
    // window 3 → p1 decayed = 300 + 300/2 = 450.0 exactly; p4's trailing
    // frame (1,4] is all gaps → just itself
    val df = Seq((0L, 100L), (5L, 200L), (12L, 300L), (41L, 100L),
        (43L, 100L))
      .map { case (ms, v) => (new java.sql.Timestamp(ms), v) }
      .toDF("t", "v")
    val got = Behavior.decayedPeriodSums(df, "t",
        org.apache.spark.sql.functions.col("v"),
        periodMs = 10L, window = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 300L, 300.0), (1L, 300L, 450.0),
      (4L, 200L, 200.0)))
  }

  test("burstinessCensus: bursty above Fano 1, metronome below") {
    val D = 86400L * 1000000000L
    // type 'a': days 0,1 with counts 4 and 0? — observed only: day 0
    // count 3, day 1 count 1 → m=2 S=4 Q=10: fano = (20−16)/(8) = 0.5
    // → 500 q3, not bursty. type 'b': day 0 count 4, day 1 count 0?
    // observed: day0=4, day1 none, day2=0? Use day0=5, day2=1:
    // m=2 S=6 Q=26 → (52−36)/12 = 1.333 → 1333, bursty.
    val rows =
      (Seq.fill(3)(0L) ++ Seq(D)).map(t => (1L, t, "a")) ++
      (Seq.fill(5)(0L) ++ Seq(2 * D)).map(t => (2L, t, "b"))
    val df = rows.zipWithIndex.map { case ((u, t, ty), i) =>
      (u, t, i.toLong, ty, 1.0)
    }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.burstinessCensus(df)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq(("a", 2L, 500L, false), ("b", 2L, 1333L, true)))
  }

  test("binarySegmentation: level shift found at the true boundary") {
    // periodMs 10: counts 1,1,1,5,5 — true split after ordinal 3.
    // f(3) = 9/3 + 100/2 = 53; f(1) = 1 + 144/4 = 37; f(2) = 4/2 +
    // 121/3 ≈ 42.3; f(4) = 64/4 + 25 = 41 → argmax i=3.
    // gain = 53 − 169/5 = 19.2 → round 19
    val ts = Seq(0L, 10L, 20L) ++
      (0 until 5).map(i => 30L + i.toLong) ++
      (0 until 5).map(i => 40L + i.toLong)
    val df = ts.map(ms => new java.sql.Timestamp(ms)).toDF("t")
    val got = Behavior.binarySegmentation(df, "t", periodMs = 10L)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 3L, 2L, 3L, 10L, 19L)))
  }

  test("seasonalNaiveBacktest: season-lag errors, gap parents skipped") {
    // periodMs 10, season 2. periods/cents: p0:100, p1:200, p2:150,
    // p4:300. Scored: p2 (pred p0 → err +50), p4? parent p2 → err
    // +150; p1's parent p−1 unobserved, p3 itself unobserved. But p4's
    // own value must exist AND parent p2 exists → scored.
    // n=2, mae = (50+150) div 2 = 100, bias = +200
    val df = Seq((0L, 100L), (10L, 200L), (25L, 150L), (45L, 300L))
      .map { case (ms, v) => (new java.sql.Timestamp(ms), v) }
      .toDF("t", "v")
    val got = Behavior.seasonalNaiveBacktest(df, "t",
        org.apache.spark.sql.functions.col("v"),
        periodMs = 10L, season = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((2L, 100L, 200L)))
  }

  test("kaplanMeierTable: converters bucket at latency, others censor") {
    val D = 86400L * 1000000000L
    // u1: first event day 0, purchase day 2 → event at k=2
    // u2: first event day 0, purchase same ts → event at k=0
    // u3: first event day 1, no purchase; horizon = max ts = day 3
    //   → censored at k=2
    // at-risk suffix sums: k=0: 3, k=2: 2
    val rows = Seq(
      (1L, 0L, "view"), (1L, 2 * D, "purchase"),
      (2L, 0L, "purchase"),
      (3L, 1 * D, "view"), (3L, 3 * D, "click"))
      .zipWithIndex.map { case ((u, t, ty), i) =>
        (u, t, i.toLong, ty, 1.0)
      }.toDF("user_id", "ts", "event_id", "event_type", "value")
    val got = Behavior.kaplanMeierTable(rows, "purchase")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 3L, 1L, 0L), (2L, 2L, 1L, 1L)))
  }

  test("theilSenTrend: median pairwise slope, outlier-immune") {
    // periods (width 10 ms) and counts: p0:1, p1:2, p2:3, p3:100 —
    // a clean +1/day trend with one spike. Pairs (dn/dt): (0,1)=1,
    // (0,2)=1, (1,2)=1, (0,3)=33, (1,3)=49, (2,3)=97 → sorted slopes
    // 1,1,1,33,49,97; lower median = rank (6+1) div 2 = 3, and within
    // the slope-1 tie the (dt, pi) order puts (dn=2, dt=2) third —
    // slope 1/day either way; the spike never reaches the median
    // (OLS would report ~28)
    val ts = Seq(0L) ++ Seq(10L, 15L) ++ Seq(20L, 21L, 22L) ++
      (0 until 100).map(i => 30L + (i % 10))
    val df = ts.map(ms => new java.sql.Timestamp(ms)).toDF("t")
    val got = Behavior.theilSenTrend(df, "t", periodMs = 10L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((6L, 2L, 2L, 1000000L)))
  }

  test("decayedPeriodCounts: dyadic weights, gaps contribute nothing") {
    // periods 0 (2 events), 1 (1), 4 (2); window=3. p1 sees p0 at half
    // weight → 1 + 2/2 = 2.0 exactly; p4's frame (1,4] holds no observed
    // neighbour (p2/p3 are gaps, p1 is outside) → just itself.
    val ts = Seq(0L, 5L, 12L, 41L, 43L).map(ms =>
      new java.sql.Timestamp(ms))
    val got = Behavior.decayedPeriodCounts(ts.toDF("t"), "t",
        periodMs = 10L, window = 3)
      .as[(Long, Long, Double)].collect().toSeq
    assert(got == Seq((0L, 2L, 2.0), (1L, 1L, 2.0), (4L, 2L, 2.0)))
  }

  test("seasonalAnomalies: integer-exact within-season flag") {
    // periodMs=10, seasonLen=2. Season 0 = {p0:1, p2:1, p4:4}:
    // m=3, S=6, Q=18 → p4: (3·4−6)² = 36 > 1²·(3·18−36) = 18 → anomaly;
    // p0/p2: (3·1−6)² = 9 ≤ 18. Season 1 = {p1:1, p3:1}: zero variance,
    // zero deviation → (2·1−2)² = 0 > 0 is false (no self-anomaly on a
    // constant season).
    val ts = Seq(1L, 11L, 21L, 31L, 40L, 42L, 44L, 46L).map(ms =>
      new java.sql.Timestamp(ms))
    val got = Behavior.seasonalAnomalies(ts.toDF("t"), "t",
        periodMs = 10L, seasonLen = 2, k = 1L)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 0L, 1L, false), (1L, 1L, 1L, false),
      (2L, 0L, 1L, false), (3L, 1L, 1L, false), (4L, 0L, 4L, true)))
  }

  test("funnelWithin: per-step deadline, boundary inclusive") {
    // user 1: click exactly AT t0+gap (inclusive) counts; purchase at
    // t1+gap+1 (late) does not. user 2: click after the deadline —
    // stops at step 1. MaxValue disables the deadline entirely.
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 31L, "purchase"),
      (2L, 10L, "view"), (2L, 21L, "click"))
    val got = Behavior.funnelWithin(e, Seq("view", "click", "purchase"),
        maxGapNs = 10L)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 0L)))
    val unbounded = Behavior.funnelWithin(e,
        Seq("view", "click", "purchase"), maxGapNs = Long.MaxValue)
      .as[(Long, Long, Long)].collect().head
    assert(unbounded == ((2L, 2L, 1L)))
    // and ≡ the unbounded funnel's own entry point
    assert(Behavior.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head == unbounded)
  }

  test("sessionFunnel counts SESSIONS; a cross-session step never converts") {
    // user 1, session A: view@10, click@20 (no purchase); the purchase
    // @1000 is a NEW session (gap 100) — the whole-history funnel counts
    // it, the session funnel must not. user 1, session B: full
    // view→click→purchase run → the one converting session. user 2: two
    // view-only sessions → two step-1 entries from one user.
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 1000L, "purchase"),
      (1L, 2000L, "view"), (1L, 2010L, "click"), (1L, 2020L, "purchase"),
      (2L, 10L, "view"), (2L, 500L, "view"))
    val got = Behavior.sessionFunnel(e, Seq("view", "click", "purchase"),
        gapNs = 100L, tiebreakCol = "ts")
      .as[(Long, Long, Long)].collect().head
    // sessions with a view: u1 {10,20}, u1 {2000..}, u2 {10}, u2 {500}
    // (u1's purchase-only session has no view → not in the funnel)
    assert(got == ((4L, 2L, 1L)))
    // and the whole-history funnel (users, not sessions) disagrees
    // exactly where it should: u1's cross-session purchase@1000 converts
    assert(Behavior.funnel(e, Seq("view", "click", "purchase"))
      .as[(Long, Long, Long)].collect().head == ((2L, 1L, 1L)))
  }

  test("sessionPathMatrix: entry and exit from one session, singletons diag") {
    // u1 session A: view…purchase → (view, purchase); u1 session B:
    // singleton click → (click, click); u2: view→view
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 1000L, "click"),
      (2L, 10L, "view"), (2L, 20L, "view"))
    val got = Behavior.sessionPathMatrix(e, gapNs = 100L,
        tiebreakCol = "ts")
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("click", "click", 1L), ("view", "purchase", 1L),
      ("view", "view", 1L)))
  }

  test("topSessionPaths: ordered truncated paths, census, deterministic k") {
    // u1-a view→click→purchase→view→click truncated at depth 3;
    // u1-b singleton view; u2-a view→click→purchase
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      (1L, 40L, "view"), (1L, 50L, "click"),
      (1L, 1000L, "view"),
      (2L, 10L, "view"), (2L, 20L, "click"), (2L, 30L, "purchase"))
    val got = Behavior.topSessionPaths(e, gapNs = 100L, depth = 3,
        k = 10, tiebreakCol = "ts")
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view > click > purchase", 2L), ("view", 1L)))
    // k truncates at the (count DESC, path) total order
    assert(Behavior.topSessionPaths(e, gapNs = 100L, depth = 3, k = 1,
        tiebreakCol = "ts").as[(String, Long)].collect().toSeq ==
      Seq(("view > click > purchase", 2L)))
  }

  test("interArrivalHistogram: bit-exact log2 buckets, zero gaps dropped") {
    // u1: a@10→b@11 gap 1 (bucket 0, attributed to a); b@11→c@19 gap 8
    // (bucket 3, attributed to b); c@19→c@19 gap 0 dropped; the last
    // event and u2's singleton carry no gap
    val e = ev((1L, 10L, "a"), (1L, 11L, "b"), (1L, 19L, "c"),
      (1L, 19L, "c"), (2L, 5L, "a"))
    val got = Behavior.interArrivalHistogram(e, tiebreakCol = "ts")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", 0L, 1L), ("b", 3L, 1L)))
  }

  test("entryConversion: session attributed to its FIRST event's type") {
    // u1 session A: view→purchase (entry view, converted); u1 session
    // B: click only; u2 session: purchase-first (entry purchase,
    // trivially converted)
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "purchase"),
      (1L, 1000L, "click"),
      (2L, 10L, "purchase"))
    val got = Behavior.entryConversion(e, "purchase", gapNs = 100L,
        tiebreakCol = "ts")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 1L, 0L, 0L),
      ("purchase", 1L, 1L, 1000L), ("view", 1L, 1L, 1000L)))
  }

  test("latenessCensus: in-order stream is clean; a late event measured") {
    import org.apache.spark.sql.functions.col
    // arrivals 1..4 with event times 10, 30, 20, 40: arrival 3 carries
    // ts 20 after the max 30 was seen → late by 10; others on time
    val e = Seq((1L, 10L), (2L, 30L), (3L, 20L), (4L, 40L))
      .toDF("arrival", "ts")
    val got = Behavior.latenessCensus(e, tiebreakCol = "arrival")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((4L, 1L, 10L, 10L)))
    // strictly increasing event times → zero lateness
    val ordered = Seq((1L, 5L), (2L, 6L), (3L, 7L)).toDF("arrival", "ts")
    assert(Behavior.latenessCensus(ordered, "arrival")
      .as[(Long, Long, Long, Long)].collect().head == ((3L, 0L, 0L, 0L)))
  }

  test("latenessCensusSharded equals the one-pass window form") {
    // scrambled arrivals with several late events and ties in value
    val e = (1 to 200).map(i =>
      (i.toLong, ((i * 7919L) % 50) * 3L)).toDF("arrival", "ts")
    val want = Behavior.latenessCensus(e, "arrival", quantumNs = 3L)
      .as[(Long, Long, Long, Long)].collect().head
    val got = Behavior.latenessCensusSharded(e, "arrival", quantumNs = 3L)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == want)
    assert(want._2 > 0L, "fixture must actually contain late events")
  }

  test("userGrowthCurve: first-seen day only, cumulative is running") {
    // user 1 spans days 0 and 2 (counted once, on day 0); user 2 starts
    // day 2; user 3 day 0 — growth (0 → 2 new), (2 → 1 new), cum 2, 3
    val D = 86400000000000L
    val e = ev((1L, 10L, "view"), (1L, 2 * D + 5L, "view"),
      (2L, 2 * D + 9L, "view"), (3L, 20L, "view"))
    val got = Behavior.userGrowthCurve(e)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L, 2L), (2L, 1L, 3L)))
  }

  test("sessionAffinity: lift normalizes away base rates, exact integers") {
    // 4 sessions (gap 100): u1-a {view,click}, u1-b {view}, u2-a
    // {view,click}, u2-b {purchase}. Margins: view 3, click 2,
    // purchase 1. Pairs: (click,view) both in 2 sessions →
    // lift = 2·4·1e6 div (2·3) = 1333333. No purchase pair.
    val e = ev(
      (1L, 10L, "view"), (1L, 20L, "click"),
      (1L, 1000L, "view"),
      (2L, 10L, "view"), (2L, 30L, "click"),
      (2L, 2000L, "purchase"))
    val got = Behavior.sessionAffinity(e, gapNs = 100L,
        tiebreakCol = "ts")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("click", "view", 2L, 1333333L)))
  }

  test("forwardFill: gaps take the prior value, leading gaps stay NULL") {
    import org.apache.spark.sql.functions.col
    // user 1: v=2.0 @10, NULL @20 (→2.0), 5.0 @30, NULL @40 (→5.0)
    // user 2: leading NULL @10 stays NULL; 7.0 @20; NULL @30 → 7.0
    val e = Seq(
      (1L, 10L, Some(2.0)), (1L, 20L, None), (1L, 30L, Some(5.0)),
      (1L, 40L, None),
      (2L, 10L, None), (2L, 20L, Some(7.0)), (2L, 30L, None))
      .toDF("user_id", "ts", "value")
      .withColumn("event_id", col("ts"))
    val got = Behavior.forwardFill(e, "value")
      .as[(Long, Long, Option[Double])].collect().toSeq
      .sortBy(r => (r._2, r._1))
    assert(got == Seq(
      (10L, 1L, Some(2.0)), (20L, 1L, Some(2.0)), (30L, 1L, Some(5.0)),
      (40L, 1L, Some(5.0)),
      (10L, 2L, None), (20L, 2L, Some(7.0)), (30L, 2L, Some(7.0))))
  }

  test("dwellTimeCensus: per-state time-to-next, last event has no dwell") {
    // user 1: view@10 → click@25 → view@100: dwells view→15, click→75;
    // the final view has no next event and contributes nothing.
    // user 2: one click@5 → purchase@6: click dwell 1.
    val e = ev((1L, 10L, "view"), (1L, 25L, "click"), (1L, 100L, "view"),
      (2L, 5L, "click"), (2L, 6L, "purchase"))
    val got = Behavior.dwellTimeCensus(e, tiebreakCol = "ts")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("click", 2L, 76L, 75L), ("view", 1L, 15L, 15L)))
  }

  test("funnelWithin: huge finite gap does not overflow against ns timestamps") {
    // epoch-ns scale (~1.7e18): t0 + maxGapNs would wrap past 2⁶³ for
    // any large finite gap — the subtraction form must behave exactly
    // like the unbounded funnel here, not silently empty the tail steps
    val base = 1700000000000000000L
    val e = ev(
      (1L, base, "view"), (1L, base + 10L, "click"),
      (1L, base + 20L, "purchase"))
    val got = Behavior.funnelWithin(e, Seq("view", "click", "purchase"),
        maxGapNs = Long.MaxValue - 1L)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 1L)))
  }

  test("periodTrend: exact unit slope, single-period group is NULL") {
    // group a: counts 1,2,3 at periods 0,1,2 → OLS slope exactly 1
    // (quantized 1_000_000); group b: one period → no slope, NULL
    val ts = (Seq.fill(1)(1L) ++ Seq.fill(2)(11L) ++ Seq.fill(3)(21L))
      .map(ms => ("a", new java.sql.Timestamp(ms))) ++
      Seq(("b", new java.sql.Timestamp(5L)))
    val got = Behavior.periodTrend(ts.toDF("g", "t"), "g", "t",
        periodMs = 10L)
      .as[(String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("a", 3L, 6L, Some(1000000L)), ("b", 1L, 1L, None)))
  }

  test("linearAttribution: window-bounded credit split, NULL when none") {
    val W = 100L
    // user 1: clicks at 10, 50, purchase at 100 → both attributed
    // (gap 90 and 50; click at 10 is exactly conv−W+10 > conv−W: in);
    // click at 150 is AFTER the purchase: out.
    // user 2: click at 0, purchase at 200 → gap 200 > W−1: out → the
    // purchase surfaces unattributed with n_touches 0.
    // boundary: user 3 click exactly AT the purchase instant: included
    // (gap 0); click exactly W before (gap == W): excluded.
    val rows = Seq(
      (1L, 10L, "click", 101L), (1L, 50L, "click", 102L),
      (1L, 100L, "purchase", 103L), (1L, 150L, "click", 104L),
      (2L, 0L, "click", 201L), (2L, 200L, "purchase", 202L),
      (3L, 300L, "click", 301L), (3L, 200L, "click", 302L),
      (3L, 300L, "purchase", 303L))
      .map { case (u, t, ty, id) => (id, t, u, ty, 1.0) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = Behavior.linearAttribution(rows, "click", "purchase",
        windowNs = 100L)
      .as[(Long, Long, Option[Long], Option[Long], Long)]
      .collect().toSeq
    assert(got == Seq(
      (1L, 103L, Some(101L), Some(90L), 2L),
      (1L, 103L, Some(102L), Some(50L), 2L),
      (2L, 202L, None, None, 0L),
      (3L, 303L, Some(301L), Some(0L), 1L)))
  }

  test("activityHeatmap: integer dow/hod cells and exact shares") {
    import spark.implicits._
    val usPerDay = 86400000000L
    val usPerHour = 3600000000L
    // quantum 1: ts is already in the op's µs domain. Epoch day 0 is a
    // Thursday → dow 4 under 0=Sunday; day 4 is the following Monday
    // → dow 1.
    val e = Seq(
      0L * usPerDay + 0L * usPerHour,            // Thu 00
      0L * usPerDay + 0L * usPerHour + 1L,       // Thu 00 (same cell)
      0L * usPerDay + 23L * usPerHour,           // Thu 23
      4L * usPerDay + 5L * usPerHour)            // Mon 05
      .map(t => (1L, t, "x", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.activityHeatmap(e)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 1L, 250L), (4L, 0L, 2L, 500L),
      (4L, 23L, 1L, 250L)))
  }

  test("dailyAutocorrelation: alternating series, zero-filled gaps") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // events only on days 0, 2, 4 — days 1 and 3 must dense-fill to 0,
    // giving the series [1,0,1,0,1]: lag-1 r = −1, lag-2 r = +1
    val e = Seq(0L, 2L, 4L).map(d => (1L, d * usPerDay, "x", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.dailyAutocorrelation(e, maxLag = 2)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4L, -1000000L), (2L, 3L, 1000000L)))
  }

  test("dailyAutocorrelation: constant series has zero variance -> null") {
    import spark.implicits._
    val usPerDay = 86400000000L
    val e = Seq(0L, 1L, 2L, 3L).map(d => (1L, d * usPerDay, "x", 1.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Behavior.dailyAutocorrelation(e, maxLag = 1)
      .as[(Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, 3L, None)))
  }

  test("transitionMatrix: per-user consecutive pairs, event_id tiebreak") {
    import spark.implicits._
    // u1: A→B→A; u2: A→A; u3: two events at the SAME ts — event_id
    // order must decide the pair direction (C→D, never D→C)
    val e = Seq(
      (1L, 10L, 1L, "A"), (1L, 20L, 2L, "B"), (1L, 30L, 3L, "A"),
      (2L, 10L, 4L, "A"), (2L, 20L, 5L, "A"),
      (3L, 10L, 6L, "C"), (3L, 10L, 7L, "D"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.transitionMatrix(e)
      .as[(String, String, Long, Long)].collect().toSeq
    // from A: A→A 1, A→B 1 (total 2 → 500‰ each); B→A 1000‰; C→D 1000‰
    assert(got == Seq(("A", "A", 1L, 500L), ("A", "B", 1L, 500L),
      ("B", "A", 1L, 1000L), ("C", "D", 1L, 1000L)))
  }

  test("cusumChangepoint: dense fill, exact integer cusum, peak flag") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // events on day 0 (1) and day 2 (3); day 1 must dense-fill to 0.
    // Series [1,0,3]: D=3, T=4, P=[1,1,4] → S = 3P−iT = [−1,−5,0];
    // the peak |S| is day 1 — the fill day, so the fill is load-bearing
    val e = (Seq(0L) ++ Seq.fill(3)(2L)).zipWithIndex
      .map { case (d, i) => (1L, d * usPerDay, i.toLong, "x") }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.cusumChangepoint(e)
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((0L, 1L, -1L, false), (1L, 0L, -5L, true),
      (2L, 3L, 0L, false)))
  }

  test("conversionDeciles: first view → first purchase at-or-after it") {
    import spark.implicits._
    // u1 Δ=10; u2 Δ=40; u3's purchase@5 precedes its view — the one
    // at 30 counts (Δ=20); u4 never converts; u5 never views
    val e = Seq(
      (1L, 10L, "view"), (1L, 20L, "purchase"),
      (2L, 10L, "view"), (2L, 50L, "purchase"),
      (3L, 10L, "view"), (3L, 5L, "purchase"), (3L, 30L, "purchase"),
      (4L, 10L, "view"), (5L, 10L, "purchase"))
      .map { case (u, t, ty) => (u, t, 0L, ty) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.conversionDeciles(e, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // deltas sorted: 10, 20, 40 → ntile(2) puts {10,20} in bucket 1
    assert(got == Seq((1L, 2L, 10L, 20L, 30L), (2L, 1L, 40L, 40L, 40L)))
  }

  test("entropyDeciles: single-note user scores 0, uniform pair ln 2") {
    import spark.implicits._
    // u1: 4 events of ONE type -> H = 0 exactly under the integer
    // device; u2: 2+2 over two types -> H = round(1e6 ln 2) = 693147
    val e = (Seq.fill(4)("x").map(t => (1L, t)) ++
      Seq((2L, "a"), (2L, "a"), (2L, "b"), (2L, "b")))
      .zipWithIndex.map { case ((u, t), i) => (u, i.toLong, i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.entropyDeciles(e, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 0L, 0L),
      (2L, 1L, 693147L, 693147L, 693147L)))
  }

  test("typeCorrelationMatrix: dense fill shared across both series") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // A on days 0 (x1) and 2 (x3); B on days 0 (x3) and 2 (x1); day 1
    // fills 0 for BOTH -> series [1,0,3] vs [3,0,1]:
    // r = (3*6-16)/(sqrt(14)*sqrt(14)) = 2/14 -> 142857
    val e = ((Seq.fill(1)(0L) ++ Seq.fill(3)(2L)).map(d => (d, "A")) ++
      (Seq.fill(3)(0L) ++ Seq.fill(1)(2L)).map(d => (d, "B")))
      .zipWithIndex.map { case ((d, t), i) =>
        (1L, d * usPerDay, i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.typeCorrelationMatrix(e)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("A", "B", 3L, 142857L)))
  }

  test("intensityByEntropyDecile: user-level shares, zero-purchase user") {
    import spark.implicits._
    // u1: 4x single type (h=0), no purchases; u2: 2 views + 2
    // purchases (h=ln2 -> bucket 2), intensity 2/4 = 500 permille
    val e = (Seq.fill(4)("view").map(t => (1L, t)) ++
      Seq((2L, "view"), (2L, "view"), (2L, "purchase"), (2L, "purchase")))
      .zipWithIndex.map { case ((u, t), i) => (u, i.toLong, i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.intensityByEntropyDecile(e, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 4L, 0L), (2L, 1L, 2L, 4L, 500L)))
  }

  test("bounceRate: singleton sessions counted against their entry") {
    import spark.implicits._
    val G = 100L
    val e = Seq(
      (1L, 0L, 0L, "view"),                            // session A: bounce
      (1L, 200L, 1L, "click"), (1L, 250L, 2L, "view"), // B: 2 events
      (2L, 0L, 3L, "view"))                            // C: bounce
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.bounceRate(e, gapNs = G)
      .as[(String, Long, Long, Long)].collect().toSeq
    // entries: view(A), click(B), view(C) -> click 0/1, view 2/2
    assert(got == Seq(("click", 1L, 0L, 0L), ("view", 2L, 2L, 1000L)))
  }

  test("cadenceRegularityDeciles: metronomic user scores exactly 0") {
    import spark.implicits._
    // u1 purchases at 0,10,20 (equal gaps) -> CV^2 = 0; u2 at 0,10,40
    // (gaps 10,30) -> 2*(2*1000-1600)/(1*1600) = 0.5 -> 500000
    val e = Seq((1L, 0L), (1L, 10L), (1L, 20L),
      (2L, 0L), (2L, 10L), (2L, 40L))
      .zipWithIndex.map { case ((u, t), i) => (u, t, i.toLong, "purchase") }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.cadenceRegularityDeciles(e, k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 0L, 0L), (2L, 1L, 500000L, 500000L)))
  }

  test("trendingTypes: share deltas, NULL on each type's first day") {
    import spark.implicits._
    val usPerDay = 86400000000L
    // day0: A 1, B 3 (250/750 permille); day1: A 2, B 2 (500/500)
    val e = (Seq.fill(1)((0L, "A")) ++ Seq.fill(3)((0L, "B")) ++
      Seq.fill(2)((1L, "A")) ++ Seq.fill(2)((1L, "B")))
      .zipWithIndex.map { case ((d, t), i) =>
        (1L, d * usPerDay, i.toLong, t) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Behavior.trendingTypes(e)
      .as[(Long, String, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (0L, "A", 1L, 250L, None), (0L, "B", 3L, 750L, None),
      (1L, "A", 2L, 500L, Some(250L)), (1L, "B", 2L, 500L, Some(-250L))))
  }

  private val DAY = 86400000000000L

  /** The md5 per-mille bucket of each id, evaluated through the SAME
    * splitBucket the operators use — lets a test construct fixtures
    * with KNOWN variant assignment without hardcoding md5 values.
    */
  private def buckets(ids: Seq[Long]): Map[Long, Int] =
    ids.toDF("id")
      .select($"id", Sampling.splitBucket($"id").as("b"))
      .as[(Long, Int)].collect().toMap

  test("cupedReadout: zero pre-variance → NULL theta; x=y → theta=1") {
    // all users: 1 pre event (day 0), varying post (day 3); mid = 2
    val flat = (1L to 4L).flatMap(u =>
      (0L until u).map(i => (u, 3 * DAY + i, "view", 1.0)) :+
        ((u, 0L, "view", 1.0)))
      .toDF("user_id", "ts", "event_type", "value")
    val g1 = Behavior.cupedReadout(flat)
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(g1.map(_._2).sum == 4L)
    assert(g1.forall(r => r._4.isEmpty && r._5.isEmpty))
    // y == x per user → theta exactly 1, adj = ȳ_v − (x̄_v − x̄)
    val mirror = (1L to 4L).flatMap(u =>
      (0L until u).flatMap(i =>
        Seq((u, 0L + i, "view", 1.0), (u, 3 * DAY + i, "view", 1.0))))
      .toDF("user_id", "ts", "event_type", "value")
    val g2 = Behavior.cupedReadout(mirror)
      .as[(String, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(g2.forall(_._4.contains(1000000L)))
  }

  test("diffInDiff: constant price → 0; planted +300-cent B-post lift") {
    val bk = buckets(1L to 50L)
    val as = (1L to 50L).filter(bk(_) < 500).take(2)
    val bs = (1L to 50L).filter(bk(_) >= 500).take(2)
    assert(as.size == 2 && bs.size == 2, "need both variants in 1..50")
    def o(keys: Seq[Long], year: Int, price: Double) =
      keys.zipWithIndex.map { case (c, i) =>
        (c * 100 + year + i, c, s"$year-06-01 00:00:00", price) }
    val const = (o(as, 1995, 1.00) ++ o(as, 1997, 1.00) ++
      o(bs, 1995, 1.00) ++ o(bs, 1997, 1.00))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", $"d".cast("timestamp_ntz")).drop("d")
    assert(Behavior.diffInDiff(const)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 2L, 2L, Some(0L))))
    // B-post +3.00 over the parallel trend → DiD = +300 cents exactly
    val lifted = (o(as, 1995, 1.00) ++ o(as, 1997, 2.00) ++
      o(bs, 1995, 1.00) ++ o(bs, 1997, 5.00))
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .withColumn("o_orderdate", $"d".cast("timestamp_ntz")).drop("d")
    assert(Behavior.diffInDiff(lifted)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 2L, 2L, Some(300000000L))))
  }

  test("conversionZTest: saturated → NULL z; clean split → z = 2") {
    val bk = buckets(1L to 50L)
    val as = (1L to 50L).filter(bk(_) < 500).take(2)
    val bs = (1L to 50L).filter(bk(_) >= 500).take(2)
    def e(users: Seq[Long], typ: String) =
      users.map(u => (u, 0L, typ, 1.0))
    // everyone converts → p̂ = 1, pooled variance 0 → NULL, not error
    val sat = e(as ++ bs, "purchase")
      .toDF("user_id", "ts", "event_type", "value")
    assert(Behavior.conversionZTest(sat, minEvents = 1L)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 2L, 2L, None)))
    // A converts, B doesn't: p̂ = ½ → z = 1/√(¼·1) = 2 exactly
    val split = (e(as, "purchase") ++ e(bs, "view"))
      .toDF("user_id", "ts", "event_type", "value")
    assert(Behavior.conversionZTest(split, minEvents = 1L)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head ==
      ((2L, 2L, 2L, 0L, Some(2000000L))))
  }
}
