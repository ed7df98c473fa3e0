package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Behavioral analytics over event streams — funnel conversion and
  * cohort retention. Engine-surface extension (the reference's closest
  * shape is the two-leg flight join, SURVEY §2.3 J2 — a funnel IS a
  * k-leg ordered join, collapsed here to per-user aggregates so no
  * per-pair blow-up exists at any scale).
  *
  * Everything is exact integer arithmetic on int64 nanosecond timestamps
  * (Tables.events): counts and min-timestamps only, no floats — every
  * result is hash-comparable against a SQL oracle.
  */
object Behavior {

  /** Ordered funnel: for each user, step i counts only if its earliest
    * qualifying event is strictly AFTER the user's step-(i−1) time —
    * `min(ts | type = stepᵢ ∧ ts > tᵢ₋₁)`. One row: users reaching each
    * step. Conversion between steps is the adjacent-count ratio, left to
    * the reader (a ratio would be float; the counts are the artifact).
    *
    * Shape: one scan per step, each collapsing to a per-user min BEFORE
    * the next step's join — joins carry one row per user per step, never
    * event×event pairs. A per-user sessionized funnel (windowed, ordered
    * within session) composes from `EventStreams.userSessions` + this on
    * the session-scoped slice.
    */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame =
    funnelWithin(events, steps, maxGapNs = Long.MaxValue)

  /** `funnel` with a PER-STEP deadline: step i counts only if its
    * earliest qualifying event lands in `(tᵢ₋₁, tᵢ₋₁ + maxGapNs]` — the
    * business form ("purchased within a day of clicking") that separates
    * an active conversion path from users who merely returned months
    * later, which the unbounded q102 funnel cannot tell apart.
    * `Long.MaxValue` disables the deadline, making the unbounded funnel
    * the same code path — one definition, two contracts.
    *
    * The deadline is evaluated as `ts − tᵢ₋₁ ≤ maxGapNs`, never
    * `ts ≤ tᵢ₋₁ + maxGapNs`: with non-negative epoch-ns timestamps the
    * difference of two longs cannot overflow, so ANY gap up to
    * Long.MaxValue is safe — the addition form overflows (and under
    * Spark's ANSI default, throws) as soon as tᵢ₋₁ + maxGapNs crosses
    * 2⁶³, i.e. for every "large but finite" gap against ~1.7e18 ns
    * event times.
    */
  def funnelWithin(events: DataFrame, steps: Seq[String],
                   maxGapNs: Long): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least two steps")
    require(maxGapNs >= 1, "maxGapNs must be >= 1")
    var acc = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min("ts").as("t0"))
    for (i <- 1 until steps.length) {
      val within =
        if (maxGapNs == Long.MaxValue) lit(true)
        else col("ts") - col(s"t${i - 1}") <= maxGapNs
      val reach = events.filter(col("event_type") === steps(i))
        .join(acc.filter(col(s"t${i - 1}").isNotNull)
          .select(col("user_id"), col(s"t${i - 1}")), "user_id")
        .filter(col("ts") > col(s"t${i - 1}") && within)
        .groupBy("user_id").agg(min("ts").as(s"t$i"))
      acc = acc.join(reach, Seq("user_id"), "left")
    }
    val aggs = steps.indices.map(i => count(col(s"t$i")).as(s"step${i + 1}"))
    acc.agg(aggs.head, aggs.tail: _*)
  }

  /** Per-group activity TREND: the OLS slope of per-period row counts
    * against the period index, one row per group — "which segment is
    * growing/shrinking, and how fast" as a single number (counts/period
    * per period), quantized at 1e-6 like q147's Zipf slope so the only
    * float crosses engines safely. Groups observed in fewer than two
    * periods have no slope and surface NULL rather than a fake 0.
    *
    * Shape: the scan collapses to (group, period, count) partials; the
    * regression consumes |groups|×|periods| aggregated rows. Nothing
    * after the first partial agg scales with data.
    */
  def periodTrend(df: DataFrame, groupCol: String, tsCol: String,
                  periodMs: Long = 2592000000L): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    df.select(col(groupCol), expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"))
      .groupBy(groupCol, "period").agg(count(lit(1)).as("cnt"))
      .groupBy(groupCol)
      .agg(count(lit(1)).as("n_periods"), sum("cnt").as("n_rows"),
        expr("round(regr_slope(cast(cnt as double)," +
          " cast(period as double)) * 1000000)").cast("long")
          .as("trend_q6"))
      .orderBy(groupCol)
  }

  /** Trailing moving sum of per-period row counts: periods are integer
    * divisions of epoch-millis timestamps, the window is RANGE-based
    * (`trailing − 1` periods back through the current one), so GAPS in
    * the period sequence behave correctly — a rows-based frame would
    * silently stretch across missing periods. The week-over-week trend
    * smoother; exact integers throughout.
    *
    * Shape: the fact scan collapses to one row per period before the
    * (global, |periods|-row) window — at 100 TB the window input is
    * thousands of rows regardless of corpus size.
    */
  def rollingPeriodCounts(df: DataFrame, tsCol: String,
                          periodMs: Long = 7L * 86400000L,
                          trailing: Int = 4): DataFrame = {
    require(periodMs >= 1 && trailing >= 1, "need positive period/window")
    // cast covers TIMESTAMP_NTZ columns (parquet ms fixtures): identity
    // under the library's pinned UTC session timezone
    val perPeriod = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"))
      .groupBy("period").agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("period")
      .rangeBetween(-(trailing - 1).toLong, 0)
    perPeriod.withColumn("n_trail", sum("n").over(w)).orderBy("period")
  }

  /** The shared gaps-and-islands sessionization preamble (the q113
    * formula): quantize `ts` by `quantumNs`, break a user's
    * `(qts, tiebreak)`-ordered run wherever the inter-event gap reaches
    * `gapNs`, and label every row with the running break count as
    * `sess`. Output: `user_id`, `qts`, `tiebreakCol`, the requested
    * `extraCols`, `sess`. EVERY session-family operator (stats, funnel,
    * path matrix, entry conversion, affinity, top paths) builds on THIS
    * one definition, so the gap comparison and ordering semantics cannot
    * drift between them — the r10 hot-shingle lesson (pairsBySetOverlap)
    * applied to sessions. ONE user-keyed exchange serves both stacked
    * windows (lag + running sum share partition/order).
    */
  private def sessionized(events: DataFrame, gapNs: Long,
                          tiebreakCol: String, quantumNs: Long,
                          extraCols: Seq[String] = Seq("event_type"))
      : DataFrame = {
    require(gapNs >= 1 && quantumNs >= 1, "need positive gap/quantum")
    require(gapNs % quantumNs == 0, "gapNs must be a quantum multiple")
    val qgap = gapNs / quantumNs
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col(tiebreakCol))
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    events
      .select(col("user_id") +: expr(s"ts div ${quantumNs}L").as("qts") +:
        col(tiebreakCol) +: extraCols.map(col): _*)
      .withColumn("brk", when(col("qts") - lag("qts", 1).over(w) < qgap,
        0L).otherwise(1L)) // first event: lag null → comparison null → 1
      .withColumn("sess", sum("brk").over(cum))
      .drop("brk")
  }

  /** Batch sessionization stats, gaps-and-islands form: a session is a
    * maximal run of a user's events with inter-event gap < `gapNs`; the
    * session id is the running count of gap-breaks in `(ts, tiebreak)`
    * order — the classic SQL formulation, fully deterministic and
    * integer-exact, and therefore oracle-checkable where the streaming
    * `session_window` (EventStreams.userSessions) is spec-pinned.
    * Per user: sessions, events, and the largest session's event count.
    *
    * Shape: ONE exchange on user_id serves both stacked windows (lag
    * and running sum share the partition/order) and the two aggregates
    * that follow re-use the same keys — nothing wider than per-user
    * rows ever shuffles.
    *
    * `quantumNs` floors timestamps before the gap test AND the window
    * order (same rationale as `conversionLatency`: a µs-precision
    * oracle engine must see the identical gap comparisons — and the
    * identical ordering — or a sub-quantum gap straddling the threshold
    * breaks sessions on one engine only).
    */
  def sessionStats(events: DataFrame, gapNs: Long,
                   tiebreakCol: String = "event_id",
                   quantumNs: Long = 1L): DataFrame = {
    sessionized(events, gapNs, tiebreakCol, quantumNs, extraCols = Nil)
      .groupBy("user_id", "sess").agg(count(lit(1)).as("n"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n").as("n_events"),
        max("n").as("max_session_events"))
      .orderBy("user_id")
  }

  /** SESSION-scoped ordered funnel: step i counts only when its earliest
    * qualifying event follows step i−1 INSIDE THE SAME SESSION (the
    * q113 gaps-and-islands sessionization, shared formula) — the
    * conversion question product analytics actually asks ("did they buy
    * in that visit"), which the whole-history funnel (q102) and the
    * deadline funnel (q162) both overcount: a user who viewed today and
    * purchased in an unrelated visit next week is a q102 conversion but
    * not a session conversion. One row: SESSIONS reaching each step
    * (`stepN` counts sessions, not users — a user converting twice in
    * two visits counts twice; that is the session-funnel contract).
    *
    * Shape: ONE exchange on user_id drives the sessionization windows
    * (the q113 discipline); each step then collapses to a per-(user,
    * session) min BEFORE the next join — joins carry one row per
    * session per step, never event×event. Timestamps are quantized by
    * `quantumNs` exactly as sessionStats (oracle-parity on the gap
    * comparisons AND the step ordering).
    */
  def sessionFunnel(events: DataFrame, steps: Seq[String], gapNs: Long,
                    tiebreakCol: String = "event_id",
                    quantumNs: Long = 1L): DataFrame = {
    require(steps.length >= 2, "a funnel needs at least two steps")
    val sessioned = sessionized(events, gapNs, tiebreakCol, quantumNs)
      .select("user_id", "sess", "qts", "event_type")
    var acc = sessioned.filter(col("event_type") === steps.head)
      .groupBy("user_id", "sess").agg(min("qts").as("t0"))
    for (i <- 1 until steps.length) {
      val reach = sessioned.filter(col("event_type") === steps(i))
        .join(acc.filter(col(s"t${i - 1}").isNotNull)
          .select(col("user_id"), col("sess"), col(s"t${i - 1}")),
          Seq("user_id", "sess"))
        .filter(col("qts") > col(s"t${i - 1}"))
        .groupBy("user_id", "sess").agg(min("qts").as(s"t$i"))
      acc = acc.join(reach, Seq("user_id", "sess"), "left")
    }
    val aggs = steps.indices.map(i =>
      count(col(s"t$i")).as(s"step${i + 1}"))
    acc.agg(aggs.head, aggs.tail: _*)
  }

  /** Sweep-line interval concurrency: each `[start, end)` interval emits
    * a +1 at `start` and a −1 at `end`; the running sum over boundary
    * order IS the number of concurrently-open intervals after each
    * boundary. Deltas at the same instant merge first (one row per
    * boundary), so an interval ending exactly where another starts never
    * produces a phantom overlap and the output is deterministic without
    * a tiebreak column.
    *
    * The no-join answer to "how many X are open at once" (sessions,
    * orders in flight, leases): one aggregate + one |boundaries|-row
    * window; the quadratic interval self-join never exists. Integer
    * counts: exact. Same global-window posture as `rollingPeriodCounts`
    * — the window input is the merged boundary set, not the fact rows.
    */
  def intervalConcurrency(intervals: DataFrame, startCol: String,
                          endCol: String): DataFrame = {
    val deltas = intervals
      .select(col(startCol).as("t"), lit(1L).as("d"))
      .unionByName(intervals.select(col(endCol).as("t"),
        lit(-1L).as("d")))
      .groupBy("t").agg(sum("d").as("delta"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("t")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    deltas.withColumn("n_open", sum("delta").over(w)).orderBy("t")
  }

  /** Markov transition census: for each user's event sequence (ordered
    * by `(ts, tiebreakCol)` — the tiebreak makes same-instant order
    * deterministic), count corpus-wide adjacent `(from_type, to_type)`
    * transitions. The session-flow matrix behind "what do users do
    * next"; row-normalizing to probabilities is one division the
    * consumer applies (counts stay the exact artifact).
    *
    * Shape: one hash-shuffle on user_id for the lag window, then a
    * two-level count on the (from, to) pair — the window's sort is
    * per-user, the census exchange carries pair partials only.
    */
  def transitionCensus(events: DataFrame,
                       tiebreakCol: String = "event_id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col(tiebreakCol))
    events
      .select(col("user_id"), col("ts"), col(tiebreakCol),
        col("event_type"))
      .withColumn("from_type", lag("event_type", 1).over(w))
      .filter(col("from_type").isNotNull)
      .groupBy(col("from_type"), col("event_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  /** Session PATH matrix — (entry type, exit type) session counts: how
    * visits begin and how they end, the two-endpoint summary of the
    * full path that `transitionCensus`'s step matrix and
    * `entryConversion`'s one-column view both miss ("sessions that
    * start with search overwhelmingly end in error" is a cell here).
    *
    * Shape: the q113 sessionization exchange; entry and exit are the
    * ascending and descending row_number over the SAME per-session
    * window order (one sort serves both); the final join keys on the
    * session — per-session rows throughout.
    */
  def sessionPathMatrix(events: DataFrame, gapNs: Long,
                        tiebreakCol: String = "event_id",
                        quantumNs: Long = 1L): DataFrame = {
    val sessioned = sessionized(events, gapNs, tiebreakCol, quantumNs)
    val asc = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess")
      .orderBy(col("qts"), col(tiebreakCol))
    val desc = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess")
      .orderBy(col("qts").desc, col(tiebreakCol).desc)
    val ranked = sessioned
      .withColumn("rn", row_number().over(asc))
      .withColumn("rnd", row_number().over(desc))
    val fe = ranked.filter(col("rn") === 1)
      .select(col("user_id"), col("sess"),
        col("event_type").as("entry_type"))
    val le = ranked.filter(col("rnd") === 1)
      .select(col("user_id"), col("sess"),
        col("event_type").as("exit_type"))
    fe.join(le, Seq("user_id", "sess"))
      .groupBy("entry_type", "exit_type")
      .agg(count(lit(1)).as("n_sessions"))
      .orderBy("entry_type", "exit_type")
  }

  /** TOP-K full session paths: the ordered event-type sequence of each
    * session's first `depth` events, joined " > ", counted across
    * sessions, top `k` by frequency — the "what do users actually DO in
    * a visit" report that `sessionPathMatrix` (entry × exit only)
    * aggregates away; the last common product-analytics table on the
    * session surface (the r12 verdict's item 5). Truncation at `depth`
    * is the standard report convention (paths explode combinatorially
    * past a few steps) and bounds the path string.
    *
    * Shape: the shared `sessionized` exchange, ONE per-session
    * row_number (user-keyed window), a per-session ordered-struct
    * collect (collect_list is order-nondeterministic; `rn` is unique per
    * session, so the struct array_sort IS the positional sort — the q171
    * rebuild idiom), a path census, and a distributed
    * TakeOrderedAndProject(k) — no global-order window anywhere.
    * Deterministic total order: (n_sessions DESC, path) is unique.
    */
  def topSessionPaths(events: DataFrame, gapNs: Long, depth: Int = 4,
                      k: Int = 15, tiebreakCol: String = "event_id",
                      quantumNs: Long = 1L): DataFrame = {
    require(depth >= 1, "depth must be >= 1")
    require(k >= 1, "k must be >= 1")
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess").orderBy(col("qts"), col(tiebreakCol))
    sessionized(events, gapNs, tiebreakCol, quantumNs)
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= depth)
      .groupBy("user_id", "sess")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        s => s.getField("event_type")), " > ").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }

  /** Inter-arrival-time histogram per event type, log₂ buckets: for each
    * consecutive pair of a user's events, the gap to the NEXT event
    * bucketed by ⌊log₂ gap⌋ and attributed to the EARLIER event's type —
    * the burstiness / dead-time profile behind every session-gap choice
    * (pick `gapNs` where this histogram's antimode sits, instead of
    * folklore). Zero gaps (same quantized instant) and each user's last
    * event carry no bucket and are excluded — identically both engines.
    *
    * Exactness: the bucket is `length(bin(gap)) - 1` — pure integer bit
    * arithmetic, NOT floor(log2(double)) whose ulp wobble at power-of-2
    * boundaries is exactly the cross-engine hazard class the parity
    * rules ban. One user-keyed window (lead), then a census agg.
    */
  def interArrivalHistogram(events: DataFrame,
                            tiebreakCol: String = "event_id",
                            quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col(tiebreakCol))
    events
      .select(col("user_id"), col("event_type"),
        expr(s"ts div ${quantumNs}L").as("qts"), col(tiebreakCol))
      .withColumn("gap", lead("qts", 1).over(w) - col("qts"))
      .filter(col("gap").isNotNull && col("gap") > 0)
      .select(col("event_type"),
        (length(bin(col("gap"))) - 1).cast("long").as("log2_bucket"))
      .groupBy("event_type", "log2_bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("event_type", "log2_bucket")
  }

  /** Conversion rate BY SESSION ENTRY TYPE — which landing event
    * converts: each session is attributed to its FIRST event's type
    * (deterministic `(qts, tiebreak)` order) and scored by whether the
    * session contains `convType` at all. The channel-performance table
    * the session funnel (q168) aggregates away. Exact integer rate.
    *
    * Shape: the q113 sessionization exchange, one per-session
    * row_number for the entry, a DISTINCT converted-session set, and a
    * session-keyed left join — per-session rows throughout, never
    * event×event.
    */
  def entryConversion(events: DataFrame, convType: String, gapNs: Long,
                      tiebreakCol: String = "event_id",
                      quantumNs: Long = 1L): DataFrame = {
    val sessioned = sessionized(events, gapNs, tiebreakCol, quantumNs)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess")
      .orderBy(col("qts"), col(tiebreakCol))
    val entries = sessioned
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("sess"),
        col("event_type").as("entry_type"))
    val conv = sessioned.filter(col("event_type") === convType)
      .select("user_id", "sess").distinct()
      .withColumn("__c", lit(1L))
    entries.join(conv, Seq("user_id", "sess"), "left")
      .groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        coalesce(sum("__c"), lit(0L)).as("n_converted"))
      .select(col("entry_type"), col("n_sessions"), col("n_converted"),
        expr("n_converted * 1000L div n_sessions").as("conv_permille"))
      .orderBy("entry_type")
  }

  /** Event-time LATENESS census — the number that CHOOSES a watermark:
    * treating the monotone `event_id` as ingestion order, an event's
    * lateness is how far its event time trails the maximum event time
    * already ingested. One row: events, late events, total and max
    * lateness (quantized units) — `max_late` IS the lossless watermark
    * delay, and the late-count at a candidate delay is the data the
    * streaming operators' `delay` parameter should be read against.
    *
    * Shape note (the q116/q149 discipline): the running max over
    * ingestion order is inherently a GLOBAL-order window; this audit
    * form runs it directly (the output is ONE row — the window input is
    * the event stream itself, so at 100 TB this runs as the two-pass
    * per-partition prefix-max the shardedRanks machinery implements;
    * the one-pass window here is the oracle-refereed audit view).
    */
  def latenessCensus(events: DataFrame,
                     tiebreakCol: String = "event_id",
                     quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(tiebreakCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    events
      .select(col(tiebreakCol), expr(s"ts div ${quantumNs}L").as("qts"))
      .withColumn("late",
        greatest(max("qts").over(w) - col("qts"), lit(0L)))
      .agg(count(lit(1)).as("n_events"),
        coalesce(sum(when(col("late") > 0, 1L)), lit(0L)).as("n_late"),
        coalesce(sum("late"), lit(0L)).as("sum_late"),
        coalesce(max("late"), lit(0L)).as("max_late"))
  }

  /** `latenessCensus` computed the sharded way — the SHIPPED form: the
    * running event-time max over ingestion order comes from
    * `Layout.shardedRunningMax` (two-pass per-partition prefix-max —
    * range exchange, one Long per partition to the driver, streaming
    * second pass), so no single task ever sorts the whole event stream.
    * Identical output to the one-pass global-order window form above,
    * which stays as the spec referee (BehaviorSpec pins equality).
    */
  def latenessCensusSharded(events: DataFrame,
                            tiebreakCol: String = "event_id",
                            quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val q = events
      .select(col(tiebreakCol), expr(s"ts div ${quantumNs}L").as("qts"))
    Layout.shardedRunningMax(q, Seq(tiebreakCol), "qts")
      .withColumn("late",
        greatest(coalesce(col("run_max_prev"), col("qts")) - col("qts"),
          lit(0L)))
      .agg(count(lit(1)).as("n_events"),
        coalesce(sum(when(col("late") > 0, 1L)), lit(0L)).as("n_late"),
        coalesce(sum("late"), lit(0L)).as("sum_late"),
        coalesce(max("late"), lit(0L)).as("max_late"))
  }

  /** User GROWTH curve: per day, first-time users and the cumulative
    * total — the acquisition chart. First-seen day is a per-user min
    * (one keyed agg); the cumulative sum is a global window over the
    * DAY census (thousands of rows at any corpus size — the q108
    * aggregated-window posture). Exact integers.
    */
  def userGrowthCurve(events: DataFrame,
                      dayNs: Long = 86400000000000L): DataFrame = {
    require(dayNs >= 1, "dayNs must be >= 1")
    val days = events
      .select(col("user_id"), expr(s"ts div ${dayNs}L").as("day"))
      .groupBy("user_id").agg(min("day").as("first_day"))
      .groupBy(col("first_day").as("day"))
      .agg(count(lit(1)).as("n_new"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    days.withColumn("n_cumulative", sum("n_new").over(w)).orderBy("day")
  }

  /** Session-level event-type AFFINITY (market-basket lift over
    * sessions): for each unordered type pair, the sessions containing
    * BOTH and the lift `P(a,b) / (P(a)·P(b))` — "users who hit X in a
    * visit also hit Y" with co-incidence normalized away from the
    * types' base rates, which a raw co-count conflates. Lift is the
    * exact integer `n_both·n_sessions·10⁶ div (n_a·n_b)` — no float
    * anywhere.
    *
    * Shape: the q113 sessionization (one user-keyed exchange), then a
    * DISTINCT (session, type) reduction — per-session rows are bounded
    * by |event types|, so the pair self-join is sessions × types²/2,
    * never event×event; the margins and total are census-sized.
    */
  def sessionAffinity(events: DataFrame, gapNs: Long,
                      tiebreakCol: String = "event_id",
                      quantumNs: Long = 1L): DataFrame = {
    val st = sessionized(events, gapNs, tiebreakCol, quantumNs)
      .select("user_id", "sess", "event_type")
      .distinct()
    val total = st.select("user_id", "sess").distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val margin = st.groupBy(col("event_type"))
      .agg(count(lit(1)).as("__n"))
    val pairs = st.as("a")
      .join(st.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.sess") === col("b.sess") &&
          col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("type_a"),
        col("b.event_type").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(margin.select(col("event_type").as("type_a"),
        col("__n").as("n_a"))), "type_a")
      .join(broadcast(margin.select(col("event_type").as("type_b"),
        col("__n").as("n_b"))), "type_b")
      .crossJoin(broadcast(total))
      .select(col("type_a"), col("type_b"), col("n_both"),
        // decimal(38,0) headroom: the Long form overflows once
        // n_both·n_sessions crosses ~9.2e12 (≈3M sessions with common
        // pairs) — ANSI throw / silent wrap depending on mode. div on
        // decimals still returns LONG, so the schema is unchanged; the
        // oracle mirrors with HUGEINT (the q134-family convention).
        expr("cast(n_both as decimal(38,0)) * n_sessions * 1000000" +
          " div (cast(n_a as decimal(38,0)) * n_b)")
          .as("lift_q6"))
      .orderBy("type_a", "type_b")
  }

  /** Forward-fill (last observation carried forward) per key — the
    * standard time-series imputation: a NULL value takes the key's most
    * recent non-null value in `(qts, tiebreak)` order; leading NULLs
    * (no prior observation) stay NULL rather than inventing data. The
    * sensor-gap / sparse-telemetry prep every sessionized metric
    * assumes has already happened.
    *
    * One keyed window (`last(..., ignoreNulls)` over the running
    * frame) — the q113 single-exchange posture; `quantumNs` quantizes
    * the ordering timestamps exactly as sessionStats so an oracle
    * engine reading the ns fixtures at µs precision sorts identically
    * (fill results DEPEND on order, so order parity is correctness
    * here, not cosmetics).
    */
  def forwardFill(events: DataFrame, valueCol: String,
                  tiebreakCol: String = "event_id",
                  quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col(tiebreakCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    events
      .select(col(tiebreakCol), col("user_id"),
        expr(s"ts div ${quantumNs}L").as("qts"), col(valueCol))
      .withColumn("value_filled",
        last(col(valueCol), ignoreNulls = true).over(w))
      .select(col(tiebreakCol), col("user_id"), col("value_filled"))
      .orderBy(tiebreakCol)
  }

  /** Per-state DWELL-TIME census: for each event type, how long users
    * sit in it before their next event — count of observed dwells
    * (a user's last event has none), total and max dwell in quantized
    * units. The time-weighted face of `transitionCensus`'s count matrix:
    * "users click quickly but stall on checkout" is a dwell statement,
    * invisible in transition counts. Exact integers; mean = sum/n is
    * the consumer's one division.
    *
    * Same single user-keyed window as transitionCensus (lead instead of
    * lag — one exchange), same `(qts, tiebreak)` deterministic order,
    * same `quantumNs` oracle-parity quantization as sessionStats.
    */
  def dwellTimeCensus(events: DataFrame,
                      tiebreakCol: String = "event_id",
                      quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col(tiebreakCol))
    events
      .select(col("user_id"), expr(s"ts div ${quantumNs}L").as("qts"),
        col(tiebreakCol), col("event_type"))
      .withColumn("dwell", lead("qts", 1).over(w) - col("qts"))
      .filter(col("dwell").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_dwells"), sum("dwell").as("sum_dwell"),
        max("dwell").as("max_dwell"))
      .orderBy("event_type")
  }

  /** Conversion-latency distribution: for users whose earliest `to`
    * event follows their earliest `from` event, the discrete rank
    * percentiles (value at ⌈p·n⌉ — the winsorize convention: ranked
    * VALUES from the data, never interpolated) of `t_to − t_from`,
    * plus the converting-user count. Integer arithmetic end to end.
    *
    * `quantumNs` floors timestamps to a coarser grid BEFORE the min —
    * floor commutes with min, so this equals quantizing the mins.
    * Default 1 (full ns); an oracle engine that reads the ns fixtures
    * at µs precision (DuckDB's TIMESTAMP) needs 1000, which also makes
    * the `t_to > t_from` conversion test identical on both sides —
    * quantize-then-compare, or a sub-quantum conversion counts on one
    * engine only. `unitSuffix` names the percentile columns to match.
    */
  def conversionLatency(events: DataFrame, from: String, to: String,
                        ps: Seq[Double] = Seq(0.5, 0.9),
                        quantumNs: Long = 1L,
                        unitSuffix: String = "ns"): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      "percentiles must be in (0, 1]")
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val qts = expr(s"ts div ${quantumNs}L")
    val f = events.filter(col("event_type") === from)
      .groupBy("user_id").agg(min(qts).as("t_from"))
    val t = events.filter(col("event_type") === to)
      .groupBy("user_id").agg(min(qts).as("t_to"))
    val lat = f.join(t, "user_id")
      .filter(col("t_to") > col("t_from"))
      .select(col("user_id"), (col("t_to") - col("t_from")).as("lat"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("lat"), col("user_id"))
    val ranked = lat
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy()))
    val aggs = count(lit(1)).as("n_converted") +: ps.map { p =>
      max(when(col("rn") ===
        greatest(ceil(lit(p) * col("n")).cast("long"), lit(1L)),
        col("lat"))).as(s"p${(p * 100).round}_$unitSuffix")
    }
    ranked.agg(aggs.head, aggs.tail: _*)
  }

  /** Weekly cohort retention: users cohorted by the calendar week (epoch
    * week = ts div 7·86400·10⁹ ns) of their first event; cell (cohort,
    * offset) = distinct users of that cohort active `offset` weeks later,
    * for offsets 0..`maxOffset`. Offset 0 is the cohort size (every user
    * is active in their first week by definition) — the standard
    * triangle-shaped retention table, as exact integers.
    *
    * Shape: per-user min-week aggregate, distinct (user, week) activity
    * set, one join on user_id (both sides pre-aggregated), then a
    * two-level count — no fact-row exchange.
    */
  /** Rolling distinct active users — the DAU/WAU dashboard staple, EXACT.
    * Sliding distinct counts cannot be summed from daily partials
    * (distinct is not additive), and the naive per-day range self-join is
    * quadratic; the standard exact plan is WINDOW-MEMBERSHIP EXPLODE:
    * each distinct (day, user) row contributes to the `windowDays`
    * windows ending on day..day+windowDays−1, so WAU(d) = distinct users
    * in (d−windowDays, d] falls out of a plain two-level count. The ×7
    * explode runs on the per-(day, user) DEDUPED frame — bounded by
    * active users × days, not raw events, which the first distinct
    * collapses in its map-side partial.
    *
    * Output: (day, dau, wau) for every day with ≥1 event (the dau side
    * of the inner join pins the observed-day set; window ends beyond the
    * horizon drop out).
    */
  def rollingActiveUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val du = distinctDayUser(events)
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val wa = du
      .select(explode(sequence(col("day"),
        col("day") + (windowDays - 1))).as("day"), col("user_id"))
      .distinct()
      .groupBy("day").agg(count(lit(1)).as("wau"))
    dau.join(wa, Seq("day")).orderBy("day")
  }

  /** Shared spine for the rolling-actives family: one distinct
    * (day, user_id) pair per active user-day, day = ts at nanosecond
    * precision floor-divided to UTC days. The first distinct is the
    * whole scale story — everything downstream is bounded by
    * active-pairs, never raw events.
    */
  private def distinctDayUser(events: DataFrame): DataFrame = {
    val dayNs = 86400L * 1000000000L
    events
      .select(expr(s"ts div ${dayNs}L").as("day"), col("user_id"))
      .distinct()
  }

  /** Exponentially-decayed trailing count per period: for each period t,
    * `decayed_n = Σ_{g=0..window-1} n_{t−g} · 2^−g` over the OBSERVED
    * periods in the trailing frame (gaps contribute nothing — the q106
    * no-silent-bridging law). The EWMA-style trend signal with a hard
    * horizon, kept hash-exact by construction: the decay base is fixed at
    * ½, so every weight is a dyadic rational (`1 / (1 << g)`), every
    * term `count · 2^−g` is exactly representable, and the sum is exact
    * in ANY addition order — no float rounding exists for an oracle
    * engine to disagree with.
    *
    * Shape: the raw scan collapses to one row per period in a partial
    * agg; the decay is a self-join of that period table against itself
    * over a `window`-bounded gap — size (periods × window), independent
    * of row count. At 100 TB the period table for years of daily data is
    * thousands of rows: the join broadcasts and nothing after the first
    * partial agg scales with data.
    */
  def decayedPeriodCounts(df: DataFrame, tsCol: String,
                          periodMs: Long = 86400000L,
                          window: Int = 8): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    require(window >= 1 && window <= 62, "need 1 <= window <= 62")
    val perPeriod = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"))
      .groupBy("period").agg(count(lit(1)).as("n"))
    val past = perPeriod
      .select(col("period").as("__p0"), col("n").as("__n0"))
    perPeriod.join(broadcast(past),
        col("__p0") <= col("period") &&
          col("__p0") > col("period") - window.toLong)
      .groupBy("period", "n")
      .agg(sum(col("__n0").cast("double") /
        expr("cast(shiftleft(1L, cast(period - __p0 as int)) as double)"))
        .as("decayed_n"))
      .orderBy("period")
  }

  /** `decayedPeriodCounts` over a VALUE instead of a row count: per
    * period t, `decayed_cents = Σ_{g=0..window-1} cents_{t−g} · 2^−g`
    * over the observed trailing periods — the decayed-revenue trend dial
    * (is this week's revenue momentum above the decayed baseline?).
    * `valueCents` must be integral (e.g. `round(o_totalprice·100)`):
    * the per-period sums are then exact int64, every decay term
    * `cents · 2^−g` is a dyadic rational exactly representable in
    * double, and the trailing sum is exact in any addition order — the
    * q145 hash-exactness argument verbatim, with sums for counts.
    *
    * Scale shape identical to q145: one map-side partial agg collapses
    * the fact scan to the period table; the decay self-join broadcasts
    * that table against itself over a window-bounded gap — thousands of
    * rows for years of daily data, independent of fact cardinality.
    */
  def decayedPeriodSums(df: DataFrame, tsCol: String,
                        valueCents: org.apache.spark.sql.Column,
                        periodMs: Long = 86400000L,
                        window: Int = 8): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    require(window >= 1 && window <= 62, "need 1 <= window <= 62")
    val perPeriod = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"), valueCents.cast("long").as("__v"))
      .groupBy("period").agg(sum("__v").as("cents"))
    val past = perPeriod
      .select(col("period").as("__p0"), col("cents").as("__c0"))
    perPeriod.join(broadcast(past),
        col("__p0") <= col("period") &&
          col("__p0") > col("period") - window.toLong)
      .groupBy("period", "cents")
      .agg(sum(col("__c0").cast("double") /
        expr("cast(shiftleft(1L, cast(period - __p0 as int)) as double)"))
        .as("decayed_cents"))
      .orderBy("period")
  }

  /** Burstiness census: the Fano factor (variance/mean of per-period
    * counts) per event type — Poisson-like arrivals sit at 1, bursty
    * traffic (retry storms, batch replays, crawl loops) well above,
    * metronomic heartbeats below. Computed integer-exactly with cleared
    * denominators (the q146 device): Fano = (m·Q − S²)/(m·S) with
    * m = observed periods, S = Σn, Q = Σn², reported as
    * `fano_q3 = (m·Q − S²)·1000 div (m·S)` in decimal(38,0) so the
    * squares cannot wrap at cluster-scale counts (DuckDB promotes to
    * HUGEINT — both engines exact); `is_bursty ⇔ m·Q − S² > m·S` is the
    * same comparison with no division at all. Only OBSERVED periods
    * enter (a type's silent days are not zero-count samples — the q106
    * gap law; a zero-padded variant is a different estimator).
    *
    * Scale shape: one (type, period) partial agg collapses the scan,
    * then a types-sized census of sums — nothing holds more state than
    * |types| rows after the first agg.
    */
  def burstinessCensus(events: DataFrame,
                       periodMs: Long = 86400000L): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    val dayNs = periodMs * 1000000L
    events
      .select(col("event_type"), expr(s"ts div ${dayNs}L").as("p"))
      .groupBy("event_type", "p").agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("m"), sum("n").as("s"),
        sum(expr("n * n")).as("q"))
      .select(col("event_type"), col("m"),
        expr("cast((cast(m as decimal(38,0)) * q - cast(s as" +
          " decimal(38,0)) * s) * 1000 div (cast(m as decimal(38,0))" +
          " * s) as bigint)").as("fano_q3"),
        expr("cast(m as decimal(38,0)) * q - cast(s as decimal(38,0))" +
          " * s > cast(m as decimal(38,0)) * s").as("is_bursty"))
      .orderBy("event_type")
  }

  /** Single-changepoint localization by binary segmentation: the split
    * of the per-period count series that maximizes the between-segment
    * sum of squares, f(i) = S_l²/i + S_r²/(m−i) — equivalently the
    * split minimizing total within-segment SSE under two constant
    * levels. q220's CUSUM flags THAT a level shift exists; this says
    * WHERE. The gain column (f_best − S²/m, the variance explained by
    * splitting) is the stopping criterion a recursive segmentation
    * would threshold on. Scores are doubles from exact integer
    * cumulative sums — one fixed-shape expression, bit-identical
    * across engines — and the argmax tiebreak is the ordinal, so the
    * chosen split is a pure function of the series.
    *
    * Scale shape: the fact scan collapses to the period table; ordinal
    * + cumulative sums are one window over that days-bounded table;
    * the argmax is a top-1. Nothing scales with fact rows.
    */
  def binarySegmentation(df: DataFrame, tsCol: String,
                         periodMs: Long = 86400000L): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    val c = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"))
      .groupBy("period").agg(count(lit(1)).as("n"))
    val wOrd = org.apache.spark.sql.expressions.Window.orderBy("period")
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    c.withColumn("i", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy("period")))
      .withColumn("sl", sum("n").over(wOrd))
      .withColumn("m", count(lit(1)).over(wAll))
      .withColumn("st", sum("n").over(wAll))
      .filter(col("i") < col("m"))
      .withColumn("f",
        expr("sl * sl / i + (st - sl) * (st - sl) / (m - i)"))
      .withColumn("gain", expr("round(f - st * st / m)"))
      .orderBy(col("f").desc, col("i"))
      .limit(1)
      .select(col("period").as("split_period"),
        col("i").cast("long").as("n_periods_left"),
        (col("m") - col("i")).cast("long").as("n_periods_right"),
        col("sl").as("sum_left"), (col("st") - col("sl")).as("sum_right"),
        col("gain").cast("long").as("gain"))
  }

  /** Seasonal-naive forecast backtest: predict each period's value with
    * the value one season earlier (pred(t) = v(t−season)) and census the
    * errors — n_days scored, MAE, and signed bias, all in exact cents
    * (mean = sum div n, the repo's integer-mean convention). The
    * monitoring primitive behind "did volume do what last week said it
    * would": a rising MAE is drift, a one-sided bias is growth the
    * seasonal-naive can't see. Scoring skips periods whose seasonal
    * parent is unobserved (gaps don't fabricate zero predictions — the
    * q106 no-silent-bridging law).
    *
    * Scale shape: one partial agg to the period table, a self-join on
    * period−season (period-table-sized, broadcasts), a one-row census.
    */
  def seasonalNaiveBacktest(df: DataFrame, tsCol: String,
                            valueCents: org.apache.spark.sql.Column,
                            periodMs: Long = 86400000L,
                            season: Int = 7): DataFrame = {
    require(periodMs >= 1 && season >= 1, "periodMs and season >= 1")
    val per = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"), valueCents.cast("long").as("__v"))
      .groupBy("period").agg(sum("__v").as("cents"))
    val lagged = per.select((col("period") + season).as("period"),
      col("cents").as("pred"))
    per.join(broadcast(lagged), "period")
      .agg(count(lit(1)).as("n_scored"),
        sum(abs(col("cents") - col("pred"))).as("abs_err_cents"),
        sum(col("cents") - col("pred")).as("bias_cents"))
      .select(col("n_scored"),
        // nullif guards the empty backtest (ANSI division by zero)
        expr("abs_err_cents div nullif(n_scored, 0)").as("mae_cents"),
        col("bias_cents"))
  }

  /** Kaplan–Meier table for time-to-conversion WITH censoring: per
    * whole-day bucket k since a user's first event, how many users were
    * still at risk, how many converted (first `convType` event) exactly
    * at k, and how many were censored at k (never converted — their
    * observation ends at the corpus horizon, the global max ts). These
    * integer columns are KM's sufficient statistics: S(k) =
    * Π_{j≤k} (1 − d_j/n_j) follows by a driver-side fold, kept OUT of
    * the operator because a cumulative float product is not
    * hash-exact — the q260 survival curve ignores censoring and this
    * is the estimator that doesn't (dropping never-converters, as a
    * naive conversion-latency census does, biases conversion optimism
    * upward).
    *
    * Scale shape: one per-user partial agg (min ts, min conversion ts)
    * collapses the event scan; the horizon is a one-row broadcast; the
    * day census is horizon-bounded and the at-risk suffix sum is one
    * window over that census (the q260 device).
    */
  def kaplanMeierTable(events: DataFrame,
                       convType: String = "purchase"): DataFrame = {
    val dayNs = 86400L * 1000000000L
    val per = events.groupBy("user_id").agg(
      min(col("ts")).as("t0"),
      min(when(col("event_type") === convType, col("ts"))).as("tp"))
    val horizon = events.agg(max(col("ts")).as("__T"))
    val census = per.crossJoin(broadcast(horizon))
      .select(
        when(col("tp").isNotNull, expr(s"(tp - t0) div ${dayNs}L"))
          .otherwise(expr(s"(__T - t0) div ${dayNs}L")).as("k"),
        col("tp").isNotNull.as("ev"))
      .groupBy("k").agg(
        sum(when(col("ev"), 1L).otherwise(0L)).as("n_events"),
        sum(when(col("ev"), 0L).otherwise(1L)).as("n_censored"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("k").desc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    census
      .withColumn("n_at_risk",
        sum(col("n_events") + col("n_censored")).over(w))
      .select(col("k"), col("n_at_risk"), col("n_events"),
        col("n_censored"))
      .orderBy("k")
  }

  /** Theil–Sen robust trend: the (lower-)median of all pairwise slopes
    * (n_j − n_i)/(p_j − p_i) over the per-period count table — the
    * outlier-immune answer to "is volume trending up?" (one crazy day
    * shifts an OLS slope arbitrarily; it moves this median by one
    * rank). The median ELEMENT is selected, not averaged: ordering is
    * (double slope, dt, p_i, p_j) — the double division of exact int64
    * operands is bit-identical across engines, and the integer
    * tiebreak pins rationals that collide in double — so the reported
    * (med_dn, med_dt) pair is a pure function of the data, and
    * slope_q6 = sign·(|dn|·10⁶ div dt) is computed sign-split because
    * Spark's `div` truncates toward zero while DuckDB's `//` floors —
    * they agree only on non-negative operands.
    *
    * Scale shape: the fact scan collapses to the period table in one
    * partial agg; pairs are periods² — thousands of daily periods give
    * millions of pairs, independent of fact cardinality (years of
    * dailies ≈ 10⁶–10⁷ pairs: one broadcast self-join). The median
    * rank is selected by `Layout.shardedRanks` (range-partitioned
    * two-pass rank), NOT a global-order window — the single-task sort
    * of the pair set was this query's measured wall (~10 s at 2.9M
    * pairs, the whole suite's slowest entry) and the q129 sharded-rank
    * device removes it. For decade-scale minute granularity,
    * pre-bucket periods before calling (the resolution, not the
    * corpus, is the knob).
    */
  def theilSenTrend(df: DataFrame, tsCol: String,
                    periodMs: Long = 86400000L): DataFrame = {
    require(periodMs >= 1, "periodMs must be >= 1")
    val c = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("p"))
      .groupBy("p").agg(count(lit(1)).as("n"))
    val pairs = c.as("a").join(broadcast(c.as("b")),
        col("a.p") < col("b.p"))
      .select((col("b.n") - col("a.n")).as("dn"),
        (col("b.p") - col("a.p")).as("dt"),
        col("a.p").as("pi"), col("b.p").as("pj"))
      .withColumn("slope", col("dn").cast("double") / col("dt").cast("double"))
    val (ranked, n) = graft.ops.Layout.shardedRanksWithTotal(
      pairs.select(col("slope"), col("dt"), col("pi"), col("pj"),
        col("dn")),
      Seq("slope", "dt", "pi", "pj"))
    ranked.filter(col("rnk") === lit((n + 1) / 2))
      .select(lit(n).as("n_pairs"), col("dn").as("med_dn"),
        col("dt").as("med_dt"),
        expr("case when dn >= 0 then dn * 1000000 div dt" +
          " else -((-dn) * 1000000 div dt) end").as("slope_q6"))
  }

  /** Seasonal anomaly census: daily (or any-period) counts flagged
    * against their own position in the seasonal cycle — day-of-week by
    * default — using the per-season population mean/variance over the
    * whole span. A count is anomalous iff `|x − μ_s| > k·σ_s`, evaluated
    * INTEGER-EXACTLY by clearing denominators:
    * `(m·x − S)² > k²·(m·Q − S²)` with m = season size, S = Σx, Q = Σx²
    * — no float ever enters the decision, so the flag is bit-identical
    * on any engine. The squares are computed in DECIMAL(38,0): counts
    * near 2³¹ would overflow BIGINT squared, and a silent Long wraparound
    * would flip flags at exactly the 100 TB scales this targets.
    *
    * Shape: two stacked partial aggs (per-period, then per-season over
    * ≤ `seasonLen` rows) and a broadcast join back — nothing after the
    * first partial agg scales with data.
    */
  def seasonalAnomalies(df: DataFrame, tsCol: String,
                        periodMs: Long = 86400000L,
                        seasonLen: Int = 7,
                        k: Long = 2L): DataFrame = {
    require(periodMs >= 1 && seasonLen >= 1 && k >= 1,
      "need positive period/seasonLen/k")
    val perPeriod = df
      .select(expr(
        s"unix_millis(cast(`$tsCol` as timestamp)) div ${periodMs}L")
        .as("period"))
      .groupBy("period").agg(count(lit(1)).as("n"))
      .withColumn("season", pmod(col("period"), lit(seasonLen.toLong)))
    val bySeason = perPeriod.groupBy("season")
      .agg(count(lit(1)).as("m"), sum("n").as("s"),
        sum(col("n").cast("decimal(38,0)") * col("n")).as("q"))
    perPeriod.join(broadcast(bySeason), Seq("season"))
      .select(col("period"), col("season"), col("n"),
        ((col("m") * col("n") - col("s")).cast("decimal(38,0)") *
          (col("m") * col("n") - col("s")) >
          lit(k * k) * (col("m").cast("decimal(38,0)") * col("q") -
            col("s").cast("decimal(38,0)") * col("s")))
          .as("is_anomaly"))
      .orderBy("period")
  }

  /** Multi-touch LINEAR attribution: every conversion event distributes
    * one unit of credit equally across the user's touch events in the
    * lookback window `(t_conv − windowNs, t_conv]` — the assignment
    * table `(conv, touch, n_touches)` with credit the exact rational
    * `1/n_touches` (numerator/denominator, never a float — summing
    * per-touch credit downstream is Σ 1/d, left to the caller's
    * precision policy). Conversions with zero touches surface with a
    * NULL touch and `n_touches = 0` (unattributed conversions are the
    * first thing an attribution report gets asked about).
    *
    * Shape: the touch×conversion pairing is `Joins.rangeJoinBinned` —
    * touches as points, conversions as `[t−w+1, t+1)` intervals keyed on
    * the user — so the match is an equi-join on (user, time-bin), never
    * a raw inequality join; the per-conversion count rides a window over
    * the already-bounded pair set.
    */
  def linearAttribution(events: DataFrame,
                        touchType: String = "click",
                        convType: String = "purchase",
                        windowNs: Long = 3600L * 1000000000L): DataFrame = {
    require(windowNs >= 1, "windowNs must be >= 1")
    val touches = events.filter(col("event_type") === touchType)
      .select(col("user_id"), col("event_id").as("touch_id"),
        col("ts").as("touch_ts"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("user_id"), col("event_id").as("conv_id"),
        (col("ts") - windowNs + 1L).as("w_start"),
        (col("ts") + 1L).as("w_end"))
    val pairs = Joins.rangeJoinBinned(touches, convs,
      key = "user_id", pointTime = "touch_ts",
      start = "w_start", end = "w_end", binWidth = windowNs)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("conv_id")
    // pinned: the unattributed anti-join AND the final union both read
    // this frame — unpinned, the touch-window join ran twice (the q53
    // pattern, plan-audit sweep round 15)
    val attributed = pairs
      .withColumn("n_touches", count(lit(1)).over(w))
      .select(col("user_id"), col("conv_id"), col("touch_id"),
        (col("w_end") - 1L - col("touch_ts")).as("gap_ns"),
        col("n_touches"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // conversions nothing touched: left anti against the attributed set
    val unattributed = convs
      .join(attributed.select(col("conv_id").as("__c")).distinct(),
        col("conv_id") === col("__c"), "left_anti")
      .select(col("user_id"), col("conv_id"),
        lit(null).cast("long").as("touch_id"),
        lit(null).cast("long").as("gap_ns"), lit(0L).as("n_touches"))
    attributed.unionByName(unattributed)
      .orderBy("conv_id", "touch_id")
  }

  def cohortRetention(events: DataFrame, maxOffset: Int = 3): DataFrame = {
    require(maxOffset >= 0, "maxOffset must be >= 0")
    val weekNs = 7L * 86400L * 1000000000L
    val withWeek = events.select(col("user_id"),
      expr(s"ts div ${weekNs}L").as("week"))
    val cohorts = withWeek.groupBy("user_id")
      .agg(min("week").as("cohort_week"))
    val activity = withWeek.distinct()
    activity.join(cohorts, "user_id")
      .withColumn("offset", (col("week") - col("cohort_week")).cast("int"))
      .filter(col("offset") <= maxOffset)
      .groupBy("cohort_week", "offset")
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "offset")
  }

  /** Day-of-week × hour-of-day activity heatmap: the seasonality grid
    * behind capacity planning and the `seasonalAnomalies` baseline —
    * event counts per (dow, hour) cell with each cell's per-mille share
    * of the total. `dow` is 0=Sunday..6=Saturday in UTC, derived by
    * pure integer arithmetic on the quantized epoch (epoch day 0 was a
    * Thursday, hence the +4 shift maps it to 4) — no calendar
    * functions, so both engines compute the identical bucket from the
    * identical integer.
    *
    * Shape: one partial-agg census (≤168 groups survive the map side)
    * plus a broadcast 1-row total. Scale-invariant output.
    */
  def activityHeatmap(events: DataFrame,
                      quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val usPerDay = 86400000000L
    val cells = events
      .select(expr(s"ts div ${quantumNs}L").as("qts"))
      .select(expr(s"(qts div ${usPerDay}L + 4) % 7").as("dow"),
        expr(s"(qts % ${usPerDay}L) div 3600000000L").as("hod"))
      .groupBy("dow", "hod").agg(count(lit(1)).as("n"))
    val total = cells.agg(sum("n").as("__tot"))
    cells.crossJoin(broadcast(total))
      .select(col("dow"), col("hod"), col("n"),
        expr("n * 1000L div __tot").as("share_permille"))
      .orderBy("dow", "hod")
  }

  /** Lag-k autocorrelation of the DAILY event-count series, k = 1..
    * `maxLag` — the periodicity detector (a weekly cycle shows as a
    * peak at lag 7) that tells you whether `seasonalAnomalies`' dow
    * baseline is even justified on this stream. Days with no events
    * count as 0 via a dense day fill (A7 semantics on the day axis);
    * Pearson r per lag over the aligned (x_t, x_{t+lag}) pairs.
    *
    * Exactness: counts are integers, so every sum (Σx, Σy, Σxy, Σx²,
    * Σy²) is EXACT in decimal(38,0) (HUGEINT in the oracle); only the
    * final r = num/(√denA·√denB) touches doubles, each step an IEEE
    * correctly-rounded op applied to identical operands both engines —
    * then quantized ×1e6. denA·denB would need ~50 digits; √denA·√denB
    * stays in range (the q134-family overflow discipline).
    *
    * Shape: one day census (partial-agg), a days-bounded dense fill
    * from a 1-row extent, a `maxLag`-row broadcast lag dim, one
    * days×lags self-equi-join on (day+lag), one final census — every
    * frame after the first agg is DAYS-bounded, not event-bounded.
    */
  def dailyAutocorrelation(events: DataFrame, maxLag: Int = 7,
                           quantumNs: Long = 1L): DataFrame = {
    require(maxLag >= 1, "maxLag must be >= 1")
    val usPerDay = 86400000000L
    val counts = events
      .select(expr(s"ts div ${quantumNs}L div ${usPerDay}L").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = counts.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val lags = dense.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("lag"))
    val pairs = dense.crossJoin(broadcast(lags))
      .select(col("lag"), col("day"), col("n").as("x"),
        (col("day") + col("lag")).as("day2"))
      .join(dense.select(col("day").as("day2"), col("n").as("y")), "day2")
    pairs
      .groupBy("lag")
      .agg(count(lit(1)).cast("decimal(38,0)").as("np"),
        sum("x").cast("decimal(38,0)").as("sx"),
        sum("y").cast("decimal(38,0)").as("sy"),
        // per-term decimal BEFORE the multiply: x·y at 1e9 events/day
        // already brushes Long range, and the sums certainly exceed it
        sum(expr("cast(x as decimal(19,0)) * y")).cast("decimal(38,0)")
          .as("sxy"),
        sum(expr("cast(x as decimal(19,0)) * x")).cast("decimal(38,0)")
          .as("sxx"),
        sum(expr("cast(y as decimal(19,0)) * y")).cast("decimal(38,0)")
          .as("syy"))
      .select(col("lag"), col("np").cast("long").as("n_pairs"),
        expr("""cast(round(1000000 * cast(np*sxy - sx*sy as double) /
          nullif(sqrt(cast(np*sxx - sx*sx as double)) *
                 sqrt(cast(np*syy - sy*sy as double)), 0d)) as bigint)""")
          .as("acf_q6"))
      .orderBy("lag")
  }

  /** First-order Markov transition matrix over event types: for each
    * user's event stream in `(ts, event_id)` order, count consecutive
    * `(from_type, to_type)` pairs, then the per-mille transition
    * probability within each from_type row — the navigation model
    * behind "what do users do after X".
    *
    * Scale shape: ONE user-keyed window (lead) on the same exchange
    * every session-family query uses — partitions stay per-user sized
    * at any corpus scale — then a census bounded by |types|² and a
    * types-sized self-join for the row totals. Timestamps quantize to
    * µs first (`quantumNs`) so the window order is engine-portable.
    */
  def transitionMatrix(events: DataFrame,
                       quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col("event_id"))
    val counts = events
      .select(col("user_id"), col("event_id"),
        expr(s"ts div ${quantumNs}L").as("qts"), col("event_type"))
      .select(col("event_type").as("from_type"),
        lead("event_type", 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("from_type").as("__ft"))
      .agg(sum("n").as("__t"))
    counts
      .join(totals, col("from_type") === col("__ft"))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000L div __t").as("p_permille"))
      .orderBy("from_type", "to_type")
  }

  /** CUSUM changepoint scan over the daily event-count series: the
    * classic "did the level shift, and when" detector. For day i of D
    * (dense-filled, A7 semantics) with prefix sum P_i and total T, the
    * INTEGER-scaled cusum S_i = D·P_i − i·T (the usual P_i − i·T/D
    * times D, kept exact); the peak |S_i| marks the most likely
    * changepoint. Emits the full day series with `is_peak` flags.
    *
    * Scale shape: one event partial agg to a DAYS-bounded frame; the
    * prefix sum, ranks and the peak broadcast all live on that
    * days-sized series (the q209 regime) — the ordered window is
    * day-count-bounded, never event-bounded. Products run in
    * decimal(38,0): D·P brushes Long at ~10⁵ days × 10¹⁴ events.
    */
  def cusumChangepoint(events: DataFrame,
                       quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val usPerDay = 86400000000L
    val counts = events
      .select(expr(s"ts div ${quantumNs}L div ${usPerDay}L").as("day"))
      .groupBy("day").agg(count(lit(1)).as("n"))
    val dense = counts.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .join(counts, Seq("day"), "left")
      .select(col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val cum = w.rowsBetween(org.apache.spark.sql.expressions.Window
      .unboundedPreceding, 0)
    // days-bounded frame: the global-order window here ranks DAYS (the
    // q209/q149 audit-view precedent), not events
    val scored = dense
      .withColumn("pre", sum("n").over(cum).cast("decimal(38,0)"))
      .withColumn("i", row_number().over(w).cast("decimal(38,0)"))
      .crossJoin(broadcast(dense.agg(
        count(lit(1)).cast("decimal(38,0)").as("__d"),
        sum("n").cast("decimal(38,0)").as("__t"))))
      .select(col("day"), col("n"),
        expr("cast(__d * pre - i * __t as bigint)").as("cusum_scaled"))
    val peak = scored.agg(max(abs(col("cusum_scaled"))).as("__mx"))
    scored.crossJoin(broadcast(peak))
      .select(col("day"), col("n"), col("cusum_scaled"),
        (abs(col("cusum_scaled")) === col("__mx")).as("is_peak"))
      .orderBy("day")
  }

  /** Time-to-convert decile profile: for each user who viewed and then
    * purchased, the delta between their FIRST `fromType` event and the
    * first `toType` event at-or-after it, bucketed into `k`
    * equal-frequency tiers (the q155 sharded-ntile contract, user_id
    * tiebreak) with per-bucket min/max/count/sum — the funnel-latency
    * distribution report.
    *
    * Scale shape: two per-user min-aggregates (partial agg before any
    * join — never event×event), one user-keyed equi-join, then
    * `Profiling.quantileBuckets`' three range-partitioned rank passes
    * over the user-sized delta frame; no single-task sort anywhere.
    */
  def conversionDeciles(events: DataFrame, fromType: String = "view",
                        toType: String = "purchase", k: Int = 10,
                        quantumNs: Long = 1L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val e = events.select(col("user_id"), col("event_type"),
      expr(s"ts div ${quantumNs}L").as("qts"))
    val v0 = e.filter(col("event_type") === fromType)
      .groupBy("user_id").agg(min("qts").as("v0"))
    val p0 = e.filter(col("event_type") === toType)
      .join(v0, "user_id")
      .filter(col("qts") >= col("v0"))
      .groupBy("user_id").agg(min("qts").as("p0"), min("v0").as("v0"))
    val deltas = p0.select(col("user_id"),
      (col("p0") - col("v0")).as("delta_us"))
    Profiling.quantileBuckets(deltas, "user_id", "delta_us", "user_id", k)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), min("delta_us").as("min_us"),
        max("delta_us").as("max_us"), sum("delta_us").as("sum_us"))
      .orderBy("bucket")
  }

  /** Behavioral-entropy decile profile: each user's event-type Shannon
    * entropy — how varied their behavior is — bucketed into `k`
    * equal-frequency tiers (the q155 sharded-ntile contract) with
    * per-bucket count/min/max/sum. Low buckets are single-note users
    * (bots, crawlers); high buckets are diverse ones.
    *
    * Integer device (the q134 ln-parity family): H = ln N − Σnᵢln nᵢ/N
    * becomes h_q6 = round(10⁶·ln N) − (Σ round(10⁶·nᵢ·ln nᵢ)) div N —
    * each term quantized BEFORE the sum (order-independent), the sum
    * carried in decimal(38,0) (HUGEINT in the oracle: 10⁶·n·ln n tops
    * Long once a user-type cell nears 10¹¹ events).
    *
    * Scale shape: one (user, type) partial agg, one user-keyed
    * reduction to a users-sized frame, then quantileBuckets' three
    * range-partitioned rank passes — no single-task sort.
    */
  def entropyDeciles(events: DataFrame, k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = userEntropyQ6(events)
    Profiling.quantileBuckets(h, "user_id", "h_q6", "user_id", k)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), min("h_q6").as("min_q6"),
        max("h_q6").as("max_q6"), sum("h_q6").as("sum_q6"))
      .orderBy("bucket")
  }

  /** Pairwise Pearson correlation of the per-type daily count series —
    * do errors spike with views, do purchases move against clicks.
    * Each type's series dense-fills missing days to 0 (A7 semantics)
    * over the corpus' [min, max] day span so all series share a frame;
    * r_q6 = round(10⁶·(n·Σxy−ΣxΣy)/(√(n·Σx²−(Σx)²)·√(n·Σy²−(Σy)²))) —
    * integer sums in decimal(38,0) end-to-end, then ONE sqrt·sqrt
    * division in double (sqrt is correctly rounded everywhere, the
    * q165 rule; the operands are bit-identical integers cross-engine).
    *
    * Scale shape: one (day, type) partial agg bounds everything after
    * at days×|types|; the dense frame is a sequence explode against a
    * broadcast types dim; the pair join is day-keyed with |types|²/2
    * output per day. The ordered window problem never arises — the
    * sums are plain aggregates.
    */
  def typeCorrelationMatrix(events: DataFrame,
                            quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val usPerDay = 86400000000L
    val cd = events
      .select(expr(s"ts div ${quantumNs}L div ${usPerDay}L").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val ty = cd.select("event_type").distinct()
    val dense = cd.agg(min("day").as("d0"), max("day").as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
      .crossJoin(broadcast(ty))
      .join(cd, Seq("day", "event_type"), "left")
      .select(col("day"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
    val a = dense.select(col("day"), col("event_type").as("t1"),
      col("n").as("x"))
    val b = dense.select(col("day").as("__day"),
      col("event_type").as("t2"), col("n").as("y"))
    a.join(b, col("day") === col("__day") && col("t1") < col("t2"))
      .groupBy("t1", "t2")
      .agg(count(lit(1)).cast("decimal(38,0)").as("nn"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum(col("y").cast("decimal(38,0)")).as("sy"),
        sum(col("x").cast("decimal(38,0)") * col("y")).as("sxy"),
        sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"),
        sum(col("y").cast("decimal(38,0)") * col("y")).as("syy"))
      .select(col("t1"), col("t2"), col("nn").cast("long").as("n_days"),
        Profiling.pearsonQ6("nn", "sx", "sy", "sxy", "sxx", "syy")
          .as("r_q6"))
      .orderBy("t1", "t2")
  }

  /** Per-user event-type Shannon entropy under the integer ln-device
    * (shared by q229's deciles and q236's intensity profile — one
    * definition of the quantization, two reports):
    * h_q6 = round(10⁶·ln N) − (Σ round(10⁶·nᵢ·ln nᵢ)) div N, each term
    * quantized BEFORE the decimal(38,0) sum so the result is order-
    * independent and engine-exact. Returns (user_id, h_q6).
    */
  private def userEntropyQ6(events: DataFrame): DataFrame = {
    val cnt = events.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    cnt.groupBy("user_id")
      .agg(sum("n").as("tot"),
        sum(expr("cast(round(1000000 * n * ln(n)) as bigint)")
          .cast("decimal(38,0)")).as("sterm"))
      .select(col("user_id"),
        (expr("cast(round(1000000 * ln(tot)) as bigint)") -
          expr("sterm div tot")).as("h_q6"))
  }

  /** Purchase intensity by behavioral-entropy decile: bucket users by
    * their event-type entropy (the q229 device), then per bucket the
    * purchase share of all events — do focused or diverse users buy
    * more. The report that turns the entropy census into an
    * actionable segmentation.
    *
    * Scale shape: the entropy frame and both per-user censuses are
    * users-sized partial aggs; the joins are user-keyed; the bucket
    * census ends at k rows. quantileBuckets provides the three
    * range-partitioned rank passes — no single-task sort.
    */
  def intensityByEntropyDecile(events: DataFrame,
                               purchaseType: String = "purchase",
                               k: Int = 10): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = userEntropyQ6(events)
    val buckets = Profiling.quantileBuckets(h, "user_id", "h_q6",
      "user_id", k).select("user_id", "bucket")
    val tot = events.groupBy("user_id").agg(count(lit(1)).as("n_all"))
    val pur = events.filter(col("event_type") === purchaseType)
      .groupBy(col("user_id").as("__u"))
      .agg(count(lit(1)).as("n_pur"))
    buckets
      .join(tot, "user_id")
      .join(pur, col("user_id") === col("__u"), "left")
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("n_pur"), lit(0L))).as("n_purchases"),
        sum("n_all").as("n_events"))
      .select(col("bucket"), col("n_users"), col("n_purchases"),
        col("n_events"),
        expr("n_purchases * 1000 div n_events").as("intensity_permille"))
      .orderBy("bucket")
  }

  /** Bounce rate per session entry type: the share of sessions that
    * end after their very first event, attributed to that event's
    * type — the standard landing-quality metric, on the same
    * sessionization (and 4-hour gap convention) as the rest of the
    * session family.
    *
    * Scale shape: rides `sessionized` (one user-keyed exchange for
    * both stacked windows); the per-session rollup reuses the same
    * keys, and the census ends at |types| rows.
    */
  def bounceRate(events: DataFrame, gapNs: Long,
                 tiebreakCol: String = "event_id",
                 quantumNs: Long = 1L): DataFrame = {
    val sessioned = sessionized(events, gapNs, tiebreakCol, quantumNs)
    val ws = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess")
      .orderBy(col("qts"), col(tiebreakCol))
    val wc = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id", "sess")
    sessioned
      .withColumn("rn", row_number().over(ws))
      .withColumn("n_ev", count(lit(1)).over(wc))
      .filter(col("rn") === 1)
      .groupBy(col("event_type").as("entry_type"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("entry_type"), col("n_sessions"), col("n_bounce"),
        expr("n_bounce * 1000 div n_sessions").as("bounce_permille"))
      .orderBy("entry_type")
  }

  /** Purchase-cadence regularity deciles: per user with ≥3 purchases,
    * the squared coefficient of variation of inter-purchase gaps —
    * CV² ≈ 0 is metronomic (bot-shaped), CV² ≈ 1 is Poisson-random,
    * large CV² is bursty — bucketed by the q155 sharded-ntile
    * contract. cv2_q6 = round(10⁶·n·(n·Σx²−(Σx)²)/((n−1)·(Σx)²)):
    * integer sums in decimal(38,0) (HUGEINT in the oracle), ONE double
    * division at the end (the q230 device). Safe while a user's
    * Σgap² stays under ~10³⁶ µs² (≈ 10³ gaps of 30 years each).
    *
    * Scale shape: gaps from one user-keyed lag window (per-user
    * partitions), then a users-sized reduction and quantileBuckets'
    * range-partitioned ranks — no single-task sort.
    */
  def cadenceRegularityDeciles(events: DataFrame,
                               eventType: String = "purchase",
                               k: Int = 10,
                               quantumNs: Long = 1L): DataFrame = {
    require(k >= 1 && quantumNs >= 1, "need positive k/quantum")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("qts"), col("event_id"))
    val gaps = events.filter(col("event_type") === eventType)
      .select(col("user_id"), col("event_id"),
        expr(s"ts div ${quantumNs}L").as("qts"))
      .withColumn("gap", col("qts") - lag("qts", 1).over(w))
      .filter(col("gap").isNotNull)
    val s = gaps.groupBy("user_id")
      .agg(count(lit(1)).cast("decimal(38,0)").as("n"),
        sum(col("gap").cast("decimal(38,0)")).as("sx"),
        sum(col("gap").cast("decimal(38,0)") * col("gap")).as("sxx"))
      .filter(col("n") >= 2)
    val cv = s.select(col("user_id"),
      expr("cast(round(1000000 * cast(n * (n * sxx - sx * sx) as" +
        " double) / cast((n - 1) * sx * sx as double)) as bigint)")
        .as("cv2_q6"))
    Profiling.quantileBuckets(cv, "user_id", "cv2_q6", "user_id", k)
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_users"), min("cv2_q6").as("min_q6"),
        max("cv2_q6").as("max_q6"))
      .orderBy("bucket")
  }

  /** Day-over-day type-share momentum — the "what's trending" report:
    * per (day, type), the event count, its permille share of that
    * day's events, and the share's delta against the prior day (NULL
    * on each type's first day).
    *
    * Scale shape: one (day, type) partial agg bounds everything at
    * days×|types| rows; the lag window partitions by TYPE over a
    * days-bounded frame (the q209 regime — never event-bounded).
    */
  def trendingTypes(events: DataFrame,
                    quantumNs: Long = 1L): DataFrame = {
    require(quantumNs >= 1, "quantumNs must be >= 1")
    val usPerDay = 86400000000L
    val cd = events
      .select(expr(s"ts div ${quantumNs}L div ${usPerDay}L").as("day"),
        col("event_type"))
      .groupBy("day", "event_type").agg(count(lit(1)).as("n"))
    val tot = cd.groupBy(col("day").as("__d")).agg(sum("n").as("__t"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("day")
    cd.join(tot, col("day") === col("__d"))
      .select(col("day"), col("event_type"), col("n"),
        expr("n * 1000 div __t").as("share_pm"))
      .withColumn("delta_pm",
        col("share_pm") - lag("share_pm", 1).over(w))
      .orderBy("day", "event_type")
  }

  /** Rolling 7-day active users per observed day, with same-day DAU and
    * the DAU/WAU stickiness ratio — the engagement health dial next to
    * q131's calendar-month actives (this one is a sliding window, so a
    * user counts on every day within `windowDays` of their activity).
    *
    * Scale shape: the count-distinct-over-a-sliding-window trap (a
    * range self-join of events, or a giant per-day state) is avoided by
    * the standard expansion trick — distinct (day, user) FIRST (one
    * ids-only shuffle bounds everything by active-pairs, not events),
    * then each pair expands to the ≤`windowDays` future days it keeps
    * the user active on (a Generate, no shuffle), distinct again, and
    * an inner join to the observed-day spine drops phantom days. All
    * costs scale with active-pairs × windowDays, never events × days.
    */
  def rollingActivesStickiness(events: DataFrame,
                               windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val du = distinctDayUser(events)
    val dau = du.groupBy("day").agg(count(lit(1)).as("dau"))
    val expanded = du
      .select(explode(sequence(col("day"),
        col("day") + lit(windowDays - 1))).as("day"), col("user_id"))
      .distinct()
      .groupBy(col("day").as("__d")).agg(count(lit(1)).as("active_wd"))
    dau.join(expanded, col("day") === col("__d"))
      .select(col("day"), col("dau"), col("active_wd"),
        expr("dau * 1000 div active_wd").as("stickiness_pm"))
      .orderBy("day")
  }

  /** CUPED variance-reduced experiment readout: per md5-split variant,
    * the post-period activity mean and its CUPED adjustment
    * ȳ_v − θ·(x̄_v − x̄), with θ = cov(x, y)/var(x) estimated on ALL
    * users from their PRE-period activity x — the industry-standard
    * trick that removes pre-existing user-level variance from the
    * treatment readout (and, under a deterministic hash split, any
    * accidental pre-period imbalance between arms). Pre/post is the
    * corpus-day midpoint ((min+max+1) div 2 — integer, data-derived,
    * engine-identical).
    *
    * Exactness: x, y are integer counts, so every θ ingredient —
    * n·Σxy − Σx·Σy over n·Σx² − (Σx)² — is an exact decimal(38,0)/
    * HUGEINT; the readout is ONE fixed-shape IEEE expression over
    * those integers (identically parenthesized in the oracle — the
    * q285 Wilson discipline), q6-quantized.
    *
    * Scale shape: one keyed partial agg to per-user (x, y), one global
    * and one per-variant partial agg over that (2-row output), the
    * 1-row global broadcast. No window.
    */
  def cupedReadout(events: DataFrame): DataFrame = {
    val e = events.select(col("user_id"),
      expr("ts div 86400000000000").as("day"))
    val rng = e.agg(min("day").as("mnd"), max("day").as("mxd"))
    val per = e.crossJoin(broadcast(rng))
      .select(col("user_id"),
        (col("day") < expr("(mnd + mxd + 1) div 2")).as("pre"))
      .groupBy("user_id")
      .agg(sum(when(col("pre"), 1L).otherwise(0L)).as("x"),
        sum(when(!col("pre"), 1L).otherwise(0L)).as("y"))
      .withColumn("variant",
        when(Sampling.splitBucket(col("user_id")) < 500, "A")
          .otherwise("B"))
    val glob = per.agg(count(lit(1)).as("n"),
      sum(col("x").cast("decimal(38,0)")).as("sx"),
      sum(col("y").cast("decimal(38,0)")).as("sy"),
      sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
      sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
    per.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("x").cast("decimal(38,0)")).as("sxv"),
        sum(col("y").cast("decimal(38,0)")).as("syv"))
      .crossJoin(broadcast(glob))
      .select(col("variant"), col("n_users"),
        expr("""cast(round(1000000 * (cast(syv as double) /
          cast(n_users as double))) as bigint)""").as("mean_y_q6"),
        expr("""cast(round(1000000 * (cast(n * sxy - sx * sy as double) /
          nullif(cast(n * sxx - sx * sx as double), 0d)))
          as bigint)""").as("theta_q6"),
        expr("""cast(round(1000000 * ((cast(syv as double) /
          cast(n_users as double)) -
          (cast(n * sxy - sx * sy as double) /
           nullif(cast(n * sxx - sx * sx as double), 0d)) *
          ((cast(sxv as double) / cast(n_users as double)) -
           (cast(sx as double) / cast(n as double)))))
          as bigint)""").as("adj_mean_y_q6"))
      .orderBy("variant")
  }

  /** Difference-in-differences over the order fact: md5-split variant ×
    * calendar period (pre < `splitYear` ≤ post) cell means of the order
    * value, and DiD = (ȳ_B,post − ȳ_B,pre) − (ȳ_A,post − ȳ_A,pre) — the
    * quasi-experimental readout when assignment isn't randomized but
    * both arms share pre-trends. Exact cents in decimal(38,0)/HUGEINT;
    * the DiD is one fixed-shape IEEE expression (q285 discipline),
    * q6-quantized in cents. One conditional partial agg → a single row.
    */
  def diffInDiff(orders: DataFrame, splitYear: Int = 1996): DataFrame = {
    val cells = orders.select(
        when(Sampling.splitBucket(col("o_custkey")) < 500, "A")
          .otherwise("B").as("variant"),
        (year(col("o_orderdate")) >= splitYear).as("post"),
        expr("cast(round(o_totalprice * 100) as long)").as("cents"))
      .groupBy()
      .agg(
        sum(when(col("variant") === "A" && !col("post"), 1L)
          .otherwise(0L)).as("n_a_pre"),
        sum(when(col("variant") === "A" && col("post"), 1L)
          .otherwise(0L)).as("n_a_post"),
        sum(when(col("variant") === "B" && !col("post"), 1L)
          .otherwise(0L)).as("n_b_pre"),
        sum(when(col("variant") === "B" && col("post"), 1L)
          .otherwise(0L)).as("n_b_post"),
        sum(when(col("variant") === "A" && !col("post"), col("cents"))
          .otherwise(0L).cast("decimal(38,0)")).as("s_a_pre"),
        sum(when(col("variant") === "A" && col("post"), col("cents"))
          .otherwise(0L).cast("decimal(38,0)")).as("s_a_post"),
        sum(when(col("variant") === "B" && !col("post"), col("cents"))
          .otherwise(0L).cast("decimal(38,0)")).as("s_b_pre"),
        sum(when(col("variant") === "B" && col("post"), col("cents"))
          .otherwise(0L).cast("decimal(38,0)")).as("s_b_post"))
    cells.select(
      col("n_a_pre"), col("n_a_post"), col("n_b_pre"), col("n_b_post"),
      expr("""cast(round(1000000 * (((cast(s_b_post as double) /
        cast(n_b_post as double)) - (cast(s_b_pre as double) /
        cast(n_b_pre as double))) - ((cast(s_a_post as double) /
        cast(n_a_post as double)) - (cast(s_a_pre as double) /
        cast(n_a_pre as double))))) as bigint)""").as("did_cents_q6"))
  }

  /** Two-proportion z-test for a funnel conversion: per md5-split
    * variant, the users converting (≥ `minEvents` `convType` events —
    * an activity threshold, because "ever purchased" saturates to 100%
    * on any long-lived cohort and a saturated proportion has zero
    * pooled variance) over all users, and the pooled z statistic
    * (p̂_A − p̂_B)/√(p̂(1−p̂)(1/n_A + 1/n_B)) — the significance readout
    * next to q241's SRM gate and q283's bootstrap CI. Counts are exact
    * integers; z is one fixed-shape IEEE expression (q285 discipline),
    * q6-quantized, NULL (not an error) when the pooled proportion
    * degenerates to 0 or 1. One keyed agg + one conditional fold.
    */
  def conversionZTest(events: DataFrame, convType: String = "purchase",
                      minEvents: Long = 14L): DataFrame = {
    val per = events.groupBy(col("user_id"))
      .agg((sum(when(col("event_type") === convType, 1L).otherwise(0L))
        >= minEvents).cast("long").as("conv"))
      .withColumn("variant",
        when(Sampling.splitBucket(col("user_id")) < 500, "A")
          .otherwise("B"))
    per.groupBy()
      .agg(
        sum(when(col("variant") === "A", 1L).otherwise(0L)).as("n_a"),
        sum(when(col("variant") === "A", col("conv")).otherwise(0L))
          .as("c_a"),
        sum(when(col("variant") === "B", 1L).otherwise(0L)).as("n_b"),
        sum(when(col("variant") === "B", col("conv")).otherwise(0L))
          .as("c_b"))
      .select(col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        expr("""cast(round(1000000 * (((cast(c_a as double) /
          cast(n_a as double)) - (cast(c_b as double) /
          cast(n_b as double))) / nullif(sqrt((cast(c_a + c_b as double) /
          cast(n_a + n_b as double)) * (1.0d - (cast(c_a + c_b as double) /
          cast(n_a + n_b as double))) * ((1.0d / cast(n_a as double)) +
          (1.0d / cast(n_b as double)))), 0d))) as bigint)""").as("z_q6"))
  }
}
