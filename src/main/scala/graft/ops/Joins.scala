package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** As-of (point-in-time) join: for every left row, the single most recent
    * right row with the same `key` and right `time` ≤ left `time` (strict
    * `<` when `strict`). The feature-store / merge_asof operation a training
    * pipeline uses to attach "state as of event time" without leakage.
    *
    * NOT a range join: the two sides are tagged and UNIONed, shuffled once
    * on `key`, and the match is a running `last(right, ignoreNulls)` over
    * `(time, side)` within each key — right rows sort before (inclusive) or
    * after (strict) a left row at the same timestamp, which encodes the
    * boundary rule in the sort instead of a second pass. One exchange, no
    * per-pair blow-up, no broadcast: at 100 TB this is a single sort-shuffle
    * of each side keyed identically, and a skewed key degrades to a big
    * sort, never to a quadratic join bucket.
    *
    * Right columns come back nested under a single `asof` struct column
    * (null when no right row precedes — `joinType = "left"` keeps such rows,
    * `"inner"` drops them). Deterministic whenever `(key, time)` is unique
    * on the right (the standard as-of precondition; ties beyond that are
    * broken by the right row's position in `__r`'s struct order).
    */
  /** FUZZY key match (entity resolution): (left, right) key pairs
    * within `maxDist` Levenshtein edits — the record-linkage join
    * behind "these two catalogs spell the same entity differently".
    * The quadratic theta-join is avoided by LOSSLESS length blocking:
    * edit distance ≥ |len(a) − len(b)|, so the left side explodes to
    * its `2·maxDist+1` candidate lengths and the join is an EQUI-join
    * on length before the exact distance filter — no true match can be
    * blocked out (a first-letter or prefix block, the common folk
    * remedy, drops edits at position 0). Output carries the measured
    * distance.
    *
    * Scale shape: the exploded side grows 2·maxDist+1× (ids+keys
    * only); the equi-join hash-partitions on length — add a second
    * blocking column to the key for very skewed length distributions.
    * Distance is evaluated only on length-compatible candidates.
    */
  def fuzzyMatch(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 maxDist: Int = 1): DataFrame = {
    require(maxDist >= 0, "maxDist must be >= 0")
    val l = left.select(col(leftKey).as("left_key")).distinct()
      .withColumn("__len", explode(sequence(
        greatest(length(col("left_key")) - maxDist, lit(0)),
        length(col("left_key")) + maxDist)))
    val r = right.select(col(rightKey).as("right_key")).distinct()
      .withColumn("__len", length(col("right_key")))
    l.join(r, "__len")
      .withColumn("dist", levenshtein(col("left_key"), col("right_key")))
      .filter(col("dist") <= maxDist)
      .select("left_key", "right_key", "dist")
      .orderBy("left_key", "right_key")
  }

  def asOfJoin(left: DataFrame, right: DataFrame,
               key: String, time: String,
               strict: Boolean = false,
               joinType: String = "inner"): DataFrame = {
    require(joinType == "inner" || joinType == "left",
      s"asOfJoin supports inner/left, got $joinType")
    // side ordering encodes the boundary: inclusive → right(0) before
    // left(1) at equal time so it is visible to the running last();
    // strict → left(0) before right(1) so an equal-time right row is not.
    val (leftSide, rightSide) = if (strict) (0, 1) else (1, 0)
    val rStruct = struct(right.columns.map(col): _*)
    val rType = org.apache.spark.sql.types.StructType(right.schema.fields)
    val lTagged = left.select(
      col(key).as("__k"), col(time).as("__t"), lit(leftSide).as("__s"),
      struct(left.columns.map(col): _*).as("__l"),
      lit(null).cast(rType).as("__r"))
    val rTagged = right.select(
      col(key).as("__k"), col(time).as("__t"), lit(rightSide).as("__s"),
      lit(null).cast(org.apache.spark.sql.types.StructType(left.schema.fields))
        .as("__l"),
      rStruct.as("__r"))
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__s"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .withColumn("asof", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__s") === leftSide)
      .select(col("__l.*"), col("asof"))
    if (joinType == "inner") matched.filter(col("asof").isNotNull) else matched
  }

  /** Binned range join: points joined to bounded-width intervals
    * `[start, end)` sharing `key`. Each interval is exploded onto the
    * fixed-width time bins it overlaps and each point onto its single bin,
    * so the match becomes an EQUI-join on `(key, bin)` plus an exact
    * containment filter — a hash/sort shuffle Catalyst can plan, instead of
    * the broadcast-nested-loop a raw inequality join degrades to. A point
    * lands in exactly one bin, so a (point, interval) pair can only meet
    * once: no dedup pass.
    *
    * `binWidth` should be ≥ the typical interval width (each interval then
    * explodes to ≤ 2 bins); `maxIntervalWidth` bounds the blow-up of a
    * pathological interval — wider ones fail fast rather than exploding to
    * millions of bins. All time columns are int64 (nanoseconds in this
    * library, per Tables.events).
    */
  def rangeJoinBinned(points: DataFrame, intervals: DataFrame,
                      key: String, pointTime: String,
                      start: String, end: String,
                      binWidth: Long,
                      maxIntervalWidth: Long = Long.MaxValue): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val guarded =
      if (maxIntervalWidth == Long.MaxValue) intervals
      else intervals.withColumn("__w", col(end) - col(start))
        .withColumn(end,
          when(col("__w") <= maxIntervalWidth, col(end))
            .otherwise(raise_error(concat(
              lit(s"rangeJoinBinned: interval wider than $maxIntervalWidth ns on key "),
              col(key).cast("string")))))
        .drop("__w")
    // integer `div`, not floor(a / b): nanosecond epochs (~1.7e18) exceed
    // double's 2^53 exact range, so float division would mis-bin
    val binned = guarded
      .withColumn("__bin", explode(sequence(
        expr(s"`$start` div ${binWidth}L"),
        // end is exclusive: an interval ending exactly on a bin boundary
        // does not overlap that bin
        expr(s"(`$end` - 1) div ${binWidth}L"))))
    val pts = points
      .withColumn("__bin", expr(s"`$pointTime` div ${binWidth}L"))
      .withColumnRenamed(key, "__pk")
    pts.join(binned,
        pts("__pk") === binned(key) && pts("__bin") === binned("__bin"))
      .filter(col(pointTime) >= col(start) && col(pointTime) < col(end))
      .drop("__bin", "__pk")
  }

  /** Binned interval×interval OVERLAP join: all pairs of half-open
    * intervals `[s, e)` (one from `left`, one from `right`) with
    * `l.s < r.e ∧ r.s < l.e`. The interval-interval complement to
    * `rangeJoinBinned`'s point-in-interval: both sides are exploded onto
    * the fixed-width bins they cover, candidates meet on an EQUI-join on
    * the bin, and the exact overlap predicate filters false bin
    * neighbours. A pair can share many bins, so each survivor is emitted
    * exactly once via the RESPONSIBILITY bin — the bin containing
    * `max(l.s, r.s)` (the start of the overlap region, which every
    * overlapping pair has and both sides cover) — instead of a distinct
    * pass, so no dedup shuffle ever exists.
    *
    * Output: `(id_a, id_b, ov_start, ov_end)` with the overlap region
    * `[max(s), min(e))`. Self-join use (same frame both sides) emits both
    * orientations; callers wanting unordered pairs filter `id_a < id_b`.
    *
    * 100 TB shape: the only shuffle is the hash exchange on `__bin`; with
    * `binWidth` ≈ the typical interval width each interval covers ≤ 2
    * bins, so the exploded inputs are ≤ 2× the filtered interval sets.
    * The per-bin candidate product is (concurrency per bin)² — inherent
    * to any overlap join; the `maxIntervalWidth` guard fails pathological
    * intervals fast (same contract as rangeJoinBinned), and a skewed hot
    * bin re-splits under AQE. When only aggregate concurrency is needed,
    * `Behavior.intervalConcurrency`'s sweep line avoids the pair set
    * entirely — this operator exists for when the PAIRS are the product.
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          leftId: String, rightId: String,
                          start: String, end: String,
                          binWidth: Long,
                          maxIntervalWidth: Long = Long.MaxValue): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def prep(df: DataFrame, id: String, idOut: String, sOut: String,
             eOut: String): DataFrame = {
      val base = df.select(col(id).as(idOut),
        col(start).cast("long").as(sOut), col(end).cast("long").as(eOut))
      val guarded =
        if (maxIntervalWidth == Long.MaxValue) base
        else base.withColumn(eOut,
          when(col(eOut) - col(sOut) <= maxIntervalWidth, col(eOut))
            .otherwise(raise_error(concat(
              lit(s"intervalOverlapJoin: interval wider than " +
                s"$maxIntervalWidth on id "), col(idOut).cast("string")))))
      // integer `div`, not floor(a / b): epoch nanos exceed double's 2^53
      // exact range, so float division would mis-bin (rangeJoinBinned law)
      guarded.withColumn("__bin", explode(sequence(
        expr(s"$sOut div ${binWidth}L"),
        expr(s"($eOut - 1) div ${binWidth}L"))))
    }
    val l = prep(left, leftId, "id_a", "__s_a", "__e_a")
    val r = prep(right, rightId, "id_b", "__s_b", "__e_b")
    l.join(r, Seq("__bin"))
      .filter(col("__s_a") < col("__e_b") && col("__s_b") < col("__e_a") &&
        // responsibility bin: emit only where the overlap region starts
        col("__bin") === expr(s"greatest(__s_a, __s_b) div ${binWidth}L"))
      .select(col("id_a"), col("id_b"),
        greatest(col("__s_a"), col("__s_b")).as("ov_start"),
        least(col("__e_a"), col("__e_b")).as("ov_end"))
  }

  /** Runtime-filter pruned semi join: `fact LEFT SEMI dim` where a compact
    * hash-bucket digest of the dim keys is broadcast and applied to the
    * fact side FIRST, so the expensive exchange only carries fact rows
    * that can possibly match. The Bloom-filter pattern Spark's own
    * `InjectRuntimeFilter` uses, expressed declaratively: the digest is
    * `distinct(hash(key) mod buckets)` — a set of at most `buckets` longs
    * — and the prefilter is a broadcast semi join on the bucket, entirely
    * inside whole-stage codegen. False positives (bucket collisions) are
    * removed by the exact semi join that follows, so the result is
    * IDENTICAL to the plain semi join, which is what the oracle checks.
    *
    * 100 TB: when the dim side is selective (the common case — a filtered
    * dimension), the digest is kilobytes while the fact exchange it
    * avoids is terabytes; rows dropped by the broadcast prefilter never
    * leave the scan stage. With `buckets` ≫ |dim| the collision rate is
    * |dim|/buckets, so the exact stage's input is within a whisker of the
    * true match set. The digest build is one shuffle of the (small) dim
    * key set; the exact semi join reuses the same dim scan.
    */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
                     factKey: String, dimKey: String,
                     buckets: Int = 1 << 20): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    // hash the STRING form on both sides: xxhash64 is type-sensitive, so
    // an int-keyed fact against a bigint-keyed dim would hash the same
    // key to different buckets and the prefilter would silently drop
    // true matches the exact join's implicit cast would have kept
    def bucketOf(c: Column): Column =
      pmod(xxhash64(c.cast("string")), lit(buckets.toLong))
    val digest = dim.select(bucketOf(col(dimKey)).as("__bucket")).distinct()
    val prefiltered = fact.join(broadcast(digest),
      bucketOf(col(factKey)) === col("__bucket"), "left_semi")
    // df-qualified references: factKey == dimKey by name must resolve,
    // not throw AMBIGUOUS_REFERENCE
    prefiltered.join(dim, prefiltered(factKey) === dim(dimKey), "left_semi")
  }

  /** TRUE-Bloom pruned semi join — the sketch-literal sibling of
    * [[prunedSemiJoin]] (q90). The dim keys are folded into ONE
    * serialized BloomFilter via Spark's own runtime-filter aggregate
    * (`BloomFilterAggregate`), the single binary row is collected to the
    * driver (bounded by Spark's sketch sizing, ~1.5 MB at the default
    * max-bits cap — the same bound `InjectRuntimeFilter` accepts for a
    * broadcast), and inlined as a FOLDABLE literal into a
    * `might_contain` predicate on the fact scan. That foldability is
    * the point of the design: the probe is a pure scan-level codegen
    * predicate — no broadcast exchange, no hash-relation build, no
    * second join operator — where q90's digest still pays a
    * broadcast-hash-join probe per fact row. False positives (the
    * sketch's ~3% at default sizing) are removed by the exact semi join
    * that follows, so the output is IDENTICAL to the plain semi join —
    * the invariance the oracle checks, and JoinsSpec re-checks under a
    * deliberately undersized sketch that forces a high FP rate.
    *
    * Spark's optimizer injects this same pair on its own only under
    * `runtimeFilter.bloomFilter`'s conf-bounded heuristics (creation-
    * side selectivity it can prove, size thresholds); the operator form
    * is for the cases a pipeline KNOWS are selective — a curated id
    * drop, a quarantine list, a sampled cohort — where at 100 TB the
    * fact exchange avoided is terabytes and the sketch is constant-size
    * regardless of |dim| (q90's digest grows with the distinct-bucket
    * count; the bloom does not).
    *
    * Both sides hash the STRING form of the key (the q90 type-sensitivity
    * guard: xxhash64 over int vs bigint disagrees on equal values).
    */
  def bloomPrunedSemiJoin(fact: DataFrame, dim: DataFrame,
                          factKey: String, dimKey: String,
                          estItems: Long = 1L << 22): DataFrame = {
    require(estItems > 0, "estItems must be positive")
    graft.functions.GraftFunctions.register(fact.sparkSession)
    def hashOf(c: Column): Column = xxhash64(c.cast("string"))
    // one row, one bounded binary — the driver-side collect is the same
    // shape the engine's own runtime-filter broadcast pays
    val sketch = dim
      .select(graft.functions.GraftFunctions
        .bloomAgg(hashOf(col(dimKey)), estItems).as("bf"))
      .head.getAs[Array[Byte]](0)
    val pruned =
      if (sketch == null) fact.filter(lit(false)) // empty dim: no matches
      else fact.filter(graft.functions.GraftFunctions
        .bloomContains(lit(sketch), hashOf(col(factKey))))
    pruned.join(dim, pruned(factKey) === dim(dimKey), "left_semi")
  }
}
