package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The `final` module's geo point-prep operators re-keyed to harness tables
  * (SURVEY.md §2.2 P7, §2.4 A8/A9/A10).
  *
  * Reference semantics (paths in `/root/reference/`):
  *  - P7 HALF_UP rounding to 3 dp at ingest —
  *    final/src/main/java/population/PopulatePt.java:66–72 (Spark `round`
  *    IS HALF_UP; `bround` would be wrong).
  *  - A8 distinct-by-rounded-key + count (the reference's only dedup) —
  *    PopulatePt.java:54–77, 118–135.
  *  - A9 global min/max bounding box, map-side partials —
  *    final/src/main/java/population/MinMax.java:48–116.
  *  - A10 weighted mean per group — final/src/main/java/calc/KMeans.java:178–194.
  *
  * The harness has no lat/lon table; `pointsFromEmbeddings` derives a 2-D
  * weighted point cloud from the first two embedding dims, replicating the
  * PopulatePt pipeline (round 3dp → group → count) ahead of ml.KMeans.
  */
object Geo {

  /** P7+A8 over events: round to a coarse bucket, count occurrences per
    * (type, bucket). Exact groupBy-dedup; one shuffle with map-side combine.
    */
  def roundedDedupCount(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), round(col("value"), -1).as("vbucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy("event_type", "vbucket")

  /** A9: one-row global min/max (the bounding box). Map-side partial
    * aggregation makes this a single narrow pass — the reference needed a
    * dedicated MR job with hand-written cleanup() partials for the same.
    */
  def bbox(events: DataFrame): DataFrame =
    events.agg(
      min("value").as("min_v"), max("value").as("max_v"),
      min("user_id").as("min_u"), max("user_id").as("max_u"))

  /** A10: weighted mean per group, weights = user_id (deterministic integer
    * weights; the reference weights by dedup count). Rounded like the
    * reference rounds recomputed centers (KMeans.java:191–194).
    */
  def weightedMean(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      // zero total weight → NULL (matches the oracle's 0-divisor NULL and
      // avoids surprises under Spark 4's default ANSI mode)
      .agg(round(when(sum(col("user_id")) =!= 0,
        sum(col("value") * col("user_id")) / sum(col("user_id"))), 4)
        .as("wmean"))
      .orderBy("event_type")

  /** PopulatePt analogue on harness data: 2-D points from embedding dims
    * 0/1, rounded 3 dp HALF_UP, grouped with multiplicity. Output schema
    * (lat, lon, cnt) matches the reference's Coordinate writable.
    */
  def pointsFromEmbeddings(embeddings: DataFrame): DataFrame =
    embeddings
      .select(
        round(element_at(col("embedding"), 1).cast("double"), 3).as("lat"),
        round(element_at(col("embedding"), 2).cast("double"), 3).as("lon"))
      .groupBy("lat", "lon")
      .agg(count(lit(1)).cast("int").as("cnt"))

  /** Spatial ε-neighbor pairs by GRID-CELL join — the 2D analog of the
    * LSH band bucket (q23) and the pigeonhole chunk (q24): points land
    * in ⌊coord/ε⌋ cells (FLOOR division — truncation would merge the
    * cells on either side of zero), each left point probes its 3×3 cell
    * neighborhood, and the exact integer distance check keeps only true
    * ε-neighbors. LOSSLESS for cell size = ε (a pair within ε can never
    * be more than one cell apart on either axis, and a right point
    * lives in exactly ONE cell, so each pair is found exactly once —
    * no dedup stage), which is why the ORACLE is the brute-force
    * all-pairs join: one missed pair is a driver hash mismatch (the
    * q298 prefix-filter proof pattern, in 2D).
    *
    * Exactness: coordinates quantize to integer milli-degrees
    * (round(x·1000) of the same float→double value both engines); the
    * distance is integer milli² — no IEEE anywhere past the scan.
    *
    * Scale shape: the pair stage is bucketed by cell (shuffle on cell
    * key, ×9 constant left duplication); at 100 TB cell occupancy is
    * density-bounded, the same argument as the LSH band — versus the
    * oracle's O(n²), which exists only as the fixture-scale referee.
    */
  def gridNeighborPairs(embeddings: DataFrame,
                        epsMilli: Long = 10L): DataFrame = {
    require(epsMilli >= 1, "epsMilli must be >= 1")
    // element_at is 1-based like the oracle's embedding[1] — Spark's
    // own [] subscript is 0-based, an off-by-one the driver hash catches
    val pts = embeddings.select(col("vec_id"),
      expr("cast(round(cast(element_at(embedding, 1) as double) * 1000)" +
        " as long)").as("la"),
      expr("cast(round(cast(element_at(embedding, 2) as double) * 1000)" +
        " as long)").as("lo"))
    def cell(c: String) =
      expr(s"cast(floor(cast($c as double) / ${epsMilli}.0d) as long)")
    val left = pts
      .select(col("vec_id").as("id_a"), col("la").as("la_a"),
        col("lo").as("lo_a"), cell("la").as("__ca"), cell("lo").as("__cb"))
      .withColumn("__dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("__dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("id_a"), col("la_a"), col("lo_a"),
        (col("__ca") + col("__dx")).as("__cx"),
        (col("__cb") + col("__dy")).as("__cy"))
    val right = pts
      .select(col("vec_id").as("id_b"), col("la").as("la_b"),
        col("lo").as("lo_b"), cell("la").as("__cx"), cell("lo").as("__cy"))
    left.join(right, Seq("__cx", "__cy"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("d2",
        (col("la_a") - col("la_b")) * (col("la_a") - col("la_b")) +
          (col("lo_a") - col("lo_b")) * (col("lo_a") - col("lo_b")))
      .filter(col("d2") <= lit(epsMilli * epsMilli))
      .select(col("id_a"), col("id_b"), col("d2"))
      .orderBy("id_a", "id_b")
  }
}
