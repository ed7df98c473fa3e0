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
}
