package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Simplified (centroid-based) silhouette (SURVEY.md §2.6 M4, §2.4 A11/A13).
  *
  * Reference formula — /root/reference/final/src/main/java/calc/
  * Silhouette.java:83–108: per point, with dmin and d2nd the smallest and
  * second-smallest SQUARED Euclidean centroid distances,
  * `score = (d2nd − dmin) / d2nd`, then the COUNT-WEIGHTED mean over all
  * points. Spark ML's ClusteringEvaluator(squaredEuclidean) implements the
  * same simplified silhouette and serves as a cross-check oracle in tests.
  *
  * A13's "running 2-smallest" reducer trick collapses into
  * `array_sort(dists)[0..1]` over the literal centroid array — one narrow
  * map + one global aggregate; no shuffle of the point cloud.
  */
object Silhouette {

  /** Per-point silhouette expression for the given centroids — the single
    * source of the (d2nd − dmin)/d2nd formula (ModelSelect's batched
    * scoring reuses it; keep the semantics in one place).
    */
  private[ml] def silColumn(cs: Seq[Centroid]): org.apache.spark.sql.Column =
    if (cs.size < 2) lit(0.0)
    else {
      val sorted = array_sort(KMeans.distances(cs))
      val d1 = element_at(sorted, 1)
      val d2 = element_at(sorted, 2)
      when(d2 > 0, (d2 - d1) / d2).otherwise(lit(0.0))
    }

  /** Weighted mean silhouette of a weighted point cloud (lat, lon, cnt)
    * under the given centroids. Returns 0 when k < 2 (no second distance).
    */
  def score(points: DataFrame, cs: Seq[Centroid]): Double = {
    if (cs.size < 2) return 0.0
    points
      .select(silColumn(cs).as("sil"), col("cnt"))
      .agg(sum(col("sil") * col("cnt")) / sum(col("cnt")))
      .head().getDouble(0)
  }
}
