package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Hyperparameter sweep + model selection (SURVEY.md §2.6 M5/M6, §2.4 A12).
  *
  * The reference's KDriver (/root/reference/final/src/main/java/program/
  * KDriver.java:60–63) runs one MR-job chain per k and parks results in
  * HBase; a naive Spark port still schedules one job per (k, iteration).
  * This sweep batches instead: each Lloyd ROUND unions the assignment
  * frames of every still-active k (tagged by `kval`) and recenters them in
  * ONE groupBy(kval, cidx) job — per-k math is untouched (identical
  * centroids/iterations to sequential fits), but the job count drops from
  * Σ iterations(k) to max iterations(k), which is what matters when the
  * per-job scheduling overhead rivals the compute (the reference's own
  * diagnosis of its 38–40 s/job bottleneck, BASELINE.md).
  */
final case class SweepEntry(k: Int, silScore: Double, iterations: Int,
                            converged: Boolean)

object ModelSelect {

  private final case class KState(cs: Seq[Centroid], iterations: Int,
                                  converged: Boolean)

  /** M5: fit every k on the same cached points (one job per round across
    * all ks), then score all ks' silhouettes in one more job.
    */
  def sweep(points: DataFrame, ks: Seq[Int], seed: Long,
            maxIter: Int = 20, tol: Double = 0.001): Seq[SweepEntry] = {
    require(ks.nonEmpty)
    val cached = points.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val (minLat, maxLat, minLon, maxLon) = KMeans.bbox(cached)
      val state = scala.collection.mutable.LinkedHashMap(ks.map { k =>
        k -> KState(
          KMeans.initUniform(k, seed, minLat, maxLat, minLon, maxLon), 0, false)
      }: _*)

      var roundNo = 0
      while (roundNo < maxIter && state.values.exists(!_.converged)) {
        val active = ks.filter(k => !state(k).converged)
        val unioned = active.map { k =>
          KMeans.assign(cached, state(k).cs).withColumn("kval", lit(k))
        }.reduce(_ unionByName _)
        val recentered = unioned
          .groupBy("kval", "cidx")
          .agg(
            round(sum(col("lat") * col("cnt")) / sum(col("cnt")), 3).as("lat"),
            round(sum(col("lon") * col("cnt")) / sum(col("cnt")), 3).as("lon"))
          .collect()
          .groupBy(_.getInt(0))
          .map { case (k, rows) =>
            k -> rows.map(r =>
              r.getInt(1) -> Centroid(r.getInt(1), r.getDouble(2),
                r.getDouble(3))).toMap
          }
        active.foreach { k =>
          val prev = state(k)
          val next = prev.cs.map(c =>
            recentered.getOrElse(k, Map.empty).getOrElse(c.idx, c))
          state(k) = KState(next, prev.iterations + 1,
            KMeans.converged(prev.cs, next, tol))
        }
        roundNo += 1
      }

      val sils = scoreMany(cached, ks.map(k => k -> state(k).cs).toMap)
      ks.map { k =>
        val s = state(k)
        SweepEntry(k, sils(k), s.iterations, s.converged)
      }
    } finally { cached.unpersist(blocking = false); () }
  }

  /** All ks' weighted silhouettes in one job (union + groupBy(kval)). */
  private def scoreMany(points: DataFrame,
                        css: Map[Int, Seq[Centroid]]): Map[Int, Double] =
    css.map { case (k, cs) =>
      points.select(lit(k).as("kval"), Silhouette.silColumn(cs).as("sil"),
        col("cnt"))
    }.reduce(_ unionByName _)
      .groupBy("kval")
      .agg((sum(col("sil") * col("cnt")) / sum(col("cnt"))).as("score"))
      .collect()
      .map(r => r.getInt(0) -> r.getDouble(1))
      .toMap

  /** M6/A12: argmax silhouette (first k wins ties, like the reference's
    * strict `>` driver scan, Summarizer.java:81–86).
    */
  def best(entries: Seq[SweepEntry]): SweepEntry =
    entries.maxBy(_.silScore)

  /** M6: the reference's Summary.txt shape (Summarizer.java:98–115) —
    * `Max SilScore:<s> at kValue:<k> at iteration:<itr>`, then the winning
    * centroid list. Write with Sinks.writeReport.
    */
  def summaryReport(bestEntry: SweepEntry,
                    centroids: Seq[Centroid]): Seq[String] = {
    val header = s"Max SilScore:${bestEntry.silScore} at " +
      s"kValue:${bestEntry.k} at iteration:${bestEntry.iterations}"
    Seq(header, "Corresponding centroids") ++
      centroids.sortBy(_.idx)
        .map(c => s"${c.idx}. Lat:${c.lat} Longitude:${c.lon}")
  }

  /** M6: the reference's KResults.txt shape (Summarizer.java:86) — one
    * `SilScore:<s> at Kvalue:<k> at iteration:<itr>` line per swept k,
    * k-ascending (the reference walks its HBase scan in rowkey = k order).
    * Note the casing: `Kvalue` here, `kValue` in the Summary header —
    * both preserved verbatim from the reference's format strings.
    * GoldenPickupsSpec round-trips the reference's own committed
    * final/outputs files through this renderer byte-for-byte. Scala's
    * Double `toString` is Java's `Double.toString`, so the shortest-
    * round-trip decimal rendering matches the reference exactly.
    */
  def kResultsReport(entries: Seq[SweepEntry]): Seq[String] =
    entries.sortBy(_.k).map(e =>
      s"SilScore:${e.silScore} at Kvalue:${e.k} at iteration:${e.iterations}")
}
