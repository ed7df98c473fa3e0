package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Hyperparameter sweep + model selection (SURVEY.md §2.6 M5/M6, §2.4 A12).
  *
  * The reference's KDriver (/root/reference/final/src/main/java/program/
  * KDriver.java:60–63) runs one MR-job chain per k and parks results in
  * HBase; here the sweep is a driver loop over ONE cached point cloud, and
  * "model selection" is a max over a k-row list.
  */
final case class SweepEntry(k: Int, silScore: Double, iterations: Int,
                            converged: Boolean)

object ModelSelect {

  /** M5: fit every k on the same cached points, score each with the
    * simplified silhouette.
    */
  def sweep(points: DataFrame, ks: Seq[Int], seed: Long,
            maxIter: Int = 20, tol: Double = 0.001): Seq[SweepEntry] = {
    val cached = points.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      ks.map { k =>
        val r = KMeans.fit(cached, k, seed, maxIter, tol)
        SweepEntry(k, Silhouette.score(cached, r.centroids), r.iterations,
          r.converged)
      }
    } finally { cached.unpersist(blocking = false); () }
  }

  /** M6/A12: argmax silhouette (first k wins ties, like the reference's
    * strict `>` driver scan, Summarizer.java:81–86).
    */
  def best(entries: Seq[SweepEntry]): SweepEntry =
    entries.maxBy(_.silScore)
}
