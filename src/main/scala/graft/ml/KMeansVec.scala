package graft.ml

import graft.functions.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D-dimensional Lloyd's K-Means over an `array<double>` column — the
  * vector generalization of ml.KMeans (M1–M3) used as the coarse
  * quantizer for IVF similarity search (Similarity.annIvf).
  *
  * Execution shape per iteration (same discipline as the 2-D loop):
  *  - assignment: ||x−c||² = ‖x‖² − 2·x·c + ‖c‖², with x·c and ‖x‖²
  *    through the codegen'd graft_dot kernel and ‖c‖² folded as a literal
  *    — one narrow pass, k dots per row;
  *  - recenter: `posexplode` of the vector → groupBy(cluster, dim) sums —
  *    one shuffle of k·d partial rows per partition (map-side combined),
  *    collecting only k·d (cluster, dim, mean) cells to the driver.
  */
final case class VecCentroid(idx: Int, vec: Array[Double])

final case class KMeansVecResult(centroids: Seq[VecCentroid],
                                 iterations: Int, converged: Boolean)

object KMeansVec {

  /** Deterministic init: the k seeded-sample rows of the corpus (k-means||
    * style sampling is unnecessary at coarse-quantizer k). Sampling uses a
    * hash of the id column — stable across partitionings.
    */
  def initFromSample(vectors: DataFrame, idCol: String, vecCol: String,
                     k: Int, seed: Long): Seq[VecCentroid] = {
    val rows = vectors
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(k)
      .collect()
    require(rows.nonEmpty, "k-means needs a non-empty vector corpus")
    rows.zipWithIndex.map { case (r, i) =>
      VecCentroid(i, r.getSeq[Double](1).toArray)
    }.toSeq
  }

  /** Greedy farthest-point (k-center) init: the seeded-sample row
    * first, then k−1 rounds each taking the corpus point with the
    * LARGEST min-squared-distance to the chosen set (ties on id — fully
    * deterministic, independent of partitioning). On data with real
    * cluster structure this seeds every cluster before revisiting any —
    * the property the hash-sample init only has by seed luck (k samples
    * over k clusters collide with birthday probability ≈ 1, and a
    * collided init can leave Lloyd converged on split/merged lists):
    * the coarse-quantizer regime where pruned-probe EXACTNESS contracts
    * must hold at every scale, not at the scales the seed happened to
    * win. Cost: k driver-side scans (k = coarse nlist, small by
    * construction). Caveat: on noisy corpora farthest-point seeds
    * outliers — use for quantizer fits over deduped/structured vectors,
    * keep the sample init for exploratory clustering.
    */
  def initFarthest(vectors: DataFrame, idCol: String, vecCol: String,
                   k: Int, seed: Long): Seq[VecCentroid] = {
    val first = vectors
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)))
      .limit(1).collect()
    require(first.nonEmpty, "k-means needs a non-empty vector corpus")
    var chosen = Vector(
      VecCentroid(0, first(0).getSeq[Double](1).toArray))
    // r19: carry the running min-distance as a materialized column
    // instead of re-deriving distances to EVERY chosen centroid each
    // round — the old per-round plan inlined chosen.size × d literal
    // vectors and re-analyzed a growing expression tree (~0.5 s/round of
    // pure planning at k = 8). Each round now adds ONE centroid's
    // distance and folds it with least(); the eager localCheckpoint pins
    // the column so the next round's plan is a block read + one
    // projection. min over the same IEEE doubles in any association is
    // the same value, so the argmax (and its id tie-break) is unchanged.
    var cur = vectors.select(col(idCol), col(vecCol))
      .withColumn("__d", distCols(col(vecCol), chosen.takeRight(1)).head)
      .localCheckpoint(true)
    while (chosen.size < k) {
      val far = cur
        .orderBy(col("__d").desc, col(idCol))
        .limit(1).collect()(0)
      chosen = chosen :+
        VecCentroid(chosen.size, far.getSeq[Double](1).toArray)
      if (chosen.size < k) {
        val prev = cur
        val dNew = distCols(col(vecCol), chosen.takeRight(1)).head
        cur = cur.withColumn("__d",
            when(col("__d") < dNew, col("__d")).otherwise(dNew))
          .localCheckpoint(true)
        prev.unpersist(blocking = false)
      }
    }
    chosen
  }

  private def litVec(v: Array[Double]): Column = array(v.map(lit(_)): _*)

  /** Squared distances to every centroid, in idx order (codegen'd dot
    * products; ‖c‖² folded as a literal). Shared by assignment here and
    * by Similarity.annIvf's query-probe scoring — one formula, no drift.
    */
  private[graft] def distCols(vecCol: Column,
                              cs: Seq[VecCentroid]): Seq[Column] = {
    val xx = GraftFunctions.dot(vecCol, vecCol)
    cs.sortBy(_.idx).map { c =>
      val cc = c.vec.map(x => x * x).sum
      xx - lit(2.0) * GraftFunctions.dot(vecCol, litVec(c.vec)) + lit(cc)
    }
  }

  /** Adds `cidx` = idx of the nearest centroid (first minimum wins).
    *
    * Codegen-STABLE (NearestVecCentroid): the centroid matrix rides the
    * codegen `references` array, so the Lloyd loop reuses one compiled
    * plan across iterations instead of recompiling per-iteration literal
    * plans. Distances here are Σ(x_i−c_i)² directly (not the ‖x‖²−2x·c+‖c‖²
    * expansion distCols uses for query-probe scoring): both orderings agree
    * except in FP noise far below centroid separation at quantizer scale.
    */
  def assign(vectors: DataFrame, vecCol: String,
             cs: Seq[VecCentroid]): DataFrame = {
    GraftFunctions.register(vectors.sparkSession)
    val sorted = cs.sortBy(_.idx)
    vectors.withColumn("cidx",
      GraftFunctions.nearestVecCentroid(col(vecCol),
        sorted.map(_.idx), sorted.map(_.vec)))
  }

  /** Mean vector per cluster via (cluster, dim) partial sums; empty
    * clusters keep their previous centroid.
    */
  def recenter(assigned: DataFrame, vecCol: String,
               prev: Seq[VecCentroid]): Seq[VecCentroid] = {
    val cells = assigned
      .select(col("cidx"), posexplode(col(vecCol)))
      .groupBy("cidx", "pos")
      .agg(sum("col").as("s"), count(lit(1)).as("n"))
      .collect()
    val byCluster = cells.groupBy(_.getInt(0))
    prev.map { c =>
      byCluster.get(c.idx) match {
        case Some(rows) =>
          val vec = c.vec.clone()
          rows.foreach { r =>
            vec(r.getInt(1)) = r.getDouble(2) / r.getLong(3)
          }
          VecCentroid(c.idx, vec)
        case None => c
      }
    }
  }

  def converged(prev: Seq[VecCentroid], next: Seq[VecCentroid],
                tol: Double): Boolean =
    prev.sortBy(_.idx).zip(next.sortBy(_.idx)).forall { case (p, q) =>
      p.vec.zip(q.vec).forall { case (a, b) => math.abs(a - b) <= tol }
    }

  /** The Lloyd loop. Cache `vectors` before calling for multi-iteration
    * runs (same contract as KMeans.fit).
    */
  def fit(vectors: DataFrame, vecCol: String, k: Int, seed: Long,
          maxIter: Int = 10, tol: Double = 1e-4,
          idCol: String = "vec_id",
          farthestInit: Boolean = false): KMeansVecResult = {
    var cs =
      if (farthestInit) initFarthest(vectors, idCol, vecCol, k, seed)
      else initFromSample(vectors, idCol, vecCol, k, seed)
    var iter = 0
    var done = false
    while (iter < maxIter && !done) {
      val next = recenter(assign(vectors, vecCol, cs), vecCol, cs)
      done = converged(cs, next, tol)
      cs = next
      iter += 1
    }
    KMeansVecResult(cs, iter, done)
  }
}
