package graft.ml

import graft.SparkSpec

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private def pts(ps: (Double, Double, Int)*) = ps.toDF("lat", "lon", "cnt")

  private val blobs = pts(
    (0.0, 0.0, 1), (0.1, 0.0, 1), (0.0, 0.1, 1),   // blob A around (0.033, 0.033)
    (10.0, 10.0, 1), (10.1, 10.0, 1), (10.0, 10.1, 1)) // blob B

  test("M2: k=2 on separable blobs converges to the blob means") {
    val r = KMeans.fit(blobs, k = 2, seed = 1L)
    assert(r.converged)
    val cs = r.centroids.map(c => (c.lat, c.lon)).sortBy(_._1)
    assert(cs(0) == (0.033, 0.033))   // 3-dp HALF_UP weighted mean
    assert(cs(1) == (10.033, 10.033))
  }

  test("A10: recenter is the count-weighted mean, rounded 3dp HALF_UP") {
    val p = pts((1.0, 0.0, 3), (2.0, 0.0, 1)) // weighted mean lat = 1.25
    val assigned = KMeans.assign(p, Seq(Centroid(0, 0.0, 0.0)))
    val r = KMeans.recenter(assigned, Seq(Centroid(0, 0.0, 0.0)))
    assert(r.head.lat == 1.25 && r.head.lon == 0.0)
    // HALF_UP at the 3rd decimal: 0.0005 → 0.001
    val p2 = pts((0.0005, 0.0, 1))
    val r2 = KMeans.recenter(KMeans.assign(p2, Seq(Centroid(0, 0.0, 0.0))),
      Seq(Centroid(0, 0.0, 0.0)))
    assert(r2.head.lat == 0.001)
  }

  test("J4: assignment takes the FIRST minimum on ties") {
    val p = pts((5.0, 0.0, 1)) // equidistant from centroids 0 and 1
    val assigned = KMeans.assign(p,
      Seq(Centroid(0, 0.0, 0.0), Centroid(1, 10.0, 0.0)))
    assert(assigned.select("cidx").as[Int].head() == 0)
  }

  test("assignment and recenter honor non-contiguous centroid idxs") {
    // golden-file inits may carry arbitrary idxs; cidx must be the
    // centroid's OWN idx, not its array position
    val p = pts((0.0, 0.0, 1), (10.0, 10.0, 1))
    val prev = Seq(Centroid(7, 0.0, 0.0), Centroid(3, 10.0, 10.0))
    val assigned = KMeans.assign(p, prev)
    val byIdx = assigned.select("lat", "cidx").collect()
      .map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(byIdx(0.0) == 7 && byIdx(10.0) == 3)
    val r = KMeans.recenter(assigned, prev).sortBy(_.idx)
    assert(r == Seq(Centroid(3, 10.0, 10.0), Centroid(7, 0.0, 0.0)))
  }

  test("empty clusters keep their previous centroid") {
    val p = pts((0.0, 0.0, 1))
    val prev = Seq(Centroid(0, 0.0, 0.0), Centroid(1, 99.0, 99.0))
    val r = KMeans.recenter(KMeans.assign(p, prev), prev)
    assert(r(1) == Centroid(1, 99.0, 99.0))
  }

  test("M3: convergence threshold is ≤ 0.001 on BOTH axes") {
    val a = Seq(Centroid(0, 1.0, 1.0))
    assert(KMeans.converged(a, Seq(Centroid(0, 1.001, 1.001))))
    assert(!KMeans.converged(a, Seq(Centroid(0, 1.002, 1.0))))
  }

  test("M4: silhouette near 1 for tight separated blobs, ordered sanely") {
    val r = KMeans.fit(blobs, k = 2, seed = 1L)
    val s2 = Silhouette.score(blobs, r.centroids)
    assert(s2 > 0.99, s"s2=$s2") // squared-distance simplified silhouette
    // degenerate k=1 scores 0
    assert(Silhouette.score(blobs, Seq(Centroid(0, 5.0, 5.0))) == 0.0)
  }

  test("M5/M6: sweep picks the separable k") {
    val entries = ModelSelect.sweep(blobs, Seq(2, 3), seed = 1L)
    assert(ModelSelect.best(entries).k == 2)
  }

  test("M6: summary report replicates the reference's Summary.txt shape") {
    val report = ModelSelect.summaryReport(
      SweepEntry(2, 0.9771, 6, converged = true),
      Seq(Centroid(1, 40.657, -73.922), Centroid(0, 40.742, -73.976)))
    assert(report == Seq(
      "Max SilScore:0.9771 at kValue:2 at iteration:6",
      "Corresponding centroids",
      "0. Lat:40.742 Longitude:-73.976",
      "1. Lat:40.657 Longitude:-73.922"))
  }

  test("batched sweep is job-batched but math-identical to sequential fits") {
    val noisy = pts((0.0, 0.0, 2), (0.4, 0.1, 1), (3.0, 2.0, 1),
      (10.0, 10.0, 3), (9.5, 10.5, 1), (5.0, 5.0, 1), (6.0, 4.0, 2))
    val entries = ModelSelect.sweep(noisy, Seq(2, 3, 4), seed = 7L,
      maxIter = 15)
    entries.foreach { e =>
      val fit = KMeans.fit(noisy, e.k, seed = 7L, maxIter = 15)
      assert(fit.iterations == e.iterations, s"k=${e.k}")
      assert(fit.converged == e.converged, s"k=${e.k}")
      // union changes float summation order → compare to ULP tolerance
      val sil = Silhouette.score(noisy, fit.centroids)
      assert(math.abs(sil - e.silScore) < 1e-12, s"k=${e.k}")
    }
  }
}
