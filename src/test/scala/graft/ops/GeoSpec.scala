package graft.ops

import graft.SparkSpec

/** Pins the grid-cell neighbor join's LOSSLESS law against an in-test
  * brute force, with points placed exactly on the adversarial spots:
  * cell boundaries, the zero axis (where truncating division would
  * merge two cells), and distances exactly at ε.
  */
class GeoSpec extends SparkSpec {
  import spark.implicits._

  private def emb(pts: (Long, Double, Double)*) =
    pts.map { case (id, a, b) => (id, Array(a.toFloat, b.toFloat)) }
      .toDF("vec_id", "embedding")

  test("gridNeighborPairs ≡ brute force on boundary-adversarial points") {
    // milli coords after ×1000: (0,0), (10,0) exactly ε apart;
    // (-1,0) and (9,0) straddle the zero cell wall at distance 10;
    // (-11,0) is 10 from (-1,0); (25,25) is isolated; (7,7) near origin
    val pts = Seq(
      (1L, 0.000, 0.000), (2L, 0.010, 0.000), (3L, -0.001, 0.000),
      (4L, -0.011, 0.000), (5L, 0.025, 0.025), (6L, 0.007, 0.007))
    val df = emb(pts.map { case (i, a, b) => (i, a, b) }: _*)
    val got = Geo.gridNeighborPairs(df, epsMilli = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    val milli = pts.map { case (i, a, b) =>
      (i, math.round(a.toFloat.toDouble * 1000),
        math.round(b.toFloat.toDouble * 1000)) }
    val brute = (for {
      (ia, xa, ya) <- milli; (ib, xb, yb) <- milli
      if ia < ib
      d2 = (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      if d2 <= 100
    } yield (ia, ib, d2)).sortBy(p => (p._1, p._2))
    assert(got == brute && brute.nonEmpty)
    // the exact-ε pair and the cross-zero pair must both be present
    assert(brute.contains((1L, 2L, 100L)))
    assert(brute.contains((1L, 3L, 1L)))
  }

  test("gridNeighborPairs: each pair is emitted exactly once") {
    // duplicate coordinates (distance 0) still yield one row per pair
    val df = emb((1L, 0.001, 0.001), (2L, 0.001, 0.001),
      (3L, 0.001, 0.001))
    val got = Geo.gridNeighborPairs(df, epsMilli = 10L)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }
}
