package graft.ml

import graft.SparkSpec
import graft.ops.Pickups

/** Golden-fixture replication of the reference's k-means pipeline
  * (SURVEY.md §5.3) on its own committed inputs:
  * `final/inputs/sample.csv` (1 000 NYC pickups) seeded with the 5 golden
  * initial centroids from `final/inputs/centroids/part-r-00000`.
  *
  * The reference's own KResults.txt cannot be matched run-for-run — its
  * init is an unseeded `new Random()` (CGenerator.java:99) and Lloyd's
  * lands in init-dependent local optima (verified empirically: 12 random
  * inits at k=3 give 10 distinct final silhouettes). With the init PINNED
  * to the committed centroids the whole pipeline is deterministic; the
  * expected values below were computed by an independent straight-line
  * re-implementation of the reference semantics (round-3-HALF_UP dedup →
  * Lloyd with rounded recenters → 0.001 convergence → weighted simplified
  * silhouette) and must match this engine exactly.
  */
class GoldenPickupsSpec extends SparkSpec {

  private val sampleCsv = "/root/reference/final/inputs/sample.csv"
  private val goldenCentroids =
    "/root/reference/final/inputs/centroids/part-r-00000"

  private lazy val goldenInit: Seq[Centroid] =
    scala.io.Source.fromFile(goldenCentroids).getLines().map { line =>
      val Array(i, la, lo) = line.split(",")
      Centroid(i.toInt, la.toDouble, lo.toDouble)
    }.toSeq

  test("golden pipeline: sample.csv + committed centroids is deterministic") {
    assume(new java.io.File(sampleCsv).isFile)
    val pts = Pickups.points(Pickups.load(spark, sampleCsv)).cache()
    try {
      assert(pts.count() == 735) // 1 000 pickups → 735 distinct rounded cells
      val r = KMeans.fitWithInit(pts, goldenInit, maxIter = 20, tol = 0.001)
      assert(r.converged)
      assert(r.iterations == 12)
      val got = r.centroids.sortBy(_.idx).map(c => (c.lat, c.lon))
      assert(got == Seq(
        (40.675, -73.734), (40.724, -74.194), (40.779, -73.876),
        (40.769, -73.974), (40.727, -73.999)))
      val sil = Silhouette.score(pts, r.centroids)
      assert(math.abs(sil - 0.824746691962) < 1e-9, s"sil=$sil")

      // M6 end-to-end: the Summary.txt-format report for this run
      val report = ModelSelect.summaryReport(
        SweepEntry(5, sil, r.iterations, r.converged), r.centroids)
      val out = java.nio.file.Files.createTempDirectory("golden")
        .resolve("Summary.txt").toString
      graft.ops.Sinks.writeReport(report, out)
      val lines = java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(out))
      assert(lines.get(0).startsWith("Max SilScore:0.8247466919615"))
      assert(lines.get(0).endsWith("at kValue:5 at iteration:12"))
      assert(lines.get(1) == "Corresponding centroids")
      assert(lines.get(2) == "0. Lat:40.675 Longitude:-73.734")
      assert(lines.size() == 7)
    } finally { pts.unpersist(); () }
  }

  // ---- byte-format parity against the reference's COMMITTED outputs
  // (r16 verdict item 8). The scores themselves are init-dependent (the
  // reference's unseeded Random — see the object doc), so the committed
  // VALUES can't be reproduced; the FORMAT can and must be. Each test
  // parses a committed file with a grammar regex, re-renders the parsed
  // values through this engine's own report renderer, and asserts the
  // bytes match the reference's verbatim — any drift in a label, casing
  // ("Kvalue" vs "kValue"), separator, or double rendering fails here.

  private def readLines(p: String): Seq[String] = {
    val src = scala.io.Source.fromFile(p)
    try src.getLines().toList finally src.close()
  }

  test("KResults.txt byte format round-trips the committed reference file") {
    val f = "/root/reference/final/outputs/KResults.txt"
    assume(new java.io.File(f).isFile)
    val got = readLines(f)
    val re = """SilScore:(\S+) at Kvalue:(\d+) at iteration:(\d+)""".r
    val entries = got.map { case re(s, k, i) =>
      SweepEntry(k.toInt, s.toDouble, i.toInt, converged = true) }
    assert(ModelSelect.kResultsReport(entries) == got)
  }

  test("Summary.txt byte format round-trips both committed reference files") {
    val hdr = """Max SilScore:(\S+) at kValue:(\d+) at iteration:(\d+)""".r
    val cen = """(\d+)\. Lat:(\S+) Longitude:(\S+)""".r
    // Summary.txt is the k=1 smoke run; summary.txt the k=10 EMR run with
    // a SPARSE centroid list (only 6 of 10 ids) — the renderer must not
    // invent rows for missing ids, only sort and print what it is given.
    for (name <- Seq("Summary.txt", "summary.txt")) {
      val f = s"/root/reference/final/outputs/$name"
      assume(new java.io.File(f).isFile)
      val got = readLines(f)
      val hdr(s, k, i) = got.head: @unchecked
      assert(got(1) == "Corresponding centroids")
      val cs = got.drop(2).map { case cen(idx, la, lo) =>
        Centroid(idx.toInt, la.toDouble, lo.toDouble) }
      val rendered = ModelSelect.summaryReport(
        SweepEntry(k.toInt, s.toDouble, i.toInt, converged = true), cs)
      assert(rendered == got)
    }
  }
}
