package graft.ops

import graft.SparkSpec

/** Pins the integer-micro PageRank arithmetic round by round. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  // 1→2, 1→3, 2→3, 3→1: deg(1)=2, deg(2)=deg(3)=1
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L))
    .toDF("src", "dst")

  test("pageRankMicro: one round, hand-computed micro-units") {
    // contribs: 1→{2,3}: 500000 each; 2→3: 1e6; 3→1: 1e6
    // p1 = 150000 + 850·incoming // 1000
    val got = Graph.pageRankMicro(edges, iterations = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1000000L), (2L, 575000L), (3L, 1425000L)))
  }

  test("pageRankMicro: second round compounds exactly") {
    // contribs from p1: 1→{2,3}: 500000; 2→3: 575000; 3→1: 1425000
    val got = Graph.pageRankMicro(edges, iterations = 2)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1361250L), (2L, 575000L), (3L, 1063750L)))
  }

  test("pageRankMicro: sink-only node gets base, dangling mass drops") {
    // 1→2 only: node 2 has no out-edges (dangling), node 1 no in-edges
    val e = Seq((1L, 2L)).toDF("src", "dst")
    val got = Graph.pageRankMicro(e, iterations = 1)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 150000L), (2L, 1000000L)))
    // duplicate edges must not double-contribute
    val dup = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    assert(Graph.pageRankMicro(dup, iterations = 1)
      .as[(Long, Long)].collect().toSeq == got)
  }

  test("triangleCount: orientation counts each triangle exactly once") {
    // K4 minus one edge = 2 triangles; edges given in mixed directions
    // with duplicates and a self-loop, all of which must collapse
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 4L),
      (2L, 4L), (2L, 4L), (3L, 3L)).toDF("src", "dst")
    assert(Graph.triangleCount(e).as[Long].collect().head == 2L)
    // no triangle: a path
    val p = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangleCount(p).as[Long].collect().head == 0L)
  }

  test("kHopReach: exact BFS levels, symmetrized edges, no revisits") {
    // path 0–1–2–3–4 plus chord 0–2: from seed 0, hop1 = {1,2},
    // hop2 = {3}, hop3 = {4} — node 2 must NOT recount at hop 2 via
    // 0→1→2; from seed 1 (also < 2): hop1 = {0,2}, hop2 = {3},
    // hop3 = {4}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 2L))
      .toDF("src", "dst")
    val got = Graph.kHopReach(edges, maxSeedId = 2L, hops = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 2L), (1L, 2L, 1L), (1L, 3L, 1L)))
  }

  test("degreeAssortativity: star is exactly -1, hand-checked sums") {
    // star 0–{1,2,3}: deg(0)=3, leaves 1 — every edge end pairs a hub
    // with a leaf, perfect anti-correlation: n=6, sx=sy=12, sxy=18,
    // sxx=syy=30 → r = (6·18−144)/(6·30−144) = −36/36 = −1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val got = Graph.degreeAssortativity(star)
      .as[(Long, Option[Long])].collect().head
    assert(got == ((6L, Some(-1000000L))))
  }

  test("degreeAssortativity: regular graph has zero variance → NULL") {
    // triangle: all degrees 2 — denominator is 0, r undefined
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val got = Graph.degreeAssortativity(tri)
      .as[(Long, Option[Long])].collect().head
    assert(got == ((6L, None)))
  }

  test("degreeAssortativity: direction, dups, self-loops collapse") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")
    val messy = Seq((1L, 0L), (0L, 1L), (0L, 2L), (2L, 0L), (0L, 3L),
      (3L, 3L)).toDF("src", "dst")
    assert(Graph.degreeAssortativity(messy)
      .as[(Long, Option[Long])].collect().head ==
      Graph.degreeAssortativity(star)
        .as[(Long, Option[Long])].collect().head)
  }

  test("recursive CTE BFS (q388) equals the iterative-join form (q274) " +
      "on the real fixture — implementation invariance") {
    val rec = graft.SparkEntry.queries("q388_recursive_reach")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val iter = graft.SparkEntry.queries("q274_khop_reach")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    assert(rec == iter)
    assert(rec.nonEmpty)
  }
}
