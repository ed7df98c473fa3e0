package graft.ml

import graft.SparkSpec

/** Pins the integer fixed-point GD loop iteration by iteration — every
  * asserted number is hand-derived from the micro-unit arithmetic in the
  * LinearProbe scaladoc (margins, hard-sigmoid clamp, truncating
  * divisions), so any drift in division semantics or gradient order
  * breaks a named constant, not a fuzzy tolerance.
  */
class LinearProbeSpec extends SparkSpec {
  import spark.implicits._

  // two copies of "a a" (dup, y=1), two unique singles (y=0);
  // f1 = n_chars div 64 = 0 for all, f2 = token count = (2, 2, 1, 1)
  private def docs = Seq(
    (1L, "a a", "en", "s0", 3L),
    (2L, "a a", "en", "s0", 3L),
    (3L, "b", "en", "s0", 1L),
    (4L, "c", "en", "s0", 1L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("one iteration: hand-computed gradient and update") {
    // r = 500000 − 10⁶y → (−5e5, −5e5, 5e5, 5e5): g0 = 0, g1 = 0,
    // g2 = −2e6 + 1e6 = −10⁶ → w2 = −(−10⁶ div (64·4)) = 3906
    // margins all ≥ 0 → predict dup everywhere → acc 2/4 = 500‰
    val got = LinearProbe.trainHardSigmoidGd(docs, iterations = 1)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("acc_pm", 500L), ("n", 4L), ("w0", 0L),
      ("w1", 0L), ("w2", 3906L)))
  }

  test("two iterations compound through the clamp exactly") {
    // iter-2 margins (0, 0, 3906·2=7812 | 3906): h = 500000 + m div 4 →
    // (501953, 501953, 500976, 500976); residuals (−498047, ·, 500976, ·)
    // g0 = 5858 → w0 = −(5858 div 256) = −22
    // g2 = −3984376·? → 2·(−498047·2) + 2·(500976·1) = −990236
    //   → w2 = 3906 + (990236 div 256) = 3906 + 3868 = 7774
    val got = LinearProbe.trainHardSigmoidGd(docs, iterations = 2)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("acc_pm", 500L), ("n", 4L), ("w0", -22L),
      ("w1", 0L), ("w2", 7774L)))
  }

  test("determinism: same corpus, same model, twice") {
    val a = LinearProbe.trainHardSigmoidGd(docs, iterations = 3)
      .as[(String, Long)].collect().toSeq
    val b = LinearProbe.trainHardSigmoidGd(docs, iterations = 3)
      .as[(String, Long)].collect().toSeq
    assert(a == b)
  }

  test("learningCurve: the 1000-permille rung IS the full trainer; " +
      "train sizes nest monotonically") {
    // a larger corpus so every slice is non-empty
    val many = (1L to 200L).map(i =>
      (i, s"doc number $i with some words", 30L + (i % 7))).toDF(
      "doc_id", "text", "n_chars")
    val curve = LinearProbe.learningCurve(many,
        slicesPm = Seq(250, 500, 1000), iterations = 3)
      .as[(Int, Long, Long, Long, Long, Long)].collect().toSeq
    assert(curve.map(_._1) == Seq(250, 500, 1000))
    // nested slices: n_train strictly grows to the full corpus
    assert(curve.map(_._2).sliding(2).forall(p => p(0) < p(1)))
    assert(curve.last._2 == 200L)
    // the full-slice rung trains on everything — identical weights and
    // accuracy to trainHardSigmoidGd on the same corpus
    val full = LinearProbe.trainHardSigmoidGd(many, iterations = 3)
      .as[(String, Long)].collect().toMap
    assert(curve.last._3 == full("acc_pm") &&
      curve.last._4 == full("w0") && curve.last._5 == full("w1") &&
      curve.last._6 == full("w2"))
  }
}
