package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end corpus-preparation composition a training-data pipeline
  * runs over raw documents: exact dedup → quality gate → deterministic
  * split → per-split accounting. Nothing here is a new operator — the
  * point is that the library's pieces COMPOSE declaratively, so Catalyst
  * sees ONE plan: fingerprint + tokenization in the scan stage, one
  * map-side-combined shuffle for the dup-group keys, a semi-join back
  * (AQE picks broadcast when the keeper set allows), and one final
  * aggregate by split. No stage materializes an intermediate frame.
  *
  * Determinism discipline (what makes the result oracle-checkable):
  * every reported number is a count, an exact integer sum, or a ratio of
  * integer sums — no double accumulation whose low bits depend on
  * partition order.
  */
object Pipeline {

  /** Per-split corpus accounting after dedup + quality filtering:
    * `(split, n_docs, total_tokens, avg_tokens, stop_share)`.
    *
    * Stages, with their scale shape:
    *  - exact dedup in aggregate-then-semi-join form: `groupBy(fp)`
    *    partial-aggregates map-side, so a pathologically hot fingerprint
    *    (the same boilerplate duplicated across the corpus) contributes
    *    one row per map task instead of funneling one reducer — the
    *    window-min formulation would straggle exactly there (the df-cap
    *    lesson, see Dedup.pairsBySetOverlap);
    *  - quality gate on cheap per-row stats, computed in the same stage
    *    as the scan (Gopher/C4-style: enough tokens, enough stopword
    *    density to look like natural language);
    *  - `Sampling.deterministicSplit`: a pure projection, engine-portable
    *    md5 bucketing, no shuffle;
    *  - final `groupBy(split)`: three-ish rows out.
    */
  def prepareCorpus(documents: DataFrame,
                    minTokens: Int = 20,
                    minStopRatio: Double = 0.05,
                    fractions: Seq[(String, Double)] =
                      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      : DataFrame = {
    // EVERYTHING derived from text — fingerprint AND quality stats — is
    // computed in the scan stage, and text is dropped right there: the
    // dedup semi-join then shuffles only (doc_id, fp, two ints) on both
    // sides. The tempting "dedup first, tokenize survivors" order would
    // ship the raw text through the fingerprint exchange — at corpus
    // scale that IS the job's cost. Tokenizing a duplicate that dedup
    // then drops is wasted CPU only on the (rare) dups, and it's scan-
    // local; shuffled bytes are the resource that doesn't forgive.
    val toks = Text.tokens(col("text"))
    val slim = documents.select(
      col("doc_id"),
      md5(Text.normText(col("text")).cast("binary")).as("fp"),
      size(toks).as("n_tokens"),
      size(filter(toks, w =>
        w.isin(Text.defaultStopwords: _*))).as("n_stop"))
    val keepers = slim.groupBy("fp").agg(min("doc_id").as("doc_id"))
    val scored = slim.join(keepers, Seq("fp", "doc_id"), "left_semi")
      .filter(col("n_tokens") >= minTokens &&
        col("n_stop") / col("n_tokens") >= minStopRatio)
      .select("doc_id", "n_tokens", "n_stop")
    Sampling.deterministicSplit(scored, "doc_id", fractions)
      .groupBy("split")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        round(avg("n_tokens"), 2).as("avg_tokens"),
        round(sum("n_stop") / sum("n_tokens"), 4).as("stop_share"))
      .orderBy("split")
  }
}
