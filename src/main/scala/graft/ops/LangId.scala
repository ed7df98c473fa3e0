package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram-profile language identification (north-star text analysis;
  * no reference citation — SURVEY.md §2.8 engine-surface extension).
  *
  * Classic Cavnar–Trenkle-style heuristic, relationally: score each
  * language as the number of its profile n-grams contained in the
  * (lowercased) text; predict the first language among the maxima
  * (profile order breaks ties). Everything is `contains` + integer
  * adds — codegen'd, exactly reproducible, and expressible in ANSI SQL
  * for the oracle.
  *
  * Profiles are data, not code: callers pass their own corpus-derived
  * profiles; `defaultProfiles` ships common character tri-/bigrams for a
  * few Latin-script languages as a usable default.
  */
object LangId {

  /** (language → characteristic n-grams), ordered; order breaks ties. */
  type Profiles = Seq[(String, Seq[String])]

  val defaultProfiles: Profiles = Seq(
    "en" -> Seq(" th", "the", "ing", " an", "and", " of", "ion", " to"),
    "de" -> Seq("der", "sch", " un", "und", "ein", "ich", " de", "cht"),
    "es" -> Seq(" de", "de ", " la", "la ", "ión", " el", "que", " qu"),
    "fr" -> Seq(" le", "es ", " la", "de ", "ent", " et", "une", "eur"))

  private def score(text: Column, ngrams: Seq[String]): Column =
    ngrams.map(g => when(text.contains(g), 1).otherwise(0))
      .reduce(_ + _)

  /** Adds per-language scores and the predicted language. */
  def languageId(documents: DataFrame,
                 profiles: Profiles = defaultProfiles): DataFrame = {
    val low = lower(col("text"))
    val scored = profiles.foldLeft(documents) { case (df, (lang, grams)) =>
      df.withColumn(s"score_$lang", score(low, grams))
    }
    // first maximum wins, in profile order
    val best = profiles.map(_._1).foldRight(lit(profiles.last._1)) {
      case (lang, rest) =>
        val isMax = profiles.map(p => col(s"score_$lang") >= col(s"score_${p._1}"))
          .reduce(_ && _)
        when(isMax, lit(lang)).otherwise(rest)
    }
    scored.withColumn("lang_pred", best)
  }

  /** The oracle-facing projection: (doc_id, per-language scores, pick). */
  def languageIdResult(documents: DataFrame,
                       profiles: Profiles = defaultProfiles): DataFrame =
    languageId(documents, profiles)
      .select(col("doc_id") +:
        profiles.map(p => col(s"score_${p._1}")) :+ col("lang_pred"): _*)
      .orderBy("doc_id")

  /** Confusion census of the classifier against the corpus label: one
    * row per (true, predicted) pair — the model-eval view (where does
    * the heuristic confuse es↔fr?) that the per-doc q37 dump and the
    * q234 purity census don't aggregate. Diagonal mass over total IS
    * the accuracy; off-diagonal rows name the confusions. One scan +
    * one ≤|langs|²-row partial agg.
    */
  def confusionCensus(documents: DataFrame,
                      profiles: Profiles = defaultProfiles): DataFrame =
    languageId(documents, profiles)
      .groupBy(col("lang").as("lang_true"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy("lang_true", "lang_pred")
}
