package graft.ops

import graft.SparkSpec

class LangIdSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("profile n-gram scoring picks the dominant language") {
    val d = docs(
      "the thing and the other thing of everything",       // en
      "der schnelle und der gute dichter macht einen bericht", // de
      "buscamos la casa de la playa y el mar que brilla")  // es
    val r = LangId.languageIdResult(d).collect()
      .map(x => x.getLong(0) -> x.getString(x.length - 1)).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "es")
  }

  test("ties resolve to the first profile in order") {
    val r = LangId.languageIdResult(docs("zzz qqq")).collect().head
    // all scores 0 → every language is a max → first profile wins
    assert(r.getString(r.length - 1) == "en")
  }

  test("custom profiles are honored") {
    val p: LangId.Profiles = Seq("x" -> Seq("foo"), "y" -> Seq("bar"))
    val r = LangId.languageIdResult(docs("bar bar"), p).collect().head
    assert(r.getString(r.length - 1) == "y")
  }

  test("confusionCensus: diagonal hits and a planted confusion") {
    val d = Seq(
      (1L, "the and", "en"),            // predicted en: diagonal
      (2L, "der sch und", "de"),        // predicted de: diagonal
      (3L, "the and ing ion", "de")     // de doc that reads as en
    ).toDF("doc_id", "text", "lang")
    val got = LangId.confusionCensus(d)
      .as[(String, String, Long)].collect().toSeq
    assert(got == Seq(("de", "de", 1L), ("de", "en", 1L),
      ("en", "en", 1L)))
  }
}
