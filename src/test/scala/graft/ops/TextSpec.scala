package graft.ops

import graft.SparkSpec

class TextSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  test("redact: emails, URLs, phones -> tags; clean text untouched") {
    val d = docs(
      "contact me at jane.doe+spam@example.co.uk or visit " +
        "https://example.com/a?b=c#d for info",
      "call +1-555-123-4567 or (555) 123 4567 today",
      "no pii here at all")
    val r = Text.redact(d).select("text").as[String].collect()
    assert(r(0) == "contact me at <EMAIL> or visit <URL> for info")
    assert(r(1) == "call <PHONE> or <PHONE> today")
    assert(r(2) == "no pii here at all")
    // order: an email-shaped userinfo inside a URL redacts as ONE url
    val u = Text.redact(docs("see https://user@host.com/path now"))
      .select("text").as[String].collect()
    assert(u(0) == "see <URL> now")
  }

  test("redact: digit-boundary guards on phone-shaped numbers") {
    val r = Text.redact(docs(
      // 16-digit card: no 10–13-digit phone shape flanked by non-digits
      "card 1234567890123456 on file",
      // bare 10-digit run IS phone-shaped — documented over-match
      "id 5551234567 end",
      "5551234567",
      // single-char separators: the two-pass close catches the chain
      "5551234567,5551234568,5551234569",
      // inside a longer digit run: leading guard can't match
      "big 123455512345679 num")).select("text").as[String].collect()
    assert(r(0) == "card 1234567890123456 on file")
    assert(r(1) == "id <PHONE> end")
    assert(r(2) == "<PHONE>")
    assert(r(3) == "<PHONE>,<PHONE>,<PHONE>")
    assert(r(4) == "big 123455512345679 num")
  }

  test("domainStats: extract-ALL per doc, host isolation, tie-break") {
    val d = docs(
      "see https://a.com/x and http://b.org/y?z=1 plus https://a.com/w",
      "no urls here at all",
      "also https://b.org/q trailing")
    val got = Text.domainStats(d, topK = 10)
      .as[(String, Long)].collect().toSeq
    // a.com twice in ONE doc (extract-all, not extract-first); b.org
    // across docs; tie at 2 breaks on domain ascending; URL-free doc
    // contributes nothing
    assert(got == Seq(("a.com", 2L), ("b.org", 2L)))
  }

  test("P1/A1: word count over whitespace tokens, sorted by word") {
    val r = Text.wordCount(docs("b a  b", "a c")).collect()
      .map(x => x.getString(0) -> x.getLong(1))
    assert(r.toSeq == Seq("a" -> 2L, "b" -> 2L, "c" -> 1L)) // multi-space ok
  }

  test("P2: prefix regex keeps only [m-qM-Q] words") {
    val r = Text.wordCountFiltered(docs("map nap zap Quip apple mQ"))
      .collect().map(_.getString(0))
    assert(r.toSeq == Seq("Quip", "mQ", "map", "nap"))
  }

  test("quality: stopword ratio and mean token length are exact divisions") {
    val r = Text.qualityScore(docs("the cat sat")).collect().head
    assert(r.getAs[Int]("n_tokens") == 3)
    assert(r.getAs[Int]("n_stop") == 1)
    assert(r.getAs[Double]("stop_ratio") == 1.0 / 3.0)
    assert(r.getAs[Double]("mean_tok_len") == 9.0 / 3.0)
  }

  test("quality on an empty document: zero counts, NULL ratios, no crash") {
    val r = Text.qualityScore(docs("   ")).collect().head
    assert(r.getAs[Int]("n_tokens") == 0)
    assert(r.isNullAt(r.fieldIndex("stop_ratio")))
    assert(r.isNullAt(r.fieldIndex("mean_tok_len")))
  }

  test("fingerprint is whitespace/case-insensitive but content-sensitive") {
    val r = Text.fingerprint(docs("The  Cat", "the cat", "the dog"))
      .collect().map(_.getString(1))
    assert(r(0) == r(1) && r(0) != r(2))
  }

  test("O1: reference partitioner places each letter group in its partition") {
    import org.apache.spark.sql.functions.spark_partition_id
    val d = docs("map map nap order quit pick mud mat")
    val out = Text.wordCountPartitionedLikeReference(d)
      .withColumn("pid", spark_partition_id())
    val placed = out.collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    // m→0, n→1, o→2, p→3, q→4 (WordCount2/WordCount.java:59–72)
    assert(placed == Map("map" -> 0, "mud" -> 0, "mat" -> 0, "nap" -> 1,
      "order" -> 2, "pick" -> 3, "quit" -> 4))
    // and each partition is key-sorted like an MR reducer's part file
    val perPartition = out.rdd
      .mapPartitions(it => Iterator(it.map(_.getString(0)).toSeq))
      .collect()
    perPartition.foreach(ws => assert(ws == ws.sorted, s"unsorted: $ws"))
  }

  test("BPE-ish token count splits contractions, digits, punctuation") {
    val r = Text.tokenCounts(docs("it's 42 degrees, isn't it?")).collect().head
    assert(r.getAs[Int]("n_ws_tokens") == 5)
    // it|'s| 42| degrees|,| isn|'t| it|? → 9 BPE-ish tokens
    assert(r.getAs[Int]("n_bpe_tokens") == 9)
  }

  test("token stats count non-empty tokens only") {
    val r = Text.tokenStats(docs("  a  b  ")).collect().head
    assert(r.getAs[Int]("n_tokens") == 2)
  }

  test("vertical tab is NOT a token separator (RE2-parity whitespace)") {
    // Java \s matches  but DuckDB's RE2 does not; the engine pins
    // the explicit class [ \t\n\r\f] so both engines tokenize identically
    val r = Text.tokenStats(docs("ab c")).collect().head
    assert(r.getAs[Int]("n_tokens") == 2) // "ab" and "c"
  }

  test("tfidf ranks corpus-rare terms above ubiquitous ones") {
    // "common" in all 3 docs -> idf = ln(1) = 0 -> never a top term;
    // "rare" appears twice in doc 0 -> tf*idf beats the singletons
    val d = docs(
      "common rare rare alpha",
      "common beta",
      "common gamma")
    val got = Text.tfidfTopTerms(d, topK = 2)
      .select("doc_id", "rank", "term").as[(Long, Int, String)]
      .collect().toSeq
    assert(got.filter(_._1 == 0L).map(_._3) == Seq("rare", "alpha"))
    // "common" scores 0 in every doc: ranked last, only surfaces when a
    // doc has fewer than topK positive-scoring terms
    assert(got.filter(_._1 == 1L).map(_._3) == Seq("beta", "common"))
  }

  test("tfidf equal scores break ties by term ascending") {
    val d = docs("zz aa", "other")
    val got = Text.tfidfTopTerms(d, topK = 2)
      .filter("doc_id = 0").select("term").as[String].collect().toSeq
    assert(got == Seq("aa", "zz")) // same tf, same df -> lexicographic
  }

  test("repetition stats: dup and top bigram fractions") {
    // "a b a b a" -> bigrams [a b, b a, a b, b a]: 4 total, 2 distinct
    val got = Text.repetitionStats(docs("a b a b a", "x y"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == Seq((0L, 4L, 0.5, 0.5), (1L, 1L, 0.0, 1.0)))
  }

  test("repetition stats: short docs surface with zero bigrams") {
    val got = Text.repetitionStats(docs("solo", "")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(0L, 0L))
    assert(got.forall(r => r.isNullAt(2) && r.isNullAt(3)))
  }

  test("nfc: composed and decomposed encodings merge; ascii is identity") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.functions.col
    GraftFunctions.register(spark)
    val decomposed = "café Å"   // e+combining acute, A+ring
    val composed = "café Å"       // precomposed é, Å
    val d = docs(decomposed, composed, "plain ascii")
    val got = d.select(GraftFunctions.nfc(col("text")).as("t"))
      .as[String].collect().toSeq
    // both spellings normalize to the SAME byte string
    assert(got(0) == got(1))
    assert(got(0) == composed) // NFC is the composed form
    assert(got(2) == "plain ascii")
    // the dedup consequence: NFC before fingerprinting merges
    // encoding-variant duplicates that byte-level hashing misses
    assert(decomposed != composed)
    // SQL-visible under the registered name
    d.createOrReplaceTempView("nfc_docs")
    val viaSql = spark.sql(
      "SELECT graft_nfc(text) FROM nfc_docs ORDER BY doc_id")
      .as[String].collect().toSeq
    assert(viaSql == got)
    // null flows through as null
    assert(docs(null.asInstanceOf[String])
      .select(GraftFunctions.nfc(col("text"))).collect().head.isNullAt(0))
  }

  test("bigram LM score: quantized mean log-prob, hand-checked") {
    // corpus: doc0 = "a b a b" (bigrams: a b ×2, b a ×1), doc1 = "a c"
    // model: c(a b)=2, c(b a)=1, c(a c)=1; c(a ·)=3, c(b ·)=1
    // quantized ln P: a b -> round(ln(2/3)*1e4) = -4055; b a -> 0;
    //                 a c -> round(ln(1/3)*1e4) = -10986
    val got = Text.bigramLmScore(docs("a b a b", "a c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got(0) == ((0L, 3L, (2.0 * -4055 + 0) / 30000.0)))
    assert(got(1) == ((1L, 1L, -10986 / 10000.0)))
  }

  test("bigram LM score: short docs surface with zero bigrams, NULL score") {
    val got = Text.bigramLmScore(docs("a b", "solo", "")).collect()
    assert(got.map(_.getLong(1)).toSeq == Seq(1L, 0L, 0L))
    assert(got(0).getDouble(2) == 0.0) // only bigram: P(b|a)=1, ln=0
    assert(got(1).isNullAt(2) && got(2).isNullAt(2))
  }

  test("boilerplate lines: frequent lines vanish, order kept, docs kept") {
    // header in all 4 docs (df=4 >= 3), footer in 3; per-doc body unique;
    // blank lines are never boilerplate regardless of df
    val d = docs(
      "HEAD\nbody zero\n\nFOOT",
      "HEAD\nbody one\n\nFOOT",
      "HEAD\nbody two\nFOOT",
      "HEAD\nonly head")
    val got = Text.removeBoilerplateLines(d, minDocs = 3)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, "body zero\n"), (1L, "body one\n"),
      (2L, "body two"), (3L, "only head")))
    // a doc that was ALL boilerplate survives with empty text
    val all = Text.removeBoilerplateLines(
      docs("X", "X", "X\nkeep me"), minDocs = 3)
      .as[(Long, String)].collect().toSeq
    assert(all == Seq((0L, ""), (1L, ""), (2L, "keep me")))
    // below-threshold lines are untouched even when repeated
    val under = Text.removeBoilerplateLines(docs("dup\na", "dup\nb"),
      minDocs = 3).as[(Long, String)].collect().toSeq
    assert(under == Seq((0L, "dup\na"), (1L, "dup\nb")))
    intercept[IllegalArgumentException] {
      Text.removeBoilerplateLines(d, minDocs = 1)
    }
  }

  test("boilerplate lines: df counts DISTINCT docs, not occurrences") {
    // 'spam' appears 3 times but in only ONE doc -> df=1, stays
    val got = Text.removeBoilerplateLines(
      docs("spam\nspam\nspam", "other"), minDocs = 3)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq((0L, "spam\nspam\nspam"), (1L, "other")))
  }

  test("chunking: windows cover every token, tail rides the overlap") {
    // 10 tokens, window 4, stride 3 -> chunks at 1,4,7 (ceil(6/3)+1 = 3)
    val text = (1 to 10).map(i => s"t$i").mkString(" ")
    val got = Text.chunkTokens(docs(text), window = 4, stride = 3)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0, 4, "t1 t2 t3 t4"),
      (0L, 1, 4, "t4 t5 t6 t7"),
      (0L, 2, 4, "t7 t8 t9 t10")))
    // reconstruction law: stride-aligned prefixes of each chunk, plus the
    // last chunk whole, reproduce the token stream exactly
    val toks = got.dropRight(1).flatMap(_._4.split(" ").take(3)) ++
      got.last._4.split(" ")
    assert(toks == (1 to 10).map(i => s"t$i"))
  }

  test("chunking: short, empty, and null docs yield exactly one chunk") {
    // null text must NOT drop the row (a null would null out the chunk
    // count and the explode would silently erase the document)
    val got = Text.chunkTokens(docs("a b", "", "  ", null),
        window = 4, stride = 2)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got == Seq((0L, 0, 2, "a b"), (1L, 0, 0, ""), (2L, 0, 0, ""),
      (3L, 0, 0, "")))
    // exact-fit doc: one chunk, not two (n == window is the <= branch)
    val fit = Text.chunkTokens(docs("a b c d"), window = 4, stride = 2)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(fit == Seq((0L, 0, 4, "a b c d")))
    // n = window + 1: the second window starts at stride+1 and holds the tail
    val one = Text.chunkTokens(docs("a b c d e"), window = 4, stride = 2)
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(one == Seq((0L, 0, 4, "a b c d"), (0L, 1, 3, "c d e")))
    intercept[IllegalArgumentException] {
      Text.chunkTokens(docs("a"), window = 2, stride = 3)
    }
  }

  test("pmiPairs ranks an exclusive pair above an independent one") {
    // x,y co-occur in 2/6 docs and NEVER apart → PMI ratio 2·6/(2·2)=3;
    // p,q each appear 4 times, together only twice → 2·6/(4·4)=0.75
    val d = docs("x y p q", "x y p q", "p z1", "q z2", "p z3", "q z4")
    val got = Text.pmiPairs(d, topK = 10, minPairs = 2)
      .select("t1", "t2", "pair_df", "score_num", "score_den")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got.head == ("x", "y", 2L, 12L, 4L))
    val pq = got.find(r => r._1 == "p" && r._2 == "q").get
    assert(pq == ("p", "q", 2L, 12L, 16L))
    assert(got.indexOf(pq) > 0) // independent pair ranks below
    // pair below support threshold never surfaces
    assert(!got.exists(r => r._1 == "z1" || r._2 == "z1"))
  }

  test("pmiPairs respects the per-doc distinct-token cap") {
    // cap=2 keeps only the 2 sorted-first distinct tokens (a, b): the
    // (a,z)/(b,z) pairs vanish even though z co-occurs in every doc
    val d = docs("z a b", "z a b", "a b z")
    val got = Text.pmiPairs(d, topK = 10, minPairs = 2, maxTokensPerDoc = 2)
      .select("t1", "t2").as[(String, String)].collect().toSeq
    assert(got == Seq(("a", "b")))
  }

  test("bpePairCensus: frequency-weighted pairs, argmax is the merge") {
    // "aab" ×3 → pairs aa,ab each ×3; "ab" ×2 → ab ×2; "x" has no pair
    val d = docs("aab aab ab", "aab ab x")
    val got = Text.bpePairCensus(d, topK = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("ab", 5L), ("aa", 3L)))
  }

  test("bpePairCensus counts word occurrences, not distinct words") {
    // same word in two docs: freq 2, pair weight 2 (corpus-weighted)
    val d = docs("hi", "hi")
    assert(Text.bpePairCensus(d, topK = 5)
      .as[(String, Long)].collect().toSeq == Seq(("hi", 2L)))
  }

  test("canonicalizeUrl merges spelling variants, keeps real params") {
    val urls = Seq(
      (0L, "https://CDN1.Example.ORG:443/p/9?utm_source=a&ref=1#frag"),
      (1L, "https://cdn1.example.org/p/9?utm_campaign=b&ref=1"),
      (2L, "http://Host.COM:80/x?utm_a=1"),
      (3L, "http://host.com/x"),
      (4L, "https://cdn1.example.org/p/9?ref=2"), // real param differs
      (5L, "https://cdn1.example.org/P/9?ref=1")) // path case significant
      .toDF("doc_id", "url")
    val got = Text.urlDedup(urls)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("http://host.com/x", 2L, 2L),
      ("https://cdn1.example.org/P/9?ref=1", 1L, 5L),
      ("https://cdn1.example.org/p/9?ref=1", 2L, 0L),
      ("https://cdn1.example.org/p/9?ref=2", 1L, 4L)))
  }

  test("canonicalizeUrl: multiple utm params and port-only host") {
    val urls = Seq(
      (0L, "https://a.com:443?utm_x=1&utm_y=2&k=3&utm_z=4"),
      (1L, "https://a.com?k=3"),
      (2L, "https://a.com:4430/p")) // NOT the default port: kept
      .toDF("doc_id", "url")
    val got = Text.urlDedup(urls)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("https://a.com:4430/p", 1L, 2L),
      ("https://a.com?k=3", 2L, 0L)))
  }

  test("canonicalizeUrl: non-http URLs pass through, never collapse") {
    val urls = Seq(
      (0L, "ftp://Files.example.com/x"),
      (1L, "mailto:bob@example.com"),
      (2L, "/relative/path?utm_a=1#frag"),
      (3L, "HTTPS://A.com/x")) // case-insensitive scheme still canonical
      .toDF("doc_id", "url")
    val got = Text.urlDedup(urls)
      .as[(String, Long, Long)].collect().toSeq
    // ftp/mailto/relative keep their identity (fragment/utm still
    // stripped) instead of all aliasing to ''
    assert(got == Seq(
      ("/relative/path", 1L, 2L),
      ("ftp://Files.example.com/x", 1L, 0L),
      ("https://a.com/x", 1L, 3L),
      ("mailto:bob@example.com", 1L, 1L)))
  }

  test("qualityClassify scores the rule ensemble exactly") {
    val d = docs(
      "the cat sat on the mat",        // all rules pass → 3+2+2+1 = 8
      "a b",                           // n_tokens < 3: r1,r3 fail → 2+1=3
      "zz yy xx ww vv",                // no stopword → r2 fails → 3+2+1=6
      "the 12345 99999 00000 11111")   // digits ≥ 20% → r4 fails → 7
    val got = Text.qualityClassify(d)
      .select("doc_id", "score", "keep")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got == Seq((0L, 8, 1), (1L, 3, 0), (2L, 6, 1), (3L, 7, 1)))
  }

  test("qualityClassify: null text is rejected, not silently dropped") {
    // a NULL text must not propagate into NULL score / NULL keep (neither
    // kept nor rejected — invisible to both keep=1 and keep=0 filters);
    // it coalesces to '' and surfaces as an explicit reject
    val d = Seq((0L, "the cat sat on the mat"),
      (1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = Text.qualityClassify(d)
      .select("doc_id", "score", "keep")
      .as[(Long, Int, Int)].collect().toSeq
    assert(got.map(_._1) == Seq(0L, 1L)) // every row represented
    assert(got(1)._3 == 0)               // null doc is an explicit reject
    assert(got.forall(r => r._2 >= 0 && (r._3 == 0 || r._3 == 1)))
  }

  test("charClassEntropy: hand-computed values, one-class and null docs") {
    val d = Seq(
      (0L, "ab12"),       // lower 2 + digit 2 -> 2·(-.5·ln .5) = ln 2
      (1L, "Aa 1!"),      // one char per class -> ln 5
      (2L, "aaaa"),       // one class -> 0.0 exactly (and NOT -0.0)
      (3L, ""),           // empty -> n 0, entropy 0
      (4L, null.asInstanceOf[String])) // null ≡ empty (every row scored)
      .toDF("doc_id", "text")
    val got = Text.charClassEntropy(d)
      .as[(Long, Int, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 4, math.rint(math.log(2) * 10000) / 10000),
      (1L, 5, math.rint(math.log(5) * 10000) / 10000),
      (2L, 4, 0.0), (3L, 0, 0.0), (4L, 0, 0.0)))
    // the one-class doc's 0.0 must be POSITIVE zero — IEEE -0.0 would
    // hash-differ from the oracle's 0.0
    assert(java.lang.Double.doubleToRawLongBits(got(2)._3) == 0L)
  }

  test("sourceDivergence: hand-computed KL, identical source scores 0") {
    // corpus: a={x x y}, b={x y y}. N=6, g(x)=3, g(y)=3.
    // KL(a) = (2·lq(2·6/(3·3)) + 1·lq(1·6/(3·3))) / (3·10000) with
    // lq(r) = round(ln(r)·10000): lq(4/3)=2877, lq(2/3)=-4055
    //   → (2·2877 − 4055) / 30000 = 1699/30000
    val d = Seq(
      (0L, "x x y", "en", "a", 0L), (1L, "x y y", "en", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got = Text.sourceDivergence(d)
      .as[(String, Long, Double)].collect().toSeq
    val lq = (r: Double) => math.rint(math.log(r) * 10000)
    val want = (2 * lq(4.0 / 3) + lq(2.0 / 3)) / 30000.0
    assert(got == Seq(("a", 3L, want), ("b", 3L, want)))
    // a source distributed exactly like the corpus diverges by 0
    val same = Seq(
      (0L, "x y", "en", "a", 0L), (1L, "x y", "en", "b", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val got2 = Text.sourceDivergence(same)
      .as[(String, Long, Double)].collect().toSeq
    assert(got2 == Seq(("a", 2L, 0.0), ("b", 2L, 0.0)))
  }

  test("vocabCoverage: (count desc, token asc) cut; exact OOV mass per source") {
    val d = Seq(
      ("s1", "aa aa aa bb cc"),
      ("s2", "aa bb bb dd")).toDF("source", "text")
    // corpus counts: aa=4 bb=3 cc=1 dd=1 — cc and dd tie at the V=3
    // boundary; token-asc tie-break must admit cc, not dd
    val v3 = Text.vocabCoverage(d, vocabSize = 3)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(v3 == Seq(("s1", 5L, 0L, 0.0), ("s2", 4L, 1L, 0.25)))
    val v2 = Text.vocabCoverage(d, vocabSize = 2)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(v2 == Seq(("s1", 5L, 1L, 0.2), ("s2", 4L, 1L, 0.25)))
    // vocab >= universe: zero OOV everywhere
    val vAll = Text.vocabCoverage(d, vocabSize = 100)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(vAll.forall(r => r._3 == 0L && r._4 == 0.0))
  }

  test("bpeTrainMerges: greedy merges with deterministic tie-break") {
    val d = Seq(("x", "low low lower")).toDF("source", "text")
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(1L))
    val got = Text.bpeTrainMerges(d, rounds = 3)
      .as[(Long, String, String, Long)].collect().toSeq
    // counts: low×2, lower×1. Round 1: |l| |o| and |o| |w| tie at wc 3 —
    // pair-asc admits |l| |o|. Round 2: |lo| |w| wc 3. Round 3: |low|'s
    // remaining pairs in "lower" tie at 1 — |e| |r| < |low| |e|.
    assert(got == Seq(
      (1L, "|l| |o|", "|lo|", 3L),
      (2L, "|lo| |w|", "|low|", 3L),
      (3L, "|e| |r|", "|er|", 1L)))
  }

  test("bpeTrainMerges: left-to-right non-overlapping application (aaaa)") {
    val d = Seq(("x", "aaaa aaa")).toDF("source", "text")
      .withColumn("doc_id", org.apache.spark.sql.functions.lit(1L))
    val got = Text.bpeTrainMerges(d, rounds = 2)
      .as[(Long, String, String, Long)].collect().toSeq
    // Round 1: aaaa has 3 adjacent |a| |a| positions, aaa has 2 → wc 5.
    // Greedy left-to-right application: aaaa → |aa| |aa| (first and
    // third pairs; the middle pair was consumed), aaa → |aa| |a|.
    // Round 2: |aa| |aa| and |aa| |a| tie at wc 1 — BYTE-order asc
    // ('a' 0x61 < '|' 0x7C, identical in Spark's UTF8String and
    // DuckDB's VARCHAR compare) admits |aa| |aa|.
    assert(got == Seq(
      (1L, "|a| |a|", "|aa|", 5L),
      (2L, "|aa| |aa|", "|aaaa|", 1L)))
  }

  test("inDomainLmScore: coverage separates off-domain; self-train " +
    "degenerates to bigramLmScore") {
    val domain = docs("the cat sat", "the cat ran")
    val corpus = Seq(
      (10L, "the cat sat"),       // fully covered
      (11L, "purple monkey dishwasher"), // zero coverage
      (12L, "the cat flew away")) // partial: 'the cat' known, rest not
      .toDF("doc_id", "text")
    val got = Text.inDomainLmScore(corpus, domain)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // model: 'the cat' p=1 (lq 0), 'cat sat'/'cat ran' p=.5
    val lnHalf = math.rint(math.log(0.5) * 10000) / 10000.0
    assert(got == Seq(
      (10L, 2L, 2L, Some(lnHalf / 2)), // (0 + ln .5)/2 over 2 bigrams
      (11L, 2L, 0L, None),
      (12L, 3L, 1L, Some(0.0))))
    // law: training on the corpus itself reproduces bigramLmScore with
    // full coverage
    val self = Text.inDomainLmScore(corpus, corpus)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    val base = Text.bigramLmScore(corpus)
      .as[(Long, Long, Option[Double])].collect().toSeq
    assert(self.map(r => (r._1, r._2, r._4)) == base)
    assert(self.forall(r => r._2 == r._3))
  }

  test("corpusDatasheet: dup mass from normalized fingerprints") {
    val d = Seq(
      (1L, "The Cat", "en", "a"), (2L, "the  cat", "en", "b"), // exact dups
      (3L, "other words here", "de", "a"))
      .toDF("doc_id", "text", "lang", "source")
    val got = Text.corpusDatasheet(d)
      .as[(Long, Long, Long, Long, Long, Long, Double)].collect().head
    assert(got == ((3L, 7L, 2L, 2L, 1L, 333L, 7.0 / 3)))
  }

  test("dupSpanFraction: span union across overlapping shared grams") {
    val d = docs(
      "a b c d e x y z",  // shares "a b c d e" (n=5) with doc 1
      "a b c d e q r",    // ...and one private tail
      "totally private words here now")
    val got = Text.dupSpanFraction(d, n = 5)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // docs 0/1 share exactly one 5-gram: positions 0..4 covered in both
    assert(got == Seq(
      (0L, 8L, 5L, Some(5.0 / 8)),
      (1L, 7L, 5L, Some(5.0 / 7)),
      (2L, 5L, 0L, Some(0.0))))
    // overlapping shared grams union, never double-count: two docs with
    // the same 6 tokens share two overlapping 5-grams → 6 positions
    val ov = docs("p q r s t u", "p q r s t u")
    val g2 = Text.dupSpanFraction(ov, n = 5)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    assert(g2 == Seq((0L, 6L, 6L, Some(1.0)), (1L, 6L, 6L, Some(1.0))))
  }

  test("phraseSearch: consecutive tokens only, overlaps counted, " +
    "boundaries respected") {
    val d = docs(
      "a b c a b c",       // 2 occurrences of "a b c"
      "a b x c",           // broken phrase: no hit
      "x a b c",           // at end: 1
      "a a a a")           // overlapping "a a a": positions 0 and 1
    assert(Text.phraseSearch(d, Seq("a", "b", "c"))
      .as[(Long, Long)].collect().toSeq == Seq((0L, 2L), (2L, 1L)))
    assert(Text.phraseSearch(d, Seq("a", "a", "a"))
      .as[(Long, Long)].collect().toSeq == Seq((3L, 2L)))
    // single-token phrase degenerates to a term-frequency filter
    assert(Text.phraseSearch(d, Seq("x"))
      .as[(Long, Long)].collect().toSeq == Seq((1L, 1L), (2L, 1L)))
  }

  test("bm25TopK: hand-computed Lucene BM25, rare term dominates") {
    val d = Seq((1L, "a a b"), (2L, "b c"), (3L, "c c c c"))
      .toDF("doc_id", "text")
    val got = Text.bm25TopK(d, Seq("a", "c"), k = 3)
      .as[(Long, Double)].collect().toSeq
    // N=3, dl=(3,2,4), avgdl=3; df: a=1, c=2
    val idfA = math.log(1.0 + 2.5 / 1.5)
    val idfC = math.log(1.0 + 1.5 / 2.5)
    val s1 = idfA * (2 * 2.2) / (2 + 1.2 * (0.25 + 0.75 * 3.0 / 3))
    val s2 = idfC * (1 * 2.2) / (1 + 1.2 * (0.25 + 0.75 * 2.0 / 3))
    val s3 = idfC * (4 * 2.2) / (4 + 1.2 * (0.25 + 0.75 * 4.0 / 3))
    // the rare term's doc outranks the c-heavy doc despite lower tf
    assert(s1 > s3 && s3 > s2)
    assert(got.map(_._1) == Seq(1L, 3L, 2L))
    got.map(_._2).zip(Seq(s1, s3, s2)).foreach { case (g, w) =>
      assert(math.abs(g - w) < 2e-6, s"$g vs $w")
    }
  }

  test("bpeSegmentCounts: per-doc token count under the trained merges") {
    val d = Seq((1L, "low low lower"), (2L, "low"))
      .toDF("doc_id", "text").withColumn("source",
        org.apache.spark.sql.functions.lit("x"))
    // merges after 3 rounds (first test): lo, low, er →
    // "low" = 1 symbol; "lower" = |low| |er| = 2
    val got = Text.bpeSegmentCounts(d, rounds = 3)
      .as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L + 1L + 2L), (2L, 1L)))
  }

  test("dsirWeights: quantized unigram log-ratio, hand-computed") {
    val domain = Seq((100L, "a a b")).toDF("doc_id", "text")
    val corpus = Seq((1L, "a b"), (2L, "c c")).toDF("doc_id", "text")
    val got = Text.dsirWeights(corpus, domain)
      .as[(Long, Long, Long, Option[Double])].collect().toSeq
    // target: p(a)=2/3 → lq −4055, p(b)=1/3 → −10986;
    // background: p(a)=p(b)=1/4 → −13863, p(c)=2/4 → −6931.
    // doc 1: ((−4055+13863)+(−10986+13863))/(2·10000) = 12685/20000
    assert(got.map(r => (r._1, r._2, r._3)) ==
      Seq((1L, 2L, 2L), (2L, 2L, 0L)))
    assert(got.head._4.contains(12685.0 / 20000.0))
    assert(got(1)._4.isEmpty) // 'c' unknown to the target model
  }

  test("zipfCensus: two-point slope is exactly −1 on a halving law") {
    val d = Seq((1L, "x x x x y y", "s")).toDF("doc_id", "text", "source")
    val got = Text.zipfCensus(d, topK = 2)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // N=6, V=2, ttr = 2·1000 div 6 = 333; freqs (4, 2) at ranks (1, 2)
    // → slope ln(2/4)/ln(2) = −1 → −1_000_000 at q6
    assert(got == Seq(("s", 6L, 2L, 333L, -1000000L)))
  }

  test("stupidBackoffScore: bigram branch, 0.4-unigram backoff, OOV") {
    // domain "a b a b a": bigrams {a b:2, b a:2} → p(b|a)=2/3? no:
    // u1(a)=2 (from bigram marginals a→: "a b" ×2), u1(b)=2 → both
    // conditionals = 1.0 → lq_bi = 0. unigram model: a:3, b:2, N=5.
    val domain = Seq((100L, "a b a b a")).toDF("doc_id", "text")
    // doc 1 "a b": bigram in model → lq 0 → score 0.0, n_bi_hits 1.
    // doc 2 "b b": bigram NOT in model, w2 'b' in vocab → backoff
    //   lq = round(ln(0.4·(2/5))·1e4) = round(ln(0.16)·1e4) = −18326.
    // doc 3 "a z": bigram unknown AND w2 'z' unknown → OOV: counted in
    //   n_bigrams, absent from n_scored, score NULL.
    val corpus = Seq((1L, "a b"), (2L, "b b"), (3L, "a z"))
      .toDF("doc_id", "text")
    val got = Text.stupidBackoffScore(corpus, domain)
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got(0) == ((1L, 1L, 1L, 1L, Some(0.0))))
    assert(got(1)._1 == 2L && got(1)._2 == 1L && got(1)._3 == 1L &&
      got(1)._4 == 0L)
    assert(math.abs(got(1)._5.get - (-1.8326)) < 1e-9)
    assert(got(2) == ((3L, 1L, 0L, 0L, None)))
  }

  test("fertilityCensus: integer ratios over summed per-lang counts") {
    // "héllo wörld x": ws=3; chars=13; bytes=15 (two 2-byte chars);
    // bpe regex splits " ?[a-zA-Z]+" runs around the non-ascii bytes:
    // h|é|llo|_w|ö|rld|_x → 7 proxy tokens
    val d = Seq((1L, "héllo wörld x", "de")).toDF("doc_id", "text", "lang")
    val got = Text.fertilityCensus(d)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    assert(got == (("de", 3L, 7L, 13L, 15L, 7000L / 3L, 15000L / 7L)))
  }

  test("fertilityCensus: an all-empty language surfaces NULL ratios, not an error") {
    // a language whose every document is empty/whitespace has zero
    // tokens in both tokenizations — the ratios must come back NULL
    // (nullif guard), not DIVIDE_BY_ZERO under Spark's ANSI default
    val d = Seq((1L, "", "xx"), (2L, "  \t ", "xx"),
      (3L, "real words here", "en")).toDF("doc_id", "text", "lang")
    val got = Text.fertilityCensus(d)
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    val xx = got.find(_._1 == "xx").get
    assert(xx._2 == 0L && xx._6.isEmpty && xx._7.isEmpty)
    assert(got.find(_._1 == "en").get._6.nonEmpty)
  }

  test("hapaxCensus: once-only types counted per source") {
    val d = Seq((1L, "a a b c", "s1"), (2L, "x x x", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Text.hapaxCensus(d)
      .as[(String, Long, Long, Long)].collect().toSeq
    // s1: types {a,b,c}, hapax {b,c} → 666‰; s2: {x} repeated → 0
    assert(got == Seq(("s1", 3L, 2L, 666L), ("s2", 1L, 0L, 0L)))
  }

  test("truncationPlan: lost mass per candidate length, exact integers") {
    // token counts 3, 5, 10 (total 18): at L=4 → two docs over, lost
    // (3-4<0 no) (5-4=1)+(10-4=6)=7 → 7000/18 = 388‰; at L=10 nothing
    val d = Seq((1L, "a b c"), (2L, "a b c d e"),
      (3L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val got = Text.truncationPlan(d, lengths = Seq(4L, 10L))
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((4L, 3L, 2L, 7L, 388L), (10L, 3L, 0L, 0L, 0L)))
  }

  test("effectiveTokens: recycled span mass discounted per source") {
    // doc 1 (srcA) and doc 2 (srcB) share a 5-gram: both lose those 5
    // positions; srcA keeps its 2 unique tokens of 7 → 285‰; srcB's
    // doc is the shared span alone → 0 unique; srcC untouched → 1000‰
    val d = Seq(
      (1L, "u1 u2 a b c d e", "srcA"),
      (2L, "a b c d e", "srcB"),
      (3L, "totally fresh words here now", "srcC"))
      .toDF("doc_id", "text", "source")
    val got = Text.effectiveTokens(d, n = 5, minDf = 2L)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("srcA", 7L, 2L, 285L), ("srcB", 5L, 0L, 0L),
      ("srcC", 5L, 5L, 1000L)))
  }

  test("qualityEnsemble: rank-vote equals the ntile-window formulation") {
    import org.apache.spark.sql.functions.{col, lit, ntile, size}
    import org.apache.spark.sql.expressions.Window
    val d = Seq(
      (1L, "the cat sat on the mat and it is big", 36L),
      (2L, "alpha beta gamma delta epsilon zeta", 35L),
      (3L, "a a a a a a a a", 15L),
      (4L, "one two three of the and", 24L),
      (5L, "completely unique tokens everywhere here now", 45L))
      .toDF("doc_id", "text", "n_chars")
    val got = Text.qualityEnsemble(d, buckets = 3)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // reference: the literal window formulation over the same signals
    val stopwords = Seq("the", "a", "an", "of", "and", "to", "in",
      "is", "it", "for")
    val toks = Text.tokens(col("text"))
    val stops = org.apache.spark.sql.functions.filter(toks,
      w => w.isInCollection(stopwords))
    val f = d.select(col("doc_id"),
      (size(stops).cast("long") * 1000 / size(toks)).cast("long")
        .as("sp"),
      (size(org.apache.spark.sql.functions.array_distinct(toks))
        .cast("long") * 1000 / size(toks)).cast("long").as("tp"),
      col("n_chars"))
    val ref = f.select(col("doc_id"),
        ntile(3).over(Window.orderBy(col("sp"), col("doc_id")))
          .cast("long").as("b_stop"),
        ntile(3).over(Window.orderBy(col("tp"), col("doc_id")))
          .cast("long").as("b_ttr"),
        ntile(3).over(Window.orderBy(col("n_chars"), col("doc_id")))
          .cast("long").as("b_len"))
      .select(col("doc_id"), col("b_stop"), col("b_ttr"), col("b_len"),
        (col("b_stop") + col("b_ttr") + col("b_len")).as("vote"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == ref)
    // the stopword-soup doc is bottom-vote, the unique long doc top
    assert(got.find(_._1 == 3L).get._5 <= got.find(_._1 == 5L).get._5)
  }

  test("stripDuplicatedSpans cuts shared spans, keeps unique text in order") {
    // docs 0 and 1 share the 5-gram "a b c d e" (plus its extensions);
    // doc 0's unique prefix/suffix survive, doc 1 is the shared span
    // plus nothing → empty; doc 2 shares no 5-gram and survives whole
    // (canonical single-space join)
    val d = Seq(
      (0L, "unique head a b c d e unique tail words"),
      (1L, "a b c d e"),
      (2L, "completely   different text with no shared grams at all"))
      .toDF("doc_id", "text")
    val got = Text.stripDuplicatedSpans(d, n = 5, minDf = 2L)
      .as[(Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, "unique head unique tail words"),
      (1L, ""),
      (2L, "completely different text with no shared grams at all")))
  }

  test("logOddsKeywords: the source-exclusive word tops its source") {
    // 'zebra' lives only in source A (5×); shared filler everywhere
    val d = Seq(
      (1L, "zebra zebra zebra zebra zebra the the the the", "A"),
      (2L, "the the the the the and and and and", "B"),
      (3L, "and and and and the the the the", "A"))
      .toDF("doc_id", "text", "source")
    val got = Text.logOddsKeywords(d, topK = 2, minCount = 3L)
      .as[(String, String, Long, Long, Long)].collect().toSeq
    val aTop = got.filter(_._1 == "A").minBy(_._4)
    assert(aTop._2 == "zebra" && aTop._5 > 0) // exclusive ⇒ positive z
    // every source's rows are rank-ordered by descending z
    got.groupBy(_._1).values.foreach { rows =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._5) == sorted.map(_._5).sorted.reverse)
    }
  }
  test("collocationsPmi: exact integer PMI on hand counts") {
    // "a b a b a b a b a b": bigrams (a b)x5, (b a)x4; unigrams a=5,
    // b=5, N=10. minCount 5 keeps only (a, b):
    // pmi = ln(5*10/(5*5)) = ln 2 -> 693147 at q6
    val d = docs("a b a b a b a b a b")
    val got = Text.collocationsPmi(d, minCount = 5L, k = 10)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(got == Seq(("a", "b", 5L, 693147L)))
    // k truncates on the (pmi DESC, w1, w2) total order
    val d2 = docs("a b a b a b a b a b c d c d c d c d c d")
    val top = Text.collocationsPmi(d2, minCount = 5L, k = 1)
      .as[(String, String, Long, Long)].collect().toSeq
    assert(top.length == 1)
  }

  test("readabilityCensus: exact sentence/word/char proxies") {
    // "aa bb. cc dd ee." -> 5 whitespace words, 2 non-blank sentences,
    // 16 chars: words/sent 2500 permille, chars/word 3200 permille;
    // a sentence-less doc counts 1 sentence
    val d = Seq((1L, "aa bb. cc dd ee.", "s1"), (2L, "x y", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Text.readabilityCensus(d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 1L, 5L, 2L, 2500L, 3200L),
      ("s2", 1L, 2L, 1L, 2000L, 1500L)))
  }

  test("chunkDupCensus: cross-doc chunk reuse, within-doc repeat ignored") {
    import spark.implicits._
    // window 3 / stride 3: doc 1 = [aa bb cc][dd ee ff]; doc 2 (other
    // source) repeats doc 1's first window; doc 3 is unique. minDocs=2
    // counts chunks whose content spans ≥2 DISTINCT docs.
    val d = Seq(
      (1L, "aa bb cc dd ee ff", "s1"),
      (2L, "aa bb cc", "s2"),
      (3L, "zz yy xx", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Text.chunkDupCensus(d, window = 3, stride = 3, minDocs = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 2L, 1L, 500L), ("s2", 2L, 1L, 500L)))
  }

  test("tfidfSourceTerms: source-level idf, everywhere-token scores 0") {
    import spark.implicits._
    // "a" appears in BOTH sources → ln(2/2)=0 regardless of tf; "b"
    // and "c" are source-unique → round(1e6·ln 2) = 693147
    val d = Seq((1L, "a a b", "s1"), (2L, "a c", "s2"))
      .toDF("doc_id", "text", "source")
    val got = Text.tfidfSourceTerms(d, k = 2)
      .as[(String, Long, String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 1L, "b", 1L, 1L, 693147L), ("s1", 2L, "a", 2L, 2L, 0L),
      ("s2", 1L, "c", 1L, 1L, 693147L), ("s2", 2L, "a", 1L, 2L, 0L)))
  }

  test("piiCensus: each pattern detected once, any-permille exact") {
    import spark.implicits._
    val d = Seq(
      (1L, "contact a@b.com please", "s1"),
      (2L, "see https://x.org/page", "s1"),
      (3L, "call 555-123-4567 now", "s1"),
      (4L, "clean text only", "s1"))
      .toDF("doc_id", "text", "source")
    val got = Text.piiCensus(d)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 4L, 1L, 1L, 1L, 750L)))
  }

  test("langPurity: dominant language with lexicographic tiebreak") {
    import spark.implicits._
    val d = Seq(
      (1L, "t", "en", "s1"), (2L, "t", "en", "s1"), (3L, "t", "fr", "s1"),
      (4L, "t", "zz", "s2"), (5L, "t", "aa", "s2")) // tie -> "aa"
      .toDF("doc_id", "text", "lang", "source")
    val got = Text.langPurity(d)
      .as[(String, Long, String, Long)].collect().toSeq
    assert(got == Seq(("s1", 2L, "en", 666L), ("s2", 2L, "aa", 500L)))
  }

  test("lengthTokenCorrelation: perfect linear relation scores 1e6") {
    import spark.implicits._
    // n_chars = 10 * tokens exactly -> r = 1; constant tokens -> NULL
    val d = Seq(
      (1L, "a b", 20L, "s1"), (2L, "a b c", 30L, "s1"),
      (3L, "a", 10L, "s1"),
      (4L, "x", 5L, "s2"), (5L, "y", 9L, "s2"))
      .toDF("doc_id", "text", "n_chars", "source")
    val got = Text.lengthTokenCorrelation(d)
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(got == Seq(("s1", 3L, Some(1000000L)), ("s2", 2L, None)))
  }

  test("vocabGrowthCurve: first-bucket attribution, exact running sum") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    // find two doc ids landing in DIFFERENT buckets, give them one
    // shared shingle and one unique each: the shared type counts once,
    // at the EARLIER bucket; totals and cum line up exactly
    val bucketOf = (1L to 50L).map { id =>
      id -> (BigInt(java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes).take(2).map("%02x".format(_))
        .mkString, 16) % 1000 % 10).toInt
    }
    val (idA, bA) = bucketOf.find(_._2 == bucketOf.head._2).get
    val (idB, bB) = bucketOf.find(_._2 != bA).get
    val (lo, hi) = (math.min(bA, bB), math.max(bA, bB))
    val (idLo, idHi) = if (bA < bB) (idA, idB) else (idB, idA)
    val d = Seq(
      (idLo, "s h a r e d x y z"),   // shingles incl "s h a", ...
      (idHi, "s h a r e d p q r"))   // shares the first 4 shingles
      .toDF("doc_id", "text")
    val got = Text.vocabGrowthCurve(d, n = 3, buckets = 10)
      .as[(Long, Long, Long, Long)].collect().toSeq
    // each doc has 7 distinct shingles (9 tokens); they share the 4
    // spanning "s h a r e d" -> lo introduces 7, hi introduces 3 new
    assert(got.map(_._2).sum == 14)          // exploded per-doc counts
    assert(got(lo)._3 == 7 && got(hi)._3 == 3)
    assert(got.last._4 == 10)                // distinct corpus shingles
  }

  test("greedySourceCover: marginal gains, zero-gain sources dropped") {
    import spark.implicits._
    // unigrams (n=1) for hand-computation: A covers {a,b,c,d} (gain 4),
    // then B's tokens are fully covered (gain 0 -> NOT pickable) while
    // C still adds {e} -> picks are (A,4), (C,1), done at 2 rows
    val docs = Seq((1L, "a b c d", "A"), (2L, "a b", "B"),
      (3L, "d e", "C")).toDF("doc_id", "text", "source")
    val got = Text.greedySourceCover(docs, steps = 5, n = 1)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "A", 4L, 4L), (2L, "C", 1L, 5L)))
  }

  test("scriptCensus: exact per-mille character-class shares per lang") {
    val docs = Seq(
      (0L, "en", "ab 12"), // 5 chars: 2 alpha, 2 digit, 1 space
      (1L, "en", "abc"),   // 3 chars: 3 alpha
      (2L, "zh", "你好 x")) // 4 chars: 1 alpha, 1 space, 2 other
      .toDF("doc_id", "lang", "text")
    val got = Text.scriptCensus(docs)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("en", 2L, 8L, 625L, 250L, 125L, 0L),
      ("zh", 1L, 4L, 250L, 0L, 250L, 500L)))
  }

  test("rareTokenContexts: hapax tokens with their neighbor windows") {
    val docs = Seq(
      (0L, "the cat sat on the mat"),
      (1L, "a cat runs")).toDF("doc_id", "text")
    // counts: the=2 cat=2; hapax = sat on mat a runs, each sliced ±1
    // around its 1-based position in ITS doc's token array
    val got = Text.rareTokenContexts(docs, window = 1, k = 10)
      .as[(String, Long, Int, String)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 1, "a cat"),
      ("mat", 0L, 6, "the mat"),
      ("on", 0L, 4, "sat on the"),
      ("runs", 1L, 3, "cat runs"),
      ("sat", 0L, 3, "cat sat on")))
    // the cap is by token order, deterministic
    assert(Text.rareTokenContexts(docs, window = 1, k = 2)
      .as[(String, Long, Int, String)].collect().toSeq.map(_._1)
      == Seq("a", "mat"))
  }

  test("positionalTemplateCensus: templated slots saturate, prose " +
      "slots spread; short docs vanish from deep positions") {
    val docs = Seq(
      (1L, "HDR v1 alpha beta"),
      (2L, "HDR v1 gamma"),
      (3L, "HDR v2 delta epsilon"))
      .toDF("doc_id", "text")
    val got = Text.positionalTemplateCensus(docs, k = 4)
      .as[(Int, Long, Long, String, Long, Long)].collect().toSeq
    // slot 1 is pure template; slot 2 is 2/3 modal; slot 3 all distinct;
    // slot 4 sees only the two 4-token docs
    assert(got == Seq(
      (1, 3L, 1L, "HDR", 3L, 1000L),
      (2, 3L, 2L, "v1", 2L, 666L),
      (3, 3L, 3L, "gamma", 1L, 333L),
      (4, 2L, 2L, "epsilon", 1L, 500L)))
  }
}
