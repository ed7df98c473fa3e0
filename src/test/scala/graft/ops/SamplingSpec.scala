package graft.ops

import graft.SparkSpec

/** Pins the deterministic-split contract: md5-bucket assignment that is a
  * pure function of the id (stable under reruns, repartitioning, and corpus
  * growth) and portable across engines (the bucket matches a plain
  * MessageDigest reference, which is also what the DuckDB oracle computes).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val fractions = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  test("split is exhaustive, labeled from the given set, roughly sized") {
    val got = Sampling.deterministicSplit(ids(2000), "doc_id", fractions)
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(got.keySet == Set("train", "val", "test"))
    assert(got.values.sum == 2000L)
    // md5 buckets are uniform; ±5 points of slack at n=2000
    assert(got("train") > 1500 && got("train") < 1700)
    assert(got("val") > 100 && got("val") < 300)
  }

  test("group-keyed split is group-coherent: a domain never straddles") {
    // key the split on the GROUP column: every row of a group gets the
    // group's split — the leakage-safe form (near-dup pages of one site
    // cannot land on both sides of train/test)
    val rows = ids(600).selectExpr("doc_id",
      "concat('d', CAST(doc_id % 37 AS STRING)) AS domain")
    val got = Sampling.deterministicSplit(rows, "domain", fractions)
      .select("domain", "split").as[(String, String)].collect()
    val perDomain = got.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    assert(perDomain.values.forall(_.size == 1))
    assert(got.length == 600)
  }

  test("assignment is a pure function of the id") {
    val once = Sampling.deterministicSplit(ids(500), "doc_id", fractions)
      .as[(Long, String)].collect().toMap
    val again = Sampling.deterministicSplit(
        ids(500).repartition(7), "doc_id", fractions)
      .as[(Long, String)].collect().toMap
    assert(once == again)
    // subset invariance: the same ids inside a larger corpus keep their split
    val grown = Sampling.deterministicSplit(ids(5000), "doc_id", fractions)
      .filter("doc_id < 500").as[(Long, String)].collect().toMap
    assert(grown == once)
  }

  test("bucket matches a plain-JVM md5 reference (engine portability)") {
    val buckets = ids(50)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        Sampling.splitBucket(org.apache.spark.sql.functions.col("doc_id")))
      .as[(Long, Int)].collect().toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    (0L until 50L).foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val expect = Integer.parseInt(hex.take(4), 16) % 1000
      assert(buckets(id) == expect, s"id $id")
    }
  }

  test("fractions are validated") {
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(ids(1), "doc_id",
        Seq("a" -> 0.8, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.deterministicSplit(ids(1), "doc_id", Seq.empty)
    }
  }

  test("deterministicSample: stable, nested across rates, partitions at r") {
    def kept(rate: Double) = Sampling.deterministicSample(
      ids(2000), "doc_id", rate).as[Long].collect().toSet
    val k10 = kept(0.1)
    val k50 = kept(0.5)
    // nested: a smaller rate's keep set is a subset of a larger one's
    assert(k10.subsetOf(k50))
    // stable across re-runs, roughly sized (md5 buckets are uniform)
    assert(kept(0.1) == k10)
    assert(k10.size > 120 && k10.size < 280)
    // rate 0 and 1 are exact
    assert(kept(0.0).isEmpty && kept(1.0).size == 2000)
  }

  test("stratifiedSample: per-stratum restriction of the global sample") {
    // stratum = id parity; keep 80% of "even", default 25% for "odd"
    val strat = ids(2000).selectExpr("doc_id",
      "CASE WHEN doc_id % 2 = 0 THEN 'even' ELSE 'odd' END AS stratum")
    val got = Sampling.stratifiedSample(strat, "doc_id", "stratum",
        rates = Seq("even" -> 0.8), defaultRate = 0.25)
      .select("doc_id").as[Long].collect().toSet
    // the law: each stratum's keep set IS deterministicSample(rate)'s
    // keep set restricted to that stratum — same buckets, same ids
    def global(rate: Double) = Sampling.deterministicSample(
      ids(2000), "doc_id", rate).as[Long].collect().toSet
    val want = global(0.8).filter(_ % 2 == 0) ++ global(0.25).filter(_ % 2 == 1)
    assert(got == want)
    // validation: out-of-range rate, duplicate stratum
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(strat, "doc_id", "stratum",
        Seq("even" -> 1.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(strat, "doc_id", "stratum",
        Seq("even" -> 0.5, "even" -> 0.6))
    }
  }

  test("stratifiedSampleDim: join form ≡ CASE form on identical rates") {
    val strat = ids(2000).selectExpr("doc_id",
      "CASE WHEN doc_id % 3 = 0 THEN 'en' " +
        "WHEN doc_id % 3 = 1 THEN 'de' ELSE 'fr' END AS stratum")
    val caseRates = Seq("en" -> 0.8, "de" -> 0.25)
    // the law: the broadcast-dimension form with the SAME per-mille
    // thresholds (math.round(rate*1000), the CASE form's own conversion)
    // keeps exactly the same rows — including the default for strata
    // absent from the dimension ('fr' here)
    val dim = caseRates.map { case (s, r) =>
      (s, math.round(r * 1000).toInt) }.toDF("stratum", "permille")
    val viaCase = Sampling.stratifiedSample(strat, "doc_id", "stratum",
        caseRates, defaultRate = 0.1)
      .as[(Long, String)].collect().toSet
    val viaDim = Sampling.stratifiedSampleDim(strat, "doc_id", "stratum",
        dim, defaultPermille = 100)
      .as[(Long, String)].collect().toSet
    assert(viaDim == viaCase)
    assert(viaDim.nonEmpty)
    // column layout is preserved (the join must not surface as a reorder)
    assert(Sampling.stratifiedSampleDim(strat, "doc_id", "stratum", dim)
      .columns.toSeq == strat.columns.toSeq)
    // validation: permille range, missing dimension columns
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleDim(strat, "doc_id", "stratum", dim,
        defaultPermille = 1001)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleDim(strat, "doc_id", "stratum",
        dim.withColumnRenamed("permille", "rate"))
    }
  }

  test("capTokensPerStratum: longest hash-order prefix within budget") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        .map("%02x".format(_)).mkString
    val rows = (0L until 60L).map(i => (i, if (i % 2 == 0) "a" else "b",
      (i % 7 + 1).toInt))
    val df = rows.toDF("doc_id", "stratum", "n_tokens")
    val got = Sampling.capTokensPerStratum(df, "doc_id", "stratum",
      "n_tokens", budget = 20L).as[(Long, String, Int)].collect().toSet
    // the oracle-in-Scala: per stratum, sort by (md5(id), id), take while
    // the running total (INCLUDING the current row) stays <= budget
    val expect = rows.groupBy(_._2).values.flatMap { g =>
      val sorted = g.sortBy(r => (md5hex(r._1.toString), r._1))
      sorted.scanLeft((null.asInstanceOf[(Long, String, Int)], 0L)) {
        case ((_, cum), r) => (r, cum + r._3)
      }.tail.takeWhile(_._2 <= 20L).map(_._1)
    }.toSet
    assert(got == expect && got.nonEmpty)
    // take-while, not best-fit: rows after the first overflow are out
    // even if they individually fit — per stratum the kept set is a
    // PREFIX of hash order
    for (s <- Seq("a", "b")) {
      val order = rows.filter(_._2 == s)
        .sortBy(r => (md5hex(r._1.toString), r._1)).map(_._1)
      val keptIds = got.filter(_._2 == s).map(_._1)
      assert(order.takeWhile(keptIds.contains).toSet == keptIds.toSet)
    }
    // layout-stable
    assert(Sampling.capTokensPerStratum(df.repartition(7), "doc_id",
      "stratum", "n_tokens", 20L).as[(Long, String, Int)]
      .collect().toSet == got)
    // a head row larger than the whole budget blocks its stratum
    val big = Seq((1L, "x", 100), (2L, "x", 1)).toDF(
      "doc_id", "stratum", "n_tokens")
    val headFirst = Seq(1L, 2L).minBy(i => (md5hex(i.toString), i))
    val kept = Sampling.capTokensPerStratum(big, "doc_id", "stratum",
      "n_tokens", 50L).as[(Long, String, Int)].collect().toSeq
    if (headFirst == 1L) assert(kept.isEmpty)
    else assert(kept.map(_._1) == Seq(2L))
    intercept[IllegalArgumentException] {
      Sampling.capTokensPerStratum(df, "doc_id", "stratum", "n_tokens", 0L)
    }
    // a negative token count makes the cumsum non-monotone — the kept set
    // would no longer be a hash-order prefix; the in-plan check fails loud
    val neg = Seq((1L, "x", 5), (2L, "x", -1))
      .toDF("doc_id", "stratum", "n_tokens")
    val e = intercept[Exception] {
      Sampling.capTokensPerStratum(neg, "doc_id", "stratum", "n_tokens",
        50L).collect()
    }
    def msgs(t: Throwable): String =
      if (t == null) "" else s"${t.getMessage} ${msgs(t.getCause)}"
    assert(msgs(e).contains("negative n_tokens"))
  }

  test("capPerStratum: per-stratum cap, md5-order winners, layout-stable") {
    val strat = ids(100).selectExpr("doc_id",
      "CASE WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS stratum")
    val got = Sampling.capPerStratum(strat, "doc_id", "stratum", 10)
      .as[(Long, String)].collect().toSet
    assert(got.count(_._2 == "a") == 10 && got.count(_._2 == "b") == 10)
    // winners = the 10 md5-smallest ids of each stratum (JVM reference,
    // the same engine-portability pin as the bucket test)
    def hex(id: Long) = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def want(ids0: Seq[Long]) =
      ids0.sortBy(id => (hex(id), id)).take(10).toSet
    assert(got.filter(_._2 == "a").map(_._1) ==
      want((0L until 100L by 2).toSeq))
    assert(got.filter(_._2 == "b").map(_._1) ==
      want((1L until 100L by 2).toSeq))
    // the winner set must not depend on the physical layout
    val reparted = Sampling.capPerStratum(
        strat.repartition(7), "doc_id", "stratum", 10)
      .as[(Long, String)].collect().toSet
    assert(reparted == got)
    // a stratum smaller than the cap survives whole
    assert(Sampling.capPerStratum(strat, "doc_id", "stratum", 1000)
      .count() == 100)
  }

  test("negativeSample: k per anchor, positives excluded, deterministic") {
    val docs = (0L until 40L).map(i => (i, s"src${i % 4}"))
      .toDF("id", "source")
    val anchors = docs.filter($"id" < 3)
      .withColumnRenamed("id", "anchor_id")
    val cands = docs.withColumnRenamed("id", "cand_id")
    val got = Sampling.negativeSample(anchors, cands, "anchor_id",
        "cand_id", "source", k = 5)
      .as[(Long, Int, Long)].collect().toSeq
    assert(got.map(_._1).distinct == Seq(0L, 1L, 2L))
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2) == (1 to 5)) // exactly k, ranked 1..k
    }
    // positives (same source) never appear: anchor a excludes a % 4
    got.foreach { case (a, _, c) => assert(c % 4 != a % 4) }
    // pure function of ids: repartitioning changes nothing
    val again = Sampling.negativeSample(anchors.repartition(7),
        cands.repartition(5), "anchor_id", "cand_id", "source", k = 5)
      .as[(Long, Int, Long)].collect().toSeq
    assert(again == got)
  }

  test("balancedUpsample lands every stratum on exactly target rows") {
    val df = ((0L until 3L).map(i => (i, "small")) ++
      (100L until 120L).map(i => (i, "big"))).toDF("doc_id", "lang")
    val got = Sampling.balancedUpsample(df, "doc_id", "lang", target = 7L)
      .as[(String, Long, Long)].collect().toSeq
    val byLang = got.groupBy(_._1)
    assert(byLang("small").size == 7 && byLang("big").size == 7)
    // small (n=3): copies are 7 div 3 = 2 base + 1 extra on the first
    // md5-ranked row → multiset {3,2,2}; every source row appears
    val smallCopies = byLang("small").groupBy(_._2).view
      .mapValues(_.size).toMap
    assert(smallCopies.values.toSeq.sorted == Seq(2, 2, 3))
    assert(smallCopies.keySet == (0L until 3L).toSet)
    // big (n=20 > 7): a 7-row prefix, one copy each
    assert(byLang("big").map(_._3).forall(_ == 1L))
    assert(byLang("big").map(_._2).distinct.size == 7)
  }

  test("splitLeakage flags only fingerprints straddling splits") {
    val fr = Seq("train" -> 0.5, "test" -> 0.5)
    // 16 ids share one text; md5-bucket halves deterministically hit both
    // splits at this width (pinned by the reference check below)
    val docs = ((1L to 16L).map(i => (i, "shared  leaked\ttext")) ++
      Seq((100L, "unique alpha"), (101L, "unique beta"))).toDF("doc_id", "text")
    val refSplits = Sampling.deterministicSplit(docs, "doc_id", fr)
      .filter(org.apache.spark.sql.functions.col("doc_id") <= 16L)
      .select("split").distinct().as[String].collect().toSeq.sorted
    assert(refSplits == Seq("test", "train")) // the fixture DOES straddle
    val got = Sampling.splitLeakage(docs, "doc_id", "text", fr)
      .as[(String, Long, Long, String)].collect().toSeq
    assert(got.length == 1) // unique texts never flagged
    val (fp, nSplits, nDocs, splits) = got.head
    assert(nSplits == 2L && nDocs == 16L && splits == "test,train")
    // fingerprint = md5 of the normText canonical form (ws-collapsed)
    val md = java.security.MessageDigest.getInstance("MD5")
    val want = md.digest("shared leaked text".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(fp == want)
  }

  test("mixturePlan: uniform and weighted targets, ceil epochs, exact rates") {
    val d = Seq(
      ("s1", "t t t t t t t t"), // 8 tokens
      ("s2", "t t"),             // 2
      ("s3", "t t t t t t t t t t")) // 10; total 20
      .toDF("source", "text")
    val u = Sampling.mixturePlan(d, budgetTokens = 30L)
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
    // uniform: target = 30 div 3 = 10 each; epochs = ceil(10 / n)
    assert(u == Seq(
      ("s1", 8L, 400L, 10L, 1.25, 2L),
      ("s2", 2L, 100L, 10L, 5.0, 5L),
      ("s3", 10L, 500L, 10L, 1.0, 1L)))
    // weighted: wsum 3 → targets 20/10/0; zero weight → rate 0, epochs 0
    val w = Sampling.mixturePlan(d, 30L,
        Map("s1" -> 2L, "s2" -> 1L, "s3" -> 0L))
      .as[(String, Long, Long, Long, Double, Long)].collect().toSeq
    assert(w == Seq(
      ("s1", 8L, 400L, 20L, 2.5, 3L),
      ("s2", 2L, 100L, 10L, 5.0, 5L),
      ("s3", 10L, 500L, 0L, 0.0, 0L)))
  }

  test("mixManifest: matrix cells partition the corpus, tokens conserved") {
    val d = Seq(
      (1L, "a b c", "s1"), (2L, "d e", "s1"), (3L, "f", "s2"),
      (4L, "g h i j", "s2"), (5L, "k", "s1"))
      .toDF("doc_id", "text", "source")
    val got = Sampling.mixManifest(d)
      .as[(String, String, Long, Long)].collect().toSeq
    // every doc lands in exactly one cell; token mass is conserved
    assert(got.map(_._3).sum == 5L)
    assert(got.map(_._4).sum == 11L)
    // and the assignment is the deterministicSplit one, cell-for-cell
    val ref = Sampling.deterministicSplit(d, "doc_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("split", "source", "doc_id")
      .as[(String, String, Long)].collect()
      .groupBy(r => (r._1, r._2)).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == ref)
  }

  test("distributionMatchPlan: downsample-only rates, 0 for reference-absent bins") {
    import org.apache.spark.sql.functions.col
    // current: bin0 ×4, bin1 ×4, bin2 ×2 (total 10)
    // reference: bin0 ×1, bin1 ×4 (total 5) → ref shares 200‰/800‰/0
    // accept: bin0 = 1*10*1000/(5*4) = 500‰; bin1 = 4*10*1000/(5*4)
    // = 2000 → capped 1000‰; bin2 = 0 (not in reference)
    val cur = (Seq.fill(4)(1L) ++ Seq.fill(4)(17L) ++ Seq.fill(2)(33L))
      .toDF("v")
    val ref = (Seq(1L) ++ Seq.fill(4)(17L)).toDF("v")
    val got = Sampling.distributionMatchPlan(cur, ref, col("v"),
        binWidth = 16L)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(got == Seq((0L, 4L, 1L, Some(500L)), (1L, 4L, 4L, Some(1000L)),
      (2L, 2L, 0L, Some(0L))))
    // a reference-only bin has nothing to accept: NULL, not a rate
    val refExtra = Seq(99L).toDF("v")
    val g2 = Sampling.distributionMatchPlan(cur, refExtra, col("v"),
        binWidth = 16L)
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    assert(g2.find(_._1 == 6L).get == ((6L, 0L, 1L, None)))
  }

  test("temperaturePlan: sqrt weights, integer shares, alpha=1 ≡ proportional") {
    val d = Seq(
      ("s1", "t t t t t t t t t t t t t t t t"), // 16 tokens
      ("s2", "t t t t"),                         // 4
      ("s3", "t"))                               // 1; total 21
      .toDF("source", "text")
    // α=0.5: weights √16=4, √4=2, √1=1 (×1e6), wsum 7e6 → targets
    // 100·w div 7 per unit weight: 57, 28, 14 of a 100-token budget —
    // the small source's share triples vs proportional (4.7)
    val got = Sampling.temperaturePlan(d, budgetTokens = 100L, alpha = 0.5)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("s1", 16L, 4000000L, 57L, 4L),
      ("s2", 4L, 2000000L, 28L, 7L),
      ("s3", 1L, 1000000L, 14L, 14L)))
    // α=1 collapses to the proportional mixture (weight ∝ n_tokens)
    val prop = Sampling.temperaturePlan(d, 21L, alpha = 1.0)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(prop.map(r => (r._1, r._4)) ==
      Seq(("s1", 16L), ("s2", 4L), ("s3", 1L)))
    assert(prop.forall(_._5 == 1L))
  }

  test("weightedSample: A-Res keys reproduce a driver-side reference") {
    import org.apache.spark.sql.functions.col
    val docs = (1L to 20L)
      .map(i => (i, if (i % 2 == 0) "even" else "odd", i * 10))
      .toDF("doc_id", "strat", "wt")
    val got = Sampling.weightedSample(docs, "doc_id", "strat",
        col("wt"), k = 3)
      .as[(String, Long, Long)].collect().toSeq
    assert(got.count(_._1 == "even") == 3 && got.count(_._1 == "odd") == 3)
    // independent reimplementation of u and the q12 key on the driver
    // (BigDecimal HALF_UP = away-from-zero on negatives, the engines'
    // round semantics)
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(i: Long): Long = {
      val hex = md.digest(i.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val u = (java.lang.Long.parseLong(hex, 16) + 1.0) / 4294967297.0
      BigDecimal(math.log(u) / (i * 10.0) * 1e12)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }
    val ref = (1L to 20L)
      .map(i => (if (i % 2 == 0) "even" else "odd", i, key(i)))
      .groupBy(_._1).values.flatMap(_.sortBy(r => (-r._3, r._2)).take(3))
      .toSet
    assert(got.toSet == ref) // same u, same quantized key, same sample
  }

  test("curriculumInterleave: closed-form pos equals the global window") {
    import org.apache.spark.sql.functions.{col, row_number}
    import org.apache.spark.sql.expressions.Window
    // strata of sizes 3/2/1: round-robin order A1 B1 C1 A2 B2 A3
    val df = Seq(
      ("a1", "A", 30L), ("a2", "A", 20L), ("a3", "A", 10L),
      ("b1", "B", 9L), ("b2", "B", 1L),
      ("c1", "C", 5L)).toDF("id", "strat", "score")
    val got = Sampling.curriculumInterleave(df, "id", "strat", "score")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(got.map(_._1) == Seq("a1", "b1", "c1", "a2", "b2", "a3"))
    assert(got.map(_._5) == (1L to 6L))
    // and equals the single-task window formulation it replaces
    val w = Window.partitionBy("strat")
      .orderBy(col("score").desc, col("id"))
    val brute = df.withColumn("rnk", row_number().over(w))
      .withColumn("pos", row_number().over(
        Window.orderBy(col("rnk"), col("strat"))))
      .select("id", "pos").as[(String, Long)].collect().toMap
    assert(got.map(r => r._1 -> r._5).toMap == brute)
  }

  test("epochPlan: caps saturate, remainder waterfills, integer-exact") {
    // tokens 10/20/100, maxEpochs=2 → caps 20/40/200; B=100: the two
    // small sources saturate (prefix test 60 ≤ 100, then 100 ≤ 100),
    // the big one takes the λ = (100−60)/1 = 40 remainder
    def doc(src: String, n: Int) = (src, Seq.fill(n)("w").mkString(" "))
    val df = Seq(doc("s1", 10), doc("s2", 20), doc("s3", 100))
      .toDF("source", "text")
    val got = Sampling.epochPlan(df, budgetTokens = 100L, maxEpochs = 2L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("s1", 10L, 20L, 20L, 2000L),
      ("s2", 20L, 40L, 40L, 2000L), ("s3", 100L, 200L, 40L, 400L)))
    // budget ≥ total capacity: everyone runs maxEpochs flat
    val flat = Sampling.epochPlan(df, budgetTokens = 1000L, maxEpochs = 2L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(flat.forall(r => r._4 == r._3 && r._5 == 2000L))
  }

  test("clusterCoherentSplit: near-dups share the representative's split") {
    import org.apache.spark.sql.functions.col
    // 1 and 2 are identical → one cluster rep'd by 1; 7 is a singleton
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (7L, "utterly unrelated content entirely different words"))
      .toDF("doc_id", "text")
    val got = Sampling.clusterCoherentSplit(df, n = 3, threshold = 0.2,
        maxDf = Long.MaxValue)
      .as[(Long, Long, String)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(1L)._2 == 1L && byId(2L)._2 == 1L && byId(7L)._2 == 7L)
    assert(byId(1L)._3 == byId(2L)._3) // coherent: same split
    // the split is the plain deterministicSplit of the REP id
    val repSplit = Sampling.deterministicSplit(
        Seq(1L).toDF("cluster_id"), "cluster_id",
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select(col("split")).as[String].collect().head
    assert(byId(2L)._3 == repSplit)
  }

  test("srmCheck: arms partition the users; statistic is self-consistent") {
    import spark.implicits._
    val e = (1L to 40L).map(u => (u, u, u, "x"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val (na, nb, srm) = Sampling.srmCheck(e, permille = 500L)
      .as[(Long, Long, Long)].collect().head
    assert(na + nb == 40L)
    assert(srm == (na - nb) * (na - nb) * 1000000L / 40L)
    // permille 0 -> everyone lands in B
    val (za, zb, zs) = Sampling.srmCheck(e, permille = 0L)
      .as[(Long, Long, Long)].collect().head
    assert(za == 0L && zb == 40L && zs == 1000000L * 40L)
  }

  test("bootstrapConversionCi: CI brackets the point, reproducible") {
    import spark.implicits._
    // 100 users, 30 convert (user_id < 30 purchase, others view)
    val e = (0L until 100L).map(u =>
        (u, u, u, if (u < 30) "purchase" else "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val r1 = Sampling.bootstrapConversionCi(e, "purchase", reps = 400)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r1._1 == 100L && r1._2 == 30L && r1._3 == 300L)
    // the interval brackets the point and is nondegenerate but sane
    // (binomial n=100 p=.3 → ±~9 points at 95%)
    assert(r1._4 <= 300L && 300L <= r1._5)
    assert(r1._4 >= 150L && r1._5 <= 450L && r1._4 < r1._5)
    // deterministic: same inputs, byte-identical CI
    val r2 = Sampling.bootstrapConversionCi(e, "purchase", reps = 400)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(r1 == r2)
  }

  test("jackknifeRatioSe: constant metric → SE exactly 0") {
    val orders = (1L to 40L).map(k => (k, 1.00))
      .toDF("o_orderkey", "o_totalprice")
    val got = Sampling.jackknifeRatioSe(orders)
      .as[(Long, Long, Long)].collect().head
    // every leave-one-out complement has mean exactly 100 cents
    assert(got._2 == 100000000L && got._3 == 0L)
  }

  test("jackknifeRatioSe: two-bucket hand computation") {
    // learn each key's bucket parity through the SAME splitBucket the
    // operator uses, then plant 2 keys per bucket with known cents:
    // r_even = (800−200)/2 = 300, r_odd = (800−600)/2 = 100 (cents) →
    // mean 200e6, SE = √(½·((2·1e17−16e16)/4)) = √5e15 = 70710678.1…
    val bk = (1L to 100L).toDF("id")
      .select($"id", (Sampling.splitBucket($"id") % 20).as("b"))
      .as[(Long, Int)].collect().toMap
    val evens = (1L to 100L).filter(k => bk(k) == 0).take(2)
    val odds = (1L to 100L).filter(k => bk(k) == 1).take(2)
    assume(evens.size == 2 && odds.size == 2)
    val orders = (evens.map((_, 1.00)) ++ odds.map((_, 3.00)))
      .toDF("o_orderkey", "o_totalprice")
    // restrict to the two planted buckets by using buckets = 20 and
    // only keys from buckets 0 and 1
    val got = Sampling.jackknifeRatioSe(orders, buckets = 20)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((2L, 200000000L, 70710678L)))
  }

  test("quantileNormalize maps within-source ranks onto the global " +
      "order statistics (hand case + endpoint law)") {
    // A: (0, 100); B: (0, 10, 20, 30, 40) — global sorted by (v, id):
    // [0@1, 0@3, 10, 20, 30, 40, 100], N = 7
    val df = Seq(
      (1L, "A", 0L), (2L, "A", 100L),
      (3L, "B", 0L), (4L, "B", 10L), (5L, "B", 20L), (6L, "B", 30L),
      (7L, "B", 40L))
      .toDF("id", "src", "v")
    val got = Sampling.quantileNormalize(df, "id", "src", "v", "id")
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    // A (m=2): ranks 1,2 -> global ranks 1,7 -> norms 0, 100
    // B (m=5): g = (r-1)*6 div 4 + 1 = 1,2,4,5,7 -> 0, 0, 20, 30, 100
    assert(got == Seq(
      (1L, "A", 0L, 0L), (2L, "A", 100L, 100L),
      (3L, "B", 0L, 0L), (4L, "B", 10L, 0L), (5L, "B", 20L, 20L),
      (6L, "B", 30L, 30L), (7L, "B", 40L, 100L)))
    // endpoint law: every m >= 2 source spans the exact global extremes
    val bySrc = got.groupBy(_._2)
    assert(bySrc.values.forall(rs =>
      rs.map(_._4).min == 0L && rs.map(_._4).max == 100L))
    // monotone within source: normalization never reorders a source
    assert(bySrc.values.forall { rs =>
      val ordered = rs.sortBy(r => (r._3, r._1)).map(_._4)
      ordered.sliding(2).forall(p => p.head <= p.last)
    })
  }

  test("quantileNormalize sends a singleton source to the global " +
      "median rank") {
    // global sorted: [0, 10, 20, 30, 999] N = 5; C's single row maps to
    // rank (5+1)/2 = 3 -> norm 20
    val df = Seq(
      (1L, "A", 0L), (2L, "A", 10L), (3L, "A", 30L), (4L, "A", 999L),
      (5L, "C", 20L))
      .toDF("id", "src", "v")
    val c = Sampling.quantileNormalize(df, "id", "src", "v", "id")
      .filter(org.apache.spark.sql.functions.col("src") === "C")
      .as[(Long, String, Long, Long)].collect().head
    assert(c == ((5L, "C", 20L, 20L)))
  }

  test("neymanAllocation: variance owns the budget, degenerate strata " +
      "get zero, proportional column by hand") {
    // a: {0, 2} → var = (2·4 − 4)/2 = 2, σ_q3 = round(1000·√2) = 1414;
    // b: {5, 5} → var 0 → σ 0; c: singleton → σ 0.
    // weights: a = 2·1414, b = c = 0 → Neyman gives a the WHOLE budget;
    // proportional: 5 rows total → a 400, b 400, c 200
    val df = Seq(("a", 0L), ("a", 2L), ("b", 5L), ("b", 5L), ("c", 9L))
      .toDF("src", "v")
    val got = Sampling.neymanAllocation(df, "src", "v", budget = 1000L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("a", 2L, 1414L, 1000L, 400L),
      ("b", 2L, 0L, 0L, 400L),
      ("c", 1L, 0L, 0L, 200L)))
  }
}
