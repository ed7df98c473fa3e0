package graft

import org.apache.spark.sql.functions._
import graft.ops.{Dedup, Similarity}

/** Pins the DevScale inflation construction (VERDICT r8 top item): the
  * scaling measurement is only meaningful if the inflated corpus is
  * deterministic and its intrinsic output is exactly linear in the factor.
  */
class DevScaleSpec extends SparkSpec {
  import spark.implicits._

  // a corpus with an exact-dup pair (0,1), a near-dup pair (2,3), and two
  // singletons — shingle/near-dup structure every family operator sees
  private def docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en", "web", 0L),
    (1L, "the quick brown fox jumps over the lazy dog", "en", "book", 0L),
    (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "web", 0L),
    (3L, "alpha beta gamma delta epsilon zeta eta iota", "en", "web", 0L),
    (4L, "one two three four five six seven eight nine", "de", "web", 0L),
    (5L, "completely different words in this document here now", "en", "x", 0L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")
    .withColumn("n_chars", length(col("text")).cast("long"))

  private def emb = (0L until 8L).map { id =>
    (id, Array.tabulate(16)(j =>
      (math.sin(id * 16 + j + 1) * 0.5).toFloat), id.toInt % 2)
  }.toDF("vec_id", "embedding", "label")

  test("document inflation is deterministic, F x n, copy 0 = original") {
    val a = DevScale.inflateDocuments(docs, 3)
    val b = DevScale.inflateDocuments(docs, 3)
    assert(a.collect().toSeq.sortBy(_.getLong(0)) ==
      b.collect().toSeq.sortBy(_.getLong(0)))
    assert(a.count() == 3 * docs.count())
    // copy 0 is byte-identical to the original corpus
    assert(a.filter(col("doc_id") < 10000000L).exceptAll(docs).count() == 0)
    assert(docs.exceptAll(a.filter(col("doc_id") < 10000000L)).count() == 0)
    // factor 1 is the identity
    assert(DevScale.inflateDocuments(docs, 1).exceptAll(docs).count() == 0)
  }

  test("document inflation: intrinsic pair/group output grows exactly Fx") {
    val inflated = DevScale.inflateDocuments(docs, 3)
    // q22 config: pair set per copy mirrors the original; suffixed tokens
    // mean shingles never collide across copies
    val p1 = Dedup.jaccardPairs(docs, n = 3, threshold = 0.2, maxDf = 1000L)
    val p3 = Dedup.jaccardPairs(inflated, n = 3, threshold = 0.2,
      maxDf = 1000L)
    assert(p3.count() == 3 * p1.count())
    assert(p1.count() > 0) // the law is vacuous on a pair-free fixture
    // exact-dup groups likewise: every histogram bucket triples
    val h1 = Dedup.dupGroupHistogram(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h3 = Dedup.dupGroupHistogram(inflated)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h3 == h1.map { case (sz, n) => sz -> (3 * n) })
    // the directed containment pair set obeys the same law (same
    // inverted-index core, =!= join): pairs never cross copies
    val c1 = Dedup.containmentPairs(docs, n = 3, minPermille = 600L,
      maxDf = 1000L)
    val c3 = Dedup.containmentPairs(inflated, n = 3, minPermille = 600L,
      maxDf = 1000L)
    assert(c3.count() == 3 * c1.count())
    assert(c1.count() > 0)
  }

  test("id-shift inflation: deterministic, F x n, copy 0 = original, " +
    "keyed-window output exactly Fx, merged breakpoints constant") {
    import graft.ops.{Behavior, Cdc}
    val ev = Seq(
      (1L, 1000L, 10L, "view", 1.0, "{}"),
      (2L, 2000L, 10L, "purchase", 2.0, "{}"),
      (3L, 1500L, 11L, "view", 1.0, "{}"),
      (4L, 9L * 3600L * 1000000000L, 10L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val a = DevScale.inflateByIds(ev, 3, Seq("event_id", "user_id"))
    assert(a.count() == 3 * ev.count())
    assert(a.filter(col("user_id") < 10000000L).exceptAll(ev).count() == 0)
    assert(DevScale.inflateByIds(ev, 1, Seq("event_id")).exceptAll(ev)
      .count() == 0)
    assert(a.collect().toSeq.sortBy(_.getLong(0)) ==
      DevScale.inflateByIds(ev, 3, Seq("event_id", "user_id"))
        .collect().toSeq.sortBy(_.getLong(0)))
    // keyed windows: session stats rows grow exactly Fx (disjoint users,
    // identical per-user structure)
    val s1 = Behavior.sessionStats(ev, gapNs = 1800L * 1000000000L,
      quantumNs = 1000L)
    val s3 = Behavior.sessionStats(a, gapNs = 1800L * 1000000000L,
      quantumNs = 1000L)
    assert(s1.count() > 0 && s3.count() == 3 * s1.count())
    // sweep-line: copies share every boundary instant, so the merged
    // breakpoint set (and the global ordered window under it) does NOT
    // grow — deltas stack instead
    val iv = ev.select(col("ts").as("s"), (col("ts") + lit(500L)).as("e"))
    val iv3 = DevScale.inflateByIds(ev, 3, Seq("event_id", "user_id"))
      .select(col("ts").as("s"), (col("ts") + lit(500L)).as("e"))
    val c1 = Behavior.intervalConcurrency(iv, "s", "e").collect()
    val c3 = Behavior.intervalConcurrency(iv3, "s", "e").collect()
    assert(c3.length == c1.length)
    assert(c3.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      c1.map(r => (r.getLong(0), 3 * r.getLong(2))).toSeq)
  }

  test("embedding inflation: deterministic, planted near-dup, novel rest") {
    val a = DevScale.inflateEmbeddings(emb, 4)
    assert(a.count() == 4 * emb.count())
    assert(a.collect().toSeq.sortBy(_.getLong(0)).toString ==
      DevScale.inflateEmbeddings(emb, 4).collect().toSeq
        .sortBy(_.getLong(0)).toString)
    // copy 0 identical; all copies keep the dimension and FLOAT type
    assert(a.filter(col("vec_id") < 10000000L).exceptAll(emb).count() == 0)
    assert(a.schema("embedding").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].elementType ==
      org.apache.spark.sql.types.FloatType)
    assert(a.select(size(col("embedding"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(16))
    // cosine of each original against its copies: copy 1 is a planted
    // near-dup (> 0.9); copies 2/3 are fresh vectors (< 0.6, the DevScale
    // measurement threshold)
    val base = a.filter(col("vec_id") < 10000000L)
      .select(col("vec_id").as("id"),
        Similarity.asDouble(col("embedding")).as("e0"))
    val cos = a.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") % 10000000L).as("id"),
        (col("vec_id") / 10000000L).cast("int").as("copy"),
        Similarity.asDouble(col("embedding")).as("ec"))
      .join(base, "id")
      .select(col("copy"), Similarity.cosine(col("e0"), col("ec")).as("c"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1))
    assert(cos.filter(_._1 == 1).forall(_._2 > 0.9))
    assert(cos.filter(_._1 >= 2).forall(_._2 < 0.6))
  }
}
