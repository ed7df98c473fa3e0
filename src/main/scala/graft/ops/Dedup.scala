package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` (north-star surface).
  *
  * The reference's only dedup is A8, distinct-by-rounded-key + count
  * (/root/reference/final/src/main/java/population/PopulatePt.java:54–135)
  * — generalized here to the document-pipeline forms a training-data
  * engine needs: exact (content hash), n-gram Jaccard, MinHash+LSH,
  * SimHash, and embedding-cosine near-dup (delegated to Similarity).
  *
  * Everything is built from codegen'd built-ins (split/transform/xxhash64/
  * bit ops) — no UDFs. Scale design notes per operator below; the common
  * theme is that no pair enumeration is ever O(n²): candidate pairs come
  * from an inverted-index/bucket join and only candidates get exact
  * verification.
  */
object Dedup {

  private val ws = "\\s+"

  /** Whitespace-normalized lowercase body — the exact-dup key. */
  def normText(text: Column): Column =
    regexp_replace(trim(lower(text)), ws, " ")

  /** Exact dedup: group by content fingerprint; keep lowest doc_id.
    * One shuffle on the hash, map-side partial agg; at 100 TB the md5 is
    * computed in the scan stage and only (hash, id) crosses the exchange.
    */
  def exactDupGroups(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), md5(normText(col("text")).cast("binary")).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .orderBy("fp")

  /** Distinct token n-gram shingles per document. Empty array when the
    * document has fewer than n tokens (sequence() would otherwise count
    * DOWN for start > stop and fabricate shingles).
    */
  def shingleSets(documents: DataFrame, n: Int = 3): DataFrame = {
    val toks = Text.tokens(col("text"))
    documents.select(
      col("doc_id"),
      when(size(toks) >= n,
        array_distinct(transform(
          sequence(lit(0), size(toks) - n),
          i => array_join(slice(toks, i + 1, lit(n)), " "))))
        .otherwise(array().cast("array<string>"))
        .as("shingles"))
  }

  /** Exact n-gram Jaccard pairs via inverted-index join: explode
    * (doc, shingle), self-join on shingle to count intersections, then
    * |A∪B| = |A|+|B|−|A∩B|. Only docs sharing ≥1 shingle are ever paired.
    * `maxDf` drops ubiquitous shingles before the join — the skew guard
    * that keeps the hottest shingle from creating a quadratic bucket at
    * scale (df-capped shingles can only lower Jaccard below exact for
    * pairs that were never candidates anyway at sensible caps).
    */
  def jaccardPairs(documents: DataFrame, n: Int = 3,
                   threshold: Double = 0.2,
                   maxDf: Long = Long.MaxValue): DataFrame = {
    val sh0 = shingleSets(documents, n)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val sh =
      if (maxDf == Long.MaxValue) sh0
      else {
        val df = sh0.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf)
        sh0.join(df.select("sh"), "sh")
      }
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = sh.as("x")
      .join(sh.as("y"),
        col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sz_a")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sz_b")), "id_b")
      .withColumn("jaccard",
        col("inter") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** MinHash signature: for hash function h, min over shingles of
    * xxhash64(h, shingle). `numHashes` functions banded into `bands`
    * groups of numHashes/bands rows each.
    */
  def minhashSignatures(documents: DataFrame, n: Int = 3,
                        numHashes: Int = 32): DataFrame = {
    val sigs = array((0 until numHashes).map { h =>
      array_min(transform(col("shingles"), s => xxhash64(lit(h), s)))
    }: _*)
    shingleSets(documents, n)
      .filter(size(col("shingles")) > 0)
      .select(col("doc_id"), col("shingles"), sigs.as("sig"))
  }

  /** MinHash+LSH near-dup pairs: band the signature, bucket-join on
    * (band, band-hash), then verify candidates with EXACT Jaccard on the
    * shingle sets — LSH only proposes, it never decides. Output schema
    * matches `jaccardPairs`; the recall contract lives in DedupSpec.
    */
  def minhashPairs(documents: DataFrame, n: Int = 3,
                   numHashes: Int = 32, bands: Int = 16,
                   threshold: Double = 0.2): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = minhashSignatures(documents, n, numHashes)
    val banded = sigs.select(
      col("doc_id"), col("shingles"),
      posexplode(array((0 until bands).map { b =>
        hash(slice(col("sig"), b * rows + 1, rows)).as(s"b$b")
      }: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bhash")
    val cands = banded.as("x")
      .join(banded.as("y"),
        col("x.band") === col("y.band") && col("x.bhash") === col("y.bhash") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("x.shingles").as("sh_a"),
              col("y.doc_id").as("id_b"), col("y.shingles").as("sh_b"))
      .dropDuplicates("id_a", "id_b")
    cands
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("id_a", "id_b")
  }

  /** 64-bit SimHash per document: each token votes ±1 on every bit of its
    * xxhash64; the signature takes the majority sign per bit. Pure
    * aggregate — one shuffle on doc_id with map-side partials.
    */
  def simhashSignatures(documents: DataFrame): DataFrame = {
    val tok = documents.select(col("doc_id"),
      explode(Text.tokens(col("text"))).as("word"))
      .withColumn("h", xxhash64(col("word")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"v$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming, blocked by
    * the pigeonhole principle: split the 64-bit signature into
    * `maxHamming+1` chunks — any pair within the radius agrees on at least
    * one chunk, so the bucket join on (chunk-index, chunk-value) loses
    * nothing while avoiding the O(n²) pair scan.
    */
  def simhashPairs(documents: DataFrame, maxHamming: Int = 8): DataFrame = {
    val chunks = maxHamming + 1
    val bitsPer = 64 / chunks
    val sigs = simhashSignatures(documents)
    val blocked = sigs.select(
      col("doc_id"), col("simhash"),
      posexplode(array((0 until chunks).map { c =>
        // unsigned chunk extract; last chunk takes the high remainder bits
        val width = if (c == chunks - 1) 64 - bitsPer * c else bitsPer
        shiftrightunsigned(col("simhash"), bitsPer * c)
          .bitwiseAND(if (width >= 64) -1L else (1L << width) - 1)
      }: _*)))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "cval")
    blocked.as("x")
      .join(blocked.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.cval") === col("y.cval") &&
        col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("id_a"), col("y.doc_id").as("id_b"),
        bit_count(col("x.simhash").bitwiseXOR(col("y.simhash"))).as("hamming"))
      .dropDuplicates("id_a", "id_b")
      .filter(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Embedding-cosine near-dup: pairs above threshold (exact baseline;
    * swap in Similarity.annLsh buckets at corpus scale).
    */
  def embeddingNearDups(embeddings: DataFrame,
                        threshold: Double = 0.4): DataFrame =
    Similarity.cosinePairs(embeddings, threshold)
}
