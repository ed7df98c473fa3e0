package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Integer fixed-point linear classifier trained by full-batch gradient
  * descent — the M-family's second iterative trainer (reference analogue:
  * the k-means driver loop, final/src/main/java/kmeans/KMeans.java's
  * iterate-collect-rebroadcast shape; SURVEY §2.6), applied to the
  * LLM-pipeline's canonical probe task: predict exact-dup membership from
  * cheap text statistics.
  *
  * Why a HARD sigmoid: logistic GD needs exp(), whose libm rounding is
  * not pinned across engines — a hash-exact oracle would be luck. The
  * hard sigmoid h(m) = clamp(½ + m/4, 0, 1) is piecewise-linear, so with
  * micro-unit weights every quantity in the training loop — margins,
  * activations, residuals, gradients, updates — is EXACT 64/128-bit
  * integer arithmetic: the same model falls out of both engines bit for
  * bit, the property that makes a distributed trainer auditable (the
  * pageRankMicro/q28 determinism argument, applied to SGD's full-batch
  * cousin). Divisions are truncation-toward-zero in all three systems
  * (Spark `div`, DuckDB `//`, BigInt `/`) — verified, no sign-split
  * needed.
  *
  * Per iteration: margin mᵢ = w·xᵢ (micro), activation
  * hᵢ = clamp(500000 + mᵢ div 4, 0, 10⁶), residual rᵢ = hᵢ − 10⁶yᵢ,
  * gradient g_j = Σᵢ rᵢ·xᵢⱼ (decimal(38,0)/HUGEINT), update
  * w_j ← w_j − g_j div (64n) — learning rate 1/64, a power of two.
  *
  * Output: one (term, val) row each for the trained micro-weights
  * (w0 bias, w1 = n_chars div 64, w2 = token count), the corpus size n,
  * and the training accuracy acc_pm under pred ⇔ margin ≥ 0.
  *
  * Scale shape: the feature frame is one keyed dup-count agg joined back
  * to the scan (the q21 shape) and is persisted across iterations; each
  * iteration is ONE partial agg folding to four numbers on the driver
  * (map-side combine does the work — the kmeans discipline: driver state
  * is O(dims), never O(rows)); the final accuracy pass is one more
  * partial agg. No window, no shuffle beyond the dup-count join.
  */
object LinearProbe {

  /** The (f1, f2, y) feature frame with optional named extra columns —
    * labels (exact-dup membership) come from the FULL input corpus.
    */
  private def features(documents: DataFrame,
      extra: Seq[(org.apache.spark.sql.Column, String)]): DataFrame = {
    val dupCnt = documents
      .groupBy(md5(col("text").cast("binary")).as("__h"))
      .agg(count(lit(1)).as("__c"))
    documents
      .select(Seq(md5(col("text").cast("binary")).as("__h"),
        expr("cast(n_chars div 64 as long)").as("f1"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("f2")) ++
        extra.map { case (c, n) => c.as(n) }: _*)
      .join(dupCnt, "__h")
      .select(Seq(col("f1"), col("f2"),
        when(col("__c") > 1, 1L).otherwise(0L).as("y")) ++
        extra.map { case (_, n) => col(n) }: _*)
  }

  private def margin(w: Array[BigInt]) =
    lit(w(0).toLong) + lit(w(1).toLong) * col("f1") +
      lit(w(2).toLong) * col("f2")

  /** The full-batch GD loop: `iterations` partial-agg jobs over `train`,
    * each folding to four driver numbers (the kmeans discipline).
    * Returns (micro-weights, train-row count).
    */
  private def gdLoop(train: DataFrame,
                     iterations: Int): (Array[BigInt], Long) = {
    var w = Array(BigInt(0), BigInt(0), BigInt(0))
    var n = 0L
    for (_ <- 1 to iterations) {
      val h = greatest(least(lit(500000L) +
        expr("m div 4"), lit(1000000L)), lit(0L))
      val g = train.withColumn("m", margin(w))
        .select(h.as("h"), col("f1"), col("f2"), col("y"))
        .agg(count(lit(1)).as("n"),
          sum((col("h") - lit(1000000L) * col("y"))
            .cast("decimal(38,0)")).as("g0"),
          sum(((col("h") - lit(1000000L) * col("y")) * col("f1"))
            .cast("decimal(38,0)")).as("g1"),
          sum(((col("h") - lit(1000000L) * col("y")) * col("f2"))
            .cast("decimal(38,0)")).as("g2"))
        .collect().head
      n = g.getLong(0)
      require(n > 0, "empty training slice")
      val grads = (1 to 3).map(i =>
        BigInt(g.getDecimal(i).toBigInteger))
      w = w.zip(grads).map { case (wj, gj) => wj - gj / (64 * n) }
    }
    (w, n)
  }

  /** Exact accuracy of micro-weights `w` over `eval` in per-mille. */
  private def accPm(eval: DataFrame, w: Array[BigInt]): Long = {
    val acc = eval.withColumn("m", margin(w))
      .agg(count(lit(1)).as("n"),
        sum(when((col("m") >= 0L) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("ok"))
      .collect().head
    acc.getLong(1) * 1000L / acc.getLong(0)
  }

  def trainHardSigmoidGd(documents: DataFrame,
                         iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      "need 1 <= iterations <= 16")
    val session = documents.sparkSession
    val feats = features(documents, Seq.empty)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (w, n) = gdLoop(feats, iterations)
    val acc = accPm(feats, w)
    feats.unpersist()
    import session.implicits._
    Seq(
      ("acc_pm", acc),
      ("n", n),
      ("w0", w(0).toLong),
      ("w1", w(1).toLong),
      ("w2", w(2).toLong)
    ).toDF("term", "val").orderBy("term")
  }

  /** Learning curve of the probe: train the SAME 3-iteration GD on
    * nested deterministic md5 slices of the corpus (permille thresholds
    * `slicesPm` — each slice contains every smaller one, the
    * Sampling.splitBucket device on doc_id) and evaluate every trained
    * model on the FULL corpus. This is the data-scaling readout a
    * curation pipeline acts on: if acc(250‰) ≈ acc(1000‰), the next
    * labeling/cleaning dollar buys nothing — the curve, not any single
    * accuracy, is the decision artifact (the empirical-scaling-law
    * method of Hestness et al., arXiv:1712.00409, reduced to one probe).
    *
    * Labels come from the full corpus (dup membership is a corpus
    * property); only the TRAINING rows are sliced. All arithmetic is
    * the trainer's exact integer loop, so the whole curve — weights
    * included — is oracle-checked bit for bit (the generated SQL
    * unrolls the same iterations per slice: `learningCurveOracleSql`).
    *
    * Scale shape: |slices| × iterations partial-agg jobs over a
    * persisted feature frame + |slices| accuracy passes — driver state
    * stays O(dims) per slice; nothing corpus-sized ever collects.
    */
  def learningCurve(documents: DataFrame,
                    slicesPm: Seq[Int] = Seq(125, 250, 500, 1000),
                    iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      "need 1 <= iterations <= 16")
    require(slicesPm.nonEmpty &&
        slicesPm.forall(p => p >= 1 && p <= 1000),
      "slices are permille in [1, 1000]")
    val session = documents.sparkSession
    val feats = features(documents,
        Seq(graft.ops.Sampling.splitBucket(col("doc_id")) -> "bkt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = slicesPm.distinct.sorted.map { p =>
      val (w, nTrain) = gdLoop(feats.filter(col("bkt") < p), iterations)
      (p, nTrain, accPm(feats, w), w(0).toLong, w(1).toLong,
        w(2).toLong)
    }
    feats.unpersist()
    import session.implicits._
    rows.toDF("p_pm", "n_train", "acc_pm", "w0", "w1", "w2")
      .orderBy("p_pm")
  }

  /** The DuckDB oracle for `learningCurve`, generated from the same
    * iteration structure (the hilbertSqlCtes discipline: one generator,
    * two engines, zero drift): per slice, the unrolled GD chain of
    * q308's oracle with the training CTE filtered to the slice and the
    * accuracy CTE over the full feature table. Returns the full WITH
    * query text.
    */
  def learningCurveOracleSql(slicesPm: Seq[Int] = Seq(125, 250, 500,
                               1000),
                             iterations: Int = 3): String = {
    val ps = slicesPm.distinct.sorted
    val sb = new StringBuilder
    sb ++= "WITH d AS (SELECT doc_id, text, n_chars,\n" +
      "    count(*) OVER (PARTITION BY md5(text)) AS c FROM documents),\n" +
      "f AS (SELECT (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR))," +
      " 1, 4)) AS INTEGER) % 1000) AS bkt,\n" +
      "    CAST(n_chars // 64 AS BIGINT) AS f1,\n" +
      "    CAST(len(list_filter(string_split_regex(text," +
      " '[ \\t\\n\\r\\f]+'),\n" +
      "      w -> length(w) > 0)) AS BIGINT) AS f2,\n" +
      "    CASE WHEN c > 1 THEN 1 ELSE 0 END AS y FROM d)"
    for (p <- ps) {
      sb ++= s",\nt$p AS (SELECT f1, f2, y FROM f WHERE bkt < $p)"
      for (it <- 1 to iterations) {
        val src =
          if (it == 1)
            s"(SELECT f1, f2, CAST(500000 - 1000000 * y AS HUGEINT)" +
              s" AS r FROM t$p)"
          else
            s"(SELECT t.f1, t.f2, CAST(greatest(least(500000 + " +
              s"CAST(w.w0 + w.wa * t.f1 + w.wb * t.f2 AS BIGINT) // 4," +
              s" 1000000), 0) - 1000000 * t.y AS HUGEINT) AS r" +
              s" FROM t$p t, w${it - 1}_$p w)"
        sb ++= s",\ns${it}_$p AS (SELECT count(*) AS n, sum(r) AS g0," +
          s" sum(r * f1) AS g1, sum(r * f2) AS g2 FROM $src x)"
        val (p0, pa, pb, join) =
          if (it == 1) ("0", "0", "0", "")
          else ("w.w0", "w.wa", "w.wb", s", w${it - 1}_$p w")
        sb ++= s",\nw${it}_$p AS (SELECT s.n, $p0 - (s.g0 // (64 * s.n))" +
          s" AS w0, $pa - (s.g1 // (64 * s.n)) AS wa," +
          s" $pb - (s.g2 // (64 * s.n)) AS wb FROM s${it}_$p s$join)"
      }
      sb ++= s",\na_$p AS (SELECT count(*) AS n, sum(CASE WHEN " +
        s"(CAST(w.w0 + w.wa * f.f1 + w.wb * f.f2 AS BIGINT) >= 0) = " +
        s"(f.y = 1) THEN 1 ELSE 0 END) AS ok" +
        s" FROM f, w${iterations}_$p w)"
      sb ++= s",\nsel_$p AS (SELECT CAST($p AS INTEGER) AS p_pm," +
        s" (SELECT CAST(n AS BIGINT) FROM s1_$p) AS n_train," +
        s" CAST(a.ok * 1000 // a.n AS BIGINT) AS acc_pm," +
        s" CAST(w.w0 AS BIGINT) AS w0, CAST(w.wa AS BIGINT) AS w1," +
        s" CAST(w.wb AS BIGINT) AS w2" +
        s" FROM a_$p a, w${iterations}_$p w)"
    }
    sb ++= "\n" + ps.map(p => s"SELECT * FROM sel_$p")
      .mkString("", "\nUNION ALL ", "\nORDER BY p_pm")
    sb.toString
  }
}
