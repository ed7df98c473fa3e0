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

  def trainHardSigmoidGd(documents: DataFrame,
                         iterations: Int = 3): DataFrame = {
    require(iterations >= 1 && iterations <= 16,
      "need 1 <= iterations <= 16")
    val session = documents.sparkSession
    val dupCnt = documents
      .groupBy(md5(col("text").cast("binary")).as("__h"))
      .agg(count(lit(1)).as("__c"))
    val feats = documents
      .select(md5(col("text").cast("binary")).as("__h"),
        expr("cast(n_chars div 64 as long)").as("f1"),
        size(graft.ops.Text.tokens(col("text"))).cast("long").as("f2"))
      .join(dupCnt, "__h")
      .select(col("f1"), col("f2"),
        when(col("__c") > 1, 1L).otherwise(0L).as("y"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def margin(w: Array[BigInt]) =
      lit(w(0).toLong) + lit(w(1).toLong) * col("f1") +
        lit(w(2).toLong) * col("f2")

    var w = Array(BigInt(0), BigInt(0), BigInt(0))
    var n = 0L
    for (_ <- 1 to iterations) {
      val h = greatest(least(lit(500000L) +
        expr("m div 4"), lit(1000000L)), lit(0L))
      val g = feats.withColumn("m", margin(w))
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
      require(n > 0, "empty corpus")
      val grads = (1 to 3).map(i =>
        BigInt(g.getDecimal(i).toBigInteger))
      w = w.zip(grads).map { case (wj, gj) => wj - gj / (64 * n) }
    }

    val acc = feats.withColumn("m", margin(w))
      .agg(count(lit(1)).as("n"),
        sum(when((col("m") >= 0L) === (col("y") === 1L), 1L)
          .otherwise(0L)).as("ok"))
      .collect().head
    feats.unpersist()
    import session.implicits._
    Seq(
      ("acc_pm", acc.getLong(1) * 1000L / acc.getLong(0)),
      ("n", n),
      ("w0", w(0).toLong),
      ("w1", w(1).toLong),
      ("w2", w(2).toLong)
    ).toDF("term", "val").orderBy("term")
  }
}
