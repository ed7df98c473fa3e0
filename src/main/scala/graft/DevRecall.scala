package graft

import org.apache.spark.sql.SparkSession

/** Dev check: are the ANN queries' results EXACTLY the brute-force results
  * at fixture scale (the precondition for attaching the exact oracles to
  * q27/q44/q50), and are q28/q29 identical across session widths (the
  * precondition for literal-pinning their oracles)? Not driver contract.
  */
object DevRecall {
  def main(args: Array[String]): Unit = {
    for (cpus <- Seq("4", "32")) {
      val spark = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pins the events NTZ->nanos normalization (Tables.normalizeEventTs)
      .config("spark.sql.session.timeZone", "UTC")
        .appName(s"dev-recall-$cpus")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
        def rows(name: String): Seq[String] =
          SparkEntry.queries(name)(spark, sf).collect().toSeq
            .map(_.toString).sorted
        val exact = rows("q26_knn_bruteforce")
        val lsh = rows("q27_ann_lsh")
        val ivf = rows("q44_ann_ivf")
        println(s"[recall] cpus=$cpus $sf q27==q26: ${lsh == exact} " +
          s"(${lsh.size} vs ${exact.size})")
        println(s"[recall] cpus=$cpus $sf q44==q26: ${ivf == exact} " +
          s"(${ivf.size} vs ${exact.size})")
        val exactPairs = rows("q25_cosine_pairs")
        val lshPairs = rows("q50_embedding_neardup_lsh")
        println(s"[recall] cpus=$cpus $sf q50==q25: ${lshPairs == exactPairs} " +
          s"(${lshPairs.size} vs ${exactPairs.size})")
        if (sf.endsWith("0.01")) {
          println(s"[det] cpus=$cpus q28: " +
            rows("q28_kmeans_centers").mkString("; "))
          println(s"[det] cpus=$cpus q29: " +
            rows("q29_silhouette_sweep").mkString("; "))
        }
      }
      spark.stop()
      // fully tear down so the next width starts a fresh context
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
