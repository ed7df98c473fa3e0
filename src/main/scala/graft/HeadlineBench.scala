package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's HEADLINE workload, matched shape-for-shape: a k-means
  * model-selection sweep over ~22,000 pickup locations, k = 10..100 step
  * 10, ≤ 20 Lloyd iterations per k — the loop in
  * /root/reference/final/src/main/java/program/KDriver.java:60–63, which
  * BASELINE.md records at 2 h 34 min on 2×m5.xlarge (EMR) and attributes
  * to ~38–40 s of MapReduce job setup per iteration.
  *
  * Points are derived deterministically from the reference's own committed
  * input (final/inputs/sample.csv, 1,000 NYC pickups): each row is
  * replicated 22× with a hash-seeded jitter of up to ±0.005°, then run
  * through the PopulatePt pipeline (round 3 dp HALF_UP → group → count,
  * Geo.pointsFromEmbeddings' shape) before the sweep — the same
  * dedup-to-weighted-cells prep the reference applies.
  *
  * Emits one JSON line with the sweep wall-clock so the number can sit in
  * BASELINE.md next to the reference's 9,240 s row.
  */
object HeadlineBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sample = args.headOption
      .getOrElse("/root/reference/final/inputs/sample.csv")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val raw = spark.read.csv(sample)
      .select(col("_c1").cast("double").as("lat0"),
        col("_c2").cast("double").as("lon0"))
    // 22 deterministic jittered copies per row → ~22k points (the headline
    // run's 22,000 locations), jitter ±0.005° from a seeded hash
    val jitter = (seed: Int) =>
      (pmod(xxhash64(col("lat0"), col("lon0"), col("rep"), lit(seed)),
        lit(1001)) - 500) / 100000.0
    val pts = raw
      .crossJoin(spark.range(22).toDF("rep"))
      .select(
        round(col("lat0") + jitter(1), 3).as("lat"),
        round(col("lon0") + jitter(2), 3).as("lon"))
      .groupBy("lat", "lon").agg(count(lit(1)).cast("int").as("cnt"))
      .repartition(math.max(2, spark.sparkContext.defaultParallelism / 8))
      .cache()
    val nPoints = pts.agg(sum("cnt")).head().getLong(0)
    val nCells = pts.count()

    val ks = 10 to 100 by 10
    val t0 = System.nanoTime()
    val entries = ml.ModelSelect.sweep(pts, ks, seed = 42L, maxIter = 20)
    val secs = (System.nanoTime() - t0) / 1e9
    val best = ml.ModelSelect.best(entries)
    val iters = entries.map(e => s"${e.k}:${e.iterations}").mkString(",")
    println(f"""{"metric":"headline_kmeans_sweep","value":$secs%.2f,""" +
      s""""unit":"sec","points":$nPoints,"cells":$nCells,""" +
      s""""ks":"10..100 step 10","max_iter":20,""" +
      s""""best_k":${best.k},"best_sil":${best.silScore},""" +
      s""""iterations":"$iters"}""")
    spark.stop()
  }
}
