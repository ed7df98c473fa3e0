package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev profiling main: times sub-stages of the hot queries at a given SF.
  * Not part of the driver contract.
  */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pins the events NTZ->nanos normalization (Tables.normalizeEventTs)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    time("warmup count")(docs.count())
    val sh = Dedup.shingleSets(docs, 3)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    time("shingle explode count")(sh.count())
    time("shingle explode count again")(sh.count())
    val joined = sh.as("x").join(sh.as("y"),
      col("x.sh") === col("y.sh") && col("x.doc_id") < col("y.doc_id"))
    time("inverted self-join count")(joined.count())
    val grouped = joined.groupBy(col("x.doc_id").as("id_a"),
      col("y.doc_id").as("id_b")).agg(count(lit(1)).as("inter"))
    time("pair group count")(grouped.count())
    time("full jaccardPairs")(Dedup.jaccardPairs(docs, 3, 0.2).count())
    time("full minhashPairs")(
      Dedup.minhashPairs(docs, 3, 32, 16, 0.2).count())
    val sigs = Dedup.minhashSignatures(docs, 3)
    time("minhash signatures only")(sigs.count())

    // Lloyd-loop scheduling: AQE re-plans every tiny job; measure both
    val pts = Geo.pointsFromEmbeddings(Tables.events(spark, dir)
      .sparkSession.read.parquet(s"$dir/embeddings.parquet"))
      .repartition(4).cache()
    pts.count()
    time("kmeans k=5 (AQE on)")(graft.ml.KMeans.fit(pts, 5, 42L))
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("kmeans k=5 (AQE off)")(graft.ml.KMeans.fit(pts, 5, 42L))
    time("sweep 2-5 (AQE off)")(
      graft.ml.ModelSelect.sweep(pts, Seq(2, 3, 4, 5), 42L))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    time("sweep 2-5 (AQE on)")(
      graft.ml.ModelSelect.sweep(pts, Seq(2, 3, 4, 5), 42L))
    pts.unpersist()
    spark.stop()
  }
}
