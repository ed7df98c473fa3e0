package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

object DevIvf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // UTC pins the events NTZ->nanos normalization (Tables.normalizeEventTs)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      graft.functions.GraftFunctions.register(spark)
      val nonZero = Similarity.cosine(
        Similarity.asDouble(col("embedding")),
        Similarity.asDouble(col("embedding"))) > 0
      val emb = Tables.embeddings(spark, sf).filter(nonZero)
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceKnn(emb, q, 5)
        .collect().map(_.toString).sorted.toSeq
      for (nprobe <- Seq(8, 10, 12, 14, 16)) {
        val ivf = Similarity.annIvf(emb, q, 5, nlist = 16, nprobe = nprobe)
          .collect().map(_.toString).sorted.toSeq
        val miss = exact.diff(ivf).size
        println(s"[ivf] $sf nprobe=$nprobe equal=${ivf == exact} missing=$miss")
      }
    }
    spark.stop()
  }
}
