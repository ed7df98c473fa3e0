package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Dev main: measures the z-order layout's file/row-group skipping against
  * the classic single-key sort layout — the numeric evidence behind the
  * LayoutSpec "z-order SKIPS" law (which asserts bounds; this prints the
  * measured values for PLANS.md). Writes both layouts of lineitem to a
  * temp dir, probes a second-dimension point predicate and a
  * first-dimension band, and reports (a) files whose footer min/max box
  * overlaps each probe — the stats a pruning reader consults — and (b)
  * rows actually decoded by a live Spark scan with parquet pushdown.
  */
object DevSkip {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-devskip").toString
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val total = li.count()
    val files = 16
    val (pkMax, skMax) = {
      val r = li.agg(max("l_partkey"), max("l_suppkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    val q = li
      .withColumn("qx", Layout.quantize(col("l_partkey"), 0L, pkMax, 4))
      .withColumn("qy", Layout.quantize(col("l_suppkey"), 0L, skMax, 4))
    Layout.zorderPartitioned(q, "qx", "qy", numPartitions = files, bits = 4)
      .write.mode("overwrite").parquet(s"$tmp/z")
    li.repartitionByRange(files, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(s"$tmp/bykey")
    def overlaps(d: String, lo: String, hi: String, a: Long, b: Long): Long =
      Layout.fileStats(spark, d, "l_partkey", "l_suppkey")
        .filter(col(hi) >= a && col(lo) <= b).count()
    def scannedRows(d: String, probe: org.apache.spark.sql.Column): Long = {
      val df = spark.read.parquet(d).filter(probe)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .map(_.metrics("numOutputRows").value).sum
    }
    val suppProbe = col("l_suppkey") === 3L
    val bandLo = pkMax / 5
    val bandHi = pkMax * 3 / 10
    println(s"[devskip] $dir rows=$total files=$files " +
      s"pkMax=$pkMax skMax=$skMax band=[$bandLo,$bandHi]")
    println(s"[devskip] suppkey=3 files touched: " +
      s"z=${overlaps(s"$tmp/z", "y_min", "y_max", 3L, 3L)} " +
      s"bykey=${overlaps(s"$tmp/bykey", "y_min", "y_max", 3L, 3L)} of $files")
    println(s"[devskip] partkey band files touched: " +
      s"z=${overlaps(s"$tmp/z", "x_min", "x_max", bandLo, bandHi)} " +
      s"bykey=${overlaps(s"$tmp/bykey", "x_min", "x_max", bandLo, bandHi)}" +
      s" of $files")
    println(s"[devskip] suppkey=3 rows decoded (live scan, pushdown): " +
      s"z=${scannedRows(s"$tmp/z", suppProbe)} " +
      s"bykey=${scannedRows(s"$tmp/bykey", suppProbe)} of $total")
    spark.stop()
  }
}
