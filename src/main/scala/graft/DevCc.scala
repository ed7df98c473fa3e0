package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Empirical crossover for `connectedComponents`' driver-union-find
  * threshold (r11 verdict ask #5): the 4M-edge default was asserted from
  * "64 MB of longs" arithmetic — this harness measures driver-UF vs the
  * iterative min-label rounds on the same graphs and pins the default to
  * the curves.
  *
  * Graph shape mirrors real dedup closures: chains of 8 (diameter 7 —
  * near-dup clusters are shallow but multi-round), nodes = edges · 8/7,
  * both paths timed to `.count()` of the labeled output. Edge counts via
  * SPARK_GRAFT_CC_EDGES (default 1e5,1e6,4e6,1e7). Min of
  * SPARK_GRAFT_CC_REPS (default 2) reps per cell.
  */
object DevCc {
  def main(args: Array[String]): Unit = {
    val sizes = sys.env.getOrElse("SPARK_GRAFT_CC_EDGES",
        "100000,1000000,4000000,10000000")
      .split(",").map(_.trim.toLong).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_CC_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def r2(v: Double): Double = math.rint(v * 100) / 100
    println("\n| edges | nodes | driver-UF s | iterative s |")
    println("|---|---|---|---|")
    for (e <- sizes) {
      val n = e * 8 / 7 + 1
      val nodes = spark.range(n).toDF("id")
      val edges = spark.range(n - 1)
        .filter(col("id") % 8 =!= 7)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val nEdges = edges.count()
      def time(thresh: Long): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          Dedup.connectedComponents(nodes, edges,
            driverUnionFindMaxEdges = thresh).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      val tUf = time(Long.MaxValue)
      val tIter = time(0L)
      println(s"| $nEdges | $n | ${r2(tUf)} | ${r2(tIter)} |")
    }
    spark.stop()
  }
}
