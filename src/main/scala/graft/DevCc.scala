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
    // chain LENGTHS (diameter = L - 1): the r12 verdict's deep-graph
    // regime — the iterative closure's round count scales with diameter
    // (one-hop) or log(diameter) (pointer jump); driver-UF is flat
    val chains = sys.env.getOrElse("SPARK_GRAFT_CC_CHAINS", "8")
      .split(",").map(_.trim.toInt).toSeq
    val reps = sys.env.getOrElse("SPARK_GRAFT_CC_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def r2(v: Double): Double = math.rint(v * 100) / 100
    println("\n| edges | nodes | diameter | driver-UF s | iter-jump s " +
      "| iter-1hop s |")
    println("|---|---|---|---|---|---|")
    for (e <- sizes; l <- chains) {
      val n = e.toDouble * l / (l - 1) match { case x => x.toLong + 1 }
      val nodes = spark.range(n).toDF("id")
      val edges = spark.range(n - 1)
        .filter(col("id") % l =!= l - 1)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val nEdges = edges.count()
      def time(thresh: Long, jump: Boolean): Double =
        (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          // maxIter: one-hop needs diameter+1 rounds; jump ~2·log2+2
          Dedup.connectedComponents(nodes, edges, maxIter = l + 4,
            driverUnionFindMaxEdges = thresh, pointerJump = jump).count()
          (System.nanoTime() - t0) / 1e9
        }.min
      val tUf = time(Long.MaxValue, jump = true)
      val tJump = time(0L, jump = true)
      // the pure one-hop formulation is priced too (skippable for deep
      // chains via SPARK_GRAFT_CC_SKIP_1HOP=1: diameter-many rounds)
      val t1hop =
        if (sys.env.get("SPARK_GRAFT_CC_SKIP_1HOP").contains("1")) -1.0
        else time(0L, jump = false)
      println(s"| $nEdges | $n | ${l - 1} | ${r2(tUf)} | ${r2(tJump)} " +
        s"| ${if (t1hop < 0) "skipped" else r2(t1hop).toString} |")
    }
    spark.stop()
  }
}
