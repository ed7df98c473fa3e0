package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops._

/** Dev main for round-19 optimization experiments: times isolated pieces
  * of the hot queries so each fix targets the measured cost, not a guess.
  * Not part of the driver contract.
  */
object DevR19 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val what = if (args.length > 1) args.tail.toSet else Set.empty[String]
    def on(k: String) = what.isEmpty || what.contains(k)
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("SPARK_GRAFT_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](name: String)(f: => T): T = {
      spark.sparkContext.setJobDescription(name)
      val t0 = System.nanoTime()
      val r = f
      println(f"[r19] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      spark.sparkContext.setJobDescription(null)
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // session warmup (codegen, shuffle machinery)
    spark.range(1000000).selectExpr("sum(id)").collect()

    if (on("q352plan")) {
      spark.sparkContext.setLogLevel("WARN")
      val li = Tables.lineitem(spark, dir)
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      val h = Layout.hilbertValue(z, "l_partkey", "l_suppkey", 16)
      println(h.queryExecution.executedPlan.toString.take(4000))
      time("hilbertValue noop")(noop(h))
      spark.sparkContext.setLogLevel("ERROR")
    }

    if (on("q352bits")) {
      val li = Tables.lineitem(spark, dir)
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      for (b <- Seq(2, 4, 8, 12, 16)) {
        val h = Layout.hilbertValue(
          z.select((col("l_partkey") % (1L << b)).as("x"),
            (col("l_suppkey") % (1L << b)).as("y"), col("tie")),
          "x", "y", b)
        time(s"hilbertValue bits=$b noop")(noop(h))
      }
    }

    if (on("q352")) {
      val li = Tables.lineitem(spark, dir)
      time("lineitem count")(li.count())
      val z = li.withColumn("tie",
        col("l_orderkey") * 10 + col("l_linenumber"))
        .select(col("l_partkey"), col("l_suppkey"), col("tie"))
      time("base projection noop")(noop(z))
      val h = Layout.hilbertValue(z, "l_partkey", "l_suppkey", 16)
      time("hilbertValue noop (1st)")(noop(h))
      time("hilbertValue noop (2nd)")(noop(h))
      val (ranked, total) =
        Layout.shardedRanksWithTotal(h, Seq("hval", "tie"))
      time("shardedRanks ranked noop")(noop(ranked))
      println(s"[r19] total=$total")
      time("q352 full (1st)")(
        SparkEntry.queries("q352_hilbert_census")(spark, dir).count())
      spark.catalog.clearCache()
      time("q352 full (2nd)")(
        SparkEntry.queries("q352_hilbert_census")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q388")) {
      time("q388 full (1st)")(
        SparkEntry.queries("q388_recursive_reach")(spark, dir).count())
      spark.catalog.clearCache()
      time("q388 full (2nd)")(
        SparkEntry.queries("q388_recursive_reach")(spark, dir).count())
      spark.catalog.clearCache()
    }

    if (on("q302")) {
      time("q302 full (1st)")(
        SparkEntry.queries("q302_greedy_source_cover")(spark, dir).count())
      spark.catalog.clearCache()
      time("q302 full (2nd)")(
        SparkEntry.queries("q302_greedy_source_cover")(spark, dir).count())
      spark.catalog.clearCache()
    }

    spark.stop()
  }
}
