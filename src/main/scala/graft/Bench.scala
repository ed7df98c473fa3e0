package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Median of `reps` in-process repetitions per query: one noisy run
    // (cold JVM, JIT, GC pause, a contended harness host) must not decide
    // the recorded artifact. 3 is enough for a median to shed one outlier.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // events.parquet is TIMESTAMP(NANOS) — see Tables.load
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    // ERROR: stray WARNs between the timing loop and the JSON line would
    // interleave with the one-line contract the driver parses
    spark.sparkContext.setLogLevel("ERROR")
    // Warm the session once (codegen compiler, shuffle machinery, JIT of
    // the scan/agg paths) so the first measured query isn't charged the
    // cold-start tax — Bench measures steady-state throughput.
    try {
      spark.range(1000000).selectExpr("sum(id)", "count(distinct id % 100)")
        .collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
    } catch { case _: Throwable => () }
    // optional comma-separated allowlist for local iteration on a subset
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq
      .filter(n => only.forall(_.contains(n)))
    // rep-major order (full query set per rep) so a slow global phase (GC,
    // page-cache warmup) spreads across all queries instead of biasing one
    val samples: Seq[Map[String, Double]] = (1 to reps).map { rep =>
      val m = names.map { name =>
        val t0 = System.nanoTime()
        val ok = try { SparkEntry.queries(name)(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}"); false }
        // a crashed query must not read as a fast success: report -1
        name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
      }.toMap
      System.err.println(
        s"[bench] rep $rep total=${m.values.filter(_ >= 0).sum}")
      m
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(s.length / 2)
    }
    val results = names.map { name =>
      val ok = samples.map(_(name)).filter(_ >= 0)
      // fail a query only if EVERY rep failed; otherwise median of successes
      name -> (if (ok.isEmpty) -1.0 else median(ok))
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // -1 marks a failed query; only successes contribute to the total
    val total = results.map(_._2).filter(_ >= 0).sum
    // every rep is recorded beside the median so noise vs regression is
    // adjudicable from the artifact alone: per-rep totals plus the full
    // per-query sample vectors
    val repTotals = samples
      .map(m => m.values.filter(_ >= 0).sum)
      .mkString("[", ",", "]")
    val qReps = names.map { n =>
      "\"" + n + "\":" + samples.map(_(n)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"rep_totals":$repTotals,"query_reps":$qReps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
