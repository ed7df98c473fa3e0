package graft.ops

import graft.SparkSpec
import java.nio.file.Files

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toString

  test("S3: text KV sink writes key TAB value; single-file golden mode") {
    val dir = tmp("textkv") + "/out"
    val df = Seq(("b", 2L), ("a", 1L)).toDF("word", "cnt").orderBy("word")
    Sinks.writeTextKV(df, "word", "cnt", dir, singleFile = true)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.length == 1)
    val lines = spark.read.text(dir).as[String].collect().sorted
    assert(lines.toSeq == Seq("a\t1", "b\t2"))
  }

  test("S4: partitioned parquet sink round-trips with partition pruning") {
    val dir = tmp("parq") + "/out"
    val df = Seq((1L, "x", 1.0), (2L, "y", 2.0), (3L, "x", 3.0))
      .toDF("id", "part", "v")
    Sinks.writeParquet(df, dir, partitionBy = Seq("part"))
    assert(new java.io.File(dir, "part=x").isDirectory) // layout on disk
    val back = spark.read.parquet(dir).filter($"part" === "x")
    assert(back.count() == 2)
    val plan = back.queryExecution.executedPlan.toString
    assert(!plan.contains("part=y")) // pruned partition never scanned
  }

  test("S5: sorted parquet write keeps key order within files") {
    val dir = tmp("sorted") + "/out"
    val df = Seq(5L, 1L, 3L, 2L, 4L).toDF("k").repartition(1)
    Sinks.writeSortedParquet(df, Seq("k"), dir)
    val back = spark.read.parquet(dir).as[Long].collect()
    assert(back.toSeq == Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("S8: driver-side report file") {
    val f = tmp("report") + "/r/summary.txt"
    Sinks.writeReport(Seq("Max SilScore:0.9", "k:2"), f)
    assert(Files.readAllLines(java.nio.file.Paths.get(f)).size() == 2)
  }
}
