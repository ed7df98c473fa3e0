package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on skewed data") {
    // 90% of rows share one key — the classic hot-key shape
    val big = (1 to 200).map(i => (if (i <= 180) "hot" else s"k$i", i.toLong))
      .toDF("key", "v")
    val small = Seq(("hot", "H"), ("k190", "A"), ("missing", "Z"))
      .toDF("key", "name")
    val plain = big.join(small, Seq("key")).select("key", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedEquiJoin(big, small, "key", saltFactor = 8)
      .select("key", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(plain.count(_.head == "hot") == 180)
  }

  test("salting spreads a hot key across reduce partitions") {
    val big = (1 to 400).map(i => ("hot", i.toLong)).toDF("key", "v")
    val small = Seq(("hot", "H")).toDF("key", "name")
    val parts = Skew.partitionHistogram(
      Skew.saltedEquiJoin(big, small, "key", saltFactor = 2))
      .filter(col("rows") > 0).count()
    assert(parts >= 2) // un-salted, one key = one partition
  }

  test("heavy hitters surfaces the skewed key first") {
    val df = (1 to 100).map(i => if (i <= 80) "hot" else s"k$i").toDF("key")
    val top = Skew.heavyHitters(df, "key", 1).collect().head
    assert(top.getString(0) == "hot" && top.getLong(1) == 80L)
  }
}
