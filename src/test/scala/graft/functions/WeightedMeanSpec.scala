package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  test("typed aggregator equals the SQL expression form") {
    val ds = Seq((1.0, 3L), (2.0, 1L), (10.0, 0L)).toDS()
    val typed = ds.select(WeightedMean.column).head()
    val sql = ds.toDF("v", "w")
      .agg(sum(col("v") * col("w")) / sum(col("w"))).head().getDouble(0)
    assert(typed == sql && typed == 1.25)
  }

  test("zero total weight yields 0, not NaN") {
    val ds = Seq((5.0, 0L)).toDS()
    assert(ds.select(WeightedMean.column).head() == 0.0)
  }

  test("works as a grouped aggregation") {
    val ds = Seq(("a", 1.0, 1L), ("a", 3.0, 1L), ("b", 7.0, 2L)).toDS()
    val r = ds.groupByKey(_._1)
      .mapValues(t => (t._2, t._3))
      .agg(WeightedMean.column)
      .collect().toMap
    assert(r == Map("a" -> 2.0, "b" -> 7.0))
  }
}
