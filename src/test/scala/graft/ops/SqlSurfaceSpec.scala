package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws for the round-19 SQL/engine-surface entries (q389–q392): the
  * pivot⟲unpivot inverse on a SPARSE frame, lateral ≡ window-rank,
  * NOT IN three-valued logic on hand data, and observe ≡ direct agg.
  */
class SqlSurfaceSpec extends SparkSpec {
  import spark.implicits._

  test("unpivot inverts pivot, dropping the null cells a sparse frame " +
      "produces") {
    // flag A has months {1, 3}; flag B only month 2 → pivot emits null
    // cells that unpivot + the explicit filter must drop
    val df = Seq(("A", 1, 10), ("A", 3, 30), ("B", 2, 20))
      .toDF("flag", "mon", "q")
    val piv = df.groupBy("flag").pivot("mon", 1 to 3).agg(sum("q"))
    val melted = piv.unpivot(Array(col("flag")),
        (1 to 3).map(m => col(s"`$m`")).toArray, "mon", "s")
      .filter(col("s").isNotNull)
      .select(col("flag"), col("mon").cast("int").as("mon"), col("s"))
      .as[(String, Int, Long)].collect().toSet
    assert(melted == Set(("A", 1, 10L), ("A", 3, 30L), ("B", 2, 20L)))
  }

  test("lateral top-k equals the window-rank reformulation on the " +
      "real fixture") {
    val lateral = graft.SparkEntry.queries("q390_lateral_topk")(
        spark, "/root/testdata/sf0.001")
      .collect().map(_.toSeq).toSeq
    val n = graft.Tables.nation(spark, "/root/testdata/sf0.001")
    val o = graft.Tables.orders(spark, "/root/testdata/sf0.001")
    val c = graft.Tables.customer(spark, "/root/testdata/sf0.001")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("n_nationkey")
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val windowed = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .select(col("n_name"), col("o_orderkey"),
        round(col("o_totalprice") * 100).cast("long").as("price_cents"))
      .orderBy(col("n_name"), col("price_cents").desc, col("o_orderkey"))
      .collect().map(_.toSeq).toSeq
    assert(lateral == windowed)
    assert(lateral.nonEmpty)
  }

  test("NOT IN is three-valued: one NULL in the subquery empties the " +
      "anti set; without nulls it is the plain anti join") {
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("ks")
    Seq(Some(1L)).toDF("v").createOrReplaceTempView("vs_nonull")
    Seq(Some(1L), None).toDF("v").createOrReplaceTempView("vs_null")
    val noNull = spark.sql(
      "SELECT k FROM ks WHERE k NOT IN (SELECT v FROM vs_nonull)")
      .as[Long].collect().toSet
    assert(noNull == Set(2L, 3L))
    val withNull = spark.sql(
      "SELECT k FROM ks WHERE k NOT IN (SELECT v FROM vs_null)")
      .count()
    assert(withNull == 0L)
  }

  test("observed metrics equal the direct aggregate, incl. a planted " +
      "null date") {
    val li = Seq(
      (1L, 10.00, Some(java.sql.Timestamp.valueOf("1995-01-01 00:00:00"))),
      (2L, 20.50, None),
      (3L, 0.25, Some(java.sql.Timestamp.valueOf("1996-06-15 00:00:00"))))
      .toDF("l_orderkey", "l_extendedprice", "l_shipdate")
    val got = Profiling.observedScanCensus(li)
      .as[(Long, Long, Long)].collect().head
    assert(got == ((3L, 3075L, 1L)), got.toString)
  }
}
