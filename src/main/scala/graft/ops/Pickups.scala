package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The `final` module's pickup-ingest pipeline on its own CSV schema
  * (FIXTURES.md §A2: `datetime,lat,lon,base`, no header).
  *
  * PopulatePt (/root/reference/final/src/main/java/population/
  * PopulatePt.java:66–72) rounds lat/lon to 3 dp HALF_UP from the CSV
  * STRING (`new BigDecimal(records[1])`) — replicated by casting the
  * string column to decimal(12,3) (Spark's string→decimal cast is
  * HALF_UP) before widening to double. Then A8: group identical rounded
  * points, count multiplicity.
  */
object Pickups {

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.csv(path)

  /** P7+A8: the weighted point cloud (lat, lon, cnt) for ml.KMeans. */
  def points(raw: DataFrame): DataFrame =
    raw.select(
      col("_c1").cast("decimal(12,3)").cast("double").as("lat"),
      col("_c2").cast("decimal(12,3)").cast("double").as("lon"))
      .groupBy("lat", "lon")
      .agg(count(lit(1)).cast("int").as("cnt"))
}
