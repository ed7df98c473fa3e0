package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins (SURVEY.md §4: the
  * reference's only placement tool was the HBase rowkey; Spark's is
  * bucketing — both sides of a recurring equi-join pre-hashed into the
  * same bucket count on the join key, so the join plans with ZERO
  * exchanges).
  *
  * This is the 100 TB lever for fact-to-fact joins that repeat across a
  * workload (orders⋈lineitem on orderkey every day): pay the shuffle once
  * at write time, never again at read time. `sortBy` within buckets
  * additionally removes the join's sort step.
  */
object Bucketing {

  /** Write `df` as a bucketed (+ in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key. When both tables are
    * bucketed into the same count on `key`, the plan contains no Exchange
    * (verified in BucketingSpec).
    */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String, key: String,
                    joinType: String = "inner"): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), Seq(key), joinType)
}
