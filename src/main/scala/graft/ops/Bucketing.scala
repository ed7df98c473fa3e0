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

  /** Write `df` as a bucketed (+ in-bucket sorted) managed table.
    *
    * Drops any same-named table AND its warehouse directory first: a
    * managed table's location can outlive the in-memory catalog that
    * created it (each harness run is a fresh session), and Spark
    * refuses to create a managed table over an orphaned location
    * (LOCATION_ALREADY_EXISTS) — without the sweep, the SECOND run of
    * any bucketed-write query in a new JVM fails.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sorted: Boolean = true): Unit = {
    dropManaged(df.sparkSession, table)
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
    (if (sorted) w.sortBy(key) else w)
      .format("parquet")
      .saveAsTable(table)
  }

  /** DROP `table` and sweep its orphaned managed location — shared by
    * every managed-table writer here. A REGISTERED managed table's
    * directory is removed by DROP itself; the manual sweep only has to
    * handle the ORPHAN case — a directory left by a previous JVM whose
    * in-memory catalog is gone — whose default managed path is
    * warehouse/<lowercased name> (the metastore lowercases identifiers,
    * so a mixed-case `table` must not be used verbatim). Spark refuses
    * to create a managed table over an orphaned location
    * (LOCATION_ALREADY_EXISTS), so without the sweep the SECOND run of
    * any table-writing query in a new JVM fails. Deletion goes through
    * the Hadoop FileSystem API: correct for non-local warehouses and
    * free of the listFiles()==null mid-walk NPE a raw java.io recursion
    * risks.
    */
  def dropManaged(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val orphan = new org.apache.hadoop.fs.Path(warehouse,
      table.toLowerCase(java.util.Locale.ROOT))
    val fs = orphan.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(orphan)) { fs.delete(orphan, true); () }
  }

  /** Write `df` as a VALUE-PARTITIONED managed table (`partitionBy(key)`
    * directory-per-value layout) — the scan-pruning twin of bucketing:
    * where a bucketed table removes the JOIN's exchange, a partitioned
    * table removes the SCAN — a reader filtering (or DPP-joining, the
    * q347 machinery) on `key` touches only the matching directories.
    * The right layout for list-keyed index tables probed on a small set
    * of keys per query (IVF lists: nprobe of nlist directories read).
    */
  def writePartitioned(df: DataFrame, table: String, key: String): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(key)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write a SMALL (driver-bounded) frame as a plain managed table —
    * model state (centroids, censuses) persisted next to the index it
    * describes. Same drop-and-sweep semantics as the other writers.
    */
  def writeSmall(df: DataFrame, table: String): Unit = {
    dropManaged(df.sparkSession, table)
    df.write.mode(SaveMode.Overwrite).format("parquet").saveAsTable(table)
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

  /** Dynamic-partition-pruned join: `fact` written hive-partitioned on
    * `partCol`, read back, and equi-joined to the (filtered, broadcast)
    * `dim` on that column. Catalyst injects the dim side's join keys as
    * a DYNAMIC pruning subquery into the fact scan's PartitionFilters —
    * the fact's untouched partitions are never read, even though the
    * selective predicate lives on the other side of the join and no
    * static filter on `partCol` exists anywhere in the query
    * (BucketingSpec pins `dynamicpruning` in the scan).
    *
    * This closes the scan-elimination triple the layout family sells at
    * 100 TB: static pushdown prunes on literals (q02), zone maps prune
    * on file stats (q341), DPP prunes on values only known at RUNTIME
    * from a dimension filter — the star-schema pattern ("this month's
    * campaigns" joined into a date-partitioned fact) where the pruned
    * volume routinely exceeds both.
    *
    * The write is the once-per-workload layout cost (the writeBucketed
    * economics); the returned frame re-plans the pruned join each call.
    */
  def dppJoin(fact: DataFrame, partCol: String, dim: DataFrame,
              path: String): DataFrame = {
    fact.write.mode(SaveMode.Overwrite).partitionBy(partCol).parquet(path)
    fact.sparkSession.read.parquet(path)
      .join(org.apache.spark.sql.functions.broadcast(dim), Seq(partCol))
  }
}
