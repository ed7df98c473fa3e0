package graft.streaming

import graft.ops.Cdc
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.hadoop.fs.Path

/** Streaming upsert materialization: a `foreachBatch` sink that folds each
  * micro-batch of changes into a keyed latest-wins snapshot on disk — the
  * streaming face of `Cdc.compactChangelog` (Kafka compacted topic →
  * queryable table, without a table format dependency).
  *
  * Snapshot layout: `basePath/v=<batchId>/` parquet, one directory per
  * processed micro-batch; the live snapshot is the HIGHEST version with a
  * commit marker. The sink writes its OWN marker (`_GRAFT_COMMIT`) after
  * each parquet write rather than trusting the committer's `_SUCCESS`:
  * object-store committers commonly run with
  * `mapreduce.fileoutputcommitter.marksuccessfuljobs=false`, under which
  * every version would look uncommitted, every merge would see
  * `prev = None`, and accumulated snapshot state would be silently lost.
  * (`_SUCCESS` is still honored so snapshots written before the sink
  * marker existed stay readable.) Failure mid-write leaves a marker-less
  * directory that readers skip, and a restart replays the same batchId
  * over it (overwrite mode) — together that makes the sink idempotent
  * under Structured Streaming's at-least-once `foreachBatch` contract.
  *
  * Tombstones are RETAINED in the stored snapshot (marker rows), not
  * dropped: a delete must keep outranking out-of-order updates that
  * arrive in later batches with older timestamps. `readMaterialized`
  * filters them out for consumers. Production retention (dropping
  * tombstones older than the max possible lateness) is one filter on the
  * merge — deliberately left to the operator of the pipeline.
  *
  * Scale: each batch rewrites the full snapshot — correct and simple, and
  * right-sized while |snapshot| stays executor-cluster-small (dimension
  * tables, feature stores keyed by entity). At 100 TB snapshot scale the
  * same merge runs bucket-wise against a real table format (Delta/Hudi/
  * Iceberg MERGE, which is this exact compaction with bucket pruning and
  * a manifest instead of `v=N` directories); the OPERATOR — one window,
  * latest-wins, tombstone-aware — is unchanged, which is why it lives in
  * `Cdc` and this sink stays thin.
  */
object UpsertSink {

  final case class Change(key: Long, ts: Long, off: Long, op: String)

  /** The sink's own commit marker — written explicitly by `mergeBatch`,
    * so commit detection never depends on committer configuration.
    */
  val CommitMarker = "_GRAFT_COMMIT"

  /** Highest committed (has the sink marker, or a legacy `_SUCCESS`) version under `basePath`,
    * optionally restricted to versions strictly below `below` — the
    * restriction is what makes at-least-once REPLAY safe: re-delivered
    * batch N must merge onto N's PREDECESSOR, never read the v=N it is
    * about to overwrite (a same-path read-overwrite throws, and without
    * the guard a replayed batch would double-merge its own output).
    */
  def latestVersion(spark: SparkSession, basePath: String,
                    below: Long = Long.MaxValue): Option[Long] = {
    val base = new Path(basePath)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .flatMap { st =>
        val n = st.getPath.getName
        val committed = fs.exists(new Path(st.getPath, CommitMarker)) ||
          fs.exists(new Path(st.getPath, "_SUCCESS"))
        if (n.startsWith("v=") && committed) n.stripPrefix("v=").toLongOption
        else None
      }
      .filter(_ < below)
      .maxOption
  }

  /** The stored snapshot (tombstone markers INCLUDED), if any. */
  def readSnapshot(spark: SparkSession, basePath: String): Option[DataFrame] =
    latestVersion(spark, basePath)
      .map(v => spark.read.parquet(s"$basePath/v=$v"))

  /** The consumer view: latest snapshot with tombstones filtered out. */
  def readMaterialized(spark: SparkSession, basePath: String,
                       tombstoneCol: String): Option[DataFrame] =
    readSnapshot(spark, basePath).map(_.filter(!col(tombstoneCol)))

  /** One micro-batch fold: previous snapshot ∪ batch → compact → write
    * `v=batchId`. Public so the merge step is testable without a stream.
    */
  def mergeBatch(batch: Dataset[Row], batchId: Long, basePath: String,
                 keyCol: String, tsCol: String, tiebreakCol: String,
                 tombstoneCol: String): Unit = {
    val spark = batch.sparkSession
    // merge onto the predecessor of THIS batch, never onto v=batchId
    // itself: a replayed batch (crash after commit, before checkpoint)
    // would otherwise read the path it is about to overwrite
    val prev = latestVersion(spark, basePath, below = batchId)
      .map(v => spark.read.parquet(s"$basePath/v=$v"))
    val all = prev match {
      case Some(p) => p.unionByName(batch.toDF())
      case None => batch.toDF()
    }
    Cdc.compactChangelog(all, col(keyCol), col(tsCol), col(tiebreakCol),
        col(tombstoneCol), keepTombstones = true)
      .write.mode("overwrite").parquet(s"$basePath/v=$batchId")
    // commit is OURS to declare: the marker write is the last step, so a
    // crash anywhere above leaves the version invisible and replayable
    val fs = new Path(basePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.create(new Path(s"$basePath/v=$batchId/$CommitMarker"), true).close()
  }

  /** Start the sink over an unbounded change stream. The stream must
    * already carry a BOOLEAN `tombstoneCol` (derive it with one
    * `withColumn` from whatever op-code the source uses).
    */
  def start(changes: DataFrame, basePath: String, checkpointDir: String,
            keyCol: String, tsCol: String, tiebreakCol: String,
            tombstoneCol: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        mergeBatch(batch, batchId, basePath, keyCol, tsCol, tiebreakCol,
          tombstoneCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
