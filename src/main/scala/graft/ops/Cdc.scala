package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-data-capture operators: changelog compaction (latest-wins upsert
  * with tombstones) and snapshot diffing.
  *
  * Engine-surface extension (no reference analogue — the reference's HBase
  * ingest, Flight2/src/main/java/hw4/HPopulate.java:92–105, OVERWRITES by
  * rowkey, which is exactly latest-wins-by-key semantics; these operators
  * are the same contract expressed over an explicit change stream instead
  * of a KV store's implicit versioning).
  *
  * Scale notes (100 TB):
  *  - `compactChangelog` is ONE hash-shuffle of the changelog by key
  *    followed by a per-key sort — the minimum any merge can do. No
  *    broadcast, no join: a skewed key degrades to a larger sort bucket,
  *    never to a pair blow-up. AQE splits oversized partitions.
  *  - `snapshotDiff` pre-aggregates BOTH sides by the key before the full
  *    outer join, so the wide exchange carries one row per key, not one
  *    per fact row; the aggregate's hash partitioning on the key is reused
  *    by the join (no second exchange per side).
  */
object Cdc {

  /** Latest-wins changelog compaction: for each `key`, keep the single
    * change with the greatest `(ts, tiebreak)`; if that winning change
    * satisfies `tombstone`, the key is deleted (absent from the result).
    *
    * This is the batch form of a streaming upsert materialization (Kafka
    * compacted topic → table, Delta/Hudi merge): deterministic whenever
    * `(key, ts, tiebreak)` is unique, which the caller should guarantee
    * (changelogs carry a unique offset — pass it as `tiebreak`).
    *
    * `keepTombstones = true` keeps a winning delete as a marker row
    * instead of dropping the key — required when the compacted result is
    * itself re-merged with later changes (streaming.UpsertSink): without
    * the marker, a late out-of-order update older than the delete would
    * resurrect the key.
    */
  def compactChangelog(changelog: DataFrame, key: Column, ts: Column,
                       tiebreak: Column, tombstone: Column,
                       keepTombstones: Boolean = false): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.desc, tiebreak.desc)
    val latest = changelog
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    if (keepTombstones) latest else latest.filter(!tombstone)
  }

  /** Time travel: the latest-wins snapshot AS OF `asOf` — compaction
    * restricted to changes with `ts` ≤ the cutoff. With an append-only
    * changelog this reconstructs any historical table state from the one
    * log (event sourcing); the predicate sits on the scan, so partition/
    * file pruning on the change time bounds the replay cost.
    */
  def snapshotAsOf(changelog: DataFrame, key: Column, ts: Column,
                   tiebreak: Column, tombstone: Column,
                   asOf: Column): DataFrame =
    compactChangelog(changelog.filter(ts <= asOf), key, ts, tiebreak,
      tombstone)

  /** Slowly-changing-dimension type-2 build: turn a changelog into a
    * VERSIONED dimension — one row per change, carrying its validity
    * interval `[valid_from, valid_to)` and a current-row flag. `valid_to`
    * is the NEXT change's timestamp for the same key (null while current),
    * so the intervals tile each key's timeline exactly: an as-of lookup is
    * `valid_from <= t AND (valid_to IS NULL OR t < valid_to)`, and joining
    * facts to the dimension state that was current at fact time is a plain
    * as-of join against this table (Joins.asOf).
    *
    * `version` is the 1-based change ordinal per key. Determinism needs
    * `(key, ts, tiebreak)` unique — same contract as `compactChangelog`.
    *
    * Scale shape: ONE hash-shuffle of the changelog by key feeding a
    * single per-key sorted window that evaluates `row_number` and `lead`
    * together (one WindowExec, not two) — the same minimum-work shape as
    * `compactChangelog`; a hot key degrades to a bigger sort bucket, never
    * a join blow-up.
    */
  def scd2Build(changelog: DataFrame, key: Column, ts: Column,
                tiebreak: Column): DataFrame = {
    val w = Window.partitionBy(key).orderBy(ts.asc, tiebreak.asc)
    changelog
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("valid_from", ts)
      .withColumn("valid_to", lead(ts, 1).over(w))
      .withColumn("is_current", col("valid_to").isNull.cast("int"))
  }

  /** Snapshot diff: classify every key as `added` (only in `after`),
    * `removed` (only in `before`) or `changed` (in both, any `valueCols`
    * differ). Keys whose values are identical are dropped — at 100 TB the
    * overwhelming majority of keys are unchanged, and a diff that emits
    * them is a copy, not a diff.
    *
    * Inputs must be one-row-per-key (pre-aggregate first — see scale note
    * above). Null-safe comparison (`<=>`) so a null-vs-value change is
    * `changed`, not silently `same`.
    */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   keyCol: String, valueCols: Seq[String]): DataFrame = {
    val b = before.select((keyCol +: valueCols).map(col): _*)
      .withColumnsRenamed((keyCol +: valueCols).map(c => c -> s"b_$c").toMap)
    val a = after.select((keyCol +: valueCols).map(col): _*)
      .withColumnsRenamed((keyCol +: valueCols).map(c => c -> s"a_$c").toMap)
    val same = valueCols
      .map(c => col(s"b_$c") <=> col(s"a_$c"))
      .reduce(_ && _)
    b.join(a, col(s"b_$keyCol") === col(s"a_$keyCol"), "full_outer")
      .withColumn("status",
        when(col(s"b_$keyCol").isNull, lit("added"))
          .when(col(s"a_$keyCol").isNull, lit("removed"))
          .when(same, lit("same"))
          .otherwise(lit("changed")))
      .filter(col("status") =!= "same")
      .withColumn(keyCol, coalesce(col(s"a_$keyCol"), col(s"b_$keyCol")))
  }

  /** Right-to-be-forgotten cascade census: given the md5-permille slice
    * of customers to forget (the q56 deterministic-slice device — swap
    * in a real request table in production), count every row each table
    * loses BEFORE running the deletes: customers, their orders, those
    * orders' line items, and the users' event rows. The cost/impact
    * estimate a GDPR erasure batch needs up front — a job sized from
    * this census gets scheduled; one discovered mid-flight gets killed.
    *
    * Scale shape: the forget set is customer-sized; orders resolve by a
    * custkey semi-join, lineitem by an orderkey semi-join against the
    * ALREADY-FILTERED orders (never a 3-way fact join), events by a
    * user-id semi-join; four partial-agg counts cross-join into the
    * one-row report. Semi-joins carry ids only; the forget set and its
    * order keys are pinned once (each feeds two consumers).
    */
  def forgetCascadeCensus(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, events: DataFrame,
                          permille: Long = 10L): DataFrame = {
    require(permille >= 0 && permille <= 1000, "permille in [0, 1000]")
    val forget = customer
      .filter(graft.ops.Sampling.splitBucket(col("c_custkey")) <
        lit(permille))
      .select(col("c_custkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val fOrders = orders.join(forget,
        col("o_custkey") === col("c_custkey"), "left_semi")
      .select(col("o_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nCust = forget.agg(count(lit(1)).as("n_customers"))
    val nOrd = fOrders.agg(count(lit(1)).as("n_orders"))
    val nLi = lineitem.join(fOrders,
        col("l_orderkey") === col("o_orderkey"), "left_semi")
      .agg(count(lit(1)).as("n_lineitems"))
    val nEv = events.join(forget,
        col("user_id") === col("c_custkey"), "left_semi")
      .agg(count(lit(1)).as("n_events"))
    nCust.crossJoin(nOrd).crossJoin(nLi).crossJoin(nEv)
  }
}
