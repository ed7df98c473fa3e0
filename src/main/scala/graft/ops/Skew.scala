package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY.md §4: the reference hand-salts HBase
  * rowkeys — PopulatePt.java:125–127 — to force mapper parallelism; in
  * Spark, AQE's skew-join handling covers sort-merge joins automatically,
  * and these helpers cover the cases AQE does not).
  */
object Skew {

  /** Salted equi-join for a heavy-hitter key distribution: the big side
    * gets a random-but-stable salt in [0, saltFactor); the small side is
    * replicated saltFactor times; the join key becomes (key, salt), so one
    * hot key spreads over saltFactor reduce partitions.
    *
    * Correctness is unconditional (every big row still meets every small
    * row of its key exactly once); use when the SMALL side fits
    * replicated — the classic dimension-join skew case.
    */
  def saltedEquiJoin(big: DataFrame, small: DataFrame, key: String,
                     saltFactor: Int,
                     joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // right/full outer would surface each unmatched REPLICATED small row
    // saltFactor times — semantically wrong under salting.
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti")
      .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedEquiJoin does not support joinType=$joinType")
    require(!big.columns.contains("graft_salt") &&
      !small.columns.contains("graft_salt"),
      "inputs already have a graft_salt column")
    val salted = big.withColumn("graft_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = small.withColumn("graft_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(key, "graft_salt"), joinType)
      .drop("graft_salt")
  }

  /** Top-df heavy-hitter report for a key column — the diagnostic that
    * decides between plain join, AQE, and salting. Ties break on the key
    * ascending so the report (including its cutoff row) is deterministic —
    * a diagnostic that changes between runs reads as a data change.
    */
  def heavyHitters(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(key).agg(count(lit(1)).as("df"))
      .orderBy(desc("df"), col(key)).limit(topN)

  /** Gini coefficient of a key's load distribution — the single-number
    * skew metric that trends a census over time ("is this join key
    * getting more skewed week over week?"), complementing `heavyHitters`'
    * head view. 0 = perfectly even, → 1 = one key owns everything.
    *
    * Emitted as the EXACT integer rational of the rank formula
    * `G = (2·Σ rnᵢ·cᵢ − (n+1)·Σ cᵢ) / (n·Σ cᵢ)` over counts sorted
    * ascending (ties broken on the key): no float division crosses an
    * engine boundary, so the metric is hash-comparable.
    *
    * The global rank window runs over the AGGREGATED key census (one row
    * per key, not per fact row) — the same single-partition sort
    * `heavyHitters` and every exact global rank pays. For a census too
    * large for one task, bound it first (e.g. Gini of the top-1M census
    * via `heavyHitters`), which is the standard monitoring trade.
    */
  def keyGini(df: DataFrame, key: String): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cnt"), col(key))
    counts
      .withColumn("rn", row_number().over(w).cast("long"))
      .agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("total"),
        sum(col("rn") * col("cnt")).as("rc"))
      .select(col("n_keys"),
        col("total").cast("long").as("total"),
        (lit(2L) * col("rc") - (col("n_keys") + 1) * col("total"))
          .cast("long").as("gini_num"),
        (col("n_keys") * col("total")).cast("long").as("gini_den"))
  }

  /** Per-partition row-count histogram — skew visibility for any stage. */
  def partitionHistogram(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(spark_partition_id().as("pid"))
      .groupBy("pid").agg(count(lit(1)).as("rows"))
      .orderBy("pid")
  }

  /** Explicit placement: partition by `key mod numPartitions` for an
    * integral key. Spark's own `repartition(n, expr)` places rows by
    * murmur3 hash — fine for balance, but the row→partition map is a
    * Spark internal no other engine reproduces; this partitioner makes
    * placement a PURE ARITHMETIC function of the key, so partition-level
    * facts (the `partitionHistogram` of the result) are externally
    * checkable, and co-location contracts ("all of key k is in partition
    * k mod n") can be stated to systems downstream of a write. Same
    * family as the reference's semantic first-char partitioner
    * (SURVEY §2.5 O1; Partition.java) — placement-as-semantics is the one
    * case worth the RDD drop-down, and the map is narrow (no wide
    * shuffle dependency beyond the partitioner's own exchange).
    */
  def partitionByKeyMod(df: DataFrame, key: String,
                        numPartitions: Int): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    val spark = df.sparkSession
    val schema = df.schema
    val idx = schema.fieldIndex(key)
    val n = numPartitions
    val part = new org.apache.spark.Partitioner {
      override def numPartitions: Int = n
      override def getPartition(k: Any): Int =
        // floorMod: a negative key must land in [0, n), not crash
        java.lang.Math.floorMod(k.asInstanceOf[Number].longValue, n.toLong)
          .toInt
    }
    val keyName = key
    val rdd = df.rdd
      .map { r =>
        val k = r.get(idx)
        // fail with the contract, not a deep NPE from Number.longValue
        require(k != null,
          s"partitionByKeyMod: null key in column '$keyName' — " +
            "placement is key mod n, which is undefined for null")
        (k.asInstanceOf[Number].longValue, r)
      }
      .partitionBy(part)
      .values
    spark.createDataFrame(rdd, schema)
  }

  /** AQE skew-join proof (r17 verdict item 6) — the AUTOMATIC
    * counterpart to `saltedEquiJoin`'s manual salt: a deterministic
    * planted-skew fact (90% of lineitem rows collapse onto supplier
    * key 1: `skew_key = 1 when l_orderkey % 10 < 9 else l_suppkey`)
    * joined to the supplier dim with BOTH sides `hint("merge")` — the
    * broadcast escape hatch is closed, so the plan is the sort-merge
    * join AQE's OptimizeSkewedJoin operates on, and the hot partition
    * is the one `spark.sql.adaptive.skewJoin` splits at runtime into
    * advisory-sized sub-partitions (each re-reading the dim side's
    * matching partition — correctness unconditional, like the salt).
    *
    * The RESULT is AQE-invariant (a nation-keyed cents census — the
    * oracle pins values whether or not the split engages); the PROOF
    * that the split engages is SkewSpec, which lowers the skew
    * thresholds to fixture scale, executes, and pins the "skewed"
    * AQEShuffleRead node in the adaptive plan, plus the DevScale rung
    * measured with the same thresholds. At 100 TB the default
    * thresholds (256 MB skewed-partition floor) engage on real
    * stragglers; the manual salt (q72) remains for the cases AQE does
    * not cover (aggregation skew, non-SMJ joins).
    *
    * Scale shape: one projection + one sort-merge join + a keyed
    * partial agg; output bounded by |nations|. The planted key makes
    * the pre-split partition distribution maximally skewed BY
    * CONSTRUCTION, so the rung measures exactly the engine's
    * skew-repair machinery, not the data's luck.
    */
  def skewedJoinCensus(lineitem: DataFrame,
                       supplier: DataFrame): DataFrame = {
    val fact = lineitem.select(
      when(pmod(col("l_orderkey"), lit(10L)) < 9, lit(1L))
        .otherwise(col("l_suppkey")).as("skew_key"),
      expr("cast(round(l_extendedprice * 100) as bigint)").as("cents"))
    val dim = supplier.select(col("s_suppkey").as("skew_key"),
      col("s_nationkey"))
    fact.hint("merge").join(dim.hint("merge"), "skew_key")
      .groupBy(col("s_nationkey").cast("long").as("nation"))
      .agg(count(lit(1)).as("n_rows"), sum(col("cents")).as("sum_cents"))
      .orderBy("nation")
  }

  /** Salt-factor planning census: per-key row counts against a target
    * rows-per-task budget, emitting — for every key whose count exceeds
    * the budget — the salt factor `⌈count / target⌉` a salted
    * repartition needs to bring its heaviest task back under budget.
    * The decision `saltedEquiJoin` (q72) takes as a CONSTANT becomes a
    * measured, per-key plan: run this census once, feed the max (or the
    * per-key map) into the salt, and the q75/q95 skew diagnostics turn
    * into an actionable repartition scheme — the pre-flight a 100 TB
    * groupBy/join runs instead of discovering the straggler at hour
    * three. Integer arithmetic throughout: the ceiling is
    * `(cnt + target − 1) div target`, exact both engines.
    *
    * Scale shape: ONE keyed partial agg (map-side combine folds to the
    * key cardinality) + a threshold filter; output is hot keys only,
    * ordered by weight. No window, no join.
    */
  def saltPlanCensus(df: DataFrame, key: String,
                     targetPerTask: Long = 1000L): DataFrame = {
    require(targetPerTask >= 1, "targetPerTask must be >= 1")
    df.groupBy(col(key).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > targetPerTask)
      .withColumn("salt_factor",
        expr(s"(cnt + ${targetPerTask - 1}L) div ${targetPerTask}L"))
      .orderBy(col("cnt").desc, col("key"))
  }
}
