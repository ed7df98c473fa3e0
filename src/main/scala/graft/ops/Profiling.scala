package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality profiling — the observability layer a 100 TB pipeline
  * runs before trusting a new drop: per-column completeness/uniqueness/
  * range facts and value histograms (the Deequ-style constraint-metric
  * family; the reference has no profiling surface — engine extension).
  *
  * Every metric here is EXACT and accumulation-free (counts, distincts,
  * min/max): no floating-point sums whose partition order could drift
  * between engines, so the whole profile is hash-comparable against any
  * SQL oracle. Means/stddevs are deliberately absent — they are one
  * `agg` away for a caller who wants them, but they cannot be made
  * bit-stable across engines without integer quantization.
  */
object Profiling {

  /** One profile row per column: total rows, nulls, exact distinct count,
    * min and max (cast to double — callers profile numeric columns).
    *
    * Single-pass: all metrics ride ONE aggregate. The per-column exact
    * distincts make Catalyst plan an Expand (rows × columns before the
    * partial agg) — the price of exactness in one pass; at 100 TB either
    * profile few columns per pass or swap `count_distinct` for
    * `approx_count_distinct` (HLL, one row per input, no Expand) where a
    * ±2% uniqueness answer is acceptable — which is the normal trade for
    * a monitoring metric, but not oracle-checkable, so the exact form is
    * the default.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(",")}")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"${c}__n_null"),
        count_distinct(col(c)).as(s"${c}__n_distinct"),
        min(col(c)).cast("double").as(s"${c}__min"),
        max(col(c)).cast("double").as(s"${c}__max"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"), col("n_rows"),
        col(s"${c}__n_null").as("n_null"),
        col(s"${c}__n_distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"),
        col(s"${c}__max").as("max_val"))
    }
    one.select(explode(array(rows: _*)).as("p")).select("p.*")
      .orderBy("col_name")
  }

  /** Fixed-bound equal-width histogram: bin i covers
    * [lo + i·(hi−lo)/k, lo + (i+1)·(hi−lo)/k); values outside [lo, hi)
    * clamp into the edge bins (min/max from `numericProfile` are the
    * natural bounds feed). Bounds are EXPLICIT, not computed in-query —
    * a two-pass min/max-then-bin would make every run's bin edges data-
    * dependent, and histograms exist to be compared across runs. Empty
    * bins surface with count 0 (a monitoring gap reads very differently
    * from a zero), via a range join no wider than k rows.
    *
    * The bin expression is one multiply-divide-floor on doubles, written
    * identically here and in any SQL oracle, so IEEE evaluation matches
    * bit for bit. A pure projection + one two-level count: scan-speed.
    */
  def numericHistogram(df: DataFrame, valueCol: String,
                       lo: Double, hi: Double, k: Int): DataFrame = {
    require(k >= 1, "need at least one bin")
    require(lo < hi, "need lo < hi")
    val spark = df.sparkSession
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) * k / (lit(hi) - lit(lo))), lit(0)),
      lit(k - 1)).cast("int")
    val counts = df.filter(col(valueCol).isNotNull)
      .select(bin.as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))
    spark.range(k).select(col("id").cast("int").as("bin"))
      .join(counts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy("bin")
  }
}
