package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Every table is one parquet file under a scale-factor directory
  * (`/root/testdata/sf0.01` etc.). All loads go through
  * `spark.read.parquet` so Catalyst column pruning and predicate pushdown
  * reach the scan (SURVEY.md §4) — the scan is the unit that must stay
  * efficient at 100 TB, so nothing here caches or collects; callers decide
  * lifetime.
  */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events")
      // events.parquet is written as parquet TIMESTAMP(NANOS); Spark 4 only
      // reads that behind this legacy flag, as int64 nanoseconds
      // (FIXTURES.md §B gotcha). `ts` is therefore BIGINT nanos everywhere
      // in this library.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
