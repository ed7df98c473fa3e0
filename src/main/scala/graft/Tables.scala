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
    if (name == "events") {
      // events.parquet is written as parquet TIMESTAMP(NANOS); Spark 4 only
      // reads that as int64 nanoseconds behind the legacy flag (FIXTURES.md
      // §B gotcha), so `ts` is BIGINT nanos everywhere in this library.
      // The flag must be set at session BUILD time (as Bench/Verify/the
      // test harness do): setting it here as a hidden side effect would
      // silently change later nanos-parquet reads in the caller's session.
      val flag = "spark.sql.legacy.parquet.nanosAsLong"
      // case-insensitive: Spark's boolean conf parsing accepts TRUE/True too
      require(spark.conf.getOption(flag).exists(_.equalsIgnoreCase("true")),
        s"reading the events table requires $flag=true in the session " +
          "builder (events.parquet uses parquet TIMESTAMP(NANOS), which " +
          "Spark 4 only reads as int64 nanos behind that flag)")
    }
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
