package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's own flight workloads, on its own TranStats CSV schema
  * (FIXTURES.md §A1; paths in `/root/reference/`):
  *
  *  - Flight1 two-leg connection query — Flight1/src/main/java/hw3/
  *    PLAIN.java. Filter (:86–109): flight touches EXACTLY one of
  *    {origin=ORD, dest=JFK} (both ⇒ single-leg, excluded), not cancelled/
  *    diverted (field == "1.00"; empty counts as not cancelled), date in
  *    [2007-06-01, 2008-05-31] inclusive. Join (:175–194): same connecting
  *    airport AND same flight date, strict ArrTime < DepTime on HHmm ints.
  *    Final stats (:199–208): count + average, where the reference pushes
  *    the delay SUM through a long-valued Hadoop counter —
  *    `(long) totalDelay` — so the average divides a TRUNCATED sum; that
  *    quirk is replicated here (the per-reducer partial-print quirk is
  *    not, per SURVEY.md §3.2).
  *  - Flight2 airline/month average delay — Flight2/src/main/java/hw4/
  *    Secondary.java: year filter, not-cancelled, malformed-row guard
  *    (empty year/month/carrier), "" delay → 0 then Java (int) truncation
  *    (:57–58), per (airline, month) `Math.ceil(avg)` as int (:213–221),
  *    dense months 1–12 with 0 fill (:181–200). The MR secondary sort /
  *    grouping comparators (O3/O4) disappear into groupBy.
  *
  * CSV intake matches opencsv `withIgnoreQuotations(false)`: Spark's csv
  * source with default quote '"'. Columns are positional (`_cN`) exactly
  * like the reference's `records[N]`.
  */
object Flights {

  /** The committed TranStats fixture (tools/gen_flight_fixture.py),
    * resolved relative-first so sbt-local runs and the driver's
    * repo-rooted runs both find one canonical file — the q268/q269
    * oracles embed the same resolved path for DuckDB.
    */
  lazy val fixturePath: String = {
    val rel = "src/test/resources/flights_transtats.csv"
    if (new java.io.File(rel).exists()) new java.io.File(rel).getAbsolutePath
    else "/root/repo/" + rel
  }

  /** Positional quote-aware CSV scan (S1/S2). escape='"' pins RFC 4180
    * doubled-quote escaping ("" inside a quoted field), which is opencsv's
    * default and what TranStats exports use; Spark's own default escape is
    * backslash, which would mangle such fields.
    */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.option("escape", "\"").csv(path)

  /** Name + type the positionally-indexed columns the reference reads.
    * Delay keeps P6 semantics: empty → 0.0 (truncation to int happens at
    * the operator that needs it, like Secondary.java does).
    */
  def typed(raw: DataFrame): DataFrame = raw.select(
    col("_c0").cast("int").as("year"),
    col("_c2").cast("int").as("month"),
    to_date(col("_c5"), "yyyy-MM-d").as("flight_date"),
    col("_c6").as("carrier"),
    col("_c10").as("flight_num"),
    col("_c11").as("origin"),
    col("_c17").as("dest"),
    col("_c24").cast("int").as("dep_time"),
    col("_c35").cast("int").as("arr_time"),
    coalesce(col("_c37").cast("double"), lit(0.0)).as("arr_delay_min"),
    coalesce(col("_c41"), lit("")).as("cancelled"),
    coalesce(col("_c43"), lit("")).as("diverted"))

  /** P4+J1+J2: valid two-leg connections origin→via→dest on the same
    * flight date. Equi keys (via, flight_date) drive the shuffle; the
    * strict HHmm ordering is the post-match theta conjunct.
    */
  def twoLegPairs(flights: DataFrame,
                  origin: String = "ORD", dest: String = "JFK",
                  start: String = "2007-06-01",
                  end: String = "2008-05-31"): DataFrame = {
    val valid = flights.filter(
      col("cancelled") =!= "1.00" && col("diverted") =!= "1.00" &&
      col("flight_date").between(lit(start).cast("date"),
        lit(end).cast("date")))
    val leg1 = valid
      .filter(col("origin") === origin && col("dest") =!= dest)
      .select(col("dest").as("via"), col("flight_date"),
        col("arr_time").as("arr1"), col("arr_delay_min").as("delay1"))
    val leg2 = valid
      .filter(col("dest") === dest && col("origin") =!= origin)
      .select(col("origin").as("via2"), col("flight_date").as("fd2"),
        col("dep_time").as("dep2"), col("arr_delay_min").as("delay2"))
    leg1.join(leg2,
      col("via") === col("via2") && col("flight_date") === col("fd2") &&
      col("arr1") < col("dep2"))
  }

  /** A5: the reference's final `count:N average:X` line as a one-row
    * aggregate — including the `(long) totalDelay` truncation before the
    * divide (PLAIN.java:201–205).
    */
  def twoLegStats(flights: DataFrame,
                  origin: String = "ORD", dest: String = "JFK",
                  start: String = "2007-06-01",
                  end: String = "2008-05-31"): DataFrame =
    twoLegPairs(flights, origin, dest, start, end)
      .agg(
        count(lit(1)).as("count"),
        // the reference computes `((long) totalDelay) * 1.0 / count`,
        // which is NaN for an empty join; Spark 4's default ANSI mode
        // makes ANY division by zero throw, so the zero case is guarded
        // (CaseWhen evaluates only the matched branch) and NaN emitted
        // explicitly
        when(count(lit(1)) > 0,
          sum(col("delay1") + col("delay2")).cast("long")
            .cast("double") / count(lit(1)))
          .otherwise(lit(Double.NaN)).as("average"))

  /** P5+P6+A6+A7: per-airline dense monthly ceil-average delay for one
    * year. Output stays relational (carrier, mon, avg_delay); the
    * reference's `airline,(1,a1),...,(12,a12)` line is presentation
    * (SURVEY §2.4 A7).
    */
  def airlineMonthlyDelay(flights: DataFrame, year: Int = 2008): DataFrame = {
    val spark = flights.sparkSession
    val valid = flights.filter(
      col("year") === year && col("cancelled") =!= "1.00" &&
      col("year").isNotNull && col("month").isNotNull &&
      col("carrier").isNotNull && col("carrier") =!= "")
      .withColumn("delay", col("arr_delay_min").cast("int"))
    val agg = valid
      .groupBy(col("carrier"), col("month").as("mon"))
      .agg(ceil(avg("delay")).cast("int").as("avg_delay"))
    val months = spark.range(1, 13).select(col("id").cast("int").as("mon"))
    valid.select("carrier").distinct()
      .crossJoin(broadcast(months))
      .join(agg, Seq("carrier", "mon"), "left")
      .na.fill(0, Seq("avg_delay"))
      .orderBy("carrier", "mon")
  }
}
