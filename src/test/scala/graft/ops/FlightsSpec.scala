package graft.ops

import graft.SparkSpec
import java.nio.file.Files

/** Exercises the reference's own flight workloads on synthetic TranStats
  * rows (FIXTURES.md §A1 schema — 44 positional columns, only the indices
  * the reference reads are populated).
  */
class FlightsSpec extends SparkSpec {

  /** One CSV line with the given fields at the reference's indices. */
  private def row(year: String = "2007", month: String = "7",
                  date: String = "2007-07-1", carrier: String = "AA",
                  origin: String = "ORD", dest: String = "JFK",
                  dep: String = "900", arr: String = "1100",
                  delay: String = "10.00", cancelled: String = "0.00",
                  diverted: String = "0.00"): String = {
    val c = Array.fill(44)("")
    c(0) = year; c(2) = month; c(5) = date; c(6) = carrier; c(10) = "111"
    c(11) = origin; c(17) = dest; c(24) = dep; c(35) = arr; c(37) = delay
    c(41) = cancelled; c(43) = diverted
    c.mkString(",")
  }

  private def flightsDf(lines: String*) = {
    val f = Files.createTempFile("flights", ".csv")
    Files.write(f, lines.mkString("\n").getBytes)
    Flights.typed(Flights.load(spark, f.toString))
  }

  test("two-leg join: connects ORD→X→JFK same-date with ArrTime<DepTime") {
    val df = flightsDf(
      row(origin = "ORD", dest = "DEN", arr = "1100", delay = "10.00"),  // leg1 via DEN
      row(origin = "DEN", dest = "JFK", dep = "1200", delay = "5.00"),   // leg2 valid
      row(origin = "DEN", dest = "JFK", dep = "1030", delay = "7.00"),   // dep before arr → no
      row(origin = "DEN", dest = "JFK", dep = "1200", delay = "5.00",
        date = "2007-07-2"),                                             // other date → no
      row(origin = "ORD", dest = "JFK"),                                 // single-leg → excluded
      row(origin = "ORD", dest = "DEN", cancelled = "1.00"),             // cancelled → excluded
      row(origin = "ORD", dest = "DEN", date = "2009-01-1"))             // out of window → excluded
    val stats = Flights.twoLegStats(df).collect().head
    assert(stats.getLong(0) == 1)          // exactly one valid connection
    assert(stats.getDouble(1) == 15.0)     // 10 + 5
  }

  test("two-leg average truncates the delay sum like the long counter") {
    val df = flightsDf(
      row(origin = "ORD", dest = "DEN", arr = "1000", delay = "0.70"),
      row(origin = "DEN", dest = "JFK", dep = "1100", delay = "0.80"),
      row(origin = "ORD", dest = "LAX", arr = "1000", delay = "1.00"),
      row(origin = "LAX", dest = "JFK", dep = "1100", delay = "1.00"))
    val stats = Flights.twoLegStats(df).collect().head
    // sums: 1.5 + 2.0 = 3.5 → (long) 3 → 3/2 = 1.5 (NOT 3.5/2 = 1.75)
    assert(stats.getLong(0) == 2)
    assert(stats.getDouble(1) == 1.5)
  }

  test("no qualifying connections: count 0, NaN average, no ANSI crash") {
    val df = flightsDf(row(origin = "ORD", dest = "DEN")) // one leg only
    val stats = Flights.twoLegStats(df).collect().head
    assert(stats.getLong(0) == 0)
    assert(stats.getDouble(1).isNaN) // reference: delay*1.0/0 → NaN
  }

  test("empty cancelled/diverted fields count as not cancelled") {
    val df = flightsDf(
      row(origin = "ORD", dest = "DEN", cancelled = "", diverted = ""),
      row(origin = "DEN", dest = "JFK", dep = "1200", cancelled = "",
        diverted = ""))
    assert(Flights.twoLegStats(df).collect().head.getLong(0) == 1)
  }

  // ---- committed TranStats-schema fixture (tools/gen_flight_fixture.py):
  // 318 rows × 110 positional columns, every field quoted, city columns
  // with embedded commas BEFORE index 17 — a naive split(',') would shift
  // Dest, so these goldens pin the quote-aware parse itself.
  private lazy val fixture =
    Flights.typed(Flights.load(spark,
      "src/test/resources/flights_transtats.csv"))

  test("TranStats fixture: quote-aware 110-column parse reaches the right columns") {
    assert(fixture.count() == 318)
    val l1a = fixture.filter(fixture("flight_num") === "100").collect().head
    assert(l1a.getAs[String]("origin") == "ORD")
    assert(l1a.getAs[String]("dest") == "DEN")   // shifted under naive split
    assert(l1a.getAs[Int]("arr_time") == 1010)
    assert(l1a.getAs[Double]("arr_delay_min") == 5.0)
    // the escaped-quote row (Chicago "O'Hare", IL) still parses positionally
    val esc = fixture.filter(fixture("flight_num") === "113").collect().head
    assert(esc.getAs[String]("dest") == "DEN")
  }

  test("TranStats fixture golden: two-leg stats = 4 pairs, 12.25 average") {
    // pairs (5+3), (5+7), (10.5+7), (0+12): sum 49.5 → (long)49 → 49/4
    val stats = Flights.twoLegStats(fixture).collect().head
    assert(stats.getLong(0) == 4)
    assert(stats.getDouble(1) == 12.25)
  }

  test("TranStats fixture golden: 2008 airline monthly delay") {
    val r = Flights.airlineMonthlyDelay(fixture, 2008).collect()
    val byKey = r.map(x => (x.getAs[String]("carrier"), x.getAs[Int]("mon")) ->
      x.getAs[Int]("avg_delay")).toMap
    // carriers in 2008 with non-empty carrier: AA (4 rows incl. ORD/PHX
    // legs), UA; the empty-carrier 2008 row is dropped by the guard
    assert(r.map(_.getAs[String]("carrier")).distinct.sorted.toSeq ==
      Seq("AA", "UA"))
    assert(byKey(("AA", 1)) == 6)  // ceil(avg(0, 12))
    assert(byKey(("UA", 2)) == 4)  // 3.7→3, 4.2→4 → avg 3.5 → ceil 4
    assert(byKey(("UA", 7)) == 0)  // dense fill; cancelled row excluded
  }

  test("airline monthly delay: ceil average, truncated delays, dense months") {
    val df = flightsDf(
      row(year = "2008", month = "3", carrier = "AA", delay = "10.90"),
      row(year = "2008", month = "3", carrier = "AA", delay = "10.90"),
      row(year = "2008", month = "5", carrier = "AA", delay = ""),
      row(year = "2008", month = "3", carrier = "AA", delay = "99.00",
        cancelled = "1.00"),                       // cancelled → excluded
      row(year = "2007", month = "3", carrier = "AA", delay = "50.00"))
    val r = Flights.airlineMonthlyDelay(df, 2008).collect()
    assert(r.length == 12)
    val byMon = r.map(x => x.getAs[Int]("mon") -> x.getAs[Int]("avg_delay")).toMap
    assert(byMon(3) == 10)  // delays truncate to 10 → avg 10 → ceil 10
    assert(byMon(5) == 0)   // "" → 0
    assert(byMon(1) == 0 && byMon(12) == 0) // dense fill
  }
}
