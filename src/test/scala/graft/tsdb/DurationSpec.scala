package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite

class DurationSpec extends AnyFunSuite {
  test("unit ladder matches the reference (months = 4 weeks, years = 12 months)") {
    assert(Duration.micros(1) == 1000L)
    assert(Duration.seconds(1) == 1000000000L)
    assert(Duration.minutes(1) == 60L * 1000000000L)
    assert(Duration.hours(1) == 3600L * 1000000000L)
    assert(Duration.days(1) == 86400L * 1000000000L)
    assert(Duration.weeks(1) == 7L * 86400L * 1000000000L)
    assert(Duration.months(1) == 28L * 86400L * 1000000000L)
    assert(Duration.years(1) == 336L * 86400L * 1000000000L)
  }

  test("fractional arguments truncate to whole nanoseconds BEFORE scaling (reference parity)") {
    // talna: Duration::seconds(1.5) = nanos(1.5) * 1e9 = 1_000_000_000
    assert(Duration.seconds(1.5) == 1000000000L)
    assert(Duration.millis(2.9) == 2000000L)
    assert(Duration.nanos(0.9) == 0L)
    assert(Duration.days(0.5) == 0L)
  }

  test("timestamp() is ns since epoch and monotonic-ish") {
    val t = Time.timestamp()
    // sanity: after 2020-01-01 and before 2100
    assert(t > 1577836800L * 1000000000L && t < 4102444800L * 1000000000L)
  }
}
