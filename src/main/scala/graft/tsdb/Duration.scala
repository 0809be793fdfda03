package graft.tsdb

/** Nanosecond duration helpers, mirroring the reference's unit ladder
  * (talna `src/duration.rs`: each unit scales the next smaller one;
  * months = 4 weeks, years = 12 months). Parity includes truncation
  * order: the reference truncates `n` to whole nanoseconds *before*
  * scaling (`Duration::seconds(1.5)` = 1_000_000_000), so fractional
  * arguments below 1 ns collapse to zero exactly as they do there.
  */
object Duration {
  def nanos(n: Double): Long   = n.toLong
  def micros(n: Double): Long  = nanos(n) * 1000L
  def millis(n: Double): Long  = micros(n) * 1000L
  def seconds(n: Double): Long = millis(n) * 1000L
  def minutes(n: Double): Long = seconds(n) * 60L
  def hours(n: Double): Long   = minutes(n) * 60L
  def days(n: Double): Long    = hours(n) * 24L
  def weeks(n: Double): Long   = days(n) * 7L
  def months(n: Double): Long  = weeks(n) * 4L
  def years(n: Double): Long   = months(n) * 12L
}

/** Wall-clock helper, parity with the reference's `timestamp()`
  * (talna `src/time.rs:6`): current ns since the Unix epoch.
  */
object Time {
  def timestamp(): Long = {
    val now = java.time.Instant.now()
    now.getEpochSecond * 1000000000L + now.getNano
  }
}
