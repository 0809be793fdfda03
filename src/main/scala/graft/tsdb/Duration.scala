package graft.tsdb

/** Nanosecond duration helpers, mirroring the reference's unit ladder
  * (talna `src/duration.rs`: months = 4 weeks, years = 12 months).
  */
object Duration {
  def nanos(n: Double): Long   = n.toLong
  def micros(n: Double): Long  = (n * 1e3).toLong
  def millis(n: Double): Long  = (n * 1e6).toLong
  def seconds(n: Double): Long = (n * 1e9).toLong
  def minutes(n: Double): Long = (n * 60e9).toLong
  def hours(n: Double): Long   = (n * 3600e9).toLong
  def days(n: Double): Long    = (n * 86400e9).toLong
  def weeks(n: Double): Long   = (n * 7 * 86400e9).toLong
  def months(n: Double): Long  = (n * 28 * 86400e9).toLong
  def years(n: Double): Long   = (n * 336 * 86400e9).toLong
}
