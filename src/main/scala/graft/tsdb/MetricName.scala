package graft.tsdb

/** Validated metric name, parity with the reference's `MetricName`
  * (talna `src/metric_name.rs`: lowercase letters, `_`, `.` only).
  */
final case class MetricName private (name: String) {
  override def toString: String = name
}

object MetricName {
  private val Allowed: Set[Char] = ("abcdefghijklmnopqrstuvwxyz_." : Seq[Char]).toSet

  def parse(s: String): Either[String, MetricName] =
    if (s.nonEmpty && s.forall(Allowed.contains)) Right(new MetricName(s))
    else Left(s"invalid metric name: '$s' (allowed: a-z _ .)")

  def apply(s: String): MetricName =
    parse(s).fold(msg => throw new IllegalArgumentException(msg), identity)
}
