package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite

class MetricNameSpec extends AnyFunSuite {
  test("accepts reference-legal names") {
    assert(MetricName("cpu.total").name == "cpu.total")
    assert(MetricName.parse("disk_io.read").isRight)
  }
  test("rejects illegal characters and empty") {
    assert(MetricName.parse("CPU").isLeft)
    assert(MetricName.parse("cpu total").isLeft)
    assert(MetricName.parse("").isLeft)
    assertThrows[IllegalArgumentException](MetricName("a-b"))
  }
}
