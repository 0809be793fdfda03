package graft.tsdb

import org.scalatest.funsuite.AnyFunSuite
import FilterNode._

class FilterParserSpec extends AnyFunSuite {
  test("simple eq") {
    assert(FilterParser.parse("env:prod") == Eq("env", "prod"))
  }
  test("allstar") {
    assert(FilterParser.parse(" * ") == AllStar)
  }
  test("wildcard") {
    assert(FilterParser.parse("service:db.postgres.v*") == Wildcard("service", "db.postgres.v"))
  }
  test("and/or precedence: AND binds tighter") {
    assert(FilterParser.parse("a:1 OR b:2 AND c:3") ==
      Or(List(Eq("a", "1"), And(List(Eq("b", "2"), Eq("c", "3"))))))
  }
  test("not binds tighter than and") {
    assert(FilterParser.parse("!a:1 AND b:2") ==
      And(List(Not(Eq("a", "1")), Eq("b", "2"))))
  }
  test("nesting") {
    assert(FilterParser.parse("env:prod AND (service:db OR service:api)") ==
      And(List(Eq("env", "prod"), Or(List(Eq("service", "db"), Eq("service", "api"))))))
  }
  test("not over group") {
    assert(FilterParser.parse("!(a:1 OR b:2)") ==
      Not(Or(List(Eq("a", "1"), Eq("b", "2")))))
  }
  test("invalid term rejected") {
    assertThrows[IllegalArgumentException](FilterParser.parse("nocolon"))
    assertThrows[IllegalArgumentException](FilterParser.parse("a:1 AND (b:2"))
    assertThrows[IllegalArgumentException](FilterParser.parse("a:b:c")) // lexer.rs: no ':' in values
  }
}
