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

  test("lex errors carry the bad token's character offset (reference span parity)") {
    // reference reports byte-offset spans in filter-DSL errors
    // (talna src/query/parser/span.rs); a malformed MID-string term must
    // be locatable by position, not by hunting for the quoted text
    val input = "env:prod AND :orphan OR svc:db"
    val e = intercept[IllegalArgumentException](FilterParser.parse(input))
    assert(e.getMessage.contains("at offset 13"), e.getMessage)
    assert(e.getMessage.contains("':orphan'"), e.getMessage)
    assert(input.substring(13).startsWith(":orphan")) // the offset is real
    val e0 = intercept[IllegalArgumentException](FilterParser.parse("bad!"))
    assert(e0.getMessage.contains("at offset 0"), e0.getMessage)
  }

  test("charset parity: accepts exactly the reference lexer grammar") {
    // reference (talna src/query/lexer.rs:22-26):
    //   Identifier [a-zA-Z_-]+:[a-zA-Z0-9_\-.]+
    //   Wildcard   [a-zA-Z_-]+:[a-zA-Z0-9_\-.]*\*
    assert(FilterParser.parse("A-b_:x.y-Z_1") == Eq("A-b_", "x.y-Z_1"))
    assert(FilterParser.parse("env:123") == Eq("env", "123"))
    assert(FilterParser.parse("k:*") == Wildcard("k", ""))
    assert(FilterParser.parse("service:db-*") == Wildcard("service", "db-"))
    val rejected = Seq(
      "a:b*c",      // '*' only as trailing wildcard
      "a:b**",      // double star
      "1a:b",       // digit in key
      "a1:b",       // digit in key
      "a$:b",       // symbol in key
      "env:pro$d",  // symbol in value
      "a:b c:",     // empty value without star
      "k:",         // empty value
      "a.b:c",      // '.' not allowed in keys (values only)
      "a:b/c",      // '/' not allowed
    )
    rejected.foreach { s =>
      assertThrows[IllegalArgumentException](FilterParser.parse(s))
    }
  }

  test("charset parity property: every generated valid term parses, mutated ones fail") {
    val keyChars = "azAZ_-".toSeq
    val valChars = "azAZ09_-.".toSeq
    val rnd = new scala.util.Random(42)
    (1 to 200).foreach { _ =>
      val k = Seq.fill(1 + rnd.nextInt(6))(keyChars(rnd.nextInt(keyChars.length))).mkString
      val v = Seq.fill(1 + rnd.nextInt(8))(valChars(rnd.nextInt(valChars.length))).mkString
      val star = rnd.nextBoolean()
      val term = s"$k:$v" + (if (star) "*" else "")
      val parsed = FilterParser.parse(term)
      if (star) assert(parsed == Wildcard(k, v)) else assert(parsed == Eq(k, v))
      // inject one character the reference grammar forbids in either part
      val badKey = k.updated(rnd.nextInt(k.length), '$')
      assertThrows[IllegalArgumentException](FilterParser.parse(s"$badKey:$v"))
      val badVal = v.updated(rnd.nextInt(v.length), '!')
      assertThrows[IllegalArgumentException](FilterParser.parse(s"$k:$badVal" + (if (star) "*" else "")))
    }
  }
}
