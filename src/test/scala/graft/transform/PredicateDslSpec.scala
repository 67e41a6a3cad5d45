package graft.transform

import org.scalatest.funsuite.AnyFunSuite

import Predicate._

class PredicateDslSpec extends AnyFunSuite {

  test("simple comparison with string value quotes it") {
    assert(PredicateDsl.toSql(Cmp("name", "==", "Belle")) === "name == 'Belle'")
  }

  test("numeric and boolean values pass through raw") {
    assert(PredicateDsl.toSql(Cmp("age", "<", 10)) === "age < 10")
    assert(PredicateDsl.toSql(Cmp("age", ">=", 1.5)) === "age >= 1.5")
    assert(PredicateDsl.toSql(Cmp("happy", "==", true)) === "happy == true")
  }

  test("null literal maps ==/!= to IS NULL / IS NOT NULL") {
    assert(PredicateDsl.toSql(Cmp("age", "==", "null")) === "age is null")
    assert(PredicateDsl.toSql(Cmp("age", "!=", "null")) === "age is not null")
  }

  test("IN list renders a SQL tuple; single element keeps the quirky quoted form") {
    assert(PredicateDsl.toSql(Cmp("name", "in", Seq("a", "b"))) === "name in ('a', 'b')")
    assert(PredicateDsl.toSql(Cmp("age", "in", Seq(1, 2))) === "age in (1, 2)")
    assert(PredicateDsl.toSql(Cmp("age", "in", Seq(5))) === "age in ('5')")
  }

  test("hyphenated path segments are backtick-escaped") {
    assert(
      PredicateDsl.toSql(Cmp("family.father-status", "==", "ok")) ===
        "family.`father-status` == 'ok'")
  }

  test("logical nesting renders parenthesized and validates connectors") {
    val p = Logic(Cmp("a", "==", 1), "and", Logic(Cmp("b", ">", 2), "or", Cmp("c", "<", 3)))
    assert(PredicateDsl.toSql(p) === "(a == 1 and (b > 2 or c < 3))")
    val raw = Seq(Seq("a", "==", 1), "xor", Seq("b", ">", 2))
    assertThrows[IllegalArgumentException](Predicate.fromAny(raw))
  }

  test("fromAny parses nested YAML-shaped lists") {
    val raw = Seq(Seq("a", "==", "null"), "or", Seq("b", "in", Seq("x")))
    assert(PredicateDsl.toSql(Predicate.fromAny(raw)) === "(a is null or b in ('x'))")
  }
}
