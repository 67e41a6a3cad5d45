package graft.dsl

import scala.collection.immutable.ListMap

import org.scalatest.funsuite.AnyFunSuite

/** YAML parsing + `${var}` binding semantics (reference
  * getl/lift_definition.py:28-42, tests/getl/test_lift_definition.py). */
class YamlSpec extends AnyFunSuite {

  test("document order is preserved through parse") {
    val m = Yaml.parse("LiftJob:\n  Z: 1\n  A: 2\n  M: 3\n")
    val job = m("LiftJob").asInstanceOf[ListMap[String, Any]]
    assert(job.keys.toSeq === Seq("Z", "A", "M"))
  }

  test("exact ${var} substitutes the raw object") {
    val fn: Int => Int = _ + 1
    val bound = Yaml.bind(ListMap("F" -> "${callback}"), Map("callback" -> fn))
    assert(bound.asInstanceOf[ListMap[String, Any]]("F").
      asInstanceOf[Int => Int](41) === 42)
  }

  test("embedded ${var} does template substitution inside strings") {
    val bound = Yaml.bind("s3://bucket/${env}/data", Map("env" -> "prod"))
    assert(bound === "s3://bucket/prod/data")
  }

  test("non-strings pass through untouched") {
    assert(Yaml.bind(7, Map.empty) === 7)
    assert(Yaml.bind(true, Map.empty) === true)
  }

  test("missing parameter raises with the parameter name") {
    val e = intercept[NoSuchElementException](Yaml.bind("${nope}", Map.empty))
    assert(e.getMessage.contains("nope"))
  }

  test("Props dot-path navigation with defaults") {
    val p = Props(Map("A" -> Map("B" -> Map("C" -> 5), "S" -> "x")))
    assert(p.getInt("A.B.C") === 5)
    assert(p.getString("A.S") === "x")
    assert(p.getOrElse("A.missing", 9) === 9)
    assert(p.exists("A.B"))
    assert(!p.exists("A.B.D"))
  }
}
