package graft.dsl

import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{Yaml => SnakeYaml}

/** Lift-definition YAML parsing and `${var}` parameter binding.
  *
  * Mirrors the reference's pipeline IR (reference getl/lift_definition.py):
  *   - YAML document order is execution order; snakeyaml yields
  *     LinkedHashMap, converted here to `ListMap` to preserve it
  *     (reference uses `oyaml`, getl/lift_definition.py:7)
  *   - `${var}` binding (getl/lift_definition.py:28-42): a string that is
  *     EXACTLY `${name}` substitutes the raw parameter object — this is the
  *     load-bearing rule that lets callers pass Scala functions, schemas,
  *     or DataFrames through YAML; any other string gets template
  *     substitution of `$name` / `${name}` occurrences; non-strings pass
  *     through untouched.
  */
object Yaml {

  private val ExactVar = "^\\$\\{(\\w+)\\}$".r
  private val TemplateVar = "\\$\\$|\\$\\{(\\w+)\\}|\\$(\\w+)".r

  def parse(text: String): ListMap[String, Any] =
    toScala(new SnakeYaml().load[Any](text)) match {
      case m: ListMap[_, _] => m.asInstanceOf[ListMap[String, Any]]
      case other =>
        throw new IllegalArgumentException(
          s"Lift definition must be a YAML mapping, got: $other")
    }

  /** Recursively convert snakeyaml's java structures, preserving map order. */
  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      ListMap(m.asScala.toSeq.map { case (k, value) =>
        String.valueOf(k) -> toScala(value)
      }: _*)
    case l: java.util.List[_] => l.asScala.toList.map(toScala)
    case other                => other
  }

  /** Recursive `${var}` substitution against `params`. */
  def bind(v: Any, params: Map[String, Any]): Any = v match {
    case m: ListMap[_, _] =>
      m.asInstanceOf[ListMap[String, Any]].map { case (k, value) =>
        k -> bind(value, params)
      }
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].map { case (k, value) =>
        k -> bind(value, params)
      }
    case l: Seq[_] => l.map(bind(_, params))
    case s: String =>
      s match {
        case ExactVar(name) => lookup(name, params) // raw object
        case _ =>
          TemplateVar.replaceAllIn(s, m =>
            if (m.matched == "$$") "\\$"
            else {
              val name = Option(m.group(1)).getOrElse(m.group(2))
              scala.util.matching.Regex.quoteReplacement(
                String.valueOf(lookup(name, params)))
            })
      }
    case other => other
  }

  private def lookup(name: String, params: Map[String, Any]): Any =
    params.getOrElse(
      name,
      throw new NoSuchElementException(s"Missing lift parameter: $name"))

  def parseAndBind(text: String, params: Map[String, Any]): ListMap[String, Any] =
    bind(parse(text), params).asInstanceOf[ListMap[String, Any]]
}
