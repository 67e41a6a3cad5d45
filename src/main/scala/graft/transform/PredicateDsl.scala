package graft.transform

/** The reference's 3-element predicate DSL, compiled to a Spark SQL string.
  *
  * Semantics reproduced from reference getl/blocks/transform/transform.py:
  *   - a predicate is `[col, op, value]` (transform.py:265-276)
  *   - a logical predicate is `[pred, "and"|"or", pred]`, recursively
  *     nestable, rendered with parentheses (transform.py:272-276, 316-344)
  *   - value `"null"` turns `==`/`!=` into `IS NULL` / `IS NOT NULL`
  *     (transform.py:286-303)
  *   - string values are single-quoted; numbers and booleans pass through
  *     raw (transform.py:356-366)
  *   - list values render as a SQL IN-tuple; a single-element list renders
  *     as `('x')` with quotes regardless of element type — a reference
  *     quirk we preserve (transform.py:368-375)
  *   - dotted path segments containing `-` are backtick-escaped:
  *     `family.father-status` → `family.`father-status``
  *     (transform.py:290-295)
  *   - only `and`/`or` are legal logical connectors (transform.py:331-338)
  *
  * Compiling to a SQL text (rather than building `Column`s) keeps the exact
  * reference semantics, including Spark's own handling of `==`, `like`,
  * etc., and lets Catalyst push the filter down to the scan.
  */
sealed trait Predicate

object Predicate {
  /** `[col, op, value]`; value is String | Int | Long | Double | Boolean | Seq[Any]. */
  final case class Cmp(col: String, op: String, value: Any) extends Predicate

  /** `[left, and|or, right]` */
  final case class Logic(left: Predicate, op: String, right: Predicate)
      extends Predicate

  def and(l: Predicate, r: Predicate): Predicate = Logic(l, "and", r)
  def or(l: Predicate, r: Predicate): Predicate = Logic(l, "or", r)

  /** Parse the YAML/Any form: a 3-element Seq, possibly nested. */
  def fromAny(raw: Any): Predicate = raw match {
    case s: Seq[_] if s.length == 3 =>
      (s(0), s(2)) match {
        case (l: Seq[_], r: Seq[_]) =>
          val op = String.valueOf(s(1))
          if (!Set("and", "or").contains(op.toLowerCase))
            throw new IllegalArgumentException(
              s"Only 'AND/OR' allowed in LogicalPredicate. But '$op' was provided")
          Logic(fromAny(l), op, fromAny(r))
        case _ =>
          s(0) match {
            case col: String => Cmp(col, String.valueOf(s(1)), s(2))
            case other =>
              throw new IllegalArgumentException(
                s"Predicate column must be a string, got: $other")
          }
      }
    case other =>
      throw new IllegalArgumentException(
        s"Expected a 3-element predicate list, got: $other")
  }
}

object PredicateDsl {
  import Predicate._

  def toSql(p: Predicate): String = p match {
    case Logic(l, op, r) => s"(${toSql(l)} $op ${toSql(r)})"
    case Cmp(col, op, value) =>
      val c = escapeHyphens(col)
      if (isNullLiteral(value)) {
        val nullOp = if (op == "==") "is null" else "is not null"
        s"$c $nullOp"
      } else s"$c $op ${formatValue(op, value)}"
  }

  /** `family.father-status` → ``family.`father-status`` (transform.py:290-295). */
  private[transform] def escapeHyphens(col: String): String =
    col.split('.').map(s => if (s.contains("-")) s"`$s`" else s).mkString(".")

  private def isNullLiteral(v: Any): Boolean = v == "null"

  private[transform] def formatValue(op: String, v: Any): String = v match {
    case s: String =>
      // the reference skips quoting when the operator contains "is"
      // (transform.py:358-363)
      if (op.toLowerCase.contains("is")) s else s"'${esc(s)}'"
    case xs: Seq[_] =>
      if (xs.length == 1) s"('${esc(String.valueOf(xs.head))}')" // single-element quirk
      else xs.map(sqlLiteral).mkString("(", ", ", ")")
    case b: Boolean => if (b) "true" else "false"
    case other      => String.valueOf(other)
  }

  /** '' doubling: a data value containing an apostrophe ("O'Brien") must
    * neither break the generated WHERE clause nor rewrite its semantics
    * (config-driven injection). Backslashes escape too — Spark's default
    * parser treats them as escapes inside string literals. */
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("'", "''")

  private def sqlLiteral(v: Any): String = v match {
    case s: String  => s"'${esc(s)}'"
    case b: Boolean => if (b) "true" else "false"
    case other      => String.valueOf(other)
  }
}
