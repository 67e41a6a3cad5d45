package graft.dsl

/** Dot-path-searchable property bag.
  *
  * Mirrors the reference's `BlockConfig.get/exists/_search` lookup semantics
  * (reference: getl/block.py:57-85): a path like `"HiveTable.Schema"` walks
  * nested maps segment by segment; a missing segment is a lookup failure.
  *
  * Values are plain Scala types (`String`, `Int`, `Boolean`, `Seq[Any]`,
  * `Map[String, Any]`) as produced by [[Yaml]], plus arbitrary host objects
  * bound through parameter substitution (reference:
  * getl/lift_definition.py:28-42 — exact-match `${var}` substitutes the raw
  * object, which is how Scala functions reach custom blocks).
  */
final case class Props(underlying: Map[String, Any]) {

  def search(path: String): Option[Any] = {
    @annotation.tailrec
    def go(cur: Any, segs: List[String]): Option[Any] = segs match {
      case Nil => Some(cur)
      case s :: rest =>
        cur match {
          case m: Map[_, _] =>
            m.asInstanceOf[Map[String, Any]].get(s) match {
              case Some(v) => go(v, rest)
              case None    => None
            }
          case _ => None
        }
    }
    go(underlying, path.split('.').toList)
  }

  def exists(path: String): Boolean = search(path).isDefined

  def get[T](path: String): T =
    search(path)
      .getOrElse(
        throw new NoSuchElementException(
          s"""Could not find "$path" in properties."""))
      .asInstanceOf[T]

  /** NOTE: the erased cast materializes as a checkcast AT THE CALL SITE,
    * so `getOrElse("Fpp", "0.01")` throws ClassCastException when the
    * YAML says `Fpp: 0.01` (snakeyaml parses a Double). Use the typed
    * accessors below for scalars a user may spell unquoted. */
  def getOrElse[T](path: String, default: => T): T =
    search(path).map(_.asInstanceOf[T]).getOrElse(default)

  /** String view with a default: any YAML scalar (Integer, Double,
    * Boolean, String) renders via String.valueOf. */
  def getStringOr(path: String, default: => String): String =
    search(path).map(String.valueOf(_)).getOrElse(default)

  def getDoubleOr(path: String, default: Double): Double =
    search(path).map(v => String.valueOf(v).toDouble).getOrElse(default)

  def getLongOr(path: String, default: Long): Long =
    search(path).map(v => String.valueOf(v) match {
      case s if s.contains('.') => s.toDouble.toLong
      case s => s.toLong
    }).getOrElse(default)

  def getIntOr(path: String, default: Int): Int =
    getLongOr(path, default.toLong).toInt

  def getString(path: String): String = String.valueOf(get[Any](path))

  def getStringOpt(path: String): Option[String] =
    search(path).map(String.valueOf(_))

  def getInt(path: String): Int = get[Any](path) match {
    case i: Int    => i
    case l: Long   => l.toInt
    case s: String => s.toInt
    case o         => o.toString.toInt
  }

  def getBoolean(path: String, default: Boolean = false): Boolean =
    search(path) match {
      case Some(b: Boolean) => b
      case Some(s: String)  => s.equalsIgnoreCase("true")
      case Some(o)          => o.toString.equalsIgnoreCase("true")
      case None             => default
    }

  def getSeq(path: String): Seq[Any] = get[Any](path) match {
    case s: Seq[_] => s.asInstanceOf[Seq[Any]]
    case o =>
      throw new IllegalArgumentException(s"Property $path is not a list: $o")
  }

  def getStringSeq(path: String): Seq[String] =
    getSeq(path).map(String.valueOf(_))

  def getMap(path: String): Map[String, Any] = get[Any](path) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case o =>
      throw new IllegalArgumentException(s"Property $path is not a map: $o")
  }

  /** String-valued options sub-map (e.g. reader/writer `Options:`). */
  def stringOptions(path: String): Map[String, String] =
    if (exists(path)) getMap(path).map { case (k, v) => k -> String.valueOf(v) }
    else Map.empty

  /** Raw sub-map, empty when absent (e.g. `CustomProps:`). */
  def mapOrEmpty(path: String): Map[String, Any] =
    if (exists(path)) getMap(path) else Map.empty
}

object Props {
  val empty: Props = Props(Map.empty[String, Any])
  def apply(kvs: (String, Any)*): Props = Props(kvs.toMap)
}
