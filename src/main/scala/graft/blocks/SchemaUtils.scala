package graft.blocks

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.{DataType, StructType}

import graft.common.FsUtils

/** Schema resolution for load blocks (reference
  * getl/common/utils.py:25-52 `json_to_spark_schema` and the
  * JsonSchemaPath/JsonSchema/PySparkSchema triple at
  * getl/blocks/load/entrypoint.py:108-116).
  */
object SchemaUtils {

  /** JSON text in `StructType.fromJson` format → StructType. */
  def jsonToSparkSchema(json: String): StructType =
    try DataType.fromJson(json).asInstanceOf[StructType]
    catch {
      case e: Exception =>
        throw new IllegalArgumentException(
          s"Invalid JSON schema: ${e.getMessage}", e)
    }

  /** Parsed-YAML map form of a JSON schema → StructType (serialize the map
    * back to JSON with jackson — on the Spark classpath — then
    * `DataType.fromJson`). */
  def mapToSparkSchema(m: Map[String, Any]): StructType =
    jsonToSparkSchema(toJson(m))

  private def toJson(v: Any): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    mapper.writeValueAsString(toJava(v))
  }

  private def toJava(v: Any): Object = v match {
    case m: Map[_, _] =>
      val jm = new java.util.LinkedHashMap[String, Object]()
      m.foreach { case (k, value) => jm.put(String.valueOf(k), toJava(value)) }
      jm
    case s: Seq[_] =>
      val jl = new java.util.ArrayList[Object]()
      s.foreach(e => jl.add(toJava(e)))
      jl
    case other => other.asInstanceOf[Object]
  }

  /** Resolve the JsonSchemaPath / JsonSchema / SparkSchema property triple;
    * None → caller should infer. `SparkSchema` (the reference's
    * `PySparkSchema`) is a raw StructType or DDL string bound through
    * parameters. */
  def resolve(spark: SparkSession, props: graft.dsl.Props): Option[StructType] =
    props.getStringOpt("JsonSchemaPath") match {
      case Some(p) => Some(jsonToSparkSchema(FsUtils.readText(spark, p)))
      case None =>
        props.search("JsonSchema") match {
          case Some(m: Map[_, _]) =>
            Some(mapToSparkSchema(m.asInstanceOf[Map[String, Any]]))
          case Some(s: String) => Some(jsonToSparkSchema(s))
          case _ =>
            props.search("SparkSchema").orElse(props.search("PySparkSchema")) map {
              case st: StructType => st
              case ddl: String    => StructType.fromDDL(ddl)
              case other =>
                throw new IllegalArgumentException(
                  s"SparkSchema must be a StructType or DDL string, got: $other")
            }
        }
    }
}
