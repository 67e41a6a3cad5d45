package graft.runtime

import scala.collection.immutable.ListMap
import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.dsl.Props

/** Control-flow exception cleanly ending a lift job when a file registry
  * reports zero new files (reference getl/common/errors.py:60-61,
  * getl/manager.py:50-51). */
final class NoDataToProcess extends RuntimeException("No new data to process")

/** Ordered symbol table of block outputs — lazily-evaluated logical plans
  * keyed by section name (reference getl/block.py:9-37). */
final class BlockLog {
  private val entries = mutable.LinkedHashMap[String, (BlockConfig, Any)]()

  def add(bconf: BlockConfig, result: Any): Unit =
    entries(bconf.sectionName) = (bconf, result)

  def get(sectionName: String): Any =
    entries.getOrElse(sectionName,
      throw new NoSuchElementException(
        s"No block output named '$sectionName'. Known: ${sections.mkString(", ")}"))._2

  def getDf(sectionName: String): DataFrame = get(sectionName) match {
    case df: DataFrame => df
    case other =>
      throw new IllegalStateException(
        s"Block '$sectionName' output is not a DataFrame: $other")
  }

  /** Find a block output whose config has `key == value`
    * (reference getl/block.py:23-37; used for `UpdateAfter`). */
  def findByProp(key: String, value: Any): Option[Any] =
    entries.values.collectFirst {
      case (bconf, result) if bconf.props.search(key).contains(value) => result
    }

  /** EVERY block output whose config has `key == value`. The reference's
    * `_find_with_prop` returns only the first match, so a second registry
    * sharing an UpdateAfter section silently never flushes (its pending
    * files re-ingest forever) — this deliberately diverges to flush all. */
  def findAllByProp(key: String, value: Any): Seq[Any] =
    entries.values.collect {
      case (bconf, result) if bconf.props.search(key).contains(value) => result
    }.toSeq

  def sections: Seq[String] = entries.keys.toSeq
  def contains(sectionName: String): Boolean = entries.contains(sectionName)
}

/** All a block needs to execute (reference getl/block.py:40-95). */
final case class BlockConfig(
    sectionName: String,
    spark: SparkSession,
    input: Seq[String],
    props: Props,
    history: BlockLog,
    fileRegistry: BlockLog,
    output: Seq[String] = Nil) {

  def singleInput: String = input match {
    case Seq(one) => one
    case _ =>
      throw new IllegalArgumentException(
        s"Block '$sectionName' expects exactly one Input, got: $input")
  }

  def inputDf: DataFrame = history.getDf(singleInput)

  def inputDfs: Map[String, DataFrame] =
    input.map(n => n -> history.getDf(n)).toMap
}

/** Executes lift definitions: resolves each block in YAML order, memoizes
  * outputs, flushes file registries after their `UpdateAfter` section, and
  * short-circuits on `NoDataToProcess` (reference getl/manager.py:20-107).
  */
final class Manager(spark: SparkSession) {
  val history = new BlockLog
  val fileRegistryLog = new BlockLog

  def initFileRegistry(blocks: ListMap[String, Any]): Unit =
    processBlocks(blocks, graft.registry.FileRegistryBlocks.registry).foreach {
      case (bconf, result) => fileRegistryLog.add(bconf, result)
    }

  def executeLiftJob(blocks: ListMap[String, Any]): BlockLog = {
    try {
      processBlocks(blocks, graft.blocks.BlockRegistry.registry).foreach {
        case (bconf, result) =>
          processLiftBlockOutput(bconf, result)
          // flush EVERY registry wired to run after this section
          fileRegistryLog.findAllByProp("UpdateAfter", bconf.sectionName).foreach {
            case r: graft.registry.FileRegistry => r.update()
            case _ => ()
          }
      }
    } catch {
      case _: NoDataToProcess => () // clean exit — no new data
    }
    history
  }

  /** Multi-output handling (reference getl/manager.py:53-82): a block may
    * return a Map of named DataFrames matched against its declared
    * `Output:` names, registered as `Section.SubName`. */
  private def processLiftBlockOutput(bconf: BlockConfig, result: Any): Unit =
    result match {
      case dfs: Map[_, _] if bconf.output.nonEmpty =>
        val declared = bconf.output.toSet
        dfs.asInstanceOf[Map[String, Any]].foreach { case (sub, df) =>
          if (!declared.contains(sub))
            throw new IllegalStateException(
              s"Block ${bconf.sectionName} declared outputs $declared but returned '$sub'")
          df match {
            case d: DataFrame =>
              history.add(
                bconf.copy(sectionName = s"${bconf.sectionName}.$sub"), d)
            case other =>
              throw new IllegalStateException(
                s"Block ${bconf.sectionName}.$sub returned a non-DataFrame: $other")
          }
        }
      case df: DataFrame => history.add(bconf, df)
      case other =>
        throw new IllegalStateException(
          s"""Block "${bconf.sectionName}" needs to output a DataFrame but returned: $other""")
    }

  private def processBlocks(
      blocks: ListMap[String, Any],
      registry: Map[String, BlockConfig => Any]): Iterator[(BlockConfig, Any)] =
    blocks.iterator.map { case (sectionName, raw) =>
      val params = raw.asInstanceOf[Map[String, Any]]
      val tpe = String.valueOf(params.getOrElse("Type",
        throw new IllegalArgumentException(s"Block '$sectionName' has no Type")))
      val fn = registry.getOrElse(tpe,
        throw new IllegalArgumentException(
          s"Unknown block type '$tpe' in section '$sectionName'. " +
            s"Known: ${registry.keys.toSeq.sorted.mkString(", ")}"))
      val input: Seq[String] = params.get("Input") match {
        case Some(s: String) => Seq(s)
        case Some(l: Seq[_]) => l.map(String.valueOf(_))
        case Some(other) =>
          throw new IllegalArgumentException(
            s"Block '$sectionName' Input must be a string or list, got: $other")
        case None => Nil
      }
      val props = params.get("Properties") match {
        case Some(m: Map[_, _]) => Props(m.asInstanceOf[Map[String, Any]])
        case _                  => Props.empty
      }
      val output: Seq[String] = params.get("Output") match {
        case Some(s: String) => Seq(s)
        case Some(l: Seq[_]) => l.map(String.valueOf(_))
        case _               => Nil
      }
      val bconf =
        BlockConfig(sectionName, spark, input, props, history, fileRegistryLog, output)
      (bconf, fn(bconf))
    }
}

/** The `lift()` facade (reference getl/lift.py:12-25). */
object Lift {
  import graft.dsl.Yaml

  /** Run a lift definition. `liftDef` is YAML text, or a path (file:// or
    * any Hadoop-FS URI, or an existing local path) to a YAML document. */
  def lift(
      spark: SparkSession,
      liftDef: String,
      parameters: Map[String, Any] = Map.empty): BlockLog = {
    val text = fetch(spark, liftDef)
    val bound = Yaml.parseAndBind(text, parameters)
    val manager = new Manager(spark)
    bound.get("FileRegistry").foreach { fr =>
      manager.initFileRegistry(fr.asInstanceOf[ListMap[String, Any]])
    }
    val job = bound.getOrElse("LiftJob",
      throw new IllegalArgumentException("Lift definition has no LiftJob section"))
    manager.executeLiftJob(job.asInstanceOf[ListMap[String, Any]])
  }

  private def fetch(spark: SparkSession, liftDef: String): String = {
    val looksLikePath =
      !liftDef.contains("\n") &&
        (liftDef.contains("://") || new java.io.File(liftDef).exists())
    if (looksLikePath) graft.common.FsUtils.readText(spark, liftDef)
    else liftDef
  }
}
