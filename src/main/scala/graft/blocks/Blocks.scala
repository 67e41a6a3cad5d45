package graft.blocks

import org.apache.spark.sql.{AnalysisException, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

import graft.dsl.Props
import graft.runtime.{BlockConfig, NoDataToProcess}
import graft.registry.FileRegistry
import graft.table.ManagedTable
import graft.transform.{Predicate, Transforms}
import graft.transform.Transforms.SelectCol

/** The `module::function` block vocabulary (reference
  * getl/blocks/&lt;module&gt;/entrypoint.py, dispatched at
  * getl/manager.py:92-95). Each block is a
  * `BlockConfig => Any` returning a DataFrame (or Map[String, DataFrame]
  * for multi-output custom blocks, or Unit→input-DF pass-through for sinks).
  */
object BlockRegistry {

  def registry: Map[String, BlockConfig => Any] = Map(
    "load::batch_csv" -> LoadBlocks.batchCsv,
    "load::batch_parquet" -> LoadBlocks.batchParquet,
    "load::batch_json" -> LoadBlocks.batchJson,
    "load::batch_xml" -> LoadBlocks.batchXml,
    "load::batch_orc" -> LoadBlocks.batchOrc,
    "load::batch_delta" -> LoadBlocks.batchDelta,
    "load::stream_json" -> LoadBlocks.streamJson,
    "load::jdbc" -> LoadBlocks.jdbc,
    "transform::generic" -> TransformBlock.generic,
    "custom::sql" -> CustomBlocks.sql,
    "custom::python_codeblock" -> CustomBlocks.function,
    "custom::function" -> CustomBlocks.function,
    "write::batch_json" -> WriteBlocks.batchJson,
    "write::batch_parquet" -> WriteBlocks.batchParquet,
    "write::batch_csv" -> WriteBlocks.batchCsv,
    "write::batch_orc" -> WriteBlocks.batchOrc,
    "write::batch_jdbc" -> WriteBlocks.batchJdbc,
    "write::batch_delta" -> WriteBlocks.batchDelta,
    "write::stream_delta" -> WriteBlocks.streamDelta,
    "write::batch_postgres_upsert" -> WriteBlocks.postgresUpsert,
    "write::batch_mysql_upsert" -> WriteBlocks.mysqlUpsert,
    "write::batch_jdbc_upsert" -> WriteBlocks.jdbcMergeUpsert
  )
}

/** Load blocks (reference getl/blocks/load/entrypoint.py). */
object LoadBlocks {

  /** CSV batch read: `Path`, pass-through `Options` (entrypoint.py:26-50). */
  def batchCsv(c: BlockConfig): DataFrame =
    batchRead(c, "csv", suffix = ".csv")

  /** Parquet batch read with optional file-registry pruning
    * (entrypoint.py:53-72). */
  def batchParquet(c: BlockConfig): DataFrame =
    batchRead(c, "parquet", suffix = ".parquet")

  /** ORC batch read (beyond the reference; Spark-native columnar source
    * with the same pushdown/pruning properties as parquet). */
  def batchOrc(c: BlockConfig): DataFrame =
    batchRead(c, "orc", suffix = ".orc")

  /** JSON batch read; schema via JsonSchemaPath/JsonSchema/SparkSchema else
    * inferred; `Suffix` default `.json` (entrypoint.py:75-118). */
  def batchJson(c: BlockConfig): DataFrame =
    batchRead(c, "json", suffix = c.props.getStringOr("Suffix", ".json"))

  /** XML batch read via Spark 4's native source; `RowTag`; `BatchSize`
    * files per reader call, per-batch frames combined with allow-missing
    * `unionByName` for schema-drift tolerance (entrypoint.py:121-192). */
  def batchXml(c: BlockConfig): DataFrame = {
    val paths = resolvePaths(c, c.props.getStringOr("Suffix", ".xml"))
    val batchSize = c.props.getIntOr("BatchSize", 200)
    val schema = SchemaUtils.resolve(c.spark, c.props)
    val batches = paths.grouped(batchSize).map { group =>
      val r = c.spark.read.format("xml")
        .option("rowTag", c.props.getString("RowTag"))
        .options(c.props.stringOptions("Options"))
      schema.fold(r.option("inferSchema", "true"))(r.schema)
        .load(group: _*)
    }
    batches.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Managed-table read (the reference's Delta read, entrypoint.py:195-236):
    * plain read, `FileRegistry` naming a SnapshotDiff → new-rows-only
    * version diff, `ReadChangeFeed` + `StartingTimestamp` → row-level
    * changes since the timestamp (`IncludeChangeType: true` adds the
    * Delta-CDF `_change_type` insert/delete marker column), or `Version: N`
    * → time-travel read of that snapshot (Delta's `versionAsOf`; the
    * manifest log keeps every retained version's dir list); absent table →
    * empty DataFrame. */
  def batchDelta(c: BlockConfig): DataFrame = {
    val path = c.props.getString("Path")
    registryFor(c) match {
      case Some(reg) => reg.loadNewRowsOnly(path)
      case None =>
        val table = ManagedTable(c.spark, path)
        if (c.props.getBoolean("ReadChangeFeed")) {
          val since = startingTimestampMillis(c)
          if (c.props.getBoolean("IncludeChangeType")) table.changesWithType(since)
          else table.changesSince(since)
        } else c.props.getStringOpt("Version") match {
          case Some(v) => table.readVersion(v.toLong)
          // `Where` → data-skipping read: files whose collected stats
          // prove no match are never opened (DataSkipping)
          case None => c.props.getStringOpt("Where") match {
            case Some(w) => table.readWhere(w)
            case None    => table.read()
          }
        }
    }
  }

  /** `StartingTimestamp` as epoch millis — accepts `yyyy-MM-dd`,
    * `yyyy-MM-dd HH:mm:ss`, or a YAML-auto-typed Date. */
  private def startingTimestampMillis(c: BlockConfig): Long =
    c.props.get[Any]("StartingTimestamp") match {
      case d: java.util.Date => d.getTime
      case s =>
        val str = String.valueOf(s)
        val norm = if (str.length == 10) s"$str 00:00:00" else str
        java.sql.Timestamp.valueOf(norm.replace('T', ' ')).getTime
    }

  /** Structured-Streaming JSON source; mandatory SchemaPath
    * (entrypoint.py:239-262). */
  def streamJson(c: BlockConfig): DataFrame = {
    val schema = SchemaUtils.jsonToSparkSchema(
      graft.common.FsUtils.readText(c.spark, c.props.getString("SchemaPath")))
    c.spark.readStream.schema(schema)
      .options(c.props.stringOptions("Options"))
      .json(c.props.getString("Path"))
  }

  /** JDBC query-pushdown read (entrypoint.py:265-301): the full SQL in
    * `Query` executes inside the database; Spark sees only the result.
    *
    * Beyond the reference: optional partition-parallel reading via
    * `PartitionColumn`/`LowerBound`/`UpperBound`/`NumPartitions` — without
    * them a JDBC scan is ONE task pulling the whole result set through one
    * connection, which is the classic single-reader bottleneck when the
    * source table is large. With them, Spark issues NumPartitions stride
    * queries concurrently (same mechanism the reference already uses for
    * its partition-parallel upserts, common/upsert.py:28-42). */
  def jdbc(c: BlockConfig): DataFrame = {
    val base = c.spark.read.format("jdbc")
      .option("driver", c.props.getString("Driver"))
      .option("url", c.props.getString("ConnUrl"))
      .option("user", c.props.getString("User"))
      .option("password", c.props.getString("Password"))
    val partitioned = c.props.getStringOpt("PartitionColumn") match {
      case Some(pc) =>
        // partition bounds require the dbtable form (Spark wraps it in the
        // stride WHERE clauses); Query is used as a derived-table subquery
        base
          .option("dbtable", s"(${c.props.getString("Query")}) graft_q")
          .option("partitionColumn", pc)
          .option("lowerBound", c.props.getString("LowerBound"))
          .option("upperBound", c.props.getString("UpperBound"))
          .option("numPartitions", c.props.getStringOpt("NumPartitions").getOrElse("4"))
      case None => base.option("query", c.props.getString("Query"))
    }
    partitioned.load()
  }

  private def batchRead(c: BlockConfig, format: String, suffix: String): DataFrame = {
    val paths = resolvePaths(c, c.props.getStringOr("Suffix", suffix))
    val reader = c.spark.read.format(format)
      .options(c.props.stringOptions("Options"))
    val withSchema = SchemaUtils.resolve(c.spark, c.props) match {
      case Some(st) => reader.schema(st)
      case None if format != "parquet" => reader.option("inferSchema", "true")
      case None => reader
    }
    applyAlias(c, withSchema.load(paths: _*))
  }

  /** `Alias` names the plan for self-join disambiguation. (The reference
    * documents Alias but discards the aliased frame —
    * load/entrypoint.py:15-23; a real alias is strictly more useful.) */
  private def applyAlias(c: BlockConfig, df: DataFrame): DataFrame =
    c.props.getStringOpt("Alias").fold(df)(df.alias)

  /** Registry-driven file pruning (entrypoint.py:311-322): when a
    * `FileRegistry` is configured, the scan is narrowed to unprocessed
    * files BEFORE Spark ever lists the prefix; zero new files cleanly ends
    * the job via [[NoDataToProcess]]. */
  private def resolvePaths(c: BlockConfig, suffix: String): Seq[String] = {
    val path = c.props.getString("Path")
    registryFor(c) match {
      case None => Seq(path)
      case Some(reg) =>
        val files = reg.load(path, suffix)
        if (files.isEmpty) throw new NoDataToProcess
        files
    }
  }

  private def registryFor(c: BlockConfig): Option[FileRegistry] =
    c.props.getStringOpt("FileRegistry").map { name =>
      c.fileRegistry.get(name) match {
        case r: FileRegistry => r
        case other => throw new IllegalStateException(
          s"FileRegistry '$name' is not a registry: $other")
      }
    }
}

/** The `transform::generic` function-pipeline interpreter (reference
  * getl/blocks/transform/entrypoint.py:18-76): a left fold of
  * DataFrame→DataFrame endomorphisms — the whole chain stays one Catalyst
  * plan, so pushdown/pruning see through every step. */
object TransformBlock {

  def generic(c: BlockConfig): DataFrame = {
    val fns = c.props.getSeq("Functions")
    fns.foldLeft(c.inputDf) { (df, meta) =>
      meta match {
        case s: String => apply(c, df, s, Props.empty)
        case m: Map[_, _] =>
          // a multi-key map (usually a YAML indentation slip that turned
          // a new `- ` item into a sibling key) applies EVERY function in
          // document order — taking only the first key silently dropped
          // the rest. snakeyaml preserves insertion order.
          m.asInstanceOf[Map[String, Any]].foldLeft(df) { case (d, (n, v)) =>
            apply(c, d, n, v match {
              case p: Map[_, _] => Props(p.asInstanceOf[Map[String, Any]])
              case _            => Props.empty
            })
          }
        case other => throw new IllegalArgumentException(
          s"Could not process function $other")
      }
    }
  }

  /** Dispatch one transform function by its reference name. */
  def apply(c: BlockConfig, df: DataFrame, name: String, p: Props): DataFrame = name match {
    case "select" =>
      val cols = p.getSeq("cols").map {
        case m: Map[_, _] =>
          val mm = Props(m.asInstanceOf[Map[String, Any]])
          SelectCol(
            mm.getString("col"),
            addNewColumn = mm.getBoolean("add_new_column"),
            alias = mm.getStringOpt("alias"),
            cast = mm.getStringOpt("cast"),
            defaultValue = mm.getStringOpt("default_value"))
        case s: String => SelectCol(s)
        case other => throw new IllegalArgumentException(s"Bad select col: $other")
      }
      Transforms.select(df, cols)
    case "explode" =>
      Transforms.explode(df, p.getString("col"), p.getStringOpt("new_col"))
    case "rename_column" =>
      Transforms.renameColumn(df, p.getString("col"), p.getString("new_name"))
    case "substring" =>
      Transforms.substring(df, p.getString("col"), p.getString("new_col"),
        p.getInt("pos"), p.getInt("length"))
    case "split" =>
      Transforms.split(df, p.getString("col"), p.getString("new_col"),
        p.getString("split_on"))
    case "get_item" =>
      Transforms.getItem(df, p.getString("col"), p.getString("new_col"),
        p.get[Any]("index"))
    case "get_json_object" =>
      Transforms.getJsonObject(df, p.getString("col"), p.getString("new_col"),
        p.getString("path"))
    case "cast_column" =>
      Transforms.castColumn(df, p.getString("col"), p.getString("new_type"))
    case "join" =>
      // `broadcast: true` hints the right side — at cluster scale an
      // explicit hint beats waiting for size estimation to notice a
      // dim table fits under the broadcast threshold
      val right0 = rightDf(c, p)
      val right = if (p.getBoolean("broadcast"))
        org.apache.spark.sql.functions.broadcast(right0) else right0
      Transforms.join(df, right,
        p.getStringSeq("cols"), p.getStringOpt("join_type").getOrElse("left"))
    case "union" =>
      Transforms.union(df, rightDf(c, p))
    case "where" =>
      Transforms.where(df, Predicate.fromAny(p.get[Any]("predicate")))
    case "filter_dataframe" =>
      Transforms.filterDataframe(df, Predicate.fromAny(p.get[Any]("predicate")))
    case "concat" =>
      Transforms.concat(df, p.getStringSeq("from_columns"),
        p.getString("to_column"), p.getStringOr("delimiter", "_"))
    case "drop_duplicates" =>
      Transforms.dropDuplicates(df,
        if (p.exists("columns")) p.getStringSeq("columns") else Nil)
    case "add_column.date.unixtime_to_utcz" =>
      Transforms.unixtimeToUtcz(df, p.getString("from_column"), p.getString("to_column"))
    case "add_column.date.year" =>
      Transforms.yearCol(df, p.getString("from_column"), p.getString("to_column"))
    case "add_column.date.month" =>
      Transforms.monthCol(df, p.getString("from_column"), p.getString("to_column"))
    case "add_column.date.dayofmonth" =>
      Transforms.dayofmonthCol(df, p.getString("from_column"), p.getString("to_column"))
    case "add_column.date.date" =>
      Transforms.dateCol(df, p.getString("from_column"), p.getString("to_column"))
    case other =>
      throw new IllegalArgumentException(s"Unknown transform function: $other")
  }

  /** The right side of join/union: a raw DataFrame bound through `${param}`
    * substitution (the reference's load-bearing raw-object rule,
    * lift_definition.py:28-42), or a section name resolved from history. */
  private def rightDf(c: BlockConfig, p: Props): DataFrame =
    p.get[Any]("right_df") match {
      case df: DataFrame => df
      case name: String  => c.history.getDf(name)
      case other => throw new IllegalArgumentException(
        s"right_df must be a DataFrame or section name, got: $other")
    }
}

/** Custom blocks (reference getl/blocks/custom/entrypoint.py). */
object CustomBlocks {

  /** `custom::sql`: one SQL statement through the full Catalyst surface
    * (entrypoint.py:235-271). */
  def sql(c: BlockConfig): DataFrame = {
    // expose each input section as a temp view named after the section;
    // names a view cannot carry (multi-output "Section.Sub", hyphenated
    // sections) sanitize to underscores — the Statement references the
    // sanitized name (documented in docs/DSL.md). Two distinct inputs
    // ("A.B" and "A-B") can collide after sanitizing; that would let
    // createOrReplaceTempView silently clobber one input with the other
    // before the Statement runs, so collisions are an error, not a race.
    // .distinct: the same section listed twice re-registers the same df —
    // harmless, not a collision
    val sanitized = c.input.distinct.map(n => n -> n.replaceAll("[^A-Za-z0-9_]", "_"))
    val collisions = sanitized.groupBy(_._2).filter(_._2.size > 1)
    require(collisions.isEmpty,
      "custom::sql input sections collide after view-name sanitizing: " +
        collisions.map { case (v, ns) =>
          ns.map(_._1).mkString("'", "', '", "'") + s" -> $v"
        }.mkString("; "))
    sanitized.foreach { case (n, viewName) =>
      c.history.getDf(n).createOrReplaceTempView(viewName)
    }
    c.spark.sql(c.props.getString("Statement"))
  }

  /** The reference's `custom::python_codeblock` (entrypoint.py:22-232):
    * `CustomFunction` is a host `Map[String, Any] => Any` (one DataFrame,
    * or a Map of named DataFrames matched against `Output:`) bound through
    * parameters; `CustomCodePath` loads a `.scala` file whose body
    * evaluates to the same function type, compiled at runtime — the JVM
    * analogue of the reference's dynamic `.py` import
    * (entrypoint.py:190-226; `Packages:` pip-install stays a non-goal). */
  def function(c: BlockConfig): Any = {
    val props = c.props.mapOrEmpty("CustomProps")
    val fn: Map[String, Any] => Any =
      if (c.props.exists("CustomCodePath"))
        ScalaCodeLoader.load(c.spark, c.props.getString("CustomCodePath"))
      else c.props.get[Any]("CustomFunction") match {
        case f: Function1[_, _] => f.asInstanceOf[Map[String, Any] => Any]
        case other => throw new IllegalArgumentException(
          s"CustomFunction must be a Map[String, Any] => Any, got: $other")
      }
    fn(c.inputDfs ++ props + ("spark" -> c.spark))
  }
}

/** Runtime compiler for `CustomCodePath` blocks: the file's source must
  * evaluate to a `Map[String, Any] => Any` (the same contract as
  * `CustomFunction`). Compiled once per path per JVM — the toolbox
  * compile is driver-side only; the produced closure builds ordinary
  * lazy Spark plans like any host function. */
object ScalaCodeLoader {
  private val cache =
    scala.collection.concurrent.TrieMap.empty[String, Map[String, Any] => Any]

  def load(spark: SparkSession, path: String): Map[String, Any] => Any =
    cache.getOrElseUpdate(path, {
      import scala.tools.reflect.ToolBox
      val src = graft.common.FsUtils.readText(spark, path)
      val tb = scala.reflect.runtime.universe
        .runtimeMirror(getClass.getClassLoader).mkToolBox()
      tb.eval(tb.parse(src)) match {
        case f: Function1[_, _] => f.asInstanceOf[Map[String, Any] => Any]
        case other => throw new IllegalArgumentException(
          s"$path must evaluate to a Map[String, Any] => Any, got: $other")
      }
    })
}

/** Write blocks (reference getl/blocks/write/entrypoint.py + batch_delta.py).
  * Sinks return their input DataFrame so downstream blocks can keep
  * referencing the section. */
object WriteBlocks {

  def batchJson(c: BlockConfig): DataFrame = fileWrite(c, "json")
  def batchParquet(c: BlockConfig): DataFrame = fileWrite(c, "parquet")
  def batchCsv(c: BlockConfig): DataFrame = fileWrite(c, "csv")
  def batchOrc(c: BlockConfig): DataFrame = fileWrite(c, "orc")

  private def fileWrite(c: BlockConfig, format: String): DataFrame = {
    val df = c.inputDf
    // output-file sizing (the small-files problem): `Repartition: n`
    // rebalances via a shuffle, `Coalesce: n` merges without one — at
    // scale, a sink that writes thousands of KB-sized files per partition
    // costs more in listing/open overhead downstream than the write itself
    val sized = (c.props.getStringOpt("Repartition"), c.props.getStringOpt("Coalesce")) match {
      case (Some(n), _) => df.repartition(n.toInt)
      case (None, Some(n)) => df.coalesce(n.toInt)
      case _ => df
    }
    val w = sized.write.mode(c.props.getStringOpt("Mode").getOrElse("overwrite"))
      .options(c.props.stringOptions("Options"))
    val pb =
      if (c.props.exists("PartitionBy.Columns"))
        w.partitionBy(c.props.getStringSeq("PartitionBy.Columns"): _*)
      else w
    pb.format(format).save(c.props.getString("Path"))
    df
  }

  /** JDBC batch write (entrypoint.py:21-62); `NumPartitions` bounds the
    * number of concurrent database connections. */
  def batchJdbc(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    df.write.mode(c.props.getString("Mode"))
      .format("jdbc")
      .option("driver", c.props.getString("Driver"))
      .option("url", c.props.getString("ConnUrl"))
      .option("dbtable", c.props.getString("Table"))
      .option("user", c.props.getString("User"))
      .option("password", c.props.getString("Password"))
      .option("numPartitions", c.props.getStringOpt("NumPartitions").getOrElse("10"))
      .option("isolationLevel", "READ_COMMITTED")
      .save()
    df
  }

  /** Managed-table write (the reference's Delta write, entrypoint.py:195-293
    * + batch_delta.py): modes `upsert` (merge on `Upsert.MergeStatement`),
    * `clean_write` (overwrite), else pass-through append/overwrite;
    * optional catalog registration, post-write OPTIMIZE [ZORDER] + VACUUM. */
  def batchDelta(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    val table = ManagedTable(c.spark, c.props.getString("Path"))
    val partitionBy =
      if (c.props.exists("PartitionBy.Columns"))
        c.props.getStringSeq("PartitionBy.Columns")
      else Nil
    // table-level write validation, set BEFORE the mode runs so the very
    // first write is already validated: CHECK constraints (name → SQL
    // expression) and Delta-default schema enforcement
    if (c.props.exists("Checks"))
      c.props.getMap("Checks").foreach { case (n, e) =>
        table.setCheck(n, String.valueOf(e)) }
    if (c.props.exists("EnforceSchema"))
      table.setSchemaEnforced(c.props.getBoolean("EnforceSchema"))
    // `Bucket` → Iceberg-style bucket transform (ManagedTable.setBucket),
    // declared BEFORE the mode runs so the very first write already lays
    // out bucket dirs: point lookups prune structurally, keyed upserts/CDC
    // rewrite only touched buckets. `Type` is the canonical key type in
    // Spark DDL ("bigint", "string", …); omitted, the type is captured
    // from an existing table's schema. Idempotent per lift re-run; a
    // DIFFERENT spec on a laid-out table fails loudly (see setBucket).
    if (c.props.exists("Bucket")) {
      val bcol = c.props.getString("Bucket.Column")
      val bn = c.props.getLongOr("Bucket.N", 16L).toInt
      if (c.props.exists("Bucket.Type"))
        table.setBucket(bcol, bn, org.apache.spark.sql.types.DataType
          .fromDDL(c.props.getString("Bucket.Type")))
      else table.setBucket(bcol, bn)
    }
    c.props.getStringOr("Mode", "append") match {
      case "upsert" =>
        table.merge(df, c.props.getString("Upsert.MergeStatement"),
          upsert = true, partitionBy = partitionBy)
      case "clean_write" | "overwrite" => table.write(df, partitionBy)
      case "append" => table.append(df, partitionBy)
      // predicate-scoped overwrite (Delta replaceWhere): rows matching the
      // predicate leave, the input batch takes their place, one version —
      // the idempotent backfill; partition-pruned when PartitionBy set
      case "replace_where" =>
        table.replaceWhere(df, c.props.getString("ReplaceWhere.Predicate"),
          partitionBy)
      // row-level DELETE: the input DataFrame is ignored (the predicate
      // defines the rows to remove); partition-pruned when PartitionBy set
      case "delete" =>
        table.delete(c.props.getString("Delete.Predicate"), partitionBy)
      // deletion-vector DML: O(matched rows), zero data-file rewrites —
      // the right mode for sparse deletes/updates on very large tables
      // (GDPR erasure); OPTIMIZE materializes the vectors later
      case "delete_vectorized" =>
        table.deleteVectorized(c.props.getString("Delete.Predicate"))
      case "update_vectorized" =>
        table.updateVectorized(c.props.getString("Update.Predicate"),
          c.props.getMap("Update.Set").map { case (k, v) =>
            k -> String.valueOf(v) },
          partitionBy)
      case "upsert_vectorized" =>
        table.mergeVectorized(df, c.props.getString("Upsert.MergeStatement"),
          partitionBy)
      // RESTORE: roll back to a prior version as a new commit (input
      // DataFrame ignored; manifest-only, no data movement)
      case "restore" =>
        table.restore(c.props.getString("Restore.Version").toLong)
      // ALTER TABLE RENAME/DROP COLUMN: manifest-only schema evolution
      // (input DataFrame ignored; zero data movement, resolved per-dir at
      // read time; OPTIMIZE materializes the mapping)
      case "rename_column" =>
        table.renameColumn(c.props.getString("Rename.From"),
          c.props.getString("Rename.To"))
      case "drop_column" =>
        table.dropColumn(c.props.getString("Drop.Column"))
      // shallow CLONE: zero-copy snapshot of this table at another path
      case "clone" =>
        table.cloneTo(c.props.getString("Clone.TargetPath"))
      // CDC apply: the input DataFrame is an I/U/D change batch; one merge
      // applies deletes + upserts with last-op-wins in-batch collapse
      case "apply_changes" =>
        table.applyChanges(df,
          c.props.getString("Cdc.MergeStatement"),
          c.props.getString("Cdc.OpColumn"),
          c.props.getString("Cdc.OrderColumn"),
          partitionBy)
      // row-level UPDATE … SET: column -> SQL expression map applied to
      // rows matching the predicate; partition-pruned when PartitionBy set
      case "update" =>
        table.updateWhere(c.props.getString("Update.Predicate"),
          c.props.getMap("Update.Set").map { case (k, v) =>
            k -> String.valueOf(v) },
          partitionBy)
      case other => throw new IllegalArgumentException(s"Unknown write mode: $other")
    }
    if (c.props.exists("HiveTable"))
      table.registerAs(
        c.props.getString("HiveTable.DatabaseName"),
        c.props.getString("HiveTable.TableName"))
    if (c.props.exists("Optimize")) {
      val zcols =
        if (c.props.exists("Optimize.ZorderBy"))
          // both spellings: a YAML list ([a, b], like Blooms.Columns) or
          // the comma-separated string — String.valueOf on a List would
          // split into garbage names "List(a" / "b)"
          (c.props.get[Any]("Optimize.ZorderBy") match {
            case l: java.util.List[_] => c.props.getStringSeq("Optimize.ZorderBy")
            case l: Seq[_] => c.props.getStringSeq("Optimize.ZorderBy")
            case s => String.valueOf(s).split(",").map(_.trim).toSeq
          })
        else Nil
      // `Incremental: true` → compact/cluster only dirs written since the
      // last optimize watermark (O(new data)); default is the full rewrite
      if (c.props.getBoolean("Optimize.Incremental"))
        table.optimizeIncremental(zcols, partitionBy = partitionBy)
      else table.optimize(zcols, partitionBy = partitionBy)
    }
    if (c.props.exists("Vacuum"))
      table.vacuum(c.props.getDoubleOr("Vacuum.RetainHours", 168.0),
        enforceRetention = !c.props.getBoolean("Vacuum.Force"))
    // `Compact` → incremental small-file binpacking: only entries whose
    // files run small rewrite; healthy dirs carry by manifest reference
    if (c.props.exists("Compact"))
      table.compactSmall(
        c.props.getLongOr("Compact.TargetMB", 128L) * 1024 * 1024,
        partitionBy)
    // `Stats: true` (or `Stats.Columns: a,b`) → collect per-file
    // data-skipping stats for dirs that lack them (DataSkipping).
    // `Stats.Mode: footers` reads parquet footers instead of data bytes
    // (fixed-width columns only — see collectStatsFromFooters)
    if (c.props.exists("Stats")) {
      val statCols =
        if (c.props.exists("Stats.Columns"))
          c.props.getStringSeq("Stats.Columns")
        else Nil
      c.props.getStringOr("Stats.Mode", "scan") match {
        case "footers" => table.collectStatsFromFooters(statCols)
        case "scan" => table.collectStats(statCols)
        // a typo silently falling back to the scan pass would re-read
        // every data byte — the exact cost the option exists to avoid
        case other => throw new IllegalArgumentException(
          s"Stats.Mode must be 'scan' or 'footers', got '$other'")
      }
    }
    // `Blooms.Columns: a,b` → per-file bloom filters for equality/IN file
    // skipping on unclustered high-cardinality columns (DataSkipping)
    if (c.props.exists("Blooms"))
      table.collectBlooms(
        c.props.getStringSeq("Blooms.Columns"),
        c.props.getLongOr("Blooms.ItemsPerFile", 1000000L),
        c.props.getDoubleOr("Blooms.Fpp", 0.01))
    df
  }

  /** Streaming sink (entrypoint.py:296-321): Spark-4 `AvailableNow`
    * trigger (the successor of trigger-once), checkpoint under
    * `{Path}/checkpoint`, parquet encoding. */
  def streamDelta(c: BlockConfig): DataFrame = {
    val df = c.inputDf
    val path = c.props.getString("Path")
    df.writeStream
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .option("checkpointLocation", s"$path/checkpoint")
      .outputMode(c.props.getStringOr("OutputMode", "append"))
      .start(s"$path/data")
      .awaitTermination()
    df
  }

  def postgresUpsert(c: BlockConfig): DataFrame = Upsert.postgres(c)
  def mysqlUpsert(c: BlockConfig): DataFrame = Upsert.mysql(c)

  /** Standard-MERGE JDBC upsert (beyond the reference's two dialects):
    * same partition-parallel chunk/retry engine, SQL:2003 MERGE syntax —
    * end-to-end testable against embedded Derby. */
  def jdbcMergeUpsert(c: BlockConfig): DataFrame = Upsert.jdbcMerge(c)
}
