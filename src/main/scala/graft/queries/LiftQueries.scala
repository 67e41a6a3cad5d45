package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.lit

import graft.Tables
import graft.common.FsUtils
import graft.runtime.Lift
import graft.table.ManagedTable

/** End-to-end lift-job queries: each runs a full YAML pipeline through the
  * engine (parse → bind → blocks → registries → table layer → streaming)
  * and returns a DataFrame the driver checks against a DuckDB oracle over
  * the original testdata. This makes the SURVEY §2 block/registry surface
  * driver-verified, not just ScalaTest-verified.
  *
  * Every query rebuilds its scratch dir from the sf tables on each call, so
  * results are deterministic across runs and scale factors.
  */
object LiftQueries {

  /** Per-query scratch dir, wiped at the start of each invocation. The
    * fixture pipelines run Spark jobs against this process-local path, so
    * they are local-harness-only — loud guard, not silent partial reads
    * on a cluster (PLANS.md round-11 driver-local inventory). */
  private def scratch(s: SparkSession, name: String): String = {
    graft.common.Scratch.requireLocalMaster(s, s"lift fixture $name")
    val dir = graft.common.Scratch.dir("lift", name)
    FsUtils.deleteFiles(s, Seq(dir))
    dir
  }

  /** Read a DialectLite upsert target back as (o_orderkey, o_orderstatus,
    * price) — DialectLite serves the write path only (Spark's JDBC reader
    * needs full driver metadata), so verification reads the final table
    * state directly, as the reference's tests read theirs over a cursor. */
  private def dialectLiteReadback(s: SparkSession, db: String, table: String): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val (_, rows) = graft.blocks.DialectLite.snapshot(db, table)
    val data = rows.map(r => Row(r(0).asInstanceOf[java.lang.Long],
      String.valueOf(r(1)), r(2).asInstanceOf[java.lang.Double]))
    s.createDataFrame(new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(data).asJava),
      StructType(Seq(StructField("o_orderkey", LongType),
        StructField("o_orderstatus", StringType),
        StructField("price", DoubleType))))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // load::batch_csv with an explicit schema + transform chain, fed by a
    // CSV export of the customer table (reference load/entrypoint.py:26-50)
    "l_lift_csv" -> ((s, d) => {
      val w = scratch(s, "l_lift_csv")
      Tables.customer(s, d)
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .write.option("header", "true").csv(s"$w/in")
      val yaml =
        s"""LiftJob:
           |  Raw:
           |    Type: load::batch_csv
           |    Properties:
           |      Path: $w/in
           |      SparkSchema: $${schema}
           |      Options:
           |        header: "true"
           |  Shaped:
           |    Type: transform::generic
           |    Input: Raw
           |    Properties:
           |      Functions:
           |        - where:
           |            predicate: [c_mktsegment, '==', BUILDING]
           |        - select:
           |            cols:
           |              - col: c_custkey
           |              - col: c_name
           |              - col: c_acctbal
           |""".stripMargin
      Lift.lift(s, yaml, Map("schema" ->
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, c_acctbal DOUBLE, c_mktsegment STRING"))
        .getDf("Shaped")
    }),

    // load::batch_json with schema + suffix filtering over a JSON export of
    // part (reference load/entrypoint.py:75-118)
    "l_lift_json" -> ((s, d) => {
      val w = scratch(s, "l_lift_json")
      Tables.part(s, d).select("p_partkey", "p_name", "p_size")
        .write.json(s"$w/in")
      val yaml =
        s"""LiftJob:
           |  Raw:
           |    Type: load::batch_json
           |    Properties:
           |      Path: $w/in
           |      Suffix: .json
           |      SparkSchema: $${schema}
           |  Shaped:
           |    Type: transform::generic
           |    Input: Raw
           |    Properties:
           |      Functions:
           |        - where:
           |            predicate: [p_size, '>', 25]
           |""".stripMargin
      Lift.lift(s, yaml, Map("schema" -> "p_partkey BIGINT, p_name STRING, p_size INT"))
        .getDf("Shaped")
    }),

    // write::batch_orc -> load::batch_orc ROUND TRIP through the engine
    // (DuckDB reads no ORC, so the oracle verifies against the SOURCE
    // parquet — the same round-trip contract as l_jdbc_roundtrip): any
    // column drift, row loss, or type coercion through the ORC writer or
    // reader breaks the hash
    "l_lift_orc" -> ((s, d) => {
      val w = scratch(s, "l_lift_orc")
      Tables.customer(s, d).createOrReplaceTempView("orc_cust_src")
      val yaml =
        s"""LiftJob:
           |  Src:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal
           |        FROM orc_cust_src WHERE c_custkey % 7 = 0
           |  Out:
           |    Type: write::batch_orc
           |    Input: Src
           |    Properties:
           |      Path: $w/orc
           |      Mode: overwrite
           |  Back:
           |    Type: load::batch_orc
           |    Properties:
           |      Path: $w/orc
           |      SparkSchema: $${schema}
           |""".stripMargin
      Lift.lift(s, yaml, Map("schema" ->
        "c_custkey BIGINT, c_name STRING, c_nationkey INT, bal DOUBLE"))
        .getDf("Back")
    }),

    // load::batch_xml over Spark 4's native XML source with BatchSize
    // chunking + allow-missing unionByName (reference load/entrypoint.py:121-192)
    "l_lift_xml" -> ((s, d) => {
      val w = scratch(s, "l_lift_xml")
      Tables.nation(s, d).repartition(3)
        .write.format("xml").option("rowTag", "nation").save(s"$w/in")
      val yaml =
        s"""LiftJob:
           |  Raw:
           |    Type: load::batch_xml
           |    Properties:
           |      Path: $w/in
           |      Suffix: .xml
           |      RowTag: nation
           |      BatchSize: 2
           |      SparkSchema: $${schema}
           |""".stripMargin
      Lift.lift(s, yaml, Map("schema" ->
        "n_nationkey INT, n_name STRING, n_regionkey INT")).getDf("Raw")
    }),

    // custom::sql over two loaded inputs exposed as temp views
    // (reference custom/entrypoint.py:235-271)
    "l_lift_sql_join" -> ((s, d) => {
      val yaml =
        s"""LiftJob:
           |  Sup:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $d/supplier.parquet
           |  Nat:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $d/nation.parquet
           |  Agg:
           |    Type: custom::sql
           |    Input: [Sup, Nat]
           |    Properties:
           |      Statement: >-
           |        SELECT n_name, count(*) AS n_suppliers,
           |        round(sum(s_acctbal), 2) AS total_bal
           |        FROM Sup JOIN Nat ON s_nationkey = n_nationkey
           |        GROUP BY n_name
           |""".stripMargin
      Lift.lift(s, yaml).getDf("Agg")
    }),

    // write::batch_delta upsert-merge through the managed-table layer, then
    // read the merged table back (reference batch_delta.py:51-78)
    "l_table_upsert" -> ((s, d) => {
      val w = scratch(s, "l_table_upsert")
      Tables.orders(s, d).createOrReplaceTempView("orders_src")
      val base =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_src WHERE o_orderkey % 4 = 0
           |  W:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |""".stripMargin
      Lift.lift(s, base)
      val upsert =
        s"""LiftJob:
           |  Updates:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice + 10, 2) AS price
           |        FROM orders_src WHERE o_orderkey % 8 = 0
           |  W:
           |    Type: write::batch_delta
           |    Input: Updates
           |    Properties:
           |      Path: $w/t
           |      Mode: upsert
           |      Upsert:
           |        MergeStatement: source.o_orderkey == updates.o_orderkey
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, upsert).getDf("ReadBack")
    }),

    // the native graft expressions called FROM SQL: word_shingles +
    // simhash64 registered on the session (SparkSessionExtensions path)
    // and invoked inside a custom::sql statement — proving the extension
    // wiring end-to-end against the built-in-function oracle formulations
    "l_sql_native_fns" -> ((s, d) => {
      graft.functions.GraftExtensions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("docs_fns_src")
      val yaml =
        s"""LiftJob:
           |  Q:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT doc_id,
           |          size(word_shingles(filter(split(lower(text), '[^a-z0-9'']+'),
           |                                    t -> length(t) > 0), 3)) AS n_shingles,
           |          simhash64(filter(split(lower(text), '[^a-z0-9'']+'),
           |                           t -> length(t) > 0)) AS sig
           |        FROM docs_fns_src
           |""".stripMargin
      Lift.lift(s, yaml).getDf("Q")
    }),

    // CDC apply through write::batch_delta Mode: apply_changes — one
    // I/U/D batch mirrored onto the table (deletes + upserts in one merge)
    "l_table_cdc" -> ((s, d) => {
      val w = scratch(s, "l_table_cdc")
      Tables.orders(s, d).createOrReplaceTempView("orders_cdc_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price
           |        FROM orders_cdc_src WHERE o_orderkey % 9 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |  Changes:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice + 50, 2) AS price,
           |               'U' AS op, 1 AS seq
           |        FROM orders_cdc_src WHERE o_orderkey % 18 = 0 AND o_orderkey % 27 <> 0
           |        UNION ALL
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price, 'D' AS op, 1 AS seq
           |        FROM orders_cdc_src WHERE o_orderkey % 27 = 0
           |        UNION ALL
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price, 'I' AS op, 1 AS seq
           |        FROM orders_cdc_src WHERE o_orderkey % 9 = 1
           |  A:
           |    Type: write::batch_delta
           |    Input: Changes
           |    Properties:
           |      Path: $w/t
           |      Mode: apply_changes
           |      Cdc:
           |        MergeStatement: source.o_orderkey == updates.o_orderkey
           |        OpColumn: op
           |        OrderColumn: seq
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack").select("o_orderkey", "price")
    }),

    // CDF timestamp-resolution edge: StartingTimestamp set to EXACTLY the
    // second commit's timestamp must include that commit's changes
    // (inclusive start: base = last commit STRICTLY before ts — the
    // reference's version-at-timestamp boundary, delta_diff.py:44-54). A
    // `<=` base pick would silently drop v1's rows; a full-feed fallback
    // would add v0's. Three commits v0/v1/v2 with strictly increasing
    // millis (enforced by sleeps) pin the rule on both sides.
    "l_table_cdc_ts" -> ((s, d) => {
      val w = scratch(s, "l_table_cdc_ts")
      Tables.orders(s, d).createOrReplaceTempView("orders_cdcts_src")
      def write(mode: String, pred: String): Unit = Lift.lift(s,
        s"""LiftJob:
           |  B:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price
           |        FROM orders_cdcts_src WHERE $pred
           |  W:
           |    Type: write::batch_delta
           |    Input: B
           |    Properties:
           |      Path: $w/t
           |      Mode: $mode
           |""".stripMargin)
      write("clean_write", "o_orderkey % 11 = 0")
      Thread.sleep(5) // guarantee v0.ts < v1.ts so the boundary is sharp
      write("append", "o_orderkey % 11 = 1")
      Thread.sleep(5)
      write("append", "o_orderkey % 11 = 2")
      // ts = v1's commit millis, read back from the manifest log — the
      // exact-boundary case no wall-clock capture can hit reliably
      val hist = graft.table.ManagedTable(s, s"$w/t").history()
      assert(hist.size == 3 && hist(0)._2 < hist(1)._2 && hist(1)._2 < hist(2)._2,
        s"need 3 strictly-ordered commits, got $hist")
      val tsStr = new java.sql.Timestamp(hist(1)._2).toString
      Lift.lift(s,
        s"""LiftJob:
           |  Feed:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      ReadChangeFeed: true
           |      StartingTimestamp: '$tsStr'
           |""".stripMargin).getDf("Feed")
    }),

    // row-level UPDATE … SET through write::batch_delta Mode: update,
    // partition-pruned on o_orderstatus
    "l_table_update" -> ((s, d) => {
      val w = scratch(s, "l_table_update")
      Tables.orders(s, d).createOrReplaceTempView("orders_upd_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_upd_src WHERE o_orderkey % 7 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      PartitionBy: o_orderstatus
           |  U:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: update
           |      PartitionBy: o_orderstatus
           |      Update:
           |        Predicate: o_orderstatus = 'F'
           |        Set:
           |          price: round(price + 100, 2)
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderstatus", "price")
    }),

    // predicate-scoped overwrite through Mode: replace_where — the
    // idempotent backfill: every 'O' row leaves, a recomputed (smaller,
    // re-priced) 'O' batch takes its place, one version, pruned to the
    // o_orderstatus=O partition
    "l_table_replace" -> ((s, d) => {
      val w = scratch(s, "l_table_replace")
      Tables.orders(s, d).createOrReplaceTempView("orders_rw_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_rw_src WHERE o_orderkey % 7 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      PartitionBy: o_orderstatus
           |  Refill:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) - 1.0 AS price
           |        FROM orders_rw_src
           |        WHERE o_orderkey % 7 = 0 AND o_orderstatus = 'O' AND o_orderkey % 2 = 0
           |  R:
           |    Type: write::batch_delta
           |    Input: Refill
           |    Properties:
           |      Path: $w/t
           |      Mode: replace_where
           |      PartitionBy: o_orderstatus
           |      ReplaceWhere:
           |        Predicate: o_orderstatus = 'O'
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderstatus", "price")
    }),

    // row-level DELETE through write::batch_delta Mode: delete — the
    // GDPR/right-to-erasure path, partition-pruned on o_orderstatus
    "l_table_delete" -> ((s, d) => {
      val w = scratch(s, "l_table_delete")
      Tables.orders(s, d).createOrReplaceTempView("orders_del_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_del_src WHERE o_orderkey % 5 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      PartitionBy: o_orderstatus
           |  D:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: delete
           |      PartitionBy: o_orderstatus
           |      Delete:
           |        Predicate: o_orderkey % 10 = 0
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderstatus", "price")
    }),

    // deletion-vector DML chain: clean_write → delete_vectorized (sidecar,
    // zero data-file rewrites) → update_vectorized (vector out + append
    // images) → upsert_vectorized (vector matched + append batch) → read
    // back. Exercises the O(matched-rows) row-level DML cost model end to
    // end through the YAML surface; DeletionVectorSpec asserts the
    // zero-rewrite property itself.
    "l_table_dv" -> ((s, d) => {
      val w = scratch(s, "l_table_dv")
      Tables.orders(s, d).createOrReplaceTempView("orders_dv_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_dv_src WHERE o_orderkey % 3 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |  D:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: delete_vectorized
           |      Delete:
           |        Predicate: o_orderkey % 9 = 0
           |  U:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: update_vectorized
           |      Update:
           |        Predicate: o_orderkey % 6 = 0
           |        Set:
           |          price: round(price + 5, 2)
           |  Ups:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice - 1, 2) AS price
           |        FROM orders_dv_src WHERE o_orderkey % 12 = 0
           |  M:
           |    Type: write::batch_delta
           |    Input: Ups
           |    Properties:
           |      Path: $w/t
           |      Mode: upsert_vectorized
           |      Upsert:
           |        MergeStatement: source.o_orderkey = updates.o_orderkey
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderstatus", "price")
    }),

    // time travel: clean_write (v0) then upsert-merge (v1), read BOTH
    // file-level data skipping: clean_write, OPTIMIZE ZORDER clusters the
    // files by o_orderdate, Stats collects per-file min/max (DataSkipping),
    // and the read-back's Where prunes files at planning time — the Delta
    // stats + DataSkippingReader path over plain parquet. The YAML result
    // is correct with or without pruning; DataSkippingSpec asserts the
    // pruning itself.
    "l_table_skipping" -> ((s, d) => {
      val w = scratch(s, "l_table_skipping")
      Tables.orders(s, d).createOrReplaceTempView("orders_skip_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
           |        FROM orders_skip_src
           |  W:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      Optimize:
           |        ZorderBy: o_orderdate
           |      Stats: true
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Where: o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
           |        AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderdate", "price")
    }),

    // footer-mode data skipping over a STRING predicate (round-10: string
    // ids / ISO-date strings are the most common real-world predicate
    // columns; footer bounds carry truncation-safe widened maxima, see
    // table/DataSkipping.scala string-bounds note + FooterStatsSpec) —
    // the metadata-only stats sweep prunes a string range exactly like
    // the scan-based mode
    "l_table_skipping_str" -> ((s, d) => {
      val w = scratch(s, "l_table_skipping_str")
      Tables.orders(s, d).createOrReplaceTempView("orders_skipstr_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT concat('ORD', lpad(CAST(o_orderkey AS STRING), 10, '0')) AS okey,
           |        round(o_totalprice, 2) AS price
           |        FROM orders_skipstr_src
           |  W:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      Optimize:
           |        ZorderBy: okey
           |      Stats:
           |        Mode: footers
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Where: okey >= 'ORD0000000100' AND okey < 'ORD0000001000'
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack").select("okey", "price")
    }),

    // RESTORE: v0 clean_write, v1 botched upsert, restore to v0 as a NEW
    // commit (manifest-only rollback, no data movement), then read back
    // through a shallow CLONE of the restored table (zero-copy snapshot)
    "l_table_restore" -> ((s, d) => {
      val w = scratch(s, "l_table_restore")
      Tables.orders(s, d).createOrReplaceTempView("orders_rs_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price
           |        FROM orders_rs_src WHERE o_orderkey % 12 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |  Botch:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice * 0, 2) AS price
           |        FROM orders_rs_src WHERE o_orderkey % 12 = 0
           |  W1:
           |    Type: write::batch_delta
           |    Input: Botch
           |    Properties:
           |      Path: $w/t
           |      Mode: upsert
           |      Upsert:
           |        MergeStatement: source.o_orderkey == updates.o_orderkey
           |  R:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: restore
           |      Restore:
           |        Version: 0
           |  C:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clone
           |      Clone:
           |        TargetPath: $w/t-clone
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t-clone
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack").select("o_orderkey", "price")
    }),

    // incremental small-file compaction: clean_write + two appends leave
    // a small-file tail; the final write's Compact binpacks ONLY the
    // small entries (healthy dirs carry by manifest reference untouched —
    // asserted in DataSkippingSpec); the oracle proves no row is lost
    "l_table_compact" -> ((s, d) => {
      val w = scratch(s, "l_table_compact")
      Tables.orders(s, d).createOrReplaceTempView("orders_cp_src")
      val sel = "SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price FROM orders_cp_src"
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 10 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |  A1:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 10 = 1
           |  W1:
           |    Type: write::batch_delta
           |    Input: A1
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |  A2:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 10 = 2
           |  W2:
           |    Type: write::batch_delta
           |    Input: A2
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |      Compact:
           |        TargetMB: 64
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderstatus", "price")
    }),

    // DESCRIBE HISTORY analogue: every commit stamps its operation name
    // into the manifest; the history surface reports (version, operation,
    // snapshot footprint) — Delta's operational observability
    "l_table_history" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, expr, round}
      val w = scratch(s, "l_table_history")
      val orders = Tables.orders(s, d)
        .selectExpr("o_orderkey", "round(o_totalprice, 2) AS price")
      val t = ManagedTable(s, s"$w/t")
      t.write(orders.where(expr("o_orderkey % 6 = 0")))
      t.append(orders.where(expr("o_orderkey % 6 = 1")))
      t.merge(orders.where(expr("o_orderkey % 12 = 0"))
          .withColumn("price", round(col("price") + 1, 2)),
        "source.o_orderkey == updates.o_orderkey")
      t.delete("o_orderkey % 6 = 1")
      t.describeHistory().select("version", "operation", "num_entries")
    }),

    // Iceberg-style bucket transform (ManagedTable.setBucket): writes lay
    // out a hidden pmod(hash(o_orderkey), 16) hive partition, the merge on
    // the bucket key rewrites only touched bucket dirs, and the final
    // point lookup scans only its key's bucket — structural pruning with
    // no sidecar collection (BucketTransformSpec pins the prune evidence)
    "l_table_bucket" -> ((s, d) => {
      import org.apache.spark.sql.functions.{col, expr, min, round}
      val w = scratch(s, "l_table_bucket")
      val orders = Tables.orders(s, d)
        .selectExpr("o_orderkey", "o_orderstatus",
          "round(o_totalprice, 2) AS price")
      val t = ManagedTable(s, s"$w/t")
      t.setBucket("o_orderkey", 16, org.apache.spark.sql.types.LongType)
      // writer tasks are right-sized before the bucket-partitioned write:
      // each task emits one file per bucket it holds, so 32 tasks x 16
      // buckets would spray ~512 tiny files where 4 tasks make ~64
      t.write(orders.where(expr("o_orderkey % 5 = 0")).coalesce(4))
      t.append(orders.where(expr("o_orderkey % 5 = 1")).coalesce(4))
      // updates hit existing rows (% 10 = 0 ⊂ wave 1) AND insert fresh
      // keys (% 10 = 3 is in neither wave) — both merge arms exercised
      t.merge(orders.where(expr("o_orderkey % 10 IN (0, 3)"))
          .withColumn("price", round(col("price") + 50, 2)).coalesce(4),
        "source.o_orderkey == updates.o_orderkey")
      val k = t.read().agg(min("o_orderkey")).head().getLong(0)
      t.read().unionByName(t.readWhere(s"o_orderkey = $k"))
    }),

    // multi-column Z-order (bit-interleaved Morton key, table/ZOrder):
    // the read-back predicate filters on o_totalprice — the SECOND
    // z-ordered column, which lexicographic clustering could never prune
    "l_table_zorder" -> ((s, d) => {
      val w = scratch(s, "l_table_zorder")
      Tables.orders(s, d).createOrReplaceTempView("orders_z_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
           |        FROM orders_z_src
           |  W:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      Optimize:
           |        ZorderBy: o_orderdate, price
           |      Stats: true
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Where: price >= 100000.0 AND price < 120000.0
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderdate", "price")
    }),

    // INCREMENTAL optimize (round-10): base z-ordered full, two appends,
    // then `Optimize: {Incremental: true}` clusters ONLY the appended
    // dirs — the base dir carries by manifest reference (ManagedTableSpec
    // pins the carried entry), O(new data) maintenance where the full
    // rewrite is O(table). Content ≡ the full-optimize result by oracle.
    "l_table_zorder_inc" -> ((s, d) => {
      val w = scratch(s, "l_table_zorder_inc")
      Tables.orders(s, d).createOrReplaceTempView("orders_zi_src")
      val sel = "SELECT o_orderkey, o_orderdate, round(o_totalprice, 2)" +
        " AS price FROM orders_zi_src"
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 3 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |      Optimize:
           |        ZorderBy: o_orderdate, price
           |  A1:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 3 = 1
           |  W1:
           |    Type: write::batch_delta
           |    Input: A1
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |  A2:
           |    Type: custom::sql
           |    Properties:
           |      Statement: $sel WHERE o_orderkey % 3 = 2
           |  W2:
           |    Type: write::batch_delta
           |    Input: A2
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |      Optimize:
           |        ZorderBy: o_orderdate, price
           |        Incremental: true
           |      Stats: true
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Where: price >= 100000.0 AND price < 120000.0
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
        .select("o_orderkey", "o_orderdate", "price")
    }),

    // versions back through load::batch_delta's Version property and union
    // them version-tagged — Delta's versionAsOf over the manifest log
    "l_table_timetravel" -> ((s, d) => {
      val w = scratch(s, "l_table_timetravel")
      Tables.orders(s, d).createOrReplaceTempView("orders_tt_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice, 2) AS price
           |        FROM orders_tt_src WHERE o_orderkey % 6 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |""".stripMargin
      Lift.lift(s, yaml)
      val yaml2 =
        s"""LiftJob:
           |  Updates:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, round(o_totalprice + 7, 2) AS price
           |        FROM orders_tt_src WHERE o_orderkey % 12 = 0
           |  W1:
           |    Type: write::batch_delta
           |    Input: Updates
           |    Properties:
           |      Path: $w/t
           |      Mode: upsert
           |      Upsert:
           |        MergeStatement: source.o_orderkey == updates.o_orderkey
           |  V0:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Version: 0
           |  V1:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |      Version: 1
           |""".stripMargin
      val out = Lift.lift(s, yaml2)
      out.getDf("V0").withColumn("version", lit(0L))
        .unionByName(out.getDf("V1").withColumn("version", lit(1L)))
    }),

    // schema evolution: an appended batch carries a column the base batch
    // lacks (Delta mergeSchema semantics, reference batch_delta.py write
    // options) — the table reads as unionByName(allowMissingColumns), so
    // pre-drift rows surface NULL for the new column and neither batch is
    // rewritten (each snapshot dir keeps its own parquet schema)
    "l_table_schema_drift" -> ((s, d) => {
      val w = scratch(s, "l_table_schema_drift")
      Tables.orders(s, d).createOrReplaceTempView("orders_drift_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus
           |        FROM orders_drift_src WHERE o_orderkey % 3 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |""".stripMargin
      Lift.lift(s, yaml)
      val yaml2 =
        s"""LiftJob:
           |  Widened:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_drift_src WHERE o_orderkey % 3 = 1
           |  W1:
           |    Type: write::batch_delta
           |    Input: Widened
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml2).getDf("ReadBack")
    }),

    // manifest-only ALTER TABLE: rename a column (zero data movement),
    // append a post-rename batch under the NEW name, then drop another
    // column — the read resolves the mapping per-dir (old dirs carry the
    // old physical name) and excludes the dropped column everywhere
    "l_table_rename" -> ((s, d) => {
      val w = scratch(s, "l_table_rename")
      Tables.orders(s, d).createOrReplaceTempView("orders_rn_src")
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM orders_rn_src WHERE o_orderkey % 5 = 0
           |  W0:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: clean_write
           |  Ren:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: rename_column
           |      Rename:
           |        From: price
           |        To: amount
           |  Late:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS amount
           |        FROM orders_rn_src WHERE o_orderkey % 5 = 1
           |  W1:
           |    Type: write::batch_delta
           |    Input: Late
           |    Properties:
           |      Path: $w/t
           |      Mode: append
           |  Dropped:
           |    Type: write::batch_delta
           |    Input: Base
           |    Properties:
           |      Path: $w/t
           |      Mode: drop_column
           |      Drop:
           |        Column: o_orderstatus
           |  ReadBack:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/t
           |""".stripMargin
      Lift.lift(s, yaml).getDf("ReadBack")
    }),

    // fileregistry::s3_full_scan pruning + UpdateAfter flush + batch_delta
    // append sink (reference s3_full_scan.py, manager.py:41-46)
    "l_registry_fullscan" -> ((s, d) => {
      val w = scratch(s, "l_registry_fullscan")
      Tables.lineitem(s, d)
        .where("l_linenumber = 1")
        .select("l_orderkey", "l_partkey", "l_quantity")
        .repartition(3).write.parquet(s"$w/in")
      val yaml =
        s"""FileRegistry:
           |  Reg:
           |    Type: fileregistry::s3_full_scan
           |    Properties:
           |      BasePath: $w/registry
           |      UpdateAfter: Sink
           |LiftJob:
           |  Raw:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $w/in
           |      FileRegistry: Reg
           |  Sink:
           |    Type: write::batch_delta
           |    Input: Raw
           |    Properties:
           |      Path: $w/table
           |      Mode: append
           |""".stripMargin
      Lift.lift(s, yaml)
      // second run must be a clean no-op (registry reports no new files)
      Lift.lift(s, yaml)
      ManagedTable(s, s"$w/table").read()
    }),

    // fileregistry::s3_date_prefix_scan: strftime prefix enumeration from
    // DefaultStartDate bounds the listing to the date window
    // (reference s3_date_prefix_scan.py:24-166)
    "l_registry_dateprefix" -> ((s, d) => {
      val w = scratch(s, "l_registry_dateprefix")
      val src = Tables.orders(s, d)
        .where("o_orderkey % 16 = 0")
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      // two date-partitioned prefixes holding half the slice each
      src.where("o_orderkey % 32 = 0").write
        .parquet(s"$w/in/year=2026/month=08/day=01")
      src.where("o_orderkey % 32 <> 0").write
        .parquet(s"$w/in/year=2026/month=08/day=02")
      val yaml =
        s"""FileRegistry:
           |  Reg:
           |    Type: fileregistry::s3_date_prefix_scan
           |    Properties:
           |      BasePath: $w/registry
           |      UpdateAfter: Sink
           |      PartitionFormat: year=%Y/month=%m/day=%d
           |      DefaultStartDate: "2026-07-31"
           |LiftJob:
           |  Raw:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $w/in
           |      FileRegistry: Reg
           |  Sink:
           |    Type: write::batch_delta
           |    Input: Raw
           |    Properties:
           |      Path: $w/table
           |      Mode: append
           |""".stripMargin
      Lift.lift(s, yaml)
      ManagedTable(s, s"$w/table").read()
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
    }),

    // custom::function — the reference's python_codeblock as a host
    // function bound through raw-object parameter substitution
    // (reference custom/entrypoint.py:22-232, lift_definition.py:28-42)
    // custom::function MULTI-OUTPUT path (reference custom/entrypoint.py:
    // 110-158): the host function returns a Map of named DataFrames
    // matched against the block's declared `Output:` names; both outputs
    // carry data (threshold 910 is non-empty at every sf — 1500 used to
    // make this row vacuously pass on 0 rows) and the query joins them so
    // the oracle hash covers BOTH registered sub-outputs.
    "l_custom_function" -> ((s, d) => {
      import org.apache.spark.sql.functions.{avg, count, lit, round => rnd}
      val fn: Map[String, Any] => Any = { in =>
        val df = in("Raw").asInstanceOf[DataFrame].where("p_retailprice > 910")
        Map(
          "counts" -> df.groupBy("p_brand").agg(count(lit(1)).as("n_expensive")),
          "stats" -> df.groupBy("p_brand")
            .agg(rnd(avg("p_retailprice"), 2).as("avg_price")))
      }
      val yaml =
        s"""LiftJob:
           |  Raw:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $d/part.parquet
           |  Agg:
           |    Type: custom::function
           |    Input: [Raw]
           |    Output: [counts, stats]
           |    Properties:
           |      CustomFunction: $${agg_fn}
           |""".stripMargin
      val log = Lift.lift(s, yaml, Map("agg_fn" -> fn))
      log.getDf("Agg.counts").join(log.getDf("Agg.stats"), "p_brand")
    }),

    // write::batch_jdbc → load::jdbc round-trip against embedded Derby:
    // the write creates+fills the table, the load pushes the SQL (with a
    // MOD filter) down into the database (reference load/entrypoint.py:
    // 265-301, write/entrypoint.py:21-62)
    "l_jdbc_roundtrip" -> ((s, d) => {
      Tables.supplier(s, d).createOrReplaceTempView("jdbc_sup_src")
      val url = "jdbc:derby:memory:graft_q_jdbc;create=true"
      val yaml =
        s"""LiftJob:
           |  Src:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal
           |        FROM jdbc_sup_src
           |  Out:
           |    Type: write::batch_jdbc
           |    Input: Src
           |    Properties:
           |      Mode: overwrite
           |      Driver: org.apache.derby.jdbc.EmbeddedDriver
           |      ConnUrl: $url
           |      Table: sup_rt
           |      User: ""
           |      Password: ""
           |      NumPartitions: 4
           |  Back:
           |    Type: load::jdbc
           |    Properties:
           |      Driver: org.apache.derby.jdbc.EmbeddedDriver
           |      ConnUrl: $url
           |      User: ""
           |      Password: ""
           |      Query: >-
           |        SELECT "s_suppkey", "s_name", "bal" FROM sup_rt
           |        WHERE MOD("s_suppkey", 3) = 0
           |""".stripMargin
      Lift.lift(s, yaml).getDf("Back")
    }),

    // write::batch_jdbc_upsert: the partition-parallel chunked upsert
    // engine (one connection per partition, 1000-row executeBatch chunks,
    // retry loop — reference common/upsert.py) driven END TO END against
    // embedded Derby via the standard-MERGE dialect, then read back
    "l_jdbc_upsert" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("jdbc_ord_src")
      val url = "jdbc:derby:memory:graft_q_upsert;create=true"
      val common =
        s"""      Driver: org.apache.derby.jdbc.EmbeddedDriver
           |      ConnUrl: $url
           |      User: ""
           |      Password: """"".stripMargin
      val seedYaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 40 = 0
           |  Seed:
           |    Type: write::batch_jdbc
           |    Input: Base
           |    Properties:
           |      Mode: overwrite
           |      Table: ord_ups
           |      NumPartitions: 4
           |$common
           |""".stripMargin
      val seedLog = Lift.lift(s, seedYaml)
      // An upsert target's conflict columns are BY DEFINITION a unique
      // key (Postgres ON CONFLICT refuses to run without one); Spark's
      // JDBC writer creates a bare table, so mirror the real-world schema
      // here. Without it every MERGE probe is a full table scan whose
      // read locks escalate — at sf1 (37.5k seed rows, 19 concurrent
      // chunks) Derby deadlocked and crawled; with the index each probe
      // locks one key. One driver-side DDL, bounded.
      assert(seedLog != null)
      val ddlConn = java.sql.DriverManager.getConnection(url)
      try ddlConn.createStatement().execute(
        """CREATE UNIQUE INDEX ord_ups_pk ON ord_ups ("o_orderkey")""")
      finally ddlConn.close()
      // NumPartitions: 1 below — embedded Derby's MERGE is not
      // concurrency-safe (internal page-latch NPEs under 4+ concurrent
      // writers at sf1; its deadlocks surface fine and retry, the latch
      // NPE corrupts). Concurrent chunk/retry semantics are raced against
      // DialectLite instead; real MERGE targets (DB2/Oracle/SQL Server)
      // take whatever fan-in NumPartitions grants.
      val yaml =
        s"""LiftJob:
           |  Updates:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 80 = 0
           |  Ups:
           |    Type: write::batch_jdbc_upsert
           |    Input: Updates
           |    Properties:
           |      Table: ord_ups
           |      ConflictColumns: [o_orderkey]
           |      NumPartitions: 1
           |$common
           |  Back:
           |    Type: load::jdbc
           |    Properties:
           |      Query: SELECT "o_orderkey", "o_orderstatus", "price" FROM ord_ups
           |$common
           |""".stripMargin
      Lift.lift(s, yaml).getDf("Back")
    }),

    // write::batch_postgres_upsert executed END TO END: the exact
    // `INSERT … ON CONFLICT (…) DO UPDATE SET c = EXCLUDED.c` statement
    // runs against the embedded DialectLite engine (which parses the full
    // conflict grammar and enforces Postgres's unique-target rule) through
    // the same chunked foreachPartition/retry machinery a live server
    // sees (reference tests/getl/blocks/write/test_write_postgres_upsert.py
    // runs this against docker-compose Postgres 14). Three passes: seed
    // (all inserts), conflicting update (DO UPDATE), and a mixed
    // DO NOTHING pass that must insert new keys but leave existing rows
    // untouched.
    "l_jdbc_upsert_pg" -> ((s, d) => {
      import graft.blocks.DialectLite
      Tables.orders(s, d).createOrReplaceTempView("jdbc_ord_src")
      DialectLite.create("graft_q_pg", "ord_pg",
        Seq("o_orderkey", "o_orderstatus", "price"), Seq("o_orderkey"))
      val common =
        s"""      Driver: graft.blocks.DialectLiteDriver
           |      ConnUrl: jdbc:dialectlite:graft_q_pg
           |      User: ""
           |      Password: """"".stripMargin
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 40 = 0
           |  Seed:
           |    Type: write::batch_postgres_upsert
           |    Input: Base
           |    Properties:
           |      Table: ord_pg
           |      ConflictColumns: [o_orderkey]
           |$common
           |  Updates:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 80 = 0
           |  Ups:
           |    Type: write::batch_postgres_upsert
           |    Input: Updates
           |    Properties:
           |      Table: ord_pg
           |      ConflictColumns: [o_orderkey]
           |$common
           |  Nothing:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, 'X' AS o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 20 = 0
           |  Skip:
           |    Type: write::batch_postgres_upsert
           |    Input: Nothing
           |    Properties:
           |      Table: ord_pg
           |      ConflictColumns: [o_orderkey]
           |      UpdateColumns: []
           |$common
           |""".stripMargin
      graft.runtime.Lift.lift(s, yaml)
      dialectLiteReadback(s, "graft_q_pg", "ord_pg")
    }),

    // write::batch_mysql_upsert executed END TO END against the same
    // engine under the MySQL grammar (`ON DUPLICATE KEY UPDATE
    // c = VALUES(c)`, duplicate resolution against the table's own
    // primary key — reference getl/common/upsert.py:163-224).
    "l_jdbc_upsert_mysql" -> ((s, d) => {
      import graft.blocks.DialectLite
      Tables.orders(s, d).createOrReplaceTempView("jdbc_ord_src")
      DialectLite.create("graft_q_my", "ord_my",
        Seq("o_orderkey", "o_orderstatus", "price"), Seq("o_orderkey"))
      val common =
        s"""      Driver: graft.blocks.DialectLiteDriver
           |      ConnUrl: jdbc:dialectlite:graft_q_my
           |      User: ""
           |      Password: """"".stripMargin
      val yaml =
        s"""LiftJob:
           |  Base:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 40 = 0
           |  Seed:
           |    Type: write::batch_mysql_upsert
           |    Input: Base
           |    Properties:
           |      Table: ord_my
           |$common
           |  Updates:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
           |        FROM jdbc_ord_src WHERE o_orderkey % 80 = 0
           |  Ups:
           |    Type: write::batch_mysql_upsert
           |    Input: Updates
           |    Properties:
           |      Table: ord_my
           |$common
           |""".stripMargin
      graft.runtime.Lift.lift(s, yaml)
      dialectLiteReadback(s, "graft_q_my", "ord_my")
    }),

    // fileregistry::delta_diff: two incremental runs over a growing managed
    // table — run 1 full-loads and sets the watermark, run 2 must see ONLY
    // the rows appended after it (reference delta_diff.py:10-64, mirrored
    // on tests/integration/test_delta_file_registry.py:52-140)
    "l_registry_deltadiff" -> ((s, d) => {
      val w = scratch(s, "l_registry_deltadiff")
      Tables.orders(s, d).createOrReplaceTempView("orders_dd_src")
      def buildTarget(pred: String, mode: String): String =
        s"""LiftJob:
           |  Rows:
           |    Type: custom::sql
           |    Properties:
           |      Statement: >-
           |        SELECT o_orderkey, o_orderstatus FROM orders_dd_src
           |        WHERE $pred
           |  W:
           |    Type: write::batch_delta
           |    Input: Rows
           |    Properties:
           |      Path: $w/target
           |      Mode: $mode
           |""".stripMargin
      val incremental =
        s"""FileRegistry:
           |  Reg:
           |    Type: fileregistry::delta_diff
           |    Properties:
           |      BasePath: $w/watermark
           |      UpdateAfter: Sink
           |      JoinOnFields: [o_orderkey]
           |LiftJob:
           |  Raw:
           |    Type: load::batch_delta
           |    Properties:
           |      Path: $w/target
           |      FileRegistry: Reg
           |  Sink:
           |    Type: write::batch_delta
           |    Input: Raw
           |    Properties:
           |      Path: $w/out
           |      Mode: clean_write
           |""".stripMargin
      Lift.lift(s, buildTarget("o_orderkey % 10 = 0 AND o_orderkey % 20 = 0", "clean_write"))
      Thread.sleep(5) // version timestamps are ms-resolution; keep ordering strict
      Lift.lift(s, incremental) // full load (no watermark yet) + watermark flush
      Thread.sleep(5)
      Lift.lift(s, buildTarget("o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0", "append"))
      Thread.sleep(5)
      Lift.lift(s, incremental) // second run: the appended rows only
      ManagedTable(s, s"$w/out").read()
    }),

    // custom::function via CustomCodePath: the block body lives in a
    // .scala file compiled at runtime (the reference's dynamic .py import,
    // custom/entrypoint.py:190-226)
    "l_custom_codepath" -> ((s, d) => {
      val w = scratch(s, "l_custom_codepath")
      FsUtils.writeText(s, s"$w/block.scala",
        """(in: Map[String, Any]) => {
          |  import org.apache.spark.sql.functions._
          |  val df = in("Raw").asInstanceOf[org.apache.spark.sql.DataFrame]
          |  df.groupBy("p_brand")
          |    .agg(count(lit(1)).as("n"), round(avg("p_retailprice"), 2).as("avg_price"))
          |}""".stripMargin)
      val yaml =
        s"""LiftJob:
           |  Raw:
           |    Type: load::batch_parquet
           |    Properties:
           |      Path: $d/part.parquet
           |  Agg:
           |    Type: custom::function
           |    Input: [Raw]
           |    Properties:
           |      CustomCodePath: $w/block.scala
           |""".stripMargin
      Lift.lift(s, yaml).getDf("Agg")
    }),

    // stream_json source → stream_delta sink with Trigger.AvailableNow and
    // checkpointing (reference load/entrypoint.py:239-262, write/entrypoint
    // .py:296-321)
    "l_stream_json" -> ((s, d) => {
      val w = scratch(s, "l_stream_json")
      val docs = Tables.documents(s, d).select("doc_id", "lang", "source")
      docs.write.json(s"$w/in")
      FsUtils.writeText(s, s"$w/schema.json", docs.schema.json)
      val yaml =
        s"""LiftJob:
           |  Stream:
           |    Type: load::stream_json
           |    Properties:
           |      Path: $w/in
           |      SchemaPath: $w/schema.json
           |  Sink:
           |    Type: write::stream_delta
           |    Input: Stream
           |    Properties:
           |      Path: $w/out
           |      OutputMode: append
           |""".stripMargin
      Lift.lift(s, yaml)
      s.read.parquet(s"$w/out/data")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "l_lift_csv" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
        |WHERE c_mktsegment = 'BUILDING'""".stripMargin,
    "l_lift_json" ->
      "SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 25",
    "l_lift_xml" ->
      "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    "l_lift_sql_join" ->
      """SELECT n_name, count(*) AS n_suppliers, round(sum(s_acctbal), 2) AS total_bal
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,
    "l_table_upsert" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 4 = 0 AND o_orderkey % 8 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice + 10, 2) AS price
        |FROM orders WHERE o_orderkey % 8 = 0""".stripMargin,
    "l_table_delete" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 10 <> 0""".stripMargin,
    // base %3, dv-delete %9, dv-update %6 → +5, dv-upsert %12 → orig-1
    // (the upsert also RE-INSERTS %36 keys the delete vectored out —
    // mergeVectorized appends the whole batch, matched or not)
    "l_table_dv" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 3 = 0),
        |afterdel AS (SELECT * FROM base WHERE o_orderkey % 9 <> 0),
        |afterupd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CASE WHEN o_orderkey % 6 = 0 THEN round(price + 5, 2)
        |              ELSE price END AS price
        |  FROM afterdel)
        |SELECT o_orderkey, o_orderstatus, price FROM afterupd
        |WHERE o_orderkey % 12 <> 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice - 1, 2) AS price
        |FROM orders WHERE o_orderkey % 12 = 0""".stripMargin,
    "l_sql_native_fns" ->
      """WITH t AS (SELECT doc_id,
        |  list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
        |              w -> len(w) > 0) AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |  CASE WHEN len(toks) < 3 THEN 0
        |       ELSE len(list_distinct(list_transform(range(1, len(toks) - 1),
        |              i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) END
        |  AS n_shingles FROM t),
        |hh AS (SELECT doc_id, list_transform(toks,
        |         w -> CAST('0x' || substr(md5(w), 1, 15) AS BIGINT)) AS hs FROM t),
        |sig AS (SELECT doc_id, CAST(list_sum(list_transform(range(0, 60), j ->
        |  CASE WHEN 2 * len(list_filter(hs, x -> ((x >> j) & 1) = 1)) > len(hs)
        |       THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sig
        |  FROM hh)
        |SELECT sh.doc_id, CAST(n_shingles AS INT) AS n_shingles, sig
        |FROM sh JOIN sig ON sh.doc_id = sig.doc_id""".stripMargin,
    "l_table_cdc" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 18 = 0 AND o_orderkey % 27 <> 0
        |       THEN round(round(o_totalprice, 2) + 50, 2)
        |       ELSE round(o_totalprice, 2) END AS price
        |FROM orders
        |WHERE (o_orderkey % 9 = 0 AND o_orderkey % 27 <> 0)
        |   OR o_orderkey % 9 = 1""".stripMargin,
    "l_table_cdc_ts" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 11 IN (1, 2)""".stripMargin,
    "l_table_update" ->
      """SELECT o_orderkey, o_orderstatus,
        |  CASE WHEN o_orderstatus = 'F'
        |       THEN round(round(o_totalprice, 2) + 100, 2)
        |       ELSE round(o_totalprice, 2) END AS price
        |FROM orders WHERE o_orderkey % 7 = 0""".stripMargin,
    "l_table_replace" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 7 = 0 AND o_orderstatus <> 'O'
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) - 1.0 AS price
        |FROM orders
        |WHERE o_orderkey % 7 = 0 AND o_orderstatus = 'O' AND o_orderkey % 2 = 0""".stripMargin,
    "l_table_compact" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 10 IN (0, 1, 2)""".stripMargin,
    "l_table_history" ->
      """SELECT * FROM (VALUES
        |  (CAST(0 AS BIGINT), 'write',  CAST(1 AS BIGINT)),
        |  (1, 'append', 2),
        |  (2, 'merge',  1),
        |  (3, 'delete', 1))
        |AS t(version, operation, num_entries)""".stripMargin,
    "l_table_bucket" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |  FROM orders WHERE o_orderkey % 5 IN (0, 1)),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         round(round(o_totalprice, 2) + 50, 2) AS price
        |  FROM orders WHERE o_orderkey % 10 IN (0, 3)),
        |merged AS (
        |  SELECT * FROM base
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL SELECT * FROM upd)
        |SELECT * FROM merged
        |UNION ALL
        |SELECT * FROM merged
        |WHERE o_orderkey = (SELECT min(o_orderkey) FROM merged)""".stripMargin,
    "l_table_restore" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 12 = 0""".stripMargin,
    "l_table_zorder" ->
      """SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
        |FROM orders WHERE round(o_totalprice, 2) >= 100000.0
        |AND round(o_totalprice, 2) < 120000.0""".stripMargin,
    "l_table_zorder_inc" ->
      """SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
        |FROM orders WHERE round(o_totalprice, 2) >= 100000.0
        |AND round(o_totalprice, 2) < 120000.0""".stripMargin,
    "l_table_skipping" ->
      """SELECT o_orderkey, o_orderdate, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |AND o_orderdate < TIMESTAMP '1995-07-01 00:00:00'""".stripMargin,
    "l_table_skipping_str" ->
      """SELECT concat('ORD', lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) AS okey,
        |round(o_totalprice, 2) AS price
        |FROM orders
        |WHERE concat('ORD', lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) >= 'ORD0000000100'
        |AND concat('ORD', lpad(CAST(o_orderkey AS VARCHAR), 10, '0')) < 'ORD0000001000'""".stripMargin,
    "l_table_timetravel" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS price, CAST(0 AS BIGINT) AS version
        |FROM orders WHERE o_orderkey % 6 = 0
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice, 2) AS price, 1 AS version
        |FROM orders WHERE o_orderkey % 6 = 0 AND o_orderkey % 12 <> 0
        |UNION ALL
        |SELECT o_orderkey, round(o_totalprice + 7, 2) AS price, 1 AS version
        |FROM orders WHERE o_orderkey % 12 = 0""".stripMargin,
    "l_table_schema_drift" ->
      """SELECT o_orderkey, o_orderstatus, CAST(NULL AS DOUBLE) AS price
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin,
    "l_table_rename" ->
      """SELECT o_orderkey, round(o_totalprice, 2) AS amount
        |FROM orders WHERE o_orderkey % 5 IN (0, 1)""".stripMargin,
    "l_registry_fullscan" ->
      """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
        |WHERE l_linenumber = 1""".stripMargin,
    "l_registry_dateprefix" ->
      """SELECT o_orderkey, o_orderstatus, o_orderpriority FROM orders
        |WHERE o_orderkey % 16 = 0""".stripMargin,
    "l_jdbc_roundtrip" ->
      """SELECT s_suppkey, s_name, round(s_acctbal, 2) AS bal FROM supplier
        |WHERE s_suppkey % 3 = 0""".stripMargin,
    "l_lift_orc" ->
      """SELECT c_custkey, c_name, c_nationkey, round(c_acctbal, 2) AS bal
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin,
    "l_jdbc_upsert" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 40 = 0 AND o_orderkey % 80 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
        |FROM orders WHERE o_orderkey % 80 = 0""".stripMargin,
    // seed (%40) -> DO UPDATE (%80 -> 'U', +5) -> DO NOTHING pass over %20
    // (new keys insert as 'X', existing rows stay untouched)
    "l_jdbc_upsert_pg" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 40 = 0 AND o_orderkey % 80 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
        |FROM orders WHERE o_orderkey % 80 = 0
        |UNION ALL
        |SELECT o_orderkey, 'X' AS o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 20 = 0 AND o_orderkey % 40 <> 0""".stripMargin,
    "l_jdbc_upsert_mysql" ->
      """SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS price
        |FROM orders WHERE o_orderkey % 40 = 0 AND o_orderkey % 80 <> 0
        |UNION ALL
        |SELECT o_orderkey, 'U' AS o_orderstatus, round(o_totalprice + 5, 2) AS price
        |FROM orders WHERE o_orderkey % 80 = 0""".stripMargin,
    "l_registry_deltadiff" ->
      """SELECT o_orderkey, o_orderstatus FROM orders
        |WHERE o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0""".stripMargin,
    "l_custom_codepath" ->
      """SELECT p_brand, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
        |FROM part GROUP BY p_brand""".stripMargin,
    "l_custom_function" ->
      """SELECT p_brand, count(*) AS n_expensive,
        |  round(avg(p_retailprice), 2) AS avg_price FROM part
        |WHERE p_retailprice > 910 GROUP BY p_brand""".stripMargin,
    "l_stream_json" ->
      "SELECT doc_id, lang, source FROM documents"
  )
}
