package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.transform.Predicate.{Cmp, Logic}
import graft.transform.Transforms
import graft.transform.Transforms.SelectCol

/** Correctness queries exercising every §2.2 transform operator over the
  * driver's testdata, each with a DuckDB oracle. Names are stable — the
  * driver hashes (sorted columns, values) per query.
  */
object TransformQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_select_cast" -> ((s, d) =>
      Transforms.select(
        Tables.lineitem(s, d),
        Seq(
          SelectCol("l_orderkey"),
          SelectCol("l_linenumber"),
          SelectCol("l_quantity", alias = Some("qty"), cast = Some("int")),
          SelectCol("note", addNewColumn = true, cast = Some("string"))))),

    "t_where_and" -> ((s, d) =>
      Transforms.where(
        Tables.lineitem(s, d)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
        Logic(Cmp("l_returnflag", "==", "R"), "and", Cmp("l_quantity", "<", 10)))),

    "t_where_in" -> ((s, d) =>
      Transforms.where(
        Tables.orders(s, d).select("o_orderkey", "o_orderpriority"),
        Cmp("o_orderpriority", "in", Seq("1-URGENT", "2-HIGH")))),

    "t_where_null" -> ((s, d) => {
      // get_json_object of a missing key yields null → exercises the DSL's
      // null-literal branch on a real null column.
      val withK = Transforms.getJsonObject(
        Tables.events(s, d).select("event_id", "props"), "props", "k_missing", "nope")
      Transforms.where(withK, Cmp("k_missing", "==", "null"))
        .select("event_id")
    }),

    "t_get_json_object" -> ((s, d) =>
      Transforms.getJsonObject(
        Tables.events(s, d).select("event_id", "props"), "props", "k", "k")
        .select("event_id", "k")),

    "t_explode_split" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("doc_id", "text")
      val tok = Transforms.split(docs, "text", "tokens", " ")
      Transforms.explode(tok, "tokens", Some("token")).select("doc_id", "token")
    }),

    "t_get_item" -> ((s, d) => {
      val c = Tables.customer(s, d).select("c_custkey", "c_name")
      val sp = Transforms.split(c, "c_name", "parts", "#")
      Transforms.getItem(sp, "parts", "cust_num", 1).select("c_custkey", "cust_num")
    }),

    "t_substring" -> ((s, d) =>
      Transforms.substring(
        Tables.part(s, d).select("p_partkey", "p_name"), "p_name", "p_prefix", 1, 5)),

    "t_concat" -> ((s, d) =>
      Transforms.concat(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment", "c_name"),
        Seq("c_mktsegment", "c_name"), "seg_name", "_")
        .select("c_custkey", "seg_name")),

    "t_rename_join" -> ((s, d) => {
      val o = Transforms.renameColumn(
        Tables.orders(s, d).select("o_orderkey", "o_custkey", "o_totalprice"),
        "o_custkey", "custkey")
      val c = Transforms.renameColumn(
        Tables.customer(s, d).select("c_custkey", "c_name", "c_acctbal"),
        "c_custkey", "custkey")
      // dimension side is small at every SF relative to orders → broadcast
      Transforms.join(o, broadcast(c), Seq("custkey"), "left")
    }),

    "t_union" -> ((s, d) => {
      val p = Tables.part(s, d).select("p_partkey", "p_name", "p_size")
      Transforms.union(
        Transforms.where(p, Cmp("p_size", "<", 10)),
        Transforms.where(p, Cmp("p_size", ">", 40)))
    }),

    "t_filter_inverse" -> ((s, d) =>
      Transforms.filterDataframe(
        Tables.nation(s, d), Cmp("n_regionkey", "==", 0))),

    "t_cast_column" -> ((s, d) =>
      Transforms.castColumn(
        Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_tax"),
        "l_tax", "string")),

    "t_dedup_subset" -> ((s, d) =>
      Transforms.dropDuplicates(
        Tables.lineitem(s, d).select("l_returnflag", "l_linestatus"),
        Seq("l_returnflag", "l_linestatus"))),

    "t_dedup_full" -> ((s, d) =>
      Transforms.dropDuplicates(
        Tables.orders(s, d).select("o_orderstatus", "o_orderpriority"))),

    "t_dates" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_orderkey", "o_orderdate")
      val y = Transforms.yearCol(o, "o_orderdate", "o_year")
      val m = Transforms.monthCol(y, "o_orderdate", "o_month")
      val dd = Transforms.dayofmonthCol(m, "o_orderdate", "o_day")
      Transforms.dateCol(dd, "o_orderdate", "o_date").drop("o_orderdate")
    }),

    "t_unixtime" -> ((s, d) => {
      // the reference's odd `sss` pattern needs the LEGACY parser policy,
      // exactly as its test session sets (reference tests/conftest.py:59)
      s.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
      Transforms.unixtimeToUtcz(
        Tables.events(s, d).select("event_id"), "event_id", "utc_ts")
    })
  )

  val oracleSql: Map[String, String] = Map(
    "t_select_cast" ->
      """SELECT l_orderkey, l_linenumber, CAST(l_quantity AS INT) AS qty,
        |CAST(NULL AS VARCHAR) AS note FROM lineitem""".stripMargin,
    "t_where_and" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_quantity < 10""".stripMargin,
    "t_where_in" ->
      """SELECT o_orderkey, o_orderpriority FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')""".stripMargin,
    "t_where_null" ->
      "SELECT event_id FROM events WHERE json_extract_string(props, '$.nope') IS NULL",
    "t_get_json_object" ->
      "SELECT event_id, json_extract_string(props, '$.k') AS k FROM events",
    "t_explode_split" ->
      "SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents",
    "t_get_item" ->
      "SELECT c_custkey, string_split(c_name, '#')[2] AS cust_num FROM customer",
    "t_substring" ->
      "SELECT p_partkey, p_name, substring(p_name, 1, 5) AS p_prefix FROM part",
    "t_concat" ->
      "SELECT c_custkey, c_mktsegment || '_' || c_name AS seg_name FROM customer",
    "t_rename_join" ->
      """SELECT o.o_orderkey, o.o_custkey AS custkey, o.o_totalprice, c.c_name, c.c_acctbal
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""".stripMargin,
    "t_union" ->
      """SELECT p_partkey, p_name, p_size FROM part WHERE p_size < 10
        |UNION ALL
        |SELECT p_partkey, p_name, p_size FROM part WHERE p_size > 40""".stripMargin,
    "t_filter_inverse" ->
      "SELECT * FROM nation EXCEPT SELECT * FROM nation WHERE n_regionkey = 0",
    "t_cast_column" ->
      "SELECT l_orderkey, l_linenumber, CAST(l_tax AS VARCHAR) AS l_tax FROM lineitem",
    "t_dedup_subset" ->
      "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    "t_dedup_full" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
    "t_dates" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS VARCHAR) AS o_year,
        |CAST(month(o_orderdate) AS VARCHAR) AS o_month,
        |CAST(dayofmonth(o_orderdate) AS VARCHAR) AS o_day,
        |CAST(o_orderdate AS DATE) AS o_date FROM orders""".stripMargin,
    "t_unixtime" ->
      """SELECT event_id, strftime(to_timestamp(event_id), '%Y-%m-%dT%H:%M:0%S+0000') AS utc_ts
        |FROM events""".stripMargin
  )
}
