package graft.transform

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSuite
import Predicate._

class TransformsSpec extends SparkSuite {

  private lazy val princesses = {
    val schema = StructType(Seq(
      StructField("name", StringType),
      StructField("age", LongType),
      StructField("happy", BooleanType),
      StructField("items", StructType(Seq(
        StructField("weakness", StringType),
        StructField("father-status", StringType))))))
    spark.createDataFrame(
      java.util.Arrays.asList(
        Row("Cinderella", 22L, true, Row("shoe", "dead")),
        Row("Snow white", 17L, false, Row("apple", "alive")),
        Row("Belle", 23L, true, Row("beast", "alive")),
        Row("Jasmine", null, true, Row("tiger", "dead"))),
      schema)
  }

  test("where: comparisons, null semantics, IN, nesting, hyphen escape") {
    assert(Transforms.where(princesses, Cmp("age", ">", 20)).count() === 2)
    assert(Transforms.where(princesses, Cmp("age", "==", "null")).count() === 1)
    assert(Transforms.where(princesses, Cmp("age", "!=", "null")).count() === 3)
    assert(Transforms.where(princesses, Cmp("name", "like", "%ell%")).count() === 2)
    assert(Transforms.where(princesses, Cmp("name", "in", Seq("Belle", "Jasmine"))).count() === 2)
    assert(Transforms.where(princesses, Cmp("happy", "==", true)).count() === 3)
    assert(Transforms.where(princesses,
      Logic(Cmp("happy", "==", true), "and", Cmp("age", "<", 23))).count() === 1)
    assert(Transforms.where(princesses,
      Cmp("items.father-status", "==", "dead")).count() === 2)
  }

  test("filter_dataframe is the set complement (except semantics)") {
    val out = Transforms.filterDataframe(princesses, Cmp("happy", "==", true))
    assert(out.collect().map(_.getString(0)).toSet === Set("Snow white"))
  }

  test("select: alias, cast, add_new_column defaults") {
    val out = Transforms.select(princesses, Seq(
      Transforms.SelectCol("name"),
      Transforms.SelectCol("age", alias = Some("years"), cast = Some("int")),
      Transforms.SelectCol("missing", addNewColumn = true, cast = Some("string")),
      Transforms.SelectCol("tags", addNewColumn = true, defaultValue = Some("array()"))))
    assert(out.columns.toSeq === Seq("name", "years", "missing", "tags"))
    assert(out.schema("years").dataType === IntegerType)
    assert(out.schema("tags").dataType === ArrayType(StringType))
    assertThrows[IllegalArgumentException](
      Transforms.select(princesses, Seq(Transforms.SelectCol("nope"))))
    assertThrows[IllegalArgumentException](
      Transforms.select(princesses, Seq(
        Transforms.SelectCol("items.weakness", cast = Some("string")))))
  }

  test("concat is null-propagating (reference uses concat, not concat_ws)") {
    val out = Transforms.concat(princesses, Seq("name", "age"), "key", "-")
    val rows = out.select("key").collect().map(_.getString(0))
    assert(rows.contains("Cinderella-22"))
    assert(rows.contains(null)) // Jasmine's null age nulls the concat
  }

  test("drop_duplicates subset mode uses the concat_ws temp-key trick") {
    import spark.implicits._
    val df = Seq(("a-b", "c"), ("a", "b-c"), ("a-b", "c")).toDF("x", "y")
    // "a-b"+"c" and "a"+"b-c" both key as "a-b-c" → collide (reference quirk)
    assert(Transforms.dropDuplicates(df, Seq("x", "y")).count() === 1)
    assert(Transforms.dropDuplicates(df).count() === 2)
  }

  test("split / get_item / explode / substring / rename / cast / json") {
    import spark.implicits._
    val df = Seq((1, "a b c", """{"k": 7}""")).toDF("id", "s", "j")
    val sp = Transforms.split(df, "s", "arr", " ")
    assert(Transforms.getItem(sp, "arr", "second", 1).select("second").head().getString(0) === "b")
    assert(Transforms.explode(sp, "arr", Some("tok")).count() === 3)
    assert(Transforms.substring(df, "s", "pre", 1, 3).select("pre").head().getString(0) === "a b")
    assert(Transforms.renameColumn(df, "s", "str").columns.contains("str"))
    assert(Transforms.castColumn(df, "id", "string").schema("id").dataType === StringType)
    assert(Transforms.getJsonObject(df, "j", "k", "k").select("k").head().getString(0) === "7")
    assertThrows[IllegalArgumentException](Transforms.renameColumn(df, "zzz", "w"))
  }

  test("union is positional; join is USING-style") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "v")
    val b = Seq((2, "y")).toDF("id", "v")
    assert(Transforms.union(a, b).count() === 2)
    val c = Seq((1, "z")).toDF("id", "w")
    val j = Transforms.join(a, c, Seq("id"), "left")
    assert(j.columns.toSeq === Seq("id", "v", "w"))
  }

  test("date helpers: string-typed year/month/day, date cast, unixtime format") {
    import spark.implicits._
    spark.conf.set("spark.sql.legacy.timeParserPolicy", "LEGACY")
    val df = Seq((1, "2021-03-09 04:05:06", 1700000000L)).toDF("id", "ts", "unix")
      .selectExpr("id", "cast(ts as timestamp) as ts", "unix")
    val y = Transforms.yearCol(df, "ts", "y")
    assert(y.schema("y").dataType === StringType)
    assert(y.select("y").head().getString(0) === "2021")
    assert(Transforms.monthCol(df, "ts", "m").select("m").head().getString(0) === "3")
    assert(Transforms.dayofmonthCol(df, "ts", "d").select("d").head().getString(0) === "9")
    assert(Transforms.dateCol(df, "ts", "dt").schema("dt").dataType === DateType)
    val u = Transforms.unixtimeToUtcz(df, "unix", "utc").select("utc").head().getString(0)
    assert(u === "2023-11-14T22:13:020+0000")
  }
}
