package graft.transform

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.transform.Predicate.{Cmp, Logic}

/** Property test: an arbitrary predicate tree compiled to SQL selects the
  * same rows as the equivalent Column expression — the DSL compiler is the
  * one component where the engine implements a real compiler (SURVEY §5).
  * (Plain ScalaCheck generators with fixed seeds; the scalatest-scalacheck
  * bridge isn't on the classpath.)
  */
class PredicatePropertySpec extends SparkSuite {
  import spark.implicits._

  // fixed evaluation frame: int, double, string, nullable-string columns
  private lazy val frame = {
    val rows = for {
      i <- 0 until 60
    } yield (i, i * 1.5, s"s${i % 7}", if (i % 5 == 0) null else s"v${i % 3}")
    val df = rows.toDF("i", "d", "s", "ns")
    df.cache().count()
    df
  }

  private val leafGen: Gen[(Predicate, Column)] = Gen.oneOf(
    Gen.choose(0, 60).map(n =>
      (Cmp("i", "<", n), col("i") < n)),
    Gen.choose(0, 60).map(n =>
      (Cmp("i", ">=", n), col("i") >= n)),
    Gen.choose(0.0, 90.0).map(x =>
      (Cmp("d", "<=", x), col("d") <= x)),
    Gen.choose(0, 6).map(k =>
      (Cmp("s", "==", s"s$k"), col("s") === s"s$k")),
    Gen.choose(0, 6).map(k =>
      (Cmp("s", "!=", s"s$k"), col("s") =!= s"s$k")),
    Gen.const((Cmp("ns", "==", "null"), col("ns").isNull)),
    Gen.const((Cmp("ns", "!=", "null"), col("ns").isNotNull)),
    Gen.nonEmptyListOf(Gen.choose(0, 6).map(k => s"s$k")).map { ks =>
      (Cmp("s", "in", ks.distinct), col("s").isin(ks.distinct: _*))
    })

  private def treeGen(depth: Int): Gen[(Predicate, Column)] =
    if (depth <= 0) leafGen
    else Gen.frequency(
      2 -> leafGen,
      3 -> (for {
        op <- Gen.oneOf("and", "or")
        (lp, lc) <- treeGen(depth - 1)
        (rp, rc) <- treeGen(depth - 1)
      } yield (
        Logic(lp, op, rp),
        if (op == "and") lc && rc else lc || rc)))

  test("compiled SQL filter selects exactly the Column-built rows") {
    val gen = treeGen(3)
    (0 until 60).foreach { i =>
      val (pred, expected) =
        gen.pureApply(Gen.Parameters.default, Seed(42L + i))
      val viaDsl = frame.where(PredicateDsl.toSql(pred))
        .select("i").as[Int].collect().sorted.toSeq
      val viaColumn = frame.where(expected)
        .select("i").as[Int].collect().sorted.toSeq
      assert(viaDsl === viaColumn, s"for SQL: ${PredicateDsl.toSql(pred)}")
    }
  }
}
