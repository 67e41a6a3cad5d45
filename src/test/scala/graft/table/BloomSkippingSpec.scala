package graft.table

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Bloom-filter file skipping (Delta's bloom filter index over plain
  * parquet): per-file filters prune equality/IN point lookups that min/max
  * stats cannot, because unclustered high-cardinality columns give every
  * file an overlapping [min,max] range. The fixture forces exactly that:
  * two files whose id ranges fully interleave (evens / odds) so range
  * stats keep both and only the bloom distinguishes them. */
class BloomSkippingSpec extends SparkSuite {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-bloom").toString

  /** Table of ids 0..199 in two fully range-overlapping files:
    * one holds the evens, the other the odds. */
  private def interleavedTable(): ManagedTable = {
    val t = ManagedTable(spark, tmp() + "/t")
    val df = (0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, col("id") % 2)
    t.write(df)
    t.collectStats()
    t.collectBlooms(Seq("id"), itemsPerFile = 1000)
    t
  }

  test("equality lookup reads only the file whose bloom can match") {
    val t = interleavedTable()
    // range stats alone keep both files (min/max interleave); the bloom
    // proves the odd file cannot hold an even id
    assert(t.pruneInfo("id = 4") === ((1L, 2L)))
    assert(t.pruneInfo("id = 5") === ((1L, 2L)))
    assert(t.readWhere("id = 4").as[(Long, String)].collect().toSeq
      === Seq((4L, "v4")))
  }

  test("int literal against a long column still hash-matches") {
    val t = interleavedTable()
    // `id = 4` parses an INT literal; the bloom hashed LONGs — the keep
    // predicate must cast before hashing or every lookup would prune to 0
    // files and readWhere would silently return nothing
    assert(t.readWhere("id = 198").count() === 1)
    assert(t.pruneInfo("id = 198")._1 === 1L)
  }

  test("IN list spanning both parities keeps both files") {
    val t = interleavedTable()
    assert(t.pruneInfo("id IN (4, 5)") === ((2L, 2L)))
    assert(t.pruneInfo("id IN (4, 6)") === ((1L, 2L)))
    assert(t.readWhere("id IN (4, 5)").count() === 2)
  }

  test("an id in neither file prunes everything yet stays correct") {
    val t = interleavedTable()
    assert(t.readWhere("id = 5000").count() === 0)
  }

  test("non-equality and unbloomed conjuncts never bloom-prune") {
    val t = interleavedTable()
    // range conjunct on the bloomed column: bloom skips it, stats prune
    assert(t.pruneInfo("id < 1000")._1 === 2L)
    // equality on an UNbloomed column: no bloom pruning, still correct
    assert(t.readWhere("v = 'v7'").count() === 1)
    // conjunction: the bloomable equality still prunes
    assert(t.pruneInfo("id = 4 AND v = 'v4'")._1 === 1L)
  }

  test("files appended after collection are never pruned") {
    val t = interleavedTable()
    t.append(Seq((1001L, "late")).toDF("id", "v"))
    // new dir has no bloom sidecar → its files all survive
    assert(t.readWhere("id = 1001").as[(Long, String)].collect().toSeq
      === Seq((1001L, "late")))
    // old dirs still bloom-prune
    assert(t.readWhere("id = 4").count() === 1)
  }

  test("blooms compose with deletion vectors") {
    val t = interleavedTable()
    t.deleteVectorized("id = 4")
    assert(t.readWhere("id = 4").count() === 0)
    assert(t.readWhere("id = 6").count() === 1)
  }

  test("bloom-ONLY tables prune point lookups without any stats sidecar") {
    // collectBlooms and collectStats are independent APIs; a table with
    // only blooms must still skip, with the dir listing as the file list
    val t = ManagedTable(spark, tmp() + "/t")
    t.write((0 until 200).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartitionByRange(2, col("id") % 2))
    t.collectBlooms(Seq("id"), itemsPerFile = 1000)
    assert(t.pruneInfo("id = 4") === ((1L, 2L)), "bloom-only must prune")
    assert(t.readWhere("id = 4").as[(Long, String)].collect().toSeq
      === Seq((4L, "v4")))
    // non-equality predicates leave a bloom-only table unprunable but read
    // correctly through the full-dir path
    assert(t.readWhere("id >= 198").count() === 2)
    assert(t.pruneInfo("id >= 198") === ((2L, 2L)))
  }
}
