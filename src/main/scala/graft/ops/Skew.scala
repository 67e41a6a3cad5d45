package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation shapes for hot keys at cluster scale.
  *
  * AQE's runtime skew-join splitting (`spark.sql.adaptive.skewJoin`)
  * handles most cases for free; these are the explicit forms for the two
  * places AQE cannot help: a skewed *aggregation* (one reducer key gets a
  * whole task's worth of rows) and a broadcast-ineligible join against a
  * replicable side. Both trade one extra narrow stage for bounding the
  * largest reducer partition by `saltBuckets`.
  */
object Skew {

  /** Two-phase aggregation with a salted first phase: rows fan out over
    * `saltBuckets` sub-keys, partial aggregates shuffle per (key, salt),
    * and a second tiny shuffle folds the partials per key. The hot key's
    * rows land on `saltBuckets` reducers instead of one.
    *
    * `partials` maps output column name → (partial aggregate of the input
    * rows, final fold of the partial column). The caller supplies both
    * halves because only algebraic aggregates decompose this way, e.g.
    * count → (count, sum), sum → (sum, sum), max → (max, max).
    */
  def saltedAgg(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                partials: Map[String, (Column, Column)]): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be positive, got $saltBuckets")
    require(partials.nonEmpty, "at least one aggregate required")
    val salted = df.withColumn("__salt", rowSalt(df, saltBuckets))
    val ps = partials.toSeq.sortBy(_._1) // stable column order
    val phase1 = salted
      .groupBy((keyCols :+ "__salt").map(col): _*)
      .agg(ps.head._2._1.as(ps.head._1),
        ps.tail.map { case (n, (p, _)) => p.as(n) }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(ps.head._2._2.as(ps.head._1),
        ps.tail.map { case (n, (_, f)) => f.as(n) }: _*)
  }

  /** Salted equi-join: the skewed left side gets a random-but-deterministic
    * salt in [0, saltBuckets); the right side is replicated once per salt
    * value. The shuffle key becomes (key, salt), so a hot key spreads over
    * `saltBuckets` tasks at the cost of a `saltBuckets`-fold right-side
    * blowup — only sensible when the right side is small-ish but above the
    * broadcast threshold. Plain inner-join semantics are preserved.
    */
  def saltedJoin(skewedLeft: DataFrame, right: DataFrame,
                 joinKeys: Seq[String], saltBuckets: Int): DataFrame = {
    require(saltBuckets >= 1, s"saltBuckets must be positive, got $saltBuckets")
    val l = skewedLeft.withColumn("__salt", rowSalt(skewedLeft, saltBuckets))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    l.join(r, joinKeys :+ "__salt").drop("__salt")
  }

  /** Per-row salt in [0, buckets) from (input partition id, row content).
    *
    * The salt feeds a shuffle key, so it must be RETRY-DETERMINISTIC: a
    * partial stage recompute after a fetch failure must assign each row
    * the salt the already-fetched partitions saw, or join/agg results
    * silently lose and duplicate rows (the classic repartition-by-rand
    * hazard — position-based salts like monotonically_increasing_id
    * break exactly here, because recomputed shuffle partitions can
    * iterate rows in a different ORDER). hash(partitionId, content) is
    * order-independent, and partition membership is stable across
    * retries for both file scans and hash-partitioned exchanges, so a
    * recomputed row always re-derives the same salt.
    *
    * Spreading: byte-identical duplicates co-resident in one input
    * partition share a salt, but a key hot enough to need salting spans
    * many input splits by definition (one split is ~128 MB), so its rows
    * still fan out over ~buckets reducers; content differences spread
    * within a partition too. Round-robin repartitioning upstream of this
    * call is the one layout that breaks retry-stability — callers get
    * deterministic inputs from scans and hash shuffles, which is what
    * saltedAgg/saltedJoin are documented for. */
  private def rowSalt(df: DataFrame, buckets: Int): Column = {
    // df(name) references columns LITERALLY (col("a.b") would parse as a
    // struct-field path); map-typed columns are skipped because hash()
    // rejects MapType anywhere in its inputs — partition id plus the
    // remaining columns still salt deterministically
    def hashable(t: org.apache.spark.sql.types.DataType): Boolean = t match {
      case _: org.apache.spark.sql.types.MapType => false
      case a: org.apache.spark.sql.types.ArrayType => hashable(a.elementType)
      case st: org.apache.spark.sql.types.StructType => st.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.filter(f => hashable(f.dataType)).map(f => df(f.name))
    pmod(hash(spark_partition_id() +: cols.toIndexedSeq: _*), lit(buckets))
  }
}
