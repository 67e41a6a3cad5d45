package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch profiler for the x_dedup_prefix / x_dedup_simhash cpu audit
  * (round 9): times each sub-pipeline of prefixJaccardPairs in isolation
  * and prints (wall, jvm-cpu) per piece, so the 50 cpu-seconds the full
  * query costs can be attributed to a stage instead of guessed at.
  * Run: sbt "Test/runMain graft.tools.ProfilePrefix /root/testdata/sf0.1"
  */
object ProfilePrefix {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val c0 = osBean.getProcessCpuTime
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      val dc = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[prof] $name%-28s $dt%7.2fs cpu=$dc%6.1fs")
      r
    }
    import graft.ops.Dedup
    val docs = graft.Tables.documents(spark, sfDir)
    // warm up whole pipeline once (JIT + codegen)
    time("warm full query")(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.6).count())
    time("full query (warm)")(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.6).count())

    // piecewise
    import org.apache.spark.sql.expressions.Window
    val withSh = docs
      .repartition(spark.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .where(size(col("sh")) > 0)
      .persist()
    time("shingle+persist")(withSh.count())
    val ex = withSh.select(col("id"), size(col("sh")).as("sz"),
      explode(col("sh")).as("shingle"))
    time("explode count")(ex.count())
    val dfreq = ex.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    time("dfreq")(dfreq.count())
    val byRarity = Window.partitionBy(col("id")).orderBy(col("df"), col("shingle"))
    val threshold = 0.6
    val prefix = ex.join(dfreq, "shingle")
      .withColumn("pos", row_number().over(byRarity))
      .where(col("pos") <=
        col("sz") - ceil(lit(threshold) * col("sz")).cast("int") + 1)
      .select(col("id"), col("sz"), col("pos"), col("shingle"))
      .persist()
    time("prefix build+persist")(prefix.count())
    val cand = prefix.alias("l")
      .join(prefix.alias("r"),
        col("l.shingle") === col("r.shingle") && col("l.id") < col("r.id") &&
          col("r.sz") >= ceil(lit(threshold) * col("l.sz")) &&
          col("l.sz") >= ceil(lit(threshold) * col("r.sz")) &&
          (lit(1) + least(col("l.sz") - col("l.pos"),
            col("r.sz") - col("r.pos"))) >=
            ceil(lit(threshold / (1.0 + threshold)) *
              (col("l.sz") + col("r.sz"))))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    time("candidate join")(cand.count())
    val verified = cand
      .join(withSh.select(col("id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(withSh.select(col("id").as("id_b"), col("sh").as("sh_b")), "id_b")
      .select(col("id_a"), col("id_b"),
        round(Dedup.jaccard(col("sh_a"), col("sh_b")), 4).as("jaccard"))
      .where(col("jaccard") >= threshold)
    time("verify join")(verified.count())
    time("full again")(Dedup.prefixJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.6).count())
    // simhash for comparison
    time("simhash warm")(Dedup.simhashPairs(docs, "doc_id", "text",
      maxDistance = 3).count())
    time("simhash again")(Dedup.simhashPairs(docs, "doc_id", "text",
      maxDistance = 3).count())
    spark.stop()
  }
}
