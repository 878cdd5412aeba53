package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the shipped API): times the stages
  * of a slow query separately so the bottleneck is measured, not
  * guessed. Run: `runMain graft.Probe <sfDir>`.
  */
object Probe {
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").head()

    import org.apache.spark.sql.functions._
    // Cardinalities that size the shared-pair-stats design for the
    // d02/d25/d29 inverted-index family and the d08/d28 df-cap family.
    val sh = time("shingledDocs build+count") {
      graft.operators.TextAnalysis.shingledDocs(spark, sfDir).count()
    }
    println(s"[probe] shingled docs: $sh")
    val shingled = graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
    val all = shingled
      .withColumn("n_sh", size(col("sh")))
      .select(col("lang"), col("doc_id"), col("n_sh"),
        explode(col("sh")).as("shingle"))
    val nPosts = time("postings count") { all.count() }
    println(s"[probe] postings: $nPosts")
    val df = all.groupBy(col("lang"), col("shingle"))
      .agg(count(lit(1)).as("df"))
    val nShingles = time("distinct (lang,shingle)") { df.count() }
    println(s"[probe] distinct shingles: $nShingles")
    val hot3 = time("df>3 count") { df.filter(col("df") > 3).count() }
    val hot4 = time("df>4 count") { df.filter(col("df") > 4).count() }
    println(s"[probe] hot shingles df>3: $hot3  df>4: $hot4")
    val pairStats = all.as("a").join(all.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id"), col("b.doc_id"), col("a.n_sh"), col("b.n_sh"))
      .agg(count(lit(1)).as("n_inter"))
    val nPairs = time("uncapped pair-stats rows") { pairStats.count() }
    println(s"[probe] uncapped co-occurring pairs: $nPairs")
    SessionCache.clear(spark)
    spark.stop()
  }
}
