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
    val docs = time("load documents") {
      val d = graft.Tables.load(spark, sfDir, "documents")
      d.count(); d
    }
    val sh = time("shingledDocs count") {
      graft.operators.TextAnalysis.shingledDocs(spark, sfDir).count()
    }
    println(s"[probe] shingled rows: $sh")
    time("signatures") {
      graft.operators.MinHash.signatures(
        graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
          .select(col("doc_id"), col("sh"))).count()
    }
    time("candidatePairs") {
      graft.operators.MinHash.candidatePairs(
        graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
          .select(col("doc_id"), col("sh"))).count()
    }
    val np = time("nearDupPairs (memoized build)") {
      graft.operators.MinHash.nearDupPairs(spark, sfDir).count()
    }
    println(s"[probe] pairs: $np")
    time("d10 full (warm pairs)") {
      Bench.forceAll(graft.operators.MinHash.nearDupClusters(spark, sfDir))
    }
    time("d10 again (warm labels)") {
      Bench.forceAll(graft.operators.MinHash.nearDupClusters(spark, sfDir))
    }
    time("d07 editDistanceVerify (cold prefixes)") {
      Bench.forceAll(graft.operators.MinHash.editDistanceVerify(spark, sfDir))
    }
    time("d07 again (warm)") {
      Bench.forceAll(graft.operators.MinHash.editDistanceVerify(spark, sfDir))
    }
    time("v09 pq rerank (cold)") {
      Bench.forceAll(graft.operators.VectorSearch.annRerankPq(spark, sfDir))
    }
    time("v09 again (warm)") {
      Bench.forceAll(graft.operators.VectorSearch.annRerankPq(spark, sfDir))
    }
    time("d09 simhash") {
      Bench.forceAll(graft.operators.TextAnalysis.simhashNearDup(spark, sfDir))
    }
    time("t03 langId") {
      Bench.forceAll(graft.operators.TextAnalysis.langId(spark, sfDir))
    }
    SessionCache.clear(spark)
    spark.stop()
  }
}
