package graft

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench for perf iteration:
  * `runMain graft.Micro <queryName> [sfDir] [reps]`.
  *
  * Same session config as [[Bench]] so numbers are comparable; prints
  * one line per rep plus the min, which is the stable figure to compare
  * across code changes (first rep absorbs JIT + file-listing noise).
  */
object Micro {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(sys.error("usage: Micro <queryName> [sfDir] [reps]"))
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
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
    val fn = SparkEntry.queries(name)
    val times = (1 to reps).map { i =>
      val t0 = System.nanoTime()
      Bench.forceAll(fn(spark, sfDir))
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[micro] $name rep$i: $s%.3f s")
      s
    }
    println(f"[micro] $name min: ${times.min}%.3f s over $reps reps")
    SessionCache.clear(spark)
    spark.stop()
  }
}
