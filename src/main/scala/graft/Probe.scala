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
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(2000000).selectExpr("sum(id * 2)").head()

    import org.apache.spark.sql.functions._
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def cpuTime[T](label: String)(f: => T): T = {
      val c0 = osBean.getProcessCpuTime / 1e9; val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = osBean.getProcessCpuTime / 1e9 - c0
      println(f"[probe] $label: wall=$wall%.2fs cpu=$cpu%.1fs"); r
    }

    val e = graft.operators.Graph.edgesFor(spark, sfDir)
    val nE = cpuTime("edges build+count") { e.count() }
    println(s"[probe] edges: $nE, partitions: ${e.rdd.getNumPartitions}")
    for (r <- 1 to 3) {
      cpuTime(s"scan-only agg rep$r") {
        Bench.forceAll(e.agg(sum(col("w")), sum(col("wout")), sum(col("src")), sum(col("dst"))))
      }
      cpuTime(s"groupBy(src) agg rep$r (no exchange)") {
        Bench.forceAll(e.groupBy(col("src")).agg(sum(col("w"))))
      }
      cpuTime(s"groupBy(dst) agg rep$r") {
        Bench.forceAll(e.groupBy(col("dst")).agg(sum(col("w"))))
      }
      cpuTime(s"groupBy(dst) agg coalesce8 rep$r") {
        Bench.forceAll(e.coalesce(8).groupBy(col("dst")).agg(sum(col("w"))))
      }
    }
    // 8-partition edge variant: same loop, fewer partial-agg maps
    val e8 = {
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try { val x = e.repartition(8, col("src")).persist(); x.count(); x }
      finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
    val nodes8 = e8.select(col("src").as("node")).distinct().localCheckpoint()
    val n8 = nodes8.count()
    val tele8 = 1000000000000L * 3 / (20 * n8)
    var sc8 = nodes8.withColumn("score", lit(1000000000000L / n8))
    for (i <- 1 to 8) {
      val next = graft.operators.Graph.round(e8, sc8, tele8)
      cpuTime(s"e8 round $i") { Bench.forceAll(next) }
      if (i == 1) {
        val p = next.queryExecution.executedPlan.toString()
        println("[probe] e8 round-1: edge-side exchange above cache: " +
          p.split("InMemoryTableScan")(0).contains("Exchange hashpartitioning(src"))
        println(p.take(2500))
      }
      sc8 = if (i % 2 == 0) cpuTime(s"e8 ckpt $i") { next.localCheckpoint() } else next
    }
    val nodes2 = e.select(col("src").as("node")).distinct().localCheckpoint()
    val n = nodes2.count()
    println(s"[probe] nodes: $n")
    val tele = 1000000000000L * 3 / (20 * n)
    var scores = nodes2.withColumn("score", lit(1000000000000L / n))
    // time each round separately, print the first round's executed plan
    for (i <- 1 to 8) {
      val next = graft.operators.Graph.round(e, scores, tele)
      cpuTime(s"round $i (forceAll)") { Bench.forceAll(next) }
      if (i == 1) {
        println("[probe] round-1 executed plan:")
        println(next.queryExecution.executedPlan.toString().take(4000))
      }
      scores = if (i % 2 == 0) cpuTime(s"ckpt $i") { next.localCheckpoint() } else next
    }
    SessionCache.clear(spark)
    spark.stop()
  }
}
