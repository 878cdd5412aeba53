package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the shipped API): times the stages
  * of a slow query separately so the bottleneck is measured, not
  * guessed. Run: `runMain graft.Probe <sfDir>`.
  */
object Probe {
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

    // warm the shingle tier first (attributed separately)
    cpuTime("shingledDocs") {
      graft.operators.TextAnalysis.shingledDocs(spark, sfDir).count()
    }
    // rebuild the fused capped pair stats WITHOUT the memo so we can
    // inspect the executed plan of the build itself
    val shingled = graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
    val loose = 4; val tight = 3
    val docs = shingled.withColumn("n_sh", size(col("sh")))
    val all = docs.select(col("lang"), col("doc_id"), col("n_sh"),
      explode(col("sh")).as("shingle"))
    val dfAgg = cpuTime("dfAgg build (ckpt)") {
      all.groupBy(col("lang"), col("shingle"))
        .agg(count(lit(1)).as("df"))
        .filter(col("df") > tight)
        .localCheckpoint()
    }
    val kept = all.join(
      broadcast(dfAgg.filter(col("df") > loose).select(col("lang"), col("shingle"))),
      Seq("lang", "shingle"), "left_anti")
    val mid = dfAgg.filter(col("df") <= loose)
      .select(col("lang"), col("shingle"), lit(false).as("lowdf"))
    val posts = kept.join(broadcast(mid), Seq("lang", "shingle"), "left")
      .withColumn("lowdf", coalesce(col("lowdf"), lit(true)))
    val fused = posts.as("a").join(posts.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("n_loose"),
        count(when(col("a.lowdf") && col("b.lowdf"), 1)).as("n_tight"))
    cpuTime("fused join (forceAll)") { Bench.forceAll(fused) }
    cpuTime("fused join again") { Bench.forceAll(fused) }
    val plan = fused.queryExecution.executedPlan.toString()
    println("[probe] ReusedExchange in plan: " + plan.contains("ReusedExchange"))
    println("[probe] generate/explode count: " + "Generate explode".r.findAllIn(plan).size)
    println("[probe] SortMergeJoin count: " + "SortMergeJoin".r.findAllIn(plan).size)
    println("[probe] ShuffledHashJoin count: " + "ShuffledHashJoin".r.findAllIn(plan).size)
    println("[probe] plan:")
    println(plan.take(9000))
    SessionCache.clear(spark)
    spark.stop()
  }
}
