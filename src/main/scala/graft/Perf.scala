package graft
import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query perf probe (builder-side diagnostic, not a
  * driver artifact): times named queries in-process with the exact
  * Bench session config and prints wall + process-CPU per repetition,
  * so a plan/parallelism fix can be measured without a full bench run.
  *
  *   runMain graft.Perf <sfDir> <name>[,<name>...] [reps] [--explain]
  */
object Perf {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = args.drop(2).filterNot(_.startsWith("--")).headOption.map(_.toInt).getOrElse(2)
    val doExplain = args.contains("--explain")
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    spark.range(2000000).selectExpr("sum(id * 2)").head()
    val doExecuted = args.contains("--executed")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      if (doExplain) fn(spark, sfDir).explain("formatted")
      if (doExecuted) {
        // the POST-AQE executed plan (runtime stage reuse, final join
        // strategies) — explain("formatted") only shows the initial plan
        val df = fn(spark, sfDir)
        // collect() drives df's OWN QueryExecution (forceAll and
        // df.write both derive a new one), so the printed plan is the
        // post-AQE final one; declared queries are oracle-gated and
        // small, so the driver-side result is bounded
        df.collect()
        println(s"[perf] $n executed plan:\n" + df.queryExecution.executedPlan.toString)
      }
      for (r <- 1 to reps) {
        // contamination evidence per rep (round-13: isolated breakdowns
        // adjudicate the bench's warm_outliers, so the breakdown itself
        // must carry the ambient numbers it is judged against)
        val b0 = Bench.systemBusySec(); val s0 = Bench.systemStealSec()
        val c0 = osBean.getProcessCpuTime / 1e9
        val t0 = System.nanoTime()
        Bench.forceAll(fn(spark, sfDir))
        val wall = (System.nanoTime() - t0) / 1e9
        val cpu = osBean.getProcessCpuTime / 1e9 - c0
        val other = (for (x0 <- b0; x1 <- Bench.systemBusySec())
          yield math.max(0.0, (x1 - x0) - cpu)).getOrElse(-1.0)
        val steal = (for (x0 <- s0; x1 <- Bench.systemStealSec())
          yield math.max(0.0, x1 - x0)).getOrElse(-1.0)
        println(f"[perf] $n rep$r wall=$wall%.2fs cpu=$cpu%.1fs ratio=${cpu / wall}%.1f " +
          f"other_cpu=$other%.1fs steal=$steal%.1fs")
      }
    }
    SessionCache.clear(spark)
    spark.stop()
  }
}
