package graft

import org.apache.spark.sql.SparkSession

/** Empty-input robustness sweep (builder-side diagnostic, the
  * edge-case sibling of [[Perf]]): mirrors every synthetic table of a
  * source scale dir as a ZERO-ROW parquet with the identical schema,
  * then runs every `SparkEntry.queries` entry against the mirror and
  * reports which queries throw instead of degrading to an empty (or
  * deterministic zero-state) result.
  *
  * Why this regime matters at 100 TB: empty inputs are not a toy case
  * there — a date-partition filter that matches nothing, a tenant with
  * no documents yet, a CDC batch with zero changes, or a stream
  * micro-batch between arrivals all hand an operator the zero-row
  * frame. A query that hash-gates perfectly on populated data but
  * throws on the empty shard is a production pager, and the throw
  * almost always lives on the DRIVER side of the plan (a `.head()` on
  * an empty aggregate, a literal division by a zero `.count()`), where
  * no amount of executor-side null discipline covers it.
  *
  *   runMain graft.EmptySweep <srcSfDir> [outDir]
  *
  * Exit 1 when any query throws; the per-query verdict lines make the
  * failure set diffable run-to-run. SparkSpec pins the zero-throw
  * contract permanently on a representative cross-family subset (the
  * full sweep lives here, not in the suite, to keep `sbt test` wall
  * bounded).
  */
object EmptySweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args.lift(1).getOrElse("target/scratch/sf0")
    val prov = SweepReport.capture()
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = run(spark, srcDir, outDir)
    SweepReport.write("empty", srcDir, SparkEntry.queries.size, failed, prov)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Sweep body (shared with [[SweepAll]]): mirror + run every query,
    * returning the names that threw. */
  def run(spark: SparkSession, srcDir: String,
          outDir: String = "target/scratch/sf0"): Seq[String] = {
    mirrorEmpty(spark, srcDir, outDir)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, outDir).collect().length
        println(f"[empty] $n OK rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"[empty] $n FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    println(s"[empty] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    failed.sorted
  }

  /** Zero-row mirror of every synthetic table, schema-identical to the
    * source (limit(0) preserves the parquet schema exactly, including
    * the events table's physical timestamp encoding). */
  def mirrorEmpty(spark: SparkSession, srcDir: String, outDir: String): Unit =
    for (t <- Tables.all)
      spark.read.parquet(Tables.path(srcDir, t)).limit(0)
        .coalesce(1).write.mode("overwrite").parquet(Tables.path(outDir, t))
}
