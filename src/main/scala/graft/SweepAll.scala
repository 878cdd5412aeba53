package graft

/** One-JVM driver for all six robustness sweeps ([[EmptySweep]],
  * [[NullSweep]], [[TextFuzzSweep]], [[LayoutSweep]], [[ExecSweep]],
  * [[DupSweep]]), writing each rail's `sweeps/<name>.json` artifact for
  * the `SWEEPS_FRESH` gate in `tools/check.py` (round-14 judge item 2;
  * round 15 added the duplicate-row replay rail).
  *
  * Exists because the gate makes the sweeps a PER-ROUND rail that must
  * be re-run after the round's final src/main commit (same invalidation
  * rule as the bench of record): six separate `sbt runMain`s pay six
  * JVM + session + first-materialization warmups; one JVM pays them
  * once and the later sweeps run against a warmed code cache.
  * [[SessionCache.clear]] between sweeps releases each regime's
  * persisted frames, so the memory profile matches the standalone
  * mains (the round-7 retained-block lesson).
  *
  *   runMain graft.SweepAll <srcSfDir>
  *
  * Exit 1 when any sweep records a failure; each sweep's artifact is
  * still written (the committed history shows WHAT failed).
  */
object SweepAll {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val sweeps: Seq[(String, () => Seq[String])] = Seq(
      "empty" -> (() => EmptySweep.run(spark, srcDir)),
      "null" -> (() => NullSweep.run(spark, srcDir)),
      "fuzz" -> (() => TextFuzzSweep.run(spark, srcDir)),
      "layout" -> (() => LayoutSweep.run(spark, srcDir)),
      "exec" -> (() => ExecSweep.run(spark, srcDir)),
      "dup" -> (() => DupSweep.run(spark, srcDir)))
    require(sweeps.map(_._1) == SweepReport.railNames,
      "SweepAll's sweep list must match SweepReport.railNames (the gate's set)")
    var anyFailed = false
    for ((name, body) <- sweeps) {
      // provenance per sweep, sampled BEFORE the body runs (a commit
      // landing mid-run stales only the sweeps that started before it)
      val prov = SweepReport.capture()
      val failed = body()
      SweepReport.write(name, srcDir, SparkEntry.queries.size, failed, prov)
      anyFailed ||= failed.nonEmpty
      SessionCache.clear(spark)
    }
    spark.stop()
    if (anyFailed) sys.exit(1)
  }
}
