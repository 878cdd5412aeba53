package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Duplicate-ROW robustness sweep (sixth of the robustness rails, the
  * ingestion-regime sibling of [[NullSweep]]): mirrors every synthetic
  * table with ~1-in-7 of its rows duplicated EXACTLY (deterministic
  * hash of the row id), then runs every `SparkEntry.queries` entry
  * against the mirror and reports which queries THROW instead of
  * treating replayed rows as data.
  *
  * Why this regime matters at 100 TB: at-least-once delivery is the
  * default contract of every large ingestion path — upstream retries,
  * speculative task re-execution, CDC replays, and resumed backfills
  * all materialize the SAME logical record twice. The gate tables are
  * key-unique, so the oracle never executes a duplicate-key path — but
  * the exposure is exactly the operators that ASSUME uniqueness:
  * surrogate-key builds over now-ambiguous naturals, keep-first dedup
  * whose tiebreak order suddenly has true ties, persisted stores whose
  * upsert sees the same key twice in one batch, count-based invariants
  * (`require(n == expected)`), and driver-side `.head()` on a frame
  * that fans out. A query may legitimately return DIFFERENT rows here
  * (duplicates are data — like [[NullSweep]] this is a NO-THROW
  * contract, not an invariance contract); it must never kill the job.
  *
  *   runMain graft.DupSweep <srcSfDir> [outDir] [rate] [artifactName]
  *
  * Exit 1 when any query throws. The full sweep lives here (not in
  * `sbt test`) to keep suite wall bounded; the `sweeps/dup.json`
  * artifact + check.py's SWEEPS_FRESH gate make skipping it a round
  * failure. `artifactName` (default `dup`) names the
  * `sweeps/<name>.json` artifact — scale-regime runs (e.g. `dup_sf1`,
  * round-17 judge item 5) don't clobber the gate artifact.
  */
object DupSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args.lift(1).getOrElse("target/scratch/sf_dup")
    val rate = args.lift(2).map(_.toInt).getOrElse(7)
    val artifact = args.lift(3).getOrElse("dup")
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
          outDir: String = "target/scratch/sf_dup", rate: Int = 7): Seq[String] = {
    mirrorDuped(spark, srcDir, outDir, rate)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, outDir).collect().length
        println(f"[dup] $n OK rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"[dup] $n FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    println(s"[dup] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    failed.sorted
  }

  /** Mirror of every synthetic table with a deterministic ~1/`rate` row
    * subset duplicated exactly once (same [[NullSweep.singleSplit]] +
    * row-id machinery as the other mirrors; the duplicate is a
    * bit-identical replay of the source row — the at-least-once
    * delivery artifact, not a near-dup). */
  def mirrorDuped(spark: SparkSession, srcDir: String, outDir: String,
                  rate: Int): Unit =
    for (t <- Tables.all) {
      val src = NullSweep.singleSplit(spark, srcDir, t)
        .withColumn("__rid", monotonically_increasing_id())
      val replay = src.filter(pmod(xxhash64(col("__rid"), lit(t)), lit(rate)) === 0)
      src.unionByName(replay).drop("__rid")
        .write.mode("overwrite").parquet(Tables.path(outDir, t))
    }
}
