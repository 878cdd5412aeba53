package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line with per-query seconds.
  *
  * Materialization: `count()` lets Catalyst prune every projection-only
  * column (a string-ops query would time a near-empty plan), so each
  * result is forced through an xxhash64-of-all-columns aggregate — every
  * output column is computed and every row hashed, one scalar comes back
  * to the driver.
  *
  * Failures are NOT swallowed into timings: a failed query is reported in
  * `failed` and the process exits non-zero so a broken query can't
  * masquerade as a fast one.
  *
  * Self-diagnosis (round-4 lesson: a contended host produced a 4×-inflated
  * artifact that was indistinguishable from a plan regression):
  *   - per-query PROCESS CPU seconds are recorded next to wall seconds
  *     (local-mode executors are in-process threads, so process CPU covers
  *     the whole query). On a contended machine wall inflates while CPU
  *     stays at the plan's intrinsic cost, so cpu/wall exposes stolen time.
  *   - any query whose first wall time exceeds 5× the round median is
  *     re-run once; the REPORTED value is the min of the two runs (the
  *     better estimate of intrinsic cost) and both runs are preserved in
  *     `reruns` so the correction is auditable.
  *   - the JSON carries wall-clock `started_at`/`ended_at` stamps so a
  *     degraded window can be correlated with host telemetry after the
  *     fact.
  * Stdout stays within the driver's 4 KB tail-capture: per-query CPU lives
  * only in target/bench.json (full-fidelity); stdout carries the aggregate
  * cpu_sec / cpu_wall_ratio plus the (normally empty) reruns map.
  */
object Bench {
  def forceAll(df: DataFrame): Unit = {
    // bit_xor, not sum: summing 64-bit hashes overflows LongType, which
    // is an error under ANSI mode (Spark 4 default); xor is overflow-free
    // and order-independent
    val h = xxhash64(df.columns.map(c => col(s"`$c`")): _*)
    df.select(h.as("__h")).agg(expr("bit_xor(__h)")).head()
  }

  private val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    .asInstanceOf[com.sun.management.OperatingSystemMXBean]
  /** Cumulative CPU seconds consumed by this JVM process (driver +
    * local-mode executor threads). -1 if the platform can't report it. */
  private def processCpuSec(): Double = osBean.getProcessCpuTime / 1e9

  private case class Timing(wallSec: Double, cpuSec: Double, ok: Boolean)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val startedAt = java.time.Instant.now()
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup outside the timed loop — otherwise the
    // alphabetically-first query absorbs several seconds of JIT noise
    spark.range(2000000).selectExpr("sum(id * 2)").head()
    forceAll(spark.read.parquet(s"$sfDir/region.parquet"))
    // Materialize the SHARED feature/staging frames once, outside the
    // timed loop, so no query's number silently includes another tier's
    // build: p10 builds the whole pipeline staging+star, d02 the
    // shingled-docs feature table, e01 the repartitioned events base.
    // (Frames that are one query's own work — minhash pairs, IVF
    // centroids — stay inside that query's timing.) A production
    // pipeline pays this materialization once; it is reported
    // separately as warmup_sec, not hidden.
    // These three are re-timed warm in the main loop, so their per-query
    // numbers omit their shared-frame build cost; the `warmed` array in
    // the report JSON tags them so downstream consumers don't compare
    // warm and cold numbers as equivalent.
    val warmed = Seq("p10_validation_counts", "d02_ngram_jaccard", "e01_tumbling_hourly")
    val w0 = System.nanoTime()
    warmed.foreach(n => forceAll(SparkEntry.queries(n)(spark, sfDir)))
    val warmupSec = (System.nanoTime() - w0) / 1e9

    def timeOne(name: String, fn: (SparkSession, String) => DataFrame): Timing = {
      val c0 = processCpuSec()
      val t0 = System.nanoTime()
      val ok =
        try { forceAll(fn(spark, sfDir)); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      Timing((System.nanoTime() - t0) / 1e9, processCpuSec() - c0, ok)
    }

    val firstPass = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      (name, fn, timeOne(name, fn))
    }
    val failed = firstPass.collect { case (n, _, t) if !t.ok => n }

    // Outlier re-run: wall times on a healthy host cluster tightly; a
    // single value 5× past the median is either a genuinely expensive
    // plan (the re-run will reproduce it) or stolen CPU (it won't).
    val walls = firstPass.map(_._3.wallSec).sorted
    val median = if (walls.isEmpty) 0.0 else walls(walls.size / 2)
    val rerunThreshold = math.max(5.0 * median, 2.0)
    val results = firstPass.map { case (name, fn, t1) =>
      if (t1.ok && t1.wallSec > rerunThreshold) {
        val t2 = timeOne(name, fn)
        val best = if (t2.ok && t2.wallSec < t1.wallSec) t2 else t1
        (name, best, Some((t1.wallSec, t2.wallSec)))
      } else (name, t1, None)
    }

    val endedAt = java.time.Instant.now()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val totalWall = results.map(_._2.wallSec).sum
    val totalCpu = results.map(_._2.cpuSec).sum
    def jsonLine(num: Double => String, key: String => String, perQueryCpu: Boolean): String = {
      val qs = results.map { case (k, t, _) => "\"" + key(k) + "\":" + num(t.wallSec) }
        .mkString("{", ",", "}")
      val failedJson = failed.sorted.map("\"" + key(_) + "\"").mkString("[", ",", "]")
      val warmedJson = warmed.map("\"" + key(_) + "\"").mkString("[", ",", "]")
      val rerunsJson = results.collect { case (k, _, Some((a, b))) =>
        "\"" + key(k) + "\":[" + num(a) + "," + num(b) + "]"
      }.mkString("{", ",", "}")
      val cpuMap = if (!perQueryCpu) "" else
        results.map { case (k, t, _) => "\"" + key(k) + "\":" + num(t.cpuSec) }
          .mkString(""""cpu":{""", ",", "},")
      s"""{"metric":"total","value":${num(totalWall)},"unit":"sec","queries":$qs,""" +
        cpuMap +
        s""""failed":$failedJson,"warmed":$warmedJson,"warmup_sec":${num(warmupSec)},""" +
        s""""cpu_sec":${num(totalCpu)},"cpu_wall_ratio":${num(if (totalWall > 0) totalCpu / totalWall else 0)},""" +
        s""""reruns":$rerunsJson,"started_at":"$startedAt","ended_at":"$endedAt","sf":"$sfDir"}"""
    }
    // stdout gets millisecond-rounded timings keyed by the unique id
    // prefix (q01, d02, …): the driver captures only the LAST 4 KB of
    // output, and at 141 queries even rounded full names hit 3.9 KB —
    // one more round of queries would truncate the line again. Short
    // keys hold ~1.7 KB; full names live in target/bench.json.
    // guard: if two names ever collide on the prefix, fall back to full
    // names rather than silently dropping a timing in the JSON map
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    val shortKey: String => String =
      if (prefixes.distinct.size == prefixes.size) _.takeWhile(_ != '_') else identity
    println(jsonLine(fmt, shortKey, perQueryCpu = false))
    // the file keeps full precision and survives any log truncation.
    // Best-effort: a non-writable cwd must not fail a bench whose
    // queries all passed.
    try {
      java.nio.file.Files.createDirectories(java.nio.file.Paths.get("target"))
      java.nio.file.Files.writeString(java.nio.file.Paths.get("target/bench.json"),
        jsonLine(_.toString, identity, perQueryCpu = true) + "\n")
    } catch { case e: Exception =>
      System.err.println(s"[bench] could not write target/bench.json: ${e.getMessage}")
    }
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
