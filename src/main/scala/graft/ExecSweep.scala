package graft

import org.apache.spark.sql.SparkSession

/** EXECUTION-CONFIG invariance sweep (fourth of the robustness rails
  * with [[Perf]], [[EmptySweep]] and [[LayoutSweep]]): every
  * `SparkEntry.queries` entry must return the IDENTICAL row multiset
  * under a deliberately cluster-like session configuration —
  *
  *   - `spark.sql.shuffle.partitions = 13` (prime, ≠ the harness's 32
  *     and ≠ any table's split count): every hash-partitioned exchange
  *     places keys differently, every reduce-side merge runs in a
  *     different order, and any arithmetic keyed on a partition COUNT
  *     (prefix sums, surrogate offsets, round-robin deals) sees a
  *     different topology;
  *   - `spark.sql.autoBroadcastJoinThreshold = -1`: every join that
  *     CAN shuffle does — the sort-merge plans a 100 TB fact-fact join
  *     actually runs, where the gate-scale plan broadcasts;
  *   - `spark.sql.adaptive.enabled = false`: static planning — no
  *     runtime coalescing, re-broadcast, or skew split to mask a
  *     partition-count dependence the static plan carries.
  *
  * Why this regime matters: the oracle gate runs one fixed config, so
  * a result that depends on shuffle fan-out, join strategy, or
  * adaptive re-planning (a float sum whose value shifts with reduce
  * order, a `first()` resolved by whichever partition merges first)
  * passes the gate and diverges only when the cluster's config —
  * which an operator never controls — differs. The LayoutSweep varies
  * the DATA's physical shape; this sweep varies the ENGINE's, holding
  * data fixed.
  *
  * Both passes run in ONE JVM: pass A on the harness session, pass B
  * on a [[clusterLike]] sibling (`newSession` — same SparkContext,
  * session-scoped SQLConf), which also re-exercises the per-session
  * store/scratch isolation the IdempotenceSpec rail pins.
  *
  *   runMain graft.ExecSweep <sfDir>
  *
  * Exit 1 when any query throws or diverges. ExecInvarianceSpec pins
  * the contract permanently on the config-riskiest subset; the full
  * sweep lives here to keep `sbt test` wall bounded.
  */
object ExecSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val prov = SweepReport.capture()
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = run(spark, sfDir)
    SweepReport.write("exec", sfDir, SparkEntry.queries.size, failed, prov)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Sweep body (shared with [[SweepAll]]): compare every query across
    * session configs, returning the names that threw/diverged. */
  def run(spark: SparkSession, sfDir: String): Seq[String] = {
    val alt = clusterLike(spark)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      verdict(spark, alt, n, sfDir) match {
        case None =>
          println(f"[exec] $n OK wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        case Some(why) =>
          failed ::= n
          println(s"[exec] $n FAIL $why")
      }
    }
    println(s"[exec] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    SessionCache.clear(alt)
    failed.sorted
  }

  /** A sibling session configured the way a large cluster plans: many
    * exchanges, no automatic broadcasts, no adaptive rewrites. */
  def clusterLike(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", 13)
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    s.conf.set("spark.sql.adaptive.enabled", false)
    s
  }

  /** None when `name` returns the same row multiset on both sessions;
    * Some(reason) on divergence or throw. */
  def verdict(base: SparkSession, alt: SparkSession, name: String,
              sfDir: String): Option[String] =
    try {
      val fn = SparkEntry.queries(name)
      val a = LayoutSweep.rows(fn(base, sfDir))
      val b = LayoutSweep.rows(fn(alt, sfDir))
      if (a == b) None
      else Some(s"diverged: ${a.size} vs ${b.size} rows; " +
        s"first diff=${a.zipAll(b, "<none>", "<none>")
          .find { case (x, y) => x != y }}")
    } catch {
      case e: Throwable => Some(s"${e.getClass.getSimpleName}: " +
        Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
    }
}
