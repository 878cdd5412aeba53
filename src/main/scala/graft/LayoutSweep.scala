package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-LAYOUT invariance sweep (builder-side diagnostic, the
  * third of the robustness trio with [[Perf]] and [[EmptySweep]]):
  * rewrites every synthetic table as a multi-split mirror — same rows,
  * adversarial physical layout (`repartition(splits)` hashes full rows
  * round-robin across files, destroying the single-split file order
  * the gate data ships with) — and verifies every `SparkEntry.queries`
  * entry returns the IDENTICAL row multiset on both layouts.
  *
  * Why this regime matters at 100 TB: there, every table IS a
  * many-thousand-split layout whose file order, split count, and
  * row-to-partition placement are accidents of ingestion — none of
  * them may leak into a result. The oracle gate cannot see this class
  * (its tables are single parquet splits, so partition-placement bugs
  * — an undisciplined `limit`, an order-free `first()`, a prefix sum
  * keyed on accidental partition ids — pass it silently and surface
  * only on the cluster). The engine's defenses are by-design
  * (range-repartition before any `spark_partition_id` arithmetic in
  * Keys, full tiebreak orders under every top-k, md5 permutations for
  * sampling); this sweep is the measurement that the defenses cover
  * the whole surface.
  *
  *   runMain graft.LayoutSweep <srcSfDir> [outDir] [splits]
  *
  * Exit 1 when any query throws or diverges. SparkSpec pins the
  * contract permanently on a cross-family subset (LayoutInvarianceSpec);
  * the full sweep lives here to keep `sbt test` wall bounded.
  */
object LayoutSweep {
  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args.lift(1).getOrElse("target/scratch/sf_layout")
    val splits = args.lift(2).map(_.toInt).getOrElse(7)
    val prov = SweepReport.capture()
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = run(spark, srcDir, outDir, splits)
    SweepReport.write("layout", srcDir, SparkEntry.queries.size, failed, prov)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Sweep body (shared with [[SweepAll]]): mirror + compare every
    * query across layouts, returning the names that threw/diverged. */
  def run(spark: SparkSession, srcDir: String,
          outDir: String = "target/scratch/sf_layout", splits: Int = 7): Seq[String] = {
    mirrorSplit(spark, srcDir, outDir, splits)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      verdict(spark, n, srcDir, outDir) match {
        case None =>
          println(f"[layout] $n OK wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
        case Some(why) =>
          failed ::= n
          println(s"[layout] $n FAIL $why")
      }
    }
    println(s"[layout] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    failed.sorted
  }

  /** Multi-split mirror of every synthetic table: identical rows,
    * `splits` files each, rows hashed round-robin across them. */
  def mirrorSplit(spark: SparkSession, srcDir: String, outDir: String,
                  splits: Int): Unit =
    for (t <- Tables.all)
      spark.read.parquet(Tables.path(srcDir, t)).repartition(splits)
        .write.mode("overwrite").parquet(Tables.path(outDir, t))

  /** None when `name` returns the same row multiset on both dirs;
    * Some(reason) on divergence or throw. The p01-p14 pipeline queries
    * read fixed CSV fixtures and ignore the dir — they pass trivially
    * and are kept in the sweep as cheap harness checks. */
  def verdict(spark: SparkSession, name: String,
              srcDir: String, mirrorDir: String): Option[String] =
    try {
      val base = rows(SparkEntry.queries(name)(spark, srcDir))
      val mirrored = rows(SparkEntry.queries(name)(spark, mirrorDir))
      if (base == mirrored) None
      else Some(s"diverged: ${base.size} vs ${mirrored.size} rows; " +
        s"first diff=${base.zipAll(mirrored, "<none>", "<none>")
          .find { case (a, b) => a != b }}")
    } catch {
      case e: Throwable => Some(s"${e.getClass.getSimpleName}: " +
        Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
    }

  /** Canonical row multiset (columns name-sorted, rows string-sorted) —
    * shared with [[ExecSweep]] so both rails compare identically. */
  private[graft] def rows(df: DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq
  }
}
