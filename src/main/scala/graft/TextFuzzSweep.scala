package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Adversarial-TEXT robustness sweep (builder-side diagnostic, the
  * content-regime sibling of [[NullSweep]]): mirrors every synthetic
  * table with ~1-in-7 of every STRING column's values extended by an
  * adversarial snippet — astral-plane emoji (surrogate pairs), CJK +
  * combining marks, bidi override controls, zero-width/BOM code
  * points, embedded newlines and delimiter characters, quotes and
  * backslashes, regex metacharacters, and multi-KB runs — then runs
  * every `SparkEntry.queries` entry against the mirror and reports
  * which queries THROW instead of treating text as data.
  *
  * Why this regime matters at 100 TB: web-scale corpora contain all
  * of the above in the first gigabyte. The failure classes this
  * regime owns are real production pagers, invisible to a gate whose
  * synthetic text is ASCII words: a CSV/text sink whose reader splits
  * on a delimiter the writer never escaped (row structure silently
  * torn by an embedded newline or tab), semi-structured parsing that
  * throws on the first malformed document instead of nulling it,
  * regex pipelines that interpret user text as pattern syntax, and
  * string arithmetic that assumes one char = one code point. Like
  * [[NullSweep]] this is a NO-THROW contract, not an invariance
  * contract — mutated text legitimately changes results; it must
  * never kill the job.
  *
  *   runMain graft.TextFuzzSweep <srcSfDir> [outDir] [rate]
  *
  * Exit 1 when any query throws. TextFuzzSpec pins the no-throw
  * contract in CI on the text-riskiest subset; the full sweep lives
  * here to keep `sbt test` wall bounded.
  */
object TextFuzzSweep {

  /** One snippet per adversarial class; a row's snippet is picked by
    * the same hash that selects the row, so coverage is deterministic
    * and spread across classes. */
  private[graft] val snippets: Seq[String] = Seq(
    "😀🎉𝔘nicode", // astral emoji + math letters (surrogate pairs)
    "café 日本語テキスト éé", // CJK + combining marks
    "\u202Eevil\u202C bidi", // RTL override + pop directional formatting
    "zero\u200Bwidth\u200D\uFEFFjoin", // ZWSP / ZWJ / BOM
    "line1\nline2\rline3", // embedded newlines (sink/line formats)
    "comma,semi;tab\tpipe|", // delimiter soup (CSV/text/BPE separators)
    "quote\"back\\slash'", // quoting + escapes
    "a(b[c{d|e*f+g?h\\E\\Q.^$", // regex metacharacters
    "L" + ("o" * 4096) + "ng") // multi-KB run (buffers, shingles, regex)

  def main(args: Array[String]): Unit = {
    val srcDir = args(0)
    val outDir = args.lift(1).getOrElse("target/scratch/sf_fuzz")
    val rate = args.lift(2).map(_.toInt).getOrElse(7)
    val prov = SweepReport.capture()
    val spark = SparkEntry.harnessSession()
    spark.sparkContext.setLogLevel("ERROR")
    val failed = run(spark, srcDir, outDir, rate)
    SweepReport.write("fuzz", srcDir, SparkEntry.queries.size, failed, prov)
    SessionCache.clear(spark)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** Sweep body (shared with [[SweepAll]]): mirror + run every query,
    * returning the names that threw. */
  def run(spark: SparkSession, srcDir: String,
          outDir: String = "target/scratch/sf_fuzz", rate: Int = 7): Seq[String] = {
    mirrorFuzzed(spark, srcDir, outDir, rate)
    val names = SparkEntry.queries.keys.toSeq.sorted
    var failed = List.empty[String]
    for (n <- names) {
      val t0 = System.nanoTime()
      try {
        val rows = SparkEntry.queries(n)(spark, outDir).collect().length
        println(f"[fuzz] $n OK rows=$rows wall=${(System.nanoTime() - t0) / 1e9}%.2fs")
      } catch {
        case e: Throwable =>
          failed ::= n
          println(s"[fuzz] $n FAIL ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    println(s"[fuzz] swept=${names.size} failed=${failed.size}" +
      (if (failed.isEmpty) "" else failed.sorted.mkString(" [", ",", "]")))
    failed.sorted
  }

  /** Mirror of every synthetic table with each STRING column extended
    * by a hash-picked adversarial snippet on a deterministic ~1/`rate`
    * row subset (same row-id x column-name mask construction as
    * [[NullSweep.mirrorNulled]]; EXTEND rather than replace, so keys
    * stay distinct and joins/filters still select non-trivial rows).
    * The snippet-pick hash is SALTED (`"snip"`) so row selection and
    * snippet class are independent for ANY rate — round-14 advice: with
    * both derived from the same hash, a rate sharing a factor with
    * `snippets.size` restricts selected rows to a subset of snippet
    * classes, silently collapsing adversarial coverage. A separately
    * salted hash mod 3 weights PREPEND:APPEND 1:2 — intentionally
    * append-leaning, because appending preserves any structured PREFIX
    * the value carries (a JSON object with trailing garbage — which
    * Jackson-style parsers accept), while prepending destroys it
    * (BOM/emoji-prefixed JSON, the truncated/corrupt document a
    * semi-structured ingest must null out, not die on — the first sweep
    * could not reach that regime and raw parse_json passed it
    * silently). */
  def mirrorFuzzed(spark: SparkSession, srcDir: String, outDir: String,
                   rate: Int): Unit = {
    val snips = array(snippets.map(lit): _*)
    for (t <- Tables.all) {
      val src = NullSweep.singleSplit(spark, srcDir, t)
        .withColumn("__rid", monotonically_increasing_id())
      val fuzzed = src.select(src.schema.fields.filterNot(_.name == "__rid").map { f =>
        val c = col(s"`${f.name}`")
        val h = xxhash64(col("__rid"), lit(f.name))
        if (f.dataType == StringType) {
          val snipH = xxhash64(col("__rid"), lit(f.name), lit("snip"))
          val snip = element_at(snips, (pmod(snipH, lit(snippets.size)) + 1).cast("int"))
          val side = pmod(xxhash64(col("__rid"), lit(f.name), lit("side")), lit(3))
          when(pmod(h, lit(rate)) === 0 && c.isNotNull,
            when(side === 0, concat(snip, c)).otherwise(concat(c, snip)))
            .otherwise(c).as(f.name)
        } else c.as(f.name)
      }.toIndexedSeq: _*)
      fuzzed.write.mode("overwrite").parquet(Tables.path(outDir, t))
    }
  }
}
