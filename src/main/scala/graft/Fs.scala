package graft

/** Local-filesystem helpers for the harness mains and the catalog /
  * bucketing round-trip queries (driver-side utility paths only — never
  * in a distributed hot path).
  */
object Fs {
  /** Recursive delete. `listFiles()` returns null on I/O or permission
    * error — guard so a cleanup hiccup degrades to a leftover file
    * instead of an NPE that aborts the whole run.
    */
  def rmTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Scratch-dir tag keyed by (input dir, JVM pid): two concurrent
    * harness mains (e.g. Bench and Verify over the same scale dir) can
    * never race on overwrite-while-read of a shared tmp directory, while
    * within one JVM the tag is stable so a re-run reuses its own scratch
    * dir instead of leaking a new one per call.
    */
  def tmpTag(dir: String): String =
    s"${Integer.toHexString(dir.hashCode)}_p${ProcessHandle.current().pid()}"

  /** Monotonic per-JVM token per SparkSession — identityHashCode is NOT
    * guaranteed unique across sessions (round-8 advice), a counter is.
    * Weak keys: a token entry must not pin a stopped session; the
    * counter never repeats, so a key collected and re-inserted still
    * gets a fresh, unique token.
    */
  private val sessionTokens =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()
  private val sessionCounter = new java.util.concurrent.atomic.AtomicLong(0)

  /** [[tmpTag]] plus a SparkSession-identity token — for scratch dirs
    * whose contents back a SESSION-memoized lazy frame (c05's admitted
    * batches, v16's served results). Keyed only by (dir, pid), a second
    * SparkSession in the same JVM running the same query would rmTree
    * and rewrite the path out from under the first session's cached
    * frame; the per-session token gives each session its own directory.
    */
  def sessionTag(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    s"${tmpTag(dir)}_s${sessionToken(spark)}"

  /** The bare per-session token behind [[sessionTag]] — for callers
    * that need session identity in a CATALOG name rather than a path
    * (d33's evolving table: a session-memoized body that DROPs and
    * rewrites a shared-name table would clobber a concurrent session's
    * live store; a per-session name removes the interference entirely,
    * round-11 advice).
    */
  def sessionToken(spark: org.apache.spark.sql.SparkSession): String =
    sessionTokens.synchronized {
      Option(sessionTokens.get(spark)).getOrElse {
        val t = s"${sessionCounter.incrementAndGet()}"
        sessionTokens.put(spark, t); t
      }
    }

  /** Best-effort cleanup of STALE sibling scratch dirs under java.io.tmpdir:
    * entries starting with `namePrefix` whose embedded `_p<pid>` names a
    * process that is no longer alive, or whose pid was RECYCLED — a
    * recycled pid makes a dead owner's dir look alive forever
    * (ProcessHandle checks pid liveness, not identity; round-9 advice).
    * Recycling is detected by process START TIME, not dir age (round-10
    * advice: a pure >24h age backstop would sweep a legitimately
    * long-running owner's LIVE dir): the real owner started before it
    * created the dir, so a live process whose startInstant is CLEARLY
    * after the dir's last write cannot be the owner. "Clearly" matters —
    * the owner creates its dir milliseconds after JVM start, and
    * startInstant (derived from /proc boot-time + jiffies) and the dir
    * mtime (filesystem wall clock) are not the same clock; NTP slew or
    * coarse mtime granularity can put the true owner's start a little
    * AFTER its dir's mtime (round-11 advice). A 60 s grace margin makes
    * only unambiguously-later starts count as recycled; genuinely
    * recycled pids are hours-to-days later, so no detection is lost, and
    * the 24h fallback still covers the unverifiable case. This check
    * also relies on a filesystem invariant: a dir's mtime only moves
    * FORWARD (direct child add/remove) and the owner creates the dir
    * after starting, so mtime can never drift BELOW the owner's start —
    * do not add anything that back-dates the dir's mtime (e.g. a
    * "restore mtime after sweep" step) or the comparison inverts. Only
    * when the start time is unverifiable does the 24h age cutoff apply
    * as the fallback. Dirs of verified live owners are never touched —
    * this bounds the accumulation the per-session tokens would otherwise
    * cause, without reintroducing the rmTree-under-cached-frame race.
    */
  def sweepStaleScratch(namePrefix: String): Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val pidRe = ".*_p(\\d+)(_.*)?$".r
    val ageCutoffMs = System.currentTimeMillis() - 24L * 3600 * 1000
    Option(tmp.listFiles()).foreach(_.foreach { f =>
      if (f.getName.startsWith(namePrefix)) f.getName match {
        case pidRe(pid, _) =>
          val alive = ProcessHandle.of(pid.toLong)
          val ownerDead = !alive.isPresent || !alive.get.isAlive
          val recycledOrUnverifiable = !ownerDead && {
            val started = alive.get.info().startInstant()
            if (started.isPresent)
              started.get.toEpochMilli > f.lastModified() + 60_000L
            else f.lastModified() < ageCutoffMs
          }
          if (ownerDead || recycledOrUnverifiable) rmTree(f)
        case _ => ()
      }
    })
  }

  /** Read the concrete `b<N>` batch dirs a foreachBatch stream wrote
    * under `outBase` — never the `"$outBase/b*"` glob, which
    * FileStreamSink.hasMetadata probes as a literal path and logs a full
    * FileNotFoundException stack at WARN on every run (the c05 fix,
    * applied uniformly per round-10 advice). A zero-batch stream
    * (Trigger.AvailableNow over no input files) leaves no dirs; that
    * case degrades to a well-typed empty frame under `emptySchema`
    * instead of an unreadable zero-path `spark.read.parquet()` throw.
    * `emptySchema` is BY-NAME: some callers derive it from a full
    * analysis plan (c05 runs the whole admission pipeline on an empty
    * frame just to get `.schema`), and the common warm path — batch
    * dirs exist — must not pay that analysis (round-11 advice).
    */
  def readBatchDirs(spark: org.apache.spark.sql.SparkSession, outBase: String,
                    emptySchema: => org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame = {
    val dirs = Option(new java.io.File(outBase).listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(f => f.isDirectory && f.getName.startsWith("b"))
      .map(_.getPath).sorted
    if (dirs.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], emptySchema)
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }

  private val onceDone = new java.util.concurrent.ConcurrentHashMap[String, Boolean]()

  /** Run `body` at most once per JVM for `key` — the guard for
    * PROCESS-wide side effects (catalog DROP/CREATE against the shared
    * SharedState, tmp-dir wipes) that a per-SESSION memo would re-run
    * from a second SparkSession in the same JVM, deleting files out from
    * under the first session's cached references. `computeIfAbsent`
    * blocks concurrent callers on the same key until the first build
    * finishes.
    */
  def onceInJvm(key: String)(body: => Unit): Unit = {
    onceDone.computeIfAbsent(key, _ => { body; true }); ()
  }
}
