package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-session memo for built-once persisted frames (the events base
  * frame, the shingled docs, the pipeline staging/star tables).
  *
  * Retention contract: entries hold their frames (and thus the session)
  * strongly until [[clear]] — a weak map cannot help here, because the
  * cached DataFrames themselves reference their SparkSession, which
  * would pin weak keys forever. The harness mains call [[clear]] before
  * `spark.stop()` so persisted blocks are explicitly released; a
  * process that skips clear() retains at most its own session's frames,
  * which die with the JVM. Long multi-family runs (Bench) release each
  * family's frames as soon as its last query finishes via [[release]] —
  * "persist everything until process exit" is the memory-pressure
  * anti-pattern at scale, and retained blocks showed up in round 7 as
  * 2-9× CPU inflation on unrelated later queries (eviction + recompute
  * billed to innocent plans).
  */
object SessionCache {
  private val maps =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, scala.collection.mutable.Map[String, Any]]()
  /** Thread currently holding a session's monitor inside [[memo]] (for
    * the streaming-deadlock fail-fast below); null when uncontended. */
  private val owners =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, java.util.concurrent.atomic.AtomicReference[Thread]]()

  /** Build-once-per-(session, key). Builders MAY run Spark jobs (the
    * store builds, label-propagation rounds, and streaming replays all
    * do — localCheckpoint and awaitTermination are eager), and the
    * per-session monitor is held for the duration: concurrent memo
    * calls on the SAME session serialize behind the running builder.
    * That is the intended semantics — a second thread asking for any
    * cached frame while a store is mid-build must wait for a consistent
    * cache, and the harness mains are single-threaded per session — but
    * it means memo must never be called from inside a Spark task, and
    * callers must not assume memo is cheap under cross-thread use.
    *
    * Streaming fail-fast: a builder that starts a streaming query and
    * awaits it (c05, v16) holds the monitor while `foreachBatch` runs
    * on the stream-execution thread. If that batch path ever reaches a
    * memo call, the batch thread blocks on the monitor the awaiting
    * builder holds → classic deadlock, and the process hangs silently.
    * Rather than relying on scaladoc discipline, a contended memo call
    * FROM a stream-execution thread throws immediately with the fix
    * spelled out (resolve the frame on the calling thread before
    * `start()` and ship it in the closure — what c05's frozenState
    * does).
    */
  def memo[T](s: SparkSession, key: String)(build: => T): T = {
    val m = maps.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty[String, Any])
    val owner = owners.computeIfAbsent(s, _ => new java.util.concurrent.atomic.AtomicReference[Thread]())
    val cur = Thread.currentThread()
    val holder = owner.get()
    if (holder != null && holder != cur &&
        cur.getName.startsWith("stream execution thread"))
      throw new IllegalStateException(
        s"SessionCache.memo('$key') called from streaming micro-batch thread " +
          s"'${cur.getName}' while '${holder.getName}' holds the session cache " +
          "monitor — this deadlocks when the holder is awaiting the stream. " +
          "Resolve the frame on the calling thread BEFORE start() and capture " +
          "it in the foreachBatch closure.")
    m.synchronized {
      // restore the PREVIOUS owner on exit: builders nest (v16 →
      // vectorStore → ivfCentroids), and a nested call clearing the
      // flag would silently disable the guard for the rest of the
      // outer build
      val prev = owner.get()
      owner.set(cur)
      try m.getOrElseUpdate(key, build).asInstanceOf[T]
      finally owner.set(prev)
    }
  }

  /** Unpersist and drop the session's entries whose key matches `pred`
    * — the family-scoped release the Bench loop uses so the d-family
    * never pays memory pressure for the c-family's corpus-sized frames.
    */
  def release(s: SparkSession, pred: String => Boolean): Unit =
    Option(maps.get(s)).foreach { m =>
      m.synchronized {
        val hit = m.keys.filter(pred).toSeq
        hit.foreach { k => unpersistAll(m(k)); m.remove(k) }
      }
    }

  /** Unpersist every cached frame of the session (recursing into tuples
    * and case classes like the pipeline's Staging/Star holders) and drop
    * its entries.
    */
  def clear(s: SparkSession): Unit = {
    Option(maps.remove(s)).foreach(_.values.foreach(unpersistAll))
    owners.remove(s); ()
  }

  private def unpersistAll(v: Any): Unit = v match {
    case df: DataFrame =>
      df.unpersist()
      // localCheckpoint()ed frames cache their RDD blocks directly (not
      // through CacheManager), so Dataset.unpersist alone leaves them to
      // the ContextCleaner's GC schedule — release the checkpoint blocks
      // deterministically via the LogicalRDD handles in the plan.
      df.queryExecution.analyzed.foreach {
        case r: org.apache.spark.sql.execution.LogicalRDD =>
          r.rdd.unpersist(blocking = false); ()
        case _ => ()
      }
    case p: Product => p.productIterator.foreach(unpersistAll)
    case _ => ()
  }
}
