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
  * which die with the JVM.
  */
object SessionCache {
  private val maps =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, scala.collection.mutable.Map[String, Any]]()

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
    */
  def memo[T](s: SparkSession, key: String)(build: => T): T = {
    val m = maps.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty[String, Any])
    m.synchronized { m.getOrElseUpdate(key, build).asInstanceOf[T] }
  }

  /** Unpersist every cached frame of the session (recursing into tuples
    * and case classes like the pipeline's Staging/Star holders) and drop
    * its entries.
    */
  def clear(s: SparkSession): Unit =
    Option(maps.remove(s)).foreach(_.values.foreach(unpersistAll))

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
