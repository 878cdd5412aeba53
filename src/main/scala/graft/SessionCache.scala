package graft

import org.apache.spark.sql.SparkSession

/** Per-session memo for built-once persisted frames (the events base
  * frame, the pipeline staging/star tables).
  *
  * Weak-keyed by SparkSession so short-lived sessions (test suites spin
  * up many) don't pin their cached blocks and session references for
  * the JVM lifetime — when the session is no longer reachable the entry
  * (and with it the only strong reference to its persisted frames) is
  * collectable, and Spark's ContextCleaner reclaims the blocks.
  */
object SessionCache {
  private val maps =
    new java.util.WeakHashMap[SparkSession, scala.collection.mutable.Map[String, Any]]()

  /** Build-once-per-(session, key); the build runs under the map lock,
    * which is fine here — builders only declare plans and call persist
    * (lazy), they don't run jobs.
    */
  def memo[T](s: SparkSession, key: String)(build: => T): T = maps.synchronized {
    val m = maps.computeIfAbsent(s, _ => scala.collection.mutable.Map.empty[String, Any])
    m.getOrElseUpdate(key, build).asInstanceOf[T]
  }
}
