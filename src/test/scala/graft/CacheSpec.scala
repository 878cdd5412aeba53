package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}

/** SessionCache contract tests — the memo lock's nesting, the
  * stream-thread bounded tryLock (deadlock fail-fast), and the
  * released-key rebuild detection that Bench surfaces in
  * bench_full.json `rebuilt_after_release`.
  *
  * The stream-thread tests drive the name-prefix fallback of
  * `isStreamThread` (a plain thread named like Spark's
  * StreamExecution thread): the structural UninterruptibleThread check
  * can't be exercised without spinning up a real streaming query, and
  * either branch routes into the same tryLock path under test.
  */
class CacheSpec extends SparkSpec {

  private def onFakeStreamThread[T](body: => T): Either[Throwable, T] = {
    @volatile var out: Either[Throwable, T] = null
    val t = new Thread(
      () => out = try Right(body) catch { case e: Throwable => Left(e) },
      "stream execution thread for CacheSpec")
    t.start(); t.join(60000)
    assert(out != null, "stream-thread body did not finish in 60s")
    out
  }

  test("memo builders nest reentrantly on one thread") {
    val outer = SessionCache.memo(spark, "cachespec:outer") {
      // v16 -> vectorStore -> ivfCentroids nest exactly like this
      val inner = SessionCache.memo(spark, "cachespec:inner") { 41 }
      inner + 1
    }
    assert(outer == 42)
    assert(SessionCache.memo(spark, "cachespec:inner") { -1 } == 41,
      "nested build must be cached, not rebuilt")
    SessionCache.release(spark, _.startsWith("cachespec:"))
  }

  test("stream thread times out (throws) when the holder never releases") {
    val holderHasLock = new CountDownLatch(1)
    val releaseHolder = new CountDownLatch(1)
    val holder = new Thread(() =>
      SessionCache.memo(spark, "cachespec:held") {
        holderHasLock.countDown()
        // simulate a builder awaiting a stream that can't progress
        releaseHolder.await(30, TimeUnit.SECONDS); 1
      }, "cachespec-holder")
    holder.start()
    assert(holderHasLock.await(10, TimeUnit.SECONDS))
    val saved = SessionCache.streamTryLockMs
    SessionCache.streamTryLockMs = 250L
    try {
      val r = onFakeStreamThread(SessionCache.memo(spark, "cachespec:other") { 2 })
      r match {
        case Left(e: IllegalStateException) =>
          assert(e.getMessage.contains("could not acquire"), e.getMessage)
        case other => fail(s"expected IllegalStateException, got $other")
      }
    } finally {
      SessionCache.streamTryLockMs = saved
      releaseHolder.countDown(); holder.join(10000)
      SessionCache.release(spark, _.startsWith("cachespec:"))
    }
  }

  test("stream thread proceeds when an unrelated holder finishes in time") {
    val holderHasLock = new CountDownLatch(1)
    val holder = new Thread(() =>
      SessionCache.memo(spark, "cachespec:brief") {
        holderHasLock.countDown(); Thread.sleep(300); 1
      }, "cachespec-brief-holder")
    holder.start()
    assert(holderHasLock.await(10, TimeUnit.SECONDS))
    // bound far above the holder's 300 ms: must NOT throw
    val r = onFakeStreamThread(SessionCache.memo(spark, "cachespec:after") { 7 })
    assert(r == Right(7), s"stream memo should succeed past a brief holder: $r")
    holder.join(10000)
    SessionCache.release(spark, _.startsWith("cachespec:"))
  }

  test("re-memo after release is detected in rebuiltAfterRelease") {
    // fresh session so Bench-style global state on the shared session
    // (and other suites' keys) can't leak into the assertion
    val s2 = spark.newSession()
    assert(SessionCache.rebuiltAfterRelease(s2).isEmpty)
    SessionCache.memo(s2, "cachespec:leaky") { 1 }
    SessionCache.release(s2, _ == "cachespec:leaky")
    SessionCache.memo(s2, "cachespec:leaky") { 2 }
    assert(SessionCache.rebuiltAfterRelease(s2) == Seq("cachespec:leaky"))
    SessionCache.clear(s2)
    assert(SessionCache.rebuiltAfterRelease(s2).isEmpty,
      "clear must reset the rebuild record")
  }
}
