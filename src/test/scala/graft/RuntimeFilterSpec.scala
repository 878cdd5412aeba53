package graft

import graft.operators.Relational

/** s16: runtime Bloom-filter injection actually rewrites the fact side
  * and never changes the result. The application-side size threshold is
  * production-sized (10 GB), so the test scales it down on a child
  * session — same pattern as SkewSpec — and asserts the injected
  * bloom_filter_might_contain predicate in the optimized plan.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("s16 bloom filter is injected on the fact side and preserves results") {
    val s = spark.newSession()
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    // injection requires a PROBABLE shuffle join: at fixture scale the
    // filtered dim is broadcast-able by size estimate, which vetoes the
    // bloom filter (broadcast joins don't need one) — mimic the
    // production case where neither side fits a broadcast
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val df = Relational.bloomFilterJoin(s, sfDir)
    df.collect()
    val plan = df.queryExecution.optimizedPlan.toString()
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"expected an injected bloom filter in the optimized plan:\n$plan")
    assertSameRows(df, Relational.bloomFilterJoin(spark, sfDir))
  }
}
