package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** j15: AQE skew-join splitting actually fires and never changes the
  * result. The thresholds that decide "skewed" are absolute byte sizes
  * tuned for production shuffles, so the test scales them down to the
  * fixture data on a CHILD session (the production session keeps its
  * defaults — exactly how a real cluster would tune a skewed stage).
  */
class SkewSpec extends SparkSpec {

  test("j15 AQE splits the hot partition (skew=true) and preserves the join result") {
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // scale the absolute thresholds to fixture-size shuffles: a reduce
    // partition is "skewed" above 8 KB (and 2x the median), and gets
    // split into ~4 KB chunks; sf0.01 gives the hot partition enough
    // compressed shuffle bytes to clear the threshold decisively
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8k")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4k")
    // partition coalescing would re-merge the tiny fixture partitions
    // before skew detection sees them
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")

    val skewDir = sf01Dir
    val df = Skew.aqeSkewJoin(s, skewDir)
    df.collect() // execute so the adaptive plan is final
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("skew=true"),
      s"expected a skew-split sort-merge join in the final adaptive plan:\n$plan")

    // and the result equals the plain (non-adaptive-skew) join on the
    // parent session with default thresholds
    assertSameRows(df, Skew.aqeSkewJoin(spark, skewDir))
  }

  test("j15 hot key carries ~90% of the fact rows (the skew is real)") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val total = li.count()
    val hot = li.filter(pmod(col("l_orderkey"), lit(10)) =!= 0).count()
    assert(hot.toDouble / total > 0.8, s"hot share ${hot.toDouble / total}")
  }
}
