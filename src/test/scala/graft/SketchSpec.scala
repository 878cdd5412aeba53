package graft

import org.apache.spark.sql.functions._

/** Approximate aggregates: sketches can't hash-match a different
  * engine's implementation, so they're verified by error bound against
  * the exact answer instead of by oracle.
  */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val orders = Tables.load(spark, sfDir, "orders")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val approx = orders.select(approx_count_distinct(col("o_custkey"), 0.02))
      .head().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val approxMedian = li.select(
      percentile_approx(col("l_quantity"), lit(0.5), lit(1000))).head().getDouble(0)
    val exact = li.select(expr("percentile(l_quantity, 0.5)")).head().getDouble(0)
    assert(math.abs(approxMedian - exact) <= 1.0,
      s"approx=$approxMedian exact=$exact")
  }
}
