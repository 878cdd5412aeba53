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

  test("KmvDistinct estimate within KMV error bounds of exact") {
    val rows = graft.operators.Sketches.kmvDistinctCustomers(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(1), r.getLong(2))
      // k=64 -> relative standard error ~1/sqrt(k-2) ~ 12.7%; allow 3 sigma
      assert(math.abs(est - exact) / exact <= 0.4, s"est=$est exact=$exact")
    }
  }

  test("KmvDistinct is exact below k distinct values") {
    import spark.implicits._
    graft.functions.KmvDistinct.register(spark)
    val df = Seq.tabulate(200)(i => (i % 5, (i % 30).toLong)).toDF("g", "v")
      .selectExpr("g", "pmod(2654435761 * v + 104729, 2147483647) as hv")
      .groupBy("g").agg(expr("kmv_distinct(hv)").as("est"))
    // 30 distinct hashes per group < k=64 -> sketch is exact
    assert(df.collect().forall(r => r.getDouble(1) == 30.0 ||
      { val g = r.getInt(0); r.getDouble(1) == Seq.tabulate(200)(i => (i % 5, i % 30))
          .filter(_._1 == g).map(_._2).distinct.size.toDouble }))
  }

  test("CountMin never underestimates and row sums equal input size") {
    val sk = graft.operators.Sketches.cmsEventCounts(spark, sfDir).collect()
    assert(sk.nonEmpty)
    sk.foreach { r =>
      val (est, exact) = (r.getLong(1), r.getLong(2))
      assert(est >= exact, s"CMS underestimated: est=$est exact=$exact")
    }
    // every sketch row is a partition of the input: its counters sum to n
    graft.functions.CountMin.register(spark)
    val events = Tables.load(spark, sfDir, "events")
    val n = events.count()
    val arr = events.agg(expr("count_min_agg(user_id)")).head()
      .getSeq[Long](0)
    import graft.functions.CountMin.{Depth, Width}
    assert(arr.length == Depth * Width)
    (0 until Depth).foreach { j =>
      val rowSum = arr.slice(j * Width, (j + 1) * Width).sum
      assert(rowSum == n, s"row $j sums to $rowSum, want $n")
    }
  }

  test("CountMin merge is order-independent (additive counters)") {
    import spark.implicits._
    graft.functions.CountMin.register(spark)
    val df = Seq.tabulate(1000)(i => (i % 7).toLong).toDF("k")
    val one = df.coalesce(1).agg(expr("count_min_agg(k)")).head().getSeq[Long](0)
    val many = df.repartition(13).agg(expr("count_min_agg(k)")).head().getSeq[Long](0)
    assert(one == many)
  }

  test("CountMin.cell matches the pmod mirror for negative keys") {
    // round-16 advice: signed `x % P` and pmod(x, P) pick residue
    // representatives differing by P for x < 0, and P % Width != 0 maps
    // them to DIFFERENT Width cells — cell() now floorMods both
    // reductions so a JVM-built sketch and the Spark/SQL pmod mirror
    // agree over the full int64 key domain, not just positive keys
    import graft.functions.CountMin.{Depth, P, Width, a, b, cell}
    def pmodCell(j: Int, x: Long): Int = {
      val xr = ((x % P) + P) % P
      val h = (((a(j) * xr + b(j)) % P) + P) % P
      (h % Width).toInt
    }
    val keys = Seq(-1L, -7L, -P, -P - 1, Long.MinValue, Long.MinValue + 1,
      0L, 1L, P - 1, P, Long.MaxValue, -4026531839L)
    for (j <- 0 until Depth; x <- keys)
      assert(cell(j, x) == pmodCell(j, x), s"j=$j x=$x")
  }

  test("a15 typed Aggregator runs with map-side partial aggregation") {
    val df = graft.operators.Sketches.typedStatsAgg(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    // the Aggregator path must plan as a two-phase object hash
    // aggregate (partial before the exchange, merge after) — a
    // single-phase plan would ship every row to one reducer per group
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2, plan)
    // and the result equals the built-in formulation
    val builtin = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"),
        sum(col("cents")).as("sum_cents"), count(lit(1)).as("n_orders"))
    assertSameRows(df, builtin)
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
