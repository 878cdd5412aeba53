package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.{AsOf, TextAnalysis}

/** Boundary and equivalence tests for the round-10 additions: the as-of
  * join core (j13/j20/e26) and the temperature-mixture sampler (k06).
  * The CORRECTNESS gate pins these against DuckDB at one data point;
  * this spec pins the SEMANTICS the gate can't reach — exact tolerance
  * boundaries, tie ordering, unmatched rows, quota arithmetic edges,
  * and micro-batch invariance.
  */
class AsOfSpec extends SparkSpec {

  test("joinAsOf equals the brute-force nearest-earlier join on a tie-dense random set") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // tiny (key, time) domain on purpose: equal-timestamp ties,
    // exact-boundary matches, and unmatched lefts all occur
    val left = Seq.tabulate(300)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong)).toDF("k", "t", "lid")
    val right = Seq.tabulate(80)(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong)).toDF("k", "rt", "rid0")
      .groupBy("k", "rt").agg(max(col("rid0")).as("rid")) // unique per (k, rt), per contract
    val got = AsOf.joinAsOf(left, right, "k", "t", "rt", "rid")
      .select(col("k"), col("t"), col("lid"), col("__asof").as("rid"))
    // reference: inequality left-join + per-left-row argmax on right time
    val exp = left.join(right.withColumnRenamed("k", "rk"),
        col("k") === col("rk") && col("rt") <= col("t"), "left")
      .withColumn("mx", max(col("rt")).over(Window.partitionBy(col("lid"))))
      .filter(col("rt") === col("mx") || col("mx").isNull)
      .select(col("k"), col("t"), col("lid"), col("rid"))
    assertSameRows(got, exp)
  }

  test("as-of tolerance boundary: staleness == bound kept, bound + 1 µs dropped, same-instant match is staleness 0") {
    import spark.implicits._
    val left = Seq((1L, AsOf.AsOfTolUs, 10L), (1L, AsOf.AsOfTolUs + 1, 20L),
      (1L, 0L, 30L)).toDF("k", "t", "lid")
    val right = Seq((1L, 0L, 99L)).toDF("k", "rt", "rid")
    val kept = AsOf.joinAsOfCore(left, right, "k", "t", "rt", "rid")
      .filter(col("__asof").isNotNull &&
        col("t") - col("__asof_t") <= AsOf.AsOfTolUs)
      .select("lid").as[Long].collect().toSet
    assert(kept == Set(10L, 30L), s"kept=$kept")
  }

  test("j20 staleness histogram equals in-test brute-force recomputation at sf0.001") {
    val got = AsOf.eventsAsOfOrdersTol(spark, sfDir)
    val evRaw = Tables.load(spark, sfDir, "events")
    val ev = evRaw.select(col("event_id"), col("user_id"), Tables.tsUs(evRaw).as("t_us"))
    val orders = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      .agg(max(col("o_orderkey")).as("ref_orderkey"))
    val exp = ev.join(orders, Seq("user_id")).filter(col("o_us") <= col("t_us"))
      .withColumn("mx", max(col("o_us")).over(Window.partitionBy(col("event_id"))))
      .filter(col("o_us") === col("mx"))
      .filter(col("t_us") - col("o_us") <= AsOf.AsOfTolUs)
      .select(col("user_id"), expr("(t_us - o_us) div 2592000000000").as("staleness_months"))
      .groupBy(col("staleness_months"))
      .agg(count(lit(1)).as("n_events"), count_distinct(col("user_id")).as("n_users"))
    assertSameRows(got, exp)
  }

  test("e26 streaming as-of enrichment equals the batch as-of join") {
    assertSameRows(AsOf.streamAsOfEnrich(spark, sfDir),
      AsOf.eventsAsOfOrders(spark, sfDir))
  }

  test("k06 quotas are the exact bigint allocation, n_sampled = min(quota, n_docs), runs reproducible") {
    val got = TextAnalysis.temperatureMixture(spark, sfDir).collect()
    assert(got.nonEmpty)
    val counts = got.map(r =>
      r.getAs[String]("source") -> r.getAs[Long]("n_docs")).toMap
    val q = counts.map { case (s, n) =>
      s -> BigInt(math.floor(math.sqrt(n.toDouble) * 1e6 + 0.5).toLong) }
    val sq = q.values.sum
    val budget = BigInt(counts.values.sum) * 200 / 1000
    for (r <- got) {
      val s = r.getAs[String]("source")
      val quota = budget * q(s) / sq
      assert(BigInt(r.getAs[Long]("quota")) == quota, s"quota mismatch for $s")
      assert(r.getAs[Long]("n_sampled") == quota.toLong.min(counts(s)),
        s"n_sampled != min(quota, n_docs) for $s")
    }
    // total stays within the budget even when shortfall redistributes nothing
    assert(got.map(_.getAs[Long]("n_sampled")).sum <= budget.toLong)
    val again = TextAnalysis.temperatureMixture(spark, sfDir).collect()
    assert(got.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "temperature mixture is not reproducible across runs")
  }
}
