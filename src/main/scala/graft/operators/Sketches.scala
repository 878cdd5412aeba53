package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{CountMin, KmvDistinct}

/** Sketch aggregates. [[graft.functions.KmvDistinct]] is deliberately
  * built on an engine-reproducible hash (`pmod(a·x+b, 2³¹−1)` integer
  * arithmetic), so unlike HLL the whole sketch — buffer contents,
  * k-th minimum, estimate — is bit-identical in the DuckDB oracle.
  */
object Sketches {

  private val P = 2147483647L
  private val A = 2654435761L
  private val B = 104729L

  /** Per-status distinct-customer estimate from the KMV sketch, next to
    * the exact count — the oracle checks BOTH (the estimate is a pure
    * function of the data under the shared hash).
    */
  def kmvDistinctCustomers(spark: SparkSession, dir: String): DataFrame = {
    KmvDistinct.register(spark)
    // key pre-reduced mod P BEFORE the multiply: A·x raw overflows
    // int64 once keys exceed ~3.5·10⁹ (the sf1 scale sweep's 2⁴⁰ key
    // shift ANSI-errored here, round 16) — A·(x mod P) stays < 2⁶³ for
    // ANY int64 key and is congruent mod P, so every hash value (and
    // the gate's hashes) is unchanged where the raw form didn't overflow
    val h = pmod(lit(A) * pmod(col("o_custkey"), lit(P)) + lit(B), lit(P))
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), h.as("hv"), col("o_custkey"))
      // single-split guard: the interpreted KMV partial agg must run on
      // all cores, not the scan's one partition (at real scale the scan
      // has many splits and this is a cheap co-partitioning)
      .repartition(col("o_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        call_function("kmv_distinct", col("hv")).as("kmv_estimate"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .orderBy(col("o_orderstatus"))
  }

  /** d12: count-min frequency estimates next to the exact counts.
    * ONE pass over events builds the sketch (a single 4×256 counter
    * grid shipped through partial aggregation); the probe side reads
    * `min_j sk[j·W + h_j(k)]` out of the broadcast single-row sketch.
    * The oracle recomputes every probed counter as the sum of the true
    * counts of all colliding keys — verifying the estimates exactly,
    * collisions included, not just "close to exact".
    */
  def cmsEventCounts(spark: SparkSession, dir: String): DataFrame = {
    CountMin.register(spark)
    val events = Tables.load(spark, dir, "events")
    probeCms(spark, events,
      events.agg(call_function("count_min_agg", col("user_id")).as("sk")))
  }

  /** e14: the SAME sketch built incrementally by a streaming query —
    * count-min's additive counters are exactly the shape streaming
    * state wants (bounded size, merge-order-free), so a complete-mode
    * global aggregate over the event stream converges to bit-identical
    * counters as d12's batch pass, and the two queries share ONE oracle
    * text. This is the end-to-end proof of the sketch's mergeable-state
    * claim, not a separate operator.
    */
  def cmsEventCountsStreaming(spark: SparkSession, dir: String): DataFrame = {
    val sk = Events.runAvailableNow(spark, { s =>
      CountMin.register(s)
      Events.eventsStream(s, dir)
        .groupBy()
        .agg(call_function("count_min_agg", col("user_id")).as("sk"))
    }, "e14_cms_sink", "complete")
    probeCms(spark, Tables.load(spark, dir, "events"), sk)
  }

  /** Probe users 1-10 against the single-row sketch frame `sk`:
    * estimate = min over rows of the addressed counter, next to the
    * exact count from `events`.
    */
  private def probeCms(spark: SparkSession, events: DataFrame,
                       sk: DataFrame): DataFrame = {
    val probes = spark.range(1, 11).select(col("id").as("user_id"))
    val est = (0 until CountMin.Depth).map { j =>
      val h = pmod(lit(CountMin.a(j)) * pmod(col("user_id"), lit(CountMin.P)) + lit(CountMin.b(j)),
        lit(CountMin.P))
      element_at(col("sk"),
        (pmod(h, lit(CountMin.Width.toLong)) + lit(j * CountMin.Width) + 1)
          .cast("int"))
    }
    val exact = events.filter(col("user_id").between(1, 10))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("exact_count"))
    probes.crossJoin(broadcast(sk))
      .select(col("user_id"), least(est: _*).as("cms_estimate"))
      .join(exact, Seq("user_id"), "left")
      .select(col("user_id"), col("cms_estimate"),
        coalesce(col("exact_count"), lit(0L)).as("exact_count"))
      .orderBy(col("user_id"))
  }

  /** a15: one-pass (min, max, sum, count) per group through a typed
    * `Aggregator` registered with `udaf()` — the USER-level custom
    * aggregate API (KMV/count-min above are the engine-level
    * `TypedImperativeAggregate` path). The struct result is flattened
    * to scalars for the oracle compare.
    */
  def typedStatsAgg(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.PriceStats.register(spark)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"),
        (col("o_totalprice").cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
          .cast(org.apache.spark.sql.types.LongType).as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(call_function("price_stats", col("cents")).as("s"))
      .select(col("o_orderstatus"),
        col("s.min").as("min_cents"), col("s.max").as("max_cents"),
        col("s.sum").as("sum_cents"), col("s.cnt").as("n_orders"))
      .orderBy(col("o_orderstatus"))
  }

  /** d18: Spark's built-in approximate aggregates on the ORACLE GATE.
    * HLL++ (`approx_count_distinct`) and `approx_percentile` sketch
    * internals cannot be replayed by another engine, so the published
    * row is the EXACT value (independently recomputed by DuckDB) plus
    * an explicit within-ε boolean evaluated Spark-side; the oracle
    * emits the same exacts and literal TRUE. A sketch drifting past ε
    * flips the boolean and fails the hash — the estimates leave
    * test-only status and sit on the same gate as everything else.
    * ε = 5%: 2.5σ for HLL at rsd 0.02; generous for the median at
    * accuracy 1000 over ~25k cent values per group.
    */
  def approxSketchGate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, LongType}
    val eps = 0.05
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), col("o_custkey"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast(LongType).as("cents"))
      .repartition(col("o_custkey"))
    // exact distinct via the explicit two-phase shape (a08): a
    // countDistinct in the SAME aggregate as the percentiles would
    // trigger the Expand-based multi-distinct plan — every row
    // duplicated per aggregate group, the percentile buffers fed 2×
    // the rows (measured 9 s vs 5 s for the two passes at sf0.1)
    val exactD = base.select(col("o_orderstatus"), col("o_custkey")).distinct()
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("exact_distinct"))
    base
      .groupBy(col("o_orderstatus"))
      .agg(
        approx_count_distinct(col("o_custkey"), 0.02).as("acd"),
        expr("percentile(cents, 0.5)").as("exact_med"),
        expr("approx_percentile(cents, 0.5, 1000)").as("apct"))
      .join(exactD, "o_orderstatus")
      .select(col("o_orderstatus"), col("exact_distinct"),
        (abs(col("acd") - col("exact_distinct"))
          / col("exact_distinct") <= eps).as("acd_within_eps"),
        (abs(col("apct") - col("exact_med"))
          / col("exact_med") <= eps).as("apct_within_eps"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "a15_typed_udaf" -> (typedStatsAgg _),
    "d18_approx_sketch_gate" -> (approxSketchGate _),
    "d06_kmv_distinct" -> (kmvDistinctCustomers _),
    "d12_count_min" -> (cmsEventCounts _),
    "e14_stream_count_min" -> (cmsEventCountsStreaming _))

  private val oraclesBase: Map[String, String] = Map(
    // exact values recomputed independently; the TRUE literals are the
    // ε-contract — Spark's sketches must agree or the hash fails
    "d18_approx_sketch_gate" ->
      """SELECT o_orderstatus,
        |  COUNT(DISTINCT o_custkey) AS exact_distinct,
        |  TRUE AS acd_within_eps, TRUE AS apct_within_eps
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a15_typed_udaf" ->
      """WITH c AS (SELECT o_orderstatus,
        |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
        |  FROM orders)
        |SELECT o_orderstatus, MIN(cents) AS min_cents, MAX(cents) AS max_cents,
        |  CAST(SUM(cents) AS BIGINT) AS sum_cents, COUNT(*) AS n_orders
        |FROM c GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "d06_kmv_distinct" ->
      s"""WITH h AS (SELECT o_orderstatus, o_custkey,
         |        ($A * (o_custkey % $P) + $B) % $P AS hv FROM orders),
         |d AS (SELECT DISTINCT o_orderstatus, hv FROM h),
         |r AS (SELECT o_orderstatus, hv,
         |        ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY hv) AS rn,
         |        COUNT(*) OVER (PARTITION BY o_orderstatus) AS n FROM d),
         |km AS (SELECT o_orderstatus,
         |         CASE WHEN MAX(n) < ${KmvDistinct.DefaultK} THEN CAST(MAX(n) AS DOUBLE)
         |              ELSE ${KmvDistinct.DefaultK - 1}.0 * $P
         |                   / MAX(CASE WHEN rn = ${KmvDistinct.DefaultK} THEN hv END) END AS kmv_estimate
         |       FROM r GROUP BY 1),
         |ex AS (SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS exact_distinct
         |       FROM orders GROUP BY 1)
         |SELECT km.o_orderstatus, kmv_estimate, exact_distinct
         |FROM km JOIN ex USING (o_orderstatus) ORDER BY 1""".stripMargin,
    "d12_count_min" -> {
      import graft.functions.CountMin.{Depth, Width}
      val CP = graft.functions.CountMin.P
      s"""WITH par AS (SELECT j, 2654435761 + j*40503 AS a, 104729 + j*7919 AS b
         |             FROM (SELECT unnest(range(0, $Depth)) AS j)),
         |c AS (SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY 1),
         |cells AS (SELECT par.j, ((par.a * (c.user_id % $CP) + par.b) % $CP) % $Width AS cell,
         |                 CAST(SUM(c.cnt) AS BIGINT) AS cellsum
         |          FROM c CROSS JOIN par GROUP BY 1, 2),
         |pr AS (SELECT pb.user_id, par.j,
         |              ((par.a * (pb.user_id % $CP) + par.b) % $CP) % $Width AS cell
         |       FROM (SELECT unnest(range(1, 11)) AS user_id) pb CROSS JOIN par),
         |est AS (SELECT pr.user_id,
         |               MIN(COALESCE(cells.cellsum, 0)) AS cms_estimate
         |        FROM pr LEFT JOIN cells USING (j, cell) GROUP BY 1),
         |ex AS (SELECT user_id, COUNT(*) AS exact_count FROM events
         |       WHERE user_id BETWEEN 1 AND 10 GROUP BY 1)
         |SELECT est.user_id, cms_estimate,
         |       COALESCE(ex.exact_count, 0) AS exact_count
         |FROM est LEFT JOIN ex USING (user_id) ORDER BY 1""".stripMargin
    })

  // the stream converges to the identical sketch -> identical oracle
  val oracles: Map[String, String] =
    oraclesBase + ("e14_stream_count_min" -> oraclesBase("d12_count_min"))
}
