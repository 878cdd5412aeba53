package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** Aggregation, window, set-op, dedup, pivot, SCD2 and recursive-CTE operators.
  *
  * Split out of the former monolithic Relational.scala along its
  * section families; mixed back into [[Relational]], so every member
  * keeps its `Relational.x` address and the query/oracle maps there.
  */
trait RelationalAggs extends RelationalBase {

  // A14: HAVING-above-average — groups kept only if their total beats
  // the mean group total. The threshold comes from EXACT quantities
  // (one decimal grand total / a group count), broadcast to the group
  // rows — not a double re-aggregation whose sum order could differ
  // between engines.
  def aboveAvgGroups(spark: SparkSession, dir: String): DataFrame = {
    val groups = Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
    val threshold = Tables.load(spark, dir, "orders")
      .agg((dsum(col("o_totalprice")) /
        countDistinct(col("o_orderpriority"))).as("avg_group_total"))
    groups.crossJoin(broadcast(threshold))
      .filter(col("total") > col("avg_group_total"))
      .select(col("o_orderpriority"), col("n_orders"), col("total"),
        col("avg_group_total"))
      .orderBy(col("o_orderpriority"))
  }

  // W: ntile bucketing — the remaining rank-family window function
  // (w05 covers lag/lead/rank/dense_rank, w07 percent_rank/cume_dist).
  // Quartiles of order value within each priority, published as
  // per-bucket digests; the ORDER BY carries the orderkey tiebreak so
  // bucket membership is total-ordered and engine-stable.
  def ntileQuartiles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .withColumn("quartile", ntile(4).over(w))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  // A2: dedup via DISTINCT.
  def distinctSegments(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_nationkey"))
      .distinct()

  // A3: validation counts across tables (reference etl.py:31-43).
  def tableCounts(spark: SparkSession, dir: String): DataFrame = {
    val dfs = Seq("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
      .map(t => Tables.load(spark, dir, t).agg(count(lit(1)).as("n_rows")).select(lit(t).as("tbl"), col("n_rows")))
    dfs.reduce(_.unionAll(_)).orderBy(col("tbl"))
  }

  // Skew-safe distinct aggregation: COUNT(DISTINCT) per low-cardinality
  // group as an explicit two-phase plan — phase 1 shuffles on
  // (group, distinct-value) so no reducer hotspot forms on the 3-status
  // key space; phase 2 counts the deduped pairs. This is the rewrite a
  // 100 TB distinct-agg needs spelled out as a first-class operator.
  def twoPhaseDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"), col("o_custkey"))
      .agg(count(lit(1)).as("_n"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("o_orderstatus"))

  // Conditional aggregation — the FILTER-clause surface: per-nation
  // order stats split by status/priority predicates in ONE pass over
  // the join (no per-predicate re-scan), the idiom that replaces N
  // separate filtered aggregations at 100 TB.
  def conditionalAggs(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n_orders"),
        count_if(col("o_orderstatus") === "F").as("n_finished"),
        count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"),
        sum(when(col("o_orderstatus") === "F",
            col("o_totalprice").cast(DecimalType(18, 2))))
          .cast(DoubleType).as("finished_total"))
      .orderBy(col("c_nationkey"))
  }

  // Rollup (hierarchical subtotals + grand total) — beyond the reference
  // surface, single pass via Expand.
  def rollupCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_price"))

  // Cube (all 2³ grouping combinations) over status × priority × year —
  // the dashboard-style companion to a09's rollup. Same single-pass
  // Expand plan: 8× row fan-out BEFORE the shuffle, partial aggregation
  // applies per grouping set, so the exchange carries at most
  // Σ|grouping-set key spaces| rows per mapper — safe at 100 TB (the
  // fan-out multiplies mapper CPU, not reducer skew).
  def cubeCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .cube(col("o_orderstatus"), col("o_orderpriority"), col("o_year"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total_price"))

  // RANGE-framed window: per-customer trailing-30-day order totals —
  // the event-time sliding aggregate expressed as a window frame over
  // an integer day key (w05's frames are ROWS; RANGE differs exactly
  // when peers tie on the order key, which this data has). One
  // exchange + sort per (partition, order) spec, frame evaluation is
  // streaming within the sort — scale cost identical to any analytic
  // window. DECIMAL running sums keep the doubles bit-identical.
  def rangeWindow(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
      .rangeBetween(-29, 0)
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).as("day"),
        dec(col("o_totalprice")).as("p"))
      .select(col("o_orderkey"), col("o_custkey"), col("day"),
        sum(col("p")).over(w).cast(DoubleType).as("sum_30d"),
        count(lit(1)).over(w).as("n_30d"))
  }

  // Full analytic-window surface over one shuffle: lag/lead, rank/
  // dense_rank, ntile, and a running sum share the SAME (partition,
  // order) spec, so Catalyst evaluates all six in a single Window
  // operator after one hash exchange — the shape to insist on at 100 TB
  // (each distinct window spec costs its own sort/shuffle).
  def windowSuite(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .select(
        col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        lag(col("o_orderkey"), 1).over(w).as("prev_key"),
        lead(col("o_orderkey"), 1).over(w).as("next_key"),
        rank().over(w).as("rk"),
        dense_rank().over(w).as("drk"),
        ntile(4).over(w).as("quartile"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast(DoubleType).as("running_total"))
  }

  // GROUPING SETS with hand-picked sets — the general form behind
  // rollup/cube, plus GROUPING() markers to disambiguate subtotal rows
  // from genuine NULL keys (cast to INT for a stable cross-engine type).
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .createOrReplaceTempView("orders_gs")
    spark.sql(
      """SELECT o_orderstatus, o_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        |  CAST(GROUPING(o_year) AS INT) AS g_year
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_year), (o_orderstatus, o_year))
        |""".stripMargin)
  }

  // Latest-wins upsert (MERGE emulation on immutable storage): a batch
  // of updates is unioned with the base, versioned, and resolved with a
  // per-key row_number — the lakehouse pattern for UPDATE/MERGE when
  // the table format is plain parquet. Updates here are derived
  // deterministically (every 10th key gets status 'U', doubled price).
  def upsertLatestWins(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .withColumn("_v", lit(0))
    val updates = Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") % 10 === 0)
      .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"))
      .withColumn("_v", lit(1))
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("_v").desc)
    base.unionByName(updates)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
  }

  // SCD type-2 dimension build: each customer's order history becomes
  // versioned rows with [effective_from, effective_to) validity — the
  // warehouse pattern for historizing a changing dimension. One window
  // over (key, change time): effective_to = next change's date (null =
  // current), is_current flags the open version. Single shuffle on the
  // key; at 100 TB this is exactly the incremental-dim rebuild shape.
  /** The (key, change, date, status) source rows the SCD2 dim is built
    * from — orders of the first 300 customers. */
  private def scd2Source(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .select(col("o_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_orderstatus"))

  private def scd2VersionsOf(src: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    src
      .withColumn("version", row_number().over(w))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
  }

  /** SCD2 version intervals with native timestamps — shared by the
    * history dump (u02) and the point-in-time lookup (u03). */
  private def scd2Versions(spark: SparkSession, dir: String): DataFrame =
    scd2VersionsOf(scd2Source(spark, dir))

  def scd2CustomerStatus(spark: SparkSession, dir: String): DataFrame =
    scd2Versions(spark, dir)
      .select(
        col("o_custkey"), col("version"),
        col("o_orderstatus").as("status"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("effective_from"),
        date_format(col("next_date"), "yyyy-MM-dd").as("effective_to"),
        col("next_date").isNull.as("is_current"))

  // SCD2 point-in-time lookup: each line-item shipment resolves the
  // customer-status version effective ON ITS SHIP DATE — the standard
  // dimensional-warehouse probe against a versioned dim. Equi-join on
  // the customer key carries the validity-range predicate as a cheap
  // post-join filter; version fan-out per key is bounded (a customer's
  // version count), so the join stays a plain hash/sort-merge equi-join
  // at any scale — no interval machinery needed when the dim's history
  // per key is small, which is what SCD2 guarantees.
  def scd2PointInTime(spark: SparkSession, dir: String): DataFrame = {
    val dim = scd2Versions(spark, dir).select(
      col("o_custkey").as("v_custkey"), col("version"),
      col("o_orderstatus").as("status"),
      col("o_orderdate").as("from_d"), col("next_date").as("to_d"))
    val probes = Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .join(Tables.load(spark, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey"), col("l_orderkey"), col("l_linenumber"), col("l_shipdate"))
    probes.join(dim,
        col("o_custkey") === col("v_custkey") &&
          col("l_shipdate") >= col("from_d") &&
          (col("to_d").isNull || col("l_shipdate") < col("to_d")))
      .select(col("o_custkey"), col("l_orderkey"), col("l_linenumber"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("version"), col("status"))
  }

  // U5: SCD2 INCREMENTAL merge — the nightly-dim-build contract: an
  // existing versioned dim plus a change batch must equal the full
  // rebuild, WITHOUT re-windowing history. The merge touches only (a)
  // each changed key's open row (closed at the key's first batch date)
  // and (b) the batch rows (version numbers continue from the key's
  // stored max; one window over the BATCH only). Unchanged keys pass
  // through untouched — at 100 TB the work is O(batch + touched keys),
  // not O(history), and emitting the same output as u02's rebuild is
  // exactly what the shared oracle verifies.
  def scd2IncrementalMerge(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = to_date(lit("1996-01-01"))
    val src = scd2Source(spark, dir)
    val dim = scd2VersionsOf(src.filter(col("o_orderdate") < cutoff))
    val batch = src.filter(col("o_orderdate") >= cutoff)
    val stats = dim.groupBy(col("o_custkey")).agg(max(col("version")).as("maxv"))
    val firstBatch = batch.groupBy(col("o_custkey"))
      .agg(min(col("o_orderdate")).as("first_new"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val newVers = batch
      .join(stats, Seq("o_custkey"), "left")
      .withColumn("version", row_number().over(w) + coalesce(col("maxv"), lit(0)))
      .withColumn("next_date", lead(col("o_orderdate"), 1).over(w))
      .drop("maxv")
    val patched = dim.join(firstBatch, Seq("o_custkey"), "left")
      .withColumn("next_date",
        when(col("next_date").isNull, col("first_new")).otherwise(col("next_date")))
      .drop("first_new")
    patched.unionByName(newVers)
      .select(
        col("o_custkey"), col("version"),
        col("o_orderstatus").as("status"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("effective_from"),
        date_format(col("next_date"), "yyyy-MM-dd").as("effective_to"),
        col("next_date").isNull.as("is_current"))
  }

  // Set operations (INTERSECT / EXCEPT, set semantics with dedup) —
  // beyond the reference surface: customer cohorts across two years.
  def setOpsCohorts(spark: SparkSession, dir: String): DataFrame = {
    def cohort(y: Int) = Tables.load(spark, dir, "orders")
      .filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey"))
    cohort(1995).intersect(cohort(1996)).withColumn("op", lit("both"))
      .unionAll(cohort(1995).except(cohort(1996)).withColumn("op", lit("only_1995")))
  }

  // A7: order-stable dedup — keep latest order per customer via row_number
  // (reference dataprep.py:40 drop_duplicates-keeps-first semantics).
  def dedupFirstOrder(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    Tables.load(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("o_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
  }

  // W1: group-average attached to detail rows as a window (reference
  // dataprep.py:181-184 agg+join collapsed into one shuffle).
  def windowGroupAvg(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_orderkey"))
    Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"),
        (sum(col("l_quantity")).over(w) / count(lit(1)).over(w)).as("avg_order_qty"))
  }

  // W2: pivot rows→columns (reference race pivot, dataprep.py:16-32).
  def pivotOrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", prios)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy(col("o_orderstatus"))
  }

  // W2 inverse: first-class unpivot (melt) of the pivoted counts back to
  // long form — columns→rows, the reverse reshape of w02.
  def unpivotPriority(spark: SparkSession, dir: String): DataFrame = {
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    pivotOrderPriority(spark, dir)
      .unpivot(Array(col("o_orderstatus")), prios.map(p => col(s"`$p`")).toArray,
        "o_orderpriority", "n")
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))
  }

  // W: the distribution-analytic window functions w05 doesn't cover —
  // percent_rank / cume_dist / first_value / last_value / nth_value —
  // one window spec, one shuffle, same partition bounds as w05.
  def windowAnalytics(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 300)
      .select(
        col("o_custkey"), col("o_orderkey"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        first_value(col("o_orderkey")).over(full).as("first_key"),
        last_value(col("o_orderkey")).over(full).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(full).as("second_key"))
  }

  // W3: surrogate keys (reference IDENTITY(1,1)) via the partition-offset
  // path in [[Keys.scalableSurrogate]] — same ids as a global
  // row_number() window, with no single-partition stage in the plan.
  def surrogateKeys(spark: SparkSession, dir: String): DataFrame =
    Keys.scalableSurrogate(
      Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_name")),
      Seq(col("c_name"), col("c_custkey")), "c_id")

  // Recursive CTE (Spark 4 WITH RECURSIVE → iterative UnionLoop):
  // hierarchy walk over the implicit customer tree parent(c) = c DIV 10
  // (roots are custkey < 10; the recursive step must exclude them or
  // key 0 self-loops — 0 DIV 10 = 0 — and the loop never exhausts).
  // Each recursion level is one distributed
  // join against the full customer table — depth is bounded by
  // log10(max key), so the loop runs ~5 rounds at any scale; per-depth
  // digest keeps the result compact while pinning every level's
  // membership via count/min/max/sum.
  def recursiveHierarchy(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH RECURSIVE h AS (
        |  SELECT c_custkey AS custkey, c_custkey AS root, 1 AS depth
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, h.root, h.depth + 1
        |  FROM customer c JOIN h ON c.c_custkey DIV 10 = h.custkey
        |  WHERE c.c_custkey >= 10)
        |SELECT depth, COUNT(*) AS n_nodes,
        |  COUNT(DISTINCT root) AS n_roots,
        |  MIN(custkey) AS min_key, MAX(custkey) AS max_key,
        |  CAST(SUM(custkey) AS BIGINT) AS sum_keys
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
  }
}
