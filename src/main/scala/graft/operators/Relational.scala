package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** Core relational operator inventory (SURVEY.md §2) re-expressed over the
  * driver's synthetic star schema. Each query has a DuckDB oracle in
  * [[oracles]]; column names are aligned between the two.
  *
  * Float determinism strategy: sums over doubles are order-dependent, so
  * any hash-compared aggregate of a double column goes through an exact
  * DECIMAL(18,2) cast first (sums of decimals are exact and
  * engine-order-independent), then back to double. Integral-valued double
  * columns (quantities) sum exactly in IEEE double (< 2^53) and need no
  * cast. Ratios/avgs are computed from those exact numerators in double —
  * bit-identical across engines.
  */
object Relational extends RelationalBase
    with RelationalAnalytics with RelationalJoins with RelationalAggs
    with RelationalLayout with RelationalQuality {

  // S1/S2/P1/F1..F4: scan → filter → project, pushdown-friendly.
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  // X15: MapType surface — per-priority status→count map built with
  // map_from_entries over SORTED entries (collect_list order is
  // partition-dependent; sorting the entry array before map
  // construction is what makes a map deterministic at all), then
  // consumed via element_at / map_keys / size. Published as scalars:
  // map columns don't hash-compare across engines, scalar lookups do.
  def mapOps(spark: SparkSession, dir: String): DataFrame = {
    // NULL can never be a map key (SQL 2200E, NullSweep finding):
    // production map-builders drop the null-keyed entry at the source;
    // no-op on the gate tables (o_orderstatus is never null there)
    val counts = Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus").isNotNull)
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
    counts.groupBy(col("o_orderpriority"))
      .agg(map_from_entries(array_sort(
        collect_list(struct(col("o_orderstatus"), col("n"))))).as("m"))
      .select(
        col("o_orderpriority"),
        size(col("m")).as("n_statuses"),
        element_at(col("m"), "F").as("n_f"),
        element_at(col("m"), "O").as("n_o"),
        element_at(col("m"), "P").as("n_p"),
        array_join(map_keys(col("m")), ",").as("statuses"))
      .orderBy(col("o_orderpriority"))
  }

  // String-function breadth over the customer dim — pad/translate/
  // repeat/ascii/locate, all codegen'd built-ins with exact DuckDB
  // equivalents.
  def stringFunctions(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") <= 500)
      .select(
        col("c_custkey"),
        lpad(col("c_mktsegment"), 12, ".").as("seg_lpad"),
        rpad(col("c_mktsegment"), 12, "_").as("seg_rpad"),
        translate(col("c_name"), "#0", "_O").as("name_translated"),
        repeat(substring(col("c_mktsegment"), 1, 2), 3).as("seg_repeat"),
        ascii(col("c_mktsegment")).as("seg_ascii"),
        locate("E", col("c_mktsegment")).as("e_pos"))

  // X1: string split / substring / case ops.
  def stringOps(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        split(col("c_name"), "#").getItem(1).as("name_num"),
        upper(col("c_mktsegment")).as("seg_upper"),
        lower(col("c_name")).as("name_lower"),
        substring(col("c_name"), 1, 8).as("name_prefix"),
        length(col("c_name")).as("name_len"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("seg_name"))

  // X2: hemisphere-style sign-dependent formatting with no UDF
  // (reference dataprep.py:144-145 row lambdas → when/concat/abs).
  def hemisphereFormat(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"),
        when(col("c_acctbal") < 0,
          concat(abs(col("c_acctbal")).cast(DecimalType(12, 2)).cast(StringType), lit("W")))
          .otherwise(concat(col("c_acctbal").cast(DecimalType(12, 2)).cast(StringType), lit("E")))
          .as("bal_fmt"))

  // X3: SAS epoch date decode — days since 1960-01-01 → date, no UDF
  // (reference dataprep.py:210-212 Python UDF → built-in date_add).
  def sasDateDecode(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_format(
          date_add(to_date(lit("1960-01-01")), (col("o_orderkey") % 20000).cast(IntegerType)),
          "yyyy-MM-dd").as("sas_date"))

  // X5: date part extraction + grouped counts.
  def datePartCounts(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).as("o_year"), month(col("o_orderdate")).as("o_month"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_year"), col("o_month"))

  // Exact interpolated percentiles per group (the distribution-profile
  // aggregate a data-quality pass runs): Spark `percentile` and DuckDB
  // `quantile_cont` share the q·(n−1) linear-interpolation definition.
  def percentileProfile(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.5)").as("p50_qty"),
        expr("percentile(l_quantity, 0.9)").as("p90_qty"),
        expr("percentile(l_quantity, 0.99)").as("p99_qty"))
      .orderBy(col("l_returnflag"))

  // F7: conjunctive WHERE incl. implicit string↔int cast (README.md:213).
  def conjunctiveFilter(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R" && col("l_linestatus") === "F" &&
        year(col("l_shipdate")) === "1995")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  // F2/F5/F6: null-cleaning filters (reference dataprep.py:105-107,164,
  // 221) — nulls are injected deterministically from the key, then
  // cleaned with isNotNull, na.drop("any"), and an inequality filter.
  def nullCleaning(spark: SparkSession, dir: String): DataFrame = {
    val withNulls = Tables.load(spark, dir, "orders")
      .withColumn("status2",
        when(col("o_orderkey") % 7 === 0, lit(null).cast(StringType))
          .otherwise(col("o_orderstatus")))
      .withColumn("prio2",
        when(col("o_orderkey") % 11 === 0, lit(null).cast(StringType))
          .otherwise(col("o_orderpriority")))
    withNulls
      .filter(col("status2").isNotNull)       // F2/F6
      .na.drop("any", Seq("prio2"))           // F5
      .filter(col("status2") =!= "P")         // F3 inequality cleaning
      .select(col("o_orderkey"), col("status2"), col("prio2"))
  }

  // X17: null-handling / conditional scalar surface — nullif, nvl(2),
  // coalesce chains, greatest/least (null-skipping), CASE precedence —
  // all codegen'd built-ins, exercised over derived nullable columns.
  def nullConditionals(spark: SparkSession, dir: String): DataFrame = {
    val bal = col("c_acctbal")
    Tables.load(spark, dir, "customer")
      .select(
        col("c_custkey"),
        nullif(col("c_nationkey") % 5, lit(0)).as("res5"),
        nvl(nullif(col("c_nationkey") % 5, lit(0)), lit(-1)).as("res5_filled"),
        nvl2(nullif(col("c_nationkey") % 5, lit(0)), lit("some"), lit("none")).as("res5_tag"),
        coalesce(nullif(col("c_mktsegment"), lit("BUILDING")),
          nullif(col("c_mktsegment"), lit("AUTOMOBILE")), lit("other")).as("seg_pref"),
        greatest(bal, lit(0.0)).as("bal_floor"),
        least(bal, lit(5000.0)).as("bal_cap"),
        when(bal < 0, "overdrawn").when(bal < 1000, "low").otherwise("high").as("bal_band"))
  }

  // Datetime-arithmetic surface: add_months / last_day / date_trunc /
  // datediff / day-of-week over order dates — all codegen'd built-ins,
  // emitted as formatted strings / integers for cross-engine compare.
  def dateArithmetic(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderkey") <= 2000)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus_3m"),
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("month_end"),
        date_format(date_trunc("quarter", col("o_orderdate")), "yyyy-MM-dd").as("quarter_start"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01"))).as("days_since_95"),
        dayofweek(col("o_orderdate")).as("dow"))

  // X19: ANSI-mode safe functions — Spark 4 runs ANSI SQL, so a bad
  // cast, division by zero, or integer overflow is an ERROR unless the
  // try_* variants absorb it to NULL. This pins that contract (per-row
  // NULL, not job failure — the semantics a 100 TB batch needs, where
  // one malformed row must not kill hour N of the job): try_cast on
  // unparseable strings, try_divide by a cycling zero, try_add at the
  // Long.MaxValue edge. Published as counts + an exact sum over the
  // surviving values.
  def tryFunctions(spark: SparkSession, dir: String): DataFrame = {
    // MaxValue - 20, chosen RELATIVE to the sampled keys (multiples of
    // 10): keys 10 and 20 survive try_add, keys >= 30 overflow to NULL —
    // both branches of the contract produce verifiable values
    val near = Long.MaxValue - 20L
    Tables.load(spark, dir, "orders")
      // every failing try_* pays a caught JVM exception — that IS the
      // semantics under test, but it makes per-row cost ~10µs, so pin
      // the edge-case volume with a deterministic 1-in-10 key sample
      // (the contract is per-row, not volume-dependent) and spread the
      // single-split scan across cores
      .filter(pmod(col("o_orderkey"), lit(10)) === 0)
      .repartition(col("o_orderkey"))
      .select(col("o_orderkey"),
        expr("try_cast(concat('x', o_orderkey) AS BIGINT)").as("bad_cast"),
        expr("try_cast(CAST(o_orderkey AS STRING) AS BIGINT)").as("ok_cast"),
        expr("try_divide(o_totalprice, o_orderkey % 3)").as("div3"),
        expr(s"try_add(o_orderkey, ${near}L)").as("near_max"))
      .agg(
        count(lit(1)).as("n_rows"),
        count(col("bad_cast")).as("n_bad_cast_ok"), // 0: every cast fails to NULL
        count(col("ok_cast")).as("n_ok_cast"),
        sum(col("ok_cast")).cast(LongType).as("sum_ok_cast"),
        sum(when(col("div3").isNull, 1L).otherwise(0L)).as("n_div_by_zero"),
        count(col("near_max")).as("n_no_overflow"),
        // cast to DECIMAL(38,0) BEFORE the sum: the surviving values sit
        // at the Long edge, so SUM(BIGINT) itself would overflow (ANSI
        // error); published as a string (HUGEINT vs decimal128 don't
        // hash-compare as numbers)
        sum(col("near_max").cast(DecimalType(38, 0))).cast(StringType).as("sum_near_max"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x19_try_functions" -> (tryFunctions _),
    "dq03_skew_report" -> (skewReport _),
    "q23_min_cost_supplier" -> (minCostSupplier _),
    "q11_important_stock" -> (importantStock _),
    "j19_lateral_topk" -> (lateralTopPerGroup _),
    "r01_recursive_hierarchy" -> (recursiveHierarchy _),
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_topk_orders" -> (topkOrders _),
    "q03_shipping_priority" -> (shippingPriority _),
    "q05_local_supplier_volume" -> (localSupplierVolume _),
    "q06_forecast_revenue" -> (forecastRevenue _),
    "q04_priority_check" -> (orderPriorityCheck _),
    "q07_volume_shipping" -> (volumeShipping _),
    "q08_market_share" -> (marketShare _),
    "q10_returned_items" -> (returnedItems _),
    "q09_product_profit" -> (productProfit _),
    "q12_late_shipments" -> (lateShipments _),
    "q13_order_distribution" -> (orderCountDistribution _),
    "q14_promo_revenue" -> (promoRevenue _),
    "q17_small_qty_revenue" -> (smallQtyRevenue _),
    "q18_large_orders" -> (largeOrders _),
    "q19_disjunctive_revenue" -> (disjunctiveRevenue _),
    "q22_sales_opportunity" -> (globalSalesOpportunity _),
    "q15_top_supplier" -> (topSupplier _),
    "q16_part_supplier_counts" -> (partSupplierCounts _),
    "q21_waiting_suppliers" -> (waitingSuppliers _),
    "dq01_quality_report" -> (qualityReport _),
    "dq04_fk_report" -> (fkIntegrityReport _),
    "w07_window_analytics" -> (windowAnalytics _),
    "j16_nullsafe_join" -> (nullSafeJoin _),
    "j17_shuffle_hash_hint" -> (hintedShuffleHashJoin _),
    "x17_null_conditionals" -> (nullConditionals _),
    "x14_moment_stats" -> (momentStats _),
    "x15_map_ops" -> (mapOps _),
    "x13_string_functions" -> (stringFunctions _),
    "f01_filter_project" -> (filterProject _),
    "f05_null_cleaning" -> (nullCleaning _),
    "f07_conjunctive_filter" -> (conjunctiveFilter _),
    "j02_left_join_counts" -> (leftJoinOrderCounts _),
    "j07_semi_join" -> (semiJoinCustomers _),
    "j08_anti_join" -> (antiJoinCustomers _),
    "j06_broadcast_part_join" -> (broadcastPartJoin _),
    "j10_cross_scalar_pct" -> (nationOrderShare _),
    "u01_upsert_latest_wins" -> (upsertLatestWins _),
    "a02_distinct" -> (distinctSegments _),
    "a03_table_counts" -> (tableCounts _),
    "a08_two_phase_distinct" -> (twoPhaseDistinct _),
    "a09_rollup" -> (rollupCounts _),
    "a11_cube" -> (cubeCounts _),
    "a12_grouping_sets" -> (groupingSets _),
    "a13_conditional_aggs" -> (conditionalAggs _),
    "a10_set_ops" -> (setOpsCohorts _),
    "a07_dedup_keep_first" -> (dedupFirstOrder _),
    "w01_window_group_avg" -> (windowGroupAvg _),
    "w02_pivot_priority" -> (pivotOrderPriority _),
    "w03_surrogate_keys" -> (surrogateKeys _),
    "w04_unpivot_priority" -> (unpivotPriority _),
    "w05_window_suite" -> (windowSuite _),
    "w06_range_window" -> (rangeWindow _),
    "x01_string_ops" -> (stringOps _),
    "x02_hemisphere_format" -> (hemisphereFormat _),
    "x03_sas_date_decode" -> (sasDateDecode _),
    "x05_date_part_counts" -> (datePartCounts _),
    "x12_date_arithmetic" -> (dateArithmetic _),
    "x10_percentile_profile" -> (percentileProfile _),
    "s05_csv_roundtrip" -> (csvRoundTrip _),
    "s13_json_roundtrip" -> (jsonRoundTrip _),
    "s23_text_roundtrip" -> (textRoundTrip _),
    "s24_compaction" -> (compaction _),
    "s14_orc_roundtrip" -> (orcRoundTrip _),
    "s07_sql_over_views" -> (sqlOverViews _),
    "s08_catalog_roundtrip" -> (catalogRoundTrip _),
    "s10_static_values_join" -> (staticValuesJoin _),
    "s11_partitioned_scan" -> (partitionedScan _),
    "s12_bucketed_agg" -> (bucketedAgg _),
    "s26_bucketed_join" -> (bucketedJoin _),
    "s16_bloom_filter_join" -> (bloomFilterJoin _),
    "s17_csv_permissive" -> (csvPermissive _),
    "s18_dynamic_overwrite" -> (dynamicPartitionOverwrite _),
    "s25_time_travel" -> (timeTravel _),
    "s19_schema_evolution" -> (schemaEvolution _),
    "s15_dynamic_pruning" -> (dynamicPruning _),
    "s20_sorted_shards" -> (sortedShards _),
    "s21_stats_pruned_scan" -> (statsPrunedScan _),
    "s22_zorder_clustering" -> (zorderClustering _),
    "w08_ntile_quartiles" -> (ntileQuartiles _),
    "q20_dominant_suppliers" -> (dominantSuppliers _),
    "u02_scd2_history" -> (scd2CustomerStatus _),
    "u05_scd2_incremental" -> (scd2IncrementalMerge _),
    "a14_above_avg_groups" -> (aboveAvgGroups _),
    "u03_scd2_point_in_time" -> (scd2PointInTime _))

  private val oraclesBase: Map[String, String] = Map(
    "x19_try_functions" ->
      """WITH t AS (SELECT o_orderkey,
        |    TRY_CAST('x' || o_orderkey AS BIGINT) AS bad_cast,
        |    TRY_CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS ok_cast,
        |    CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |         ELSE o_totalprice / (o_orderkey % 3) END AS div3,
        |    CASE WHEN o_orderkey > 20 THEN NULL
        |         ELSE o_orderkey + 9223372036854775787 END AS near_max
        |  FROM orders WHERE o_orderkey % 10 = 0)
        |SELECT COUNT(*) AS n_rows,
        |  COUNT(bad_cast) AS n_bad_cast_ok,
        |  COUNT(ok_cast) AS n_ok_cast,
        |  CAST(SUM(ok_cast) AS BIGINT) AS sum_ok_cast,
        |  CAST(SUM(CASE WHEN div3 IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_div_by_zero,
        |  COUNT(near_max) AS n_no_overflow,
        |  CAST(SUM(CAST(near_max AS HUGEINT)) AS VARCHAR) AS sum_near_max
        |FROM t""".stripMargin,
    "dq03_skew_report" ->
      """WITH g AS (SELECT l_suppkey AS k, COUNT(*) AS n FROM lineitem GROUP BY 1),
        |s AS (SELECT COUNT(*) AS n_keys, CAST(SUM(n) AS BIGINT) AS n_rows,
        |       MAX(n) AS max_rows, quantile_cont(n, 0.5) AS p50_rows,
        |       quantile_cont(n, 0.99) AS p99_rows FROM g),
        |t AS (SELECT k AS top_key, n AS top_rows FROM g ORDER BY n DESC, k LIMIT 1)
        |SELECT n_keys, n_rows, max_rows, p50_rows, p99_rows, top_key, top_rows,
        |  CAST(top_rows AS DOUBLE) / n_rows AS top_share,
        |  CAST(max_rows * n_keys AS DOUBLE) / n_rows AS skew_factor
        |FROM s, t""".stripMargin,
    "q23_min_cost_supplier" ->
      """WITH eu_supp AS (
        |  SELECT s_suppkey, s_name, s_acctbal FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  WHERE r_name = 'EUROPE'),
        |parts AS (
        |  SELECT p_partkey, p_brand, p_type FROM part
        |  WHERE p_size <= 10 AND p_type = 'STANDARD'),
        |cost AS (
        |  SELECT l_partkey, l_suppkey,
        |    MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
        |  FROM lineitem
        |  JOIN parts ON l_partkey = p_partkey
        |  JOIN eu_supp ON l_suppkey = s_suppkey
        |  GROUP BY 1, 2),
        |best AS (
        |  SELECT *, MIN(supply_cost) OVER (PARTITION BY l_partkey) AS min_cost
        |  FROM cost)
        |SELECT p_partkey, p_brand, p_type, s_name, s_acctbal,
        |  CAST(supply_cost AS DOUBLE) AS supply_cost
        |FROM best
        |JOIN parts ON l_partkey = p_partkey
        |JOIN eu_supp ON l_suppkey = s_suppkey
        |WHERE supply_cost = min_cost
        |ORDER BY s_acctbal DESC, p_partkey, s_name""".stripMargin,
    "q11_important_stock" ->
      """WITH nat_supp AS (
        |  SELECT s_suppkey FROM supplier
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name IN ('NATION_7', 'NATION_12')),
        |v AS (
        |  SELECT l_partkey,
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2))
        |        * CAST(l_quantity AS DECIMAL(18,2))) AS value
        |  FROM lineitem JOIN nat_supp ON l_suppkey = s_suppkey
        |  GROUP BY 1),
        |tot AS (SELECT SUM(value) AS total FROM v)
        |SELECT l_partkey, CAST(value AS DOUBLE) AS value
        |FROM v, tot WHERE value * 1000 > total
        |ORDER BY value DESC, l_partkey""".stripMargin,
    "j19_lateral_topk" ->
      """SELECT n_name, c_custkey, c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) top_c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin,
    "r01_recursive_hierarchy" ->
      """WITH RECURSIVE h AS (
        |  SELECT c_custkey AS custkey, c_custkey AS root, 1 AS depth
        |  FROM customer WHERE c_custkey < 10
        |  UNION ALL
        |  SELECT c.c_custkey, h.root, h.depth + 1
        |  FROM customer c JOIN h ON c.c_custkey // 10 = h.custkey
        |  WHERE c.c_custkey >= 10)
        |SELECT depth, COUNT(*) AS n_nodes,
        |  COUNT(DISTINCT root) AS n_roots,
        |  MIN(custkey) AS min_key, MAX(custkey) AS max_key,
        |  CAST(SUM(custkey) AS BIGINT) AS sum_keys
        |FROM h GROUP BY depth ORDER BY depth""".stripMargin,
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(SUM(l_quantity) AS BIGINT) AS sum_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        | SUM(l_quantity) / COUNT(*) AS avg_qty,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        | CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
        | COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_topk_orders" ->
      """SELECT o_orderkey, o_totalprice, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,
    "q03_shipping_priority" ->
      """SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q05_local_supplier_volume" ->
      """SELECT n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM customer
        | JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON o_orderkey = l_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q07_volume_shipping" ->
      """SELECT supp_nation, cust_nation, l_year,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM (SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
        |        CAST(year(l_shipdate) AS INTEGER) AS l_year,
        |        l_extendedprice, l_discount
        |      FROM lineitem
        |        JOIN orders ON l_orderkey = o_orderkey
        |        JOIN customer ON o_custkey = c_custkey
        |        JOIN supplier ON l_suppkey = s_suppkey
        |        JOIN nation ns ON s_nationkey = ns.n_nationkey
        |        JOIN nation nc ON c_nationkey = nc.n_nationkey
        |      WHERE ns.n_name IN ('NATION_18','NATION_19')
        |        AND nc.n_name IN ('NATION_18','NATION_19')
        |        AND ns.n_name <> nc.n_name) t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "q08_market_share" ->
      """WITH rev AS (
        |  SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
        |    CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS r
        |  FROM lineitem
        |   JOIN orders ON l_orderkey = o_orderkey
        |   JOIN customer ON o_custkey = c_custkey
        |   JOIN nation cn ON c_nationkey = cn.n_nationkey
        |   JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
        |   JOIN supplier ON l_suppkey = s_suppkey
        |   JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |SELECT o_year,
        |  CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_18' THEN r END), 0) AS DOUBLE) AS nation_rev,
        |  CAST(SUM(r) AS DOUBLE) AS total_rev,
        |  CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_18' THEN r END), 0) AS DOUBLE)
        |    / CAST(SUM(r) AS DOUBLE) AS mkt_share
        |FROM rev GROUP BY o_year ORDER BY o_year""".stripMargin,
    "x17_null_conditionals" ->
      """SELECT c_custkey,
        | nullif(c_nationkey % 5, 0) AS res5,
        | COALESCE(nullif(c_nationkey % 5, 0), -1) AS res5_filled,
        | CASE WHEN nullif(c_nationkey % 5, 0) IS NOT NULL THEN 'some' ELSE 'none' END AS res5_tag,
        | COALESCE(nullif(c_mktsegment, 'BUILDING'), nullif(c_mktsegment, 'AUTOMOBILE'), 'other') AS seg_pref,
        | greatest(c_acctbal, 0.0) AS bal_floor,
        | least(c_acctbal, 5000.0) AS bal_cap,
        | CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |      WHEN c_acctbal < 1000 THEN 'low' ELSE 'high' END AS bal_band
        |FROM customer""".stripMargin,
    "j16_nullsafe_join" ->
      """WITH c AS (SELECT CASE WHEN c_nationkey % 5 = 0 THEN NULL
        |   ELSE c_nationkey % 5 END AS ck FROM customer),
        |s AS (SELECT CASE WHEN s_nationkey % 5 = 0 THEN NULL
        |   ELSE s_nationkey % 5 END AS sk FROM supplier)
        |SELECT ck, COUNT(*) AS n_pairs
        |FROM c JOIN s ON ck IS NOT DISTINCT FROM sk
        |GROUP BY ck ORDER BY ck""".stripMargin,
    "j17_shuffle_hash_hint" ->
      """SELECT c_mktsegment, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        | GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM rev JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q16_part_supplier_counts" ->
      """SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
        | JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO' AND p_size IN (1, 14, 23, 45)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q21_waiting_suppliers" ->
      """WITH lines AS (
        | SELECT l_orderkey, l_suppkey,
        |   date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 90 AS late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'),
        |per_supp AS (SELECT l_orderkey, l_suppkey, MAX(late) AS supp_late
        | FROM lines GROUP BY 1, 2),
        |per_order AS (SELECT l_orderkey, COUNT(*) AS n_supps,
        |  COUNT(CASE WHEN supp_late THEN 1 END) AS n_late_supps
        | FROM per_supp GROUP BY 1)
        |SELECT s_suppkey, s_name, COUNT(*) AS numwait
        |FROM per_supp
        | JOIN per_order USING (l_orderkey)
        | JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_late AND n_supps > 1 AND n_late_supps = 1
        |GROUP BY s_suppkey, s_name
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    // NOT EXISTS (not NOT IN): matches the anti-join's NULL semantics
    "dq04_fk_report" -> {
      // the edge list is the shared RelationalBase.FkEdges — one
      // definition feeds both the DataFrame audit and this oracle
      val rows = FkEdges.map { case (name, fact, fk, dim, pk) =>
        s""" SELECT '$name' AS fk, (SELECT COUNT(*) FROM $fact) AS n_rows,
           |   (SELECT COUNT(*) FROM $fact f
           |    WHERE NOT EXISTS (SELECT 1 FROM $dim d WHERE d.$pk = f.$fk)) AS n_orphans""".stripMargin
      }.mkString("\n UNION ALL\n")
      s"""SELECT fk, n_rows, n_orphans,
         |  ROUND(CAST(n_orphans AS DOUBLE) / n_rows, 6) AS orphan_rate
         |FROM (
         |$rows
         |) t ORDER BY fk""".stripMargin
    },
    "dq01_quality_report" ->
      """SELECT * FROM (
        | SELECT 'null_quantity' AS check,
        |   COUNT(CASE WHEN l_quantity IS NULL THEN 1 END) AS violations,
        |   COUNT(*) AS checked FROM lineitem
        | UNION ALL
        | SELECT 'discount_in_unit_range',
        |   COUNT(CASE WHEN l_discount NOT BETWEEN 0.0 AND 1.0 THEN 1 END),
        |   COUNT(*) FROM lineitem
        | UNION ALL
        | SELECT 'null_shipdate',
        |   COUNT(CASE WHEN l_shipdate IS NULL THEN 1 END), COUNT(*) FROM lineitem
        | UNION ALL
        | SELECT 'unique_line_key',
        |   COUNT(CASE WHEN n > 1 THEN 1 END), COUNT(*)
        | FROM (SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey, l_linenumber) g
        | UNION ALL
        | SELECT 'orderkey_fk',
        |   (SELECT COUNT(*) FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
        |   COUNT(*) FROM lineitem
        |) t ORDER BY "check"""".stripMargin,
    "w07_window_analytics" ->
      """SELECT o_custkey, o_orderkey,
        | percent_rank() OVER w AS pct_rank,
        | cume_dist() OVER w AS cume,
        | first_value(o_orderkey) OVER wf AS first_key,
        | last_value(o_orderkey) OVER wf AS last_key,
        | nth_value(o_orderkey, 2) OVER wf AS second_key
        |FROM orders WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        | wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    // the invariant the sorted shards must satisfy, plus the row
    // conservation check — boundaries themselves are sample-dependent
    "s20_sorted_shards" ->
      """SELECT CAST(8 AS BIGINT) AS n_shards,
        | (SELECT COUNT(*) FROM orders) AS n_rows,
        | true AS shards_disjoint""".stripMargin,
    "w08_ntile_quartiles" ->
      """WITH q AS (SELECT o_orderpriority, o_orderkey, o_totalprice,
        |   CAST(ntile(4) OVER (PARTITION BY o_orderpriority
        |     ORDER BY o_totalprice, o_orderkey) AS INTEGER) AS quartile
        | FROM orders)
        |SELECT o_orderpriority, quartile, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |FROM q GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // cross-multiplied share test — no float division on either side
    "q20_dominant_suppliers" ->
      """WITH ps AS (SELECT l_partkey, l_suppkey,
        |   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_ps
        | FROM lineitem GROUP BY 1, 2),
        |p AS (SELECT l_partkey, SUM(qty_ps) AS qty_p FROM ps GROUP BY 1),
        |d AS (SELECT l_suppkey, COUNT(*) AS n_dominant_parts
        | FROM ps JOIN p USING (l_partkey)
        | WHERE qty_ps * 20 > qty_p * 3 GROUP BY 1)
        |SELECT s_suppkey, s_name, n_dominant_parts
        |FROM d JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY s_suppkey""".stripMargin,
    // replicates the ENTIRE z-order pipeline (normalization, bit
    // interleave, shard stats, box hits) from the same generated
    // interleave terms the Spark side uses, rendered in DuckDB's
    // shift-operator dialect
    "s22_zorder_clustering" -> zorderOracleSql,
    // the box aggregate is file-layout-independent, so the oracle is the
    // plain filtered scan — equality proves the manifest prune lost no rows
    "s21_stats_pruned_scan" ->
      """SELECT COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | MIN(o_orderkey) AS first_key, MAX(o_orderkey) AS last_key
        |FROM orders
        |WHERE o_totalprice >= 150000.0 AND o_totalprice <= 250000.0""".stripMargin,
    "q09_product_profit" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |   - CAST(p_retailprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%widget%'
        |GROUP BY n_name, year(o_orderdate)
        |ORDER BY nation, o_year DESC""".stripMargin,
    "q12_late_shipments" ->
      """SELECT CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) > 60
        |   THEN 'LATE' ELSE 'ONTIME' END AS ship_class,
        | COUNT(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END) AS high_line_count,
        | COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 END) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q13_order_distribution" ->
      """SELECT c_count, COUNT(*) AS custdist FROM (
        | SELECT c_custkey, COUNT(o_orderkey) AS c_count
        | FROM customer LEFT OUTER JOIN
        |  (SELECT o_custkey, o_orderkey FROM orders WHERE o_orderpriority <> '5-LOW') o
        |  ON c_custkey = o_custkey
        | GROUP BY c_custkey) t
        |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q14_promo_revenue" ->
      """SELECT promo_rev, total_rev, 100.0 * promo_rev / total_rev AS promo_pct FROM (
        | SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE) AS promo_rev,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_rev
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
        |   AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00') t""".stripMargin,
    "q17_small_qty_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly FROM (
        | SELECT l_extendedprice, l_quantity,
        |  SUM(l_quantity) OVER (PARTITION BY l_partkey) / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_qty
        | FROM lineitem
        | WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_type = 'SMALL')) t
        |WHERE l_quantity < 0.5 * avg_qty""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        | o_totalprice, sum_qty
        |FROM orders
        | JOIN (SELECT l_orderkey, CAST(SUM(l_quantity) AS BIGINT) AS sum_qty
        |       FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) b
        |   ON o_orderkey = l_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin,
    "q19_disjunctive_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        | COUNT(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
        |   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 30)
        |   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 40)""".stripMargin,
    "q22_sales_opportunity" ->
      """WITH cust AS (
        | SELECT c_custkey, c_acctbal, substring(c_name, length(c_name)-1, 2) AS cntrycode
        | FROM customer
        | WHERE substring(c_name, length(c_name)-1, 2) IN ('00','11','22','33','44','55','66'))
        |SELECT cntrycode, COUNT(*) AS numcust,
        | CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM cust
        |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |                   FROM cust WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
        |GROUP BY cntrycode ORDER BY cntrycode""".stripMargin,
    "x15_map_ops" ->
      """SELECT o_orderpriority,
        |  CAST(COUNT(*) AS INTEGER) AS n_statuses,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN n END) AS BIGINT) AS n_f,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN n END) AS BIGINT) AS n_o,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN n END) AS BIGINT) AS n_p,
        |  string_agg(o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
        |FROM (SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
        |      FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q10_returned_items" ->
      """SELECT c_custkey, c_name, c_acctbal, n_name,
        | CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |GROUP BY c_custkey, c_name, c_acctbal, n_name
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "x14_moment_stats" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
        | CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS mean_price,
        | floor(greatest(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |   - (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |     * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)), 0.0) * 100.0 + 0.5) / 100.0 AS var_price,
        | floor(sqrt(greatest(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        |   - (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*))
        |     * (CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)), 0.0)) * 10000.0 + 0.5) / 10000.0 AS stddev_price,
        | min(o_totalprice) AS min_price,
        | max(o_totalprice) AS max_price
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q06_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
        |  AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_discount >= 0.02 AND l_discount <= 0.09
        |  AND l_quantity < 24""".stripMargin,
    "f01_filter_project" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderstatus = 'O' AND o_totalprice > 100000.0""".stripMargin,
    "f05_null_cleaning" ->
      """WITH x AS (SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderstatus END AS status2,
        |  CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE o_orderpriority END AS prio2
        | FROM orders)
        |SELECT o_orderkey, status2, prio2 FROM x
        |WHERE status2 IS NOT NULL AND prio2 IS NOT NULL AND status2 <> 'P'""".stripMargin,
    "f07_conjunctive_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_returnflag = 'R' AND l_linestatus = 'F'
        |  AND year(l_shipdate) = '1995'""".stripMargin,
    "j02_left_join_counts" ->
      """SELECT c_custkey, COUNT(o_orderkey) AS n_orders
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey""".stripMargin,
    "j07_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,
    "j08_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'P')""".stripMargin,
    "j06_broadcast_part_join" ->
      """SELECT p_brand, CAST(SUM(l_quantity) AS BIGINT) AS total_qty, COUNT(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "j10_cross_scalar_pct" ->
      """SELECT n_name, cnt, ROUND(100.0 * cnt / total, 2) AS pct
        |FROM (SELECT n_name, COUNT(*) AS cnt
        |      FROM orders JOIN customer ON o_custkey = c_custkey
        |        JOIN nation ON c_nationkey = n_nationkey
        |      GROUP BY n_name) g
        |CROSS JOIN (SELECT COUNT(*) AS total FROM orders) t
        |ORDER BY pct DESC, n_name""".stripMargin,
    "u01_upsert_latest_wins" ->
      """SELECT o_orderkey,
        | CASE WHEN o_orderkey % 10 = 0 THEN 'U' ELSE o_orderstatus END AS o_orderstatus,
        | CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin,
    "a02_distinct" ->
      "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
    "a03_table_counts" ->
      """SELECT 'region' AS tbl, COUNT(*) AS n_rows FROM region
        |UNION ALL SELECT 'nation', COUNT(*) FROM nation
        |UNION ALL SELECT 'customer', COUNT(*) FROM customer
        |UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
        |UNION ALL SELECT 'part', COUNT(*) FROM part
        |UNION ALL SELECT 'orders', COUNT(*) FROM orders
        |UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
        |ORDER BY tbl""".stripMargin,
    "a08_two_phase_distinct" ->
      """SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_customers
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "a09_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)""".stripMargin,
    "a13_conditional_aggs" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
        |  COUNT(*) FILTER (o_orderstatus = 'F') AS n_finished,
        |  COUNT(*) FILTER (o_orderpriority = '1-URGENT') AS n_urgent,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) FILTER (o_orderstatus = 'F') AS DOUBLE) AS finished_total
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "w06_range_window" ->
      """WITH t AS (SELECT o_orderkey, o_custkey,
        |   CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS INTEGER) AS day,
        |   CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders)
        |SELECT o_orderkey, o_custkey, day,
        | CAST(SUM(p) OVER (PARTITION BY o_custkey ORDER BY day
        |   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum_30d,
        | COUNT(*) OVER (PARTITION BY o_custkey ORDER BY day
        |   RANGE BETWEEN 29 PRECEDING AND CURRENT ROW) AS n_30d
        |FROM t""".stripMargin,
    "w05_window_suite" ->
      """SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS o_date,
        |  lag(o_orderkey, 1) OVER w AS prev_key,
        |  lead(o_orderkey, 1) OVER w AS next_key,
        |  CAST(RANK() OVER w AS INTEGER) AS rk,
        |  CAST(DENSE_RANK() OVER w AS INTEGER) AS drk,
        |  CAST(NTILE(4) OVER w AS INTEGER) AS quartile,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
        |FROM orders WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "a11_cube" ->
      """WITH o AS (SELECT o_orderstatus, o_orderpriority,
        |   CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice FROM orders)
        |SELECT o_orderstatus, o_orderpriority, o_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM o GROUP BY CUBE(o_orderstatus, o_orderpriority, o_year)""".stripMargin,
    "a12_grouping_sets" ->
      """WITH o AS (SELECT o_orderstatus,
        |   CAST(year(o_orderdate) AS INTEGER) AS o_year, o_totalprice FROM orders)
        |SELECT o_orderstatus, o_year, COUNT(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
        |  CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
        |  CAST(GROUPING(o_year) AS INTEGER) AS g_year
        |FROM o GROUP BY GROUPING SETS ((o_orderstatus), (o_year),
        |  (o_orderstatus, o_year))""".stripMargin,
    "a10_set_ops" ->
      """SELECT o_custkey, 'both' AS op FROM
        | (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  INTERSECT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)
        |UNION ALL
        |SELECT o_custkey, 'only_1995' FROM
        | (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        |  EXCEPT
        |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996)""".stripMargin,
    "a07_dedup_keep_first" ->
      """SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
        |        ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) t
        |WHERE rn = 1""".stripMargin,
    "w01_window_group_avg" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        | SUM(l_quantity) OVER (PARTITION BY l_orderkey)
        |   / COUNT(*) OVER (PARTITION BY l_orderkey) AS avg_order_qty
        |FROM lineitem""".stripMargin,
    "w02_pivot_priority" ->
      """SELECT o_orderstatus,
        | COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
        | COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
        | COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
        | COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
        | COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "w04_unpivot_priority" ->
      """WITH p AS (SELECT o_orderstatus,
        |  COUNT(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n1,
        |  COUNT(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n2,
        |  COUNT(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n3,
        |  COUNT(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n4,
        |  COUNT(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n5
        | FROM orders GROUP BY o_orderstatus)
        |SELECT o_orderstatus, '1-URGENT' AS o_orderpriority, n1 AS n FROM p
        |UNION ALL SELECT o_orderstatus, '2-HIGH', n2 FROM p
        |UNION ALL SELECT o_orderstatus, '3-MEDIUM', n3 FROM p
        |UNION ALL SELECT o_orderstatus, '4-NOT SPECIFIED', n4 FROM p
        |UNION ALL SELECT o_orderstatus, '5-LOW', n5 FROM p
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin,
    "w03_surrogate_keys" ->
      """SELECT c_custkey, c_name,
        | CAST(ROW_NUMBER() OVER (ORDER BY c_name, c_custkey) AS INTEGER) AS c_id
        |FROM customer""".stripMargin,
    "x01_string_ops" ->
      """SELECT c_custkey,
        | split_part(c_name, '#', 2) AS name_num,
        | upper(c_mktsegment) AS seg_upper,
        | lower(c_name) AS name_lower,
        | substring(c_name, 1, 8) AS name_prefix,
        | CAST(length(c_name) AS INTEGER) AS name_len,
        | concat_ws('|', c_mktsegment, c_name) AS seg_name
        |FROM customer""".stripMargin,
    "x02_hemisphere_format" ->
      """SELECT c_custkey,
        | CASE WHEN c_acctbal < 0
        |   THEN CAST(CAST(ABS(c_acctbal) AS DECIMAL(12,2)) AS VARCHAR) || 'W'
        |   ELSE CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR) || 'E' END AS bal_fmt
        |FROM customer""".stripMargin,
    "x03_sas_date_decode" ->
      """SELECT o_orderkey,
        | strftime(DATE '1960-01-01' + CAST(o_orderkey % 20000 AS INTEGER), '%Y-%m-%d') AS sas_date
        |FROM orders""".stripMargin,
    "x05_date_part_counts" ->
      """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
        | CAST(month(o_orderdate) AS INTEGER) AS o_month, COUNT(*) AS n_orders
        |FROM orders GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Spark dayofweek is 1=Sunday; DuckDB dayofweek is 0=Sunday
    "q04_priority_check" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "x13_string_functions" ->
      """SELECT c_custkey,
        |  lpad(c_mktsegment, 12, '.') AS seg_lpad,
        |  rpad(c_mktsegment, 12, '_') AS seg_rpad,
        |  translate(c_name, '#0', '_O') AS name_translated,
        |  repeat(substring(c_mktsegment, 1, 2), 3) AS seg_repeat,
        |  CAST(ascii(c_mktsegment) AS INTEGER) AS seg_ascii,
        |  CAST(strpos(c_mktsegment, 'E') AS INTEGER) AS e_pos
        |FROM customer WHERE c_custkey <= 500""".stripMargin,
    "x12_date_arithmetic" ->
      """SELECT o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS d,
        |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
        |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
        |  strftime(date_trunc('quarter', o_orderdate), '%Y-%m-%d') AS quarter_start,
        |  CAST(date_diff('day', DATE '1995-01-01', o_orderdate) AS INTEGER) AS days_since_95,
        |  CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow
        |FROM orders WHERE o_orderkey <= 2000""".stripMargin,
    "x10_percentile_profile" ->
      """SELECT l_returnflag,
        | quantile_cont(l_quantity, 0.5) AS p50_qty,
        | quantile_cont(l_quantity, 0.9) AS p90_qty,
        | quantile_cont(l_quantity, 0.99) AS p99_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "s05_csv_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MAX(n_name) AS max_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "s13_json_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MAX(n_name) AS max_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "s23_text_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MAX(n_name) AS max_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    // file-count INVARIANTS are measured Spark-side (exact counts are
    // data-dependent — empty hash partitions emit no file); the oracle
    // pins TRUE for both plus the exact content digest of the source
    // both snapshots recomputed from the base table: v1 untouched, v2
    // with the deterministic adjustment — isolation means the pinned
    // reader's numbers equal the pre-write table exactly
    "s25_time_travel" ->
      """SELECT 1 AS version, COUNT(*) AS n_rows,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal,
        |  CAST(0 AS BIGINT) AS n_changed_vs_v1
        |FROM customer
        |UNION ALL
        |SELECT 2, COUNT(*),
        |  CAST(SUM(CAST(CASE WHEN c_custkey % 10 = 0 THEN c_acctbal + 100.0
        |    ELSE c_acctbal END AS DECIMAL(18,2))) AS DOUBLE),
        |  CAST(SUM(CASE WHEN c_custkey % 10 = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |FROM customer ORDER BY version""".stripMargin,
    "s24_compaction" ->
      """SELECT TRUE AS files_reduced, TRUE AS files_at_most_target,
        |  COUNT(*) AS n_rows,
        |  MIN(event_id) AS min_event, MAX(event_id) AS max_event,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events""".stripMargin,
    "s14_orc_roundtrip" ->
      """SELECT o_orderstatus, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "s15_dynamic_pruning" ->
      """SELECT 'target' AS d_label, o_orderpriority, COUNT(*) AS n_orders
        |FROM orders WHERE year(o_orderdate) = 1995
        |GROUP BY 1, 2 ORDER BY o_orderpriority""".stripMargin,
    "u03_scd2_point_in_time" ->
      """WITH v AS (SELECT o_custkey, CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |    o_orderstatus AS status, o_orderdate AS from_d,
        |    lead(o_orderdate, 1) OVER w AS to_d
        |  FROM orders WHERE o_custkey <= 300
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
        |p AS (SELECT o_custkey, l_orderkey, l_linenumber, l_shipdate
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |  WHERE o_custkey <= 300)
        |SELECT p.o_custkey, l_orderkey, l_linenumber,
        |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date, version, status
        |FROM p JOIN v ON p.o_custkey = v.o_custkey
        |  AND l_shipdate >= from_d AND (to_d IS NULL OR l_shipdate < to_d)""".stripMargin,
    "u02_scd2_history" ->
      """SELECT o_custkey,
        |  CAST(ROW_NUMBER() OVER w AS INTEGER) AS version,
        |  o_orderstatus AS status,
        |  strftime(o_orderdate, '%Y-%m-%d') AS effective_from,
        |  strftime(lead(o_orderdate, 1) OVER w, '%Y-%m-%d') AS effective_to,
        |  lead(o_orderdate, 1) OVER w IS NULL AS is_current
        |FROM orders WHERE o_custkey <= 300
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin,
    "s07_sql_over_views" ->
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s08_catalog_roundtrip" ->
      """SELECT n_regionkey, COUNT(*) AS n_nations, MIN(n_name) AS min_name
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "s11_partitioned_scan" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders FROM orders
        |WHERE year(o_orderdate) = 1995
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "s16_bloom_filter_join" ->
      """SELECT l_linestatus, COUNT(*) AS n_items,
        | CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,
    "s12_bucketed_agg" ->
      """SELECT o_custkey, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY o_custkey""".stripMargin,
    "s26_bucketed_join" ->
      """SELECT c_custkey, c_name, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1, 2 ORDER BY c_custkey""".stripMargin,
    "s10_static_values_join" ->
      """SELECT r_regionkey, r_name, zone_name
        |FROM region JOIN (VALUES (0,'ZONE-A'),(1,'ZONE-B'),(2,'ZONE-C'),(3,'ZONE-D'),(4,'ZONE-E'))
        |  AS z(zone_key, zone_name) ON r_regionkey = zone_key
        |ORDER BY r_regionkey""".stripMargin,
    "a14_above_avg_groups" ->
      """WITH g AS (SELECT o_orderpriority, COUNT(*) AS n_orders,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        |  FROM orders GROUP BY 1),
        |t AS (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
        |    / COUNT(DISTINCT o_orderpriority) AS avg_group_total FROM orders)
        |SELECT o_orderpriority, n_orders, total, avg_group_total
        |FROM g, t WHERE total > avg_group_total ORDER BY o_orderpriority""".stripMargin,
    // batch 1 predates the n_regionkey column -> NULL there, data in 2
    "s19_schema_evolution" ->
      """SELECT n_nationkey, n_name, CAST(NULL AS INTEGER) AS n_regionkey, 1 AS batch FROM nation
        |UNION ALL
        |SELECT n_nationkey, n_name, n_regionkey, 2 AS batch FROM nation
        |ORDER BY batch, n_nationkey""".stripMargin,
    // the dynamic overwrite leaves every non-1995 partition intact and
    // doubles 1995 — equivalent to patching in place
    "s18_dynamic_overwrite" ->
      """SELECT year(o_orderdate) AS o_year, COUNT(*) AS n_orders,
        | CAST(SUM(CAST(CASE WHEN year(o_orderdate) = 1995
        |   THEN o_totalprice * 2 ELSE o_totalprice END AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // rebuilds the malformed lines from nation and replays PERMISSIVE
    // parse semantics: positional tokens, TRY_CAST per typed field,
    // corrupt = wrong token count OR any failed cast (raw line kept)
    "s17_csv_permissive" ->
      """WITH lines AS (SELECT CASE
        |    WHEN n_nationkey % 5 = 0 THEN n_nationkey || ',' || n_name || ',x' || n_regionkey
        |    WHEN n_nationkey % 7 = 0 THEN n_nationkey || ',' || n_name || ',' || n_regionkey || ',extra'
        |    WHEN n_nationkey % 11 = 0 THEN n_nationkey || ',' || n_name
        |    ELSE n_nationkey || ',' || n_name || ',' || n_regionkey END AS line
        |  FROM nation),
        |t AS (SELECT line, str_split(line, ',') AS toks FROM lines),
        |p AS (SELECT line,
        |    TRY_CAST(toks[1] AS BIGINT) AS id,
        |    CASE WHEN len(toks) >= 2 THEN toks[2] END AS name,
        |    CASE WHEN len(toks) >= 3 THEN TRY_CAST(toks[3] AS BIGINT) END AS rk,
        |    (len(toks) <> 3 OR TRY_CAST(toks[3] AS BIGINT) IS NULL) AS is_corrupt
        |  FROM t)
        |SELECT id, name, rk, is_corrupt,
        |  CASE WHEN is_corrupt THEN line END AS corrupt_raw FROM p""".stripMargin)

  // u05's contract IS "equals the u02 full rebuild" -> shared oracle
  val oracles: Map[String, String] =
    oraclesBase + ("u05_scd2_incremental" -> oraclesBase("u02_scd2_history"))


}
