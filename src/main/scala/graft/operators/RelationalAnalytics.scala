package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** TPC-H-analogue analytical queries (q01-q23) over the synthetic star schema.
  *
  * Split out of the former monolithic Relational.scala along its
  * section families; mixed back into [[Relational]], so every member
  * keeps its `Relational.x` address and the query/oracle maps there.
  */
trait RelationalAnalytics extends RelationalBase {

  // A1/A4/P4/X6/O4: TPC-H Q1-shaped pricing summary (flagship).
  def pricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).cast(LongType).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        (sum(dec(col("l_discount"))).cast(DoubleType) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  // O4 + LIMIT: top-k with deterministic tiebreak.
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  // J8-shaped: 3-table join + agg + top-k (TPC-H Q3 analogue).
  def shippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .groupBy(col("l_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // J3/J5-shaped: 6-table star join, region-filtered (TPC-H Q5 analogue).
  // nation/region are broadcast by AQE (tiny dims).
  def localSupplierVolume(spark: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(spark, dir, "nation")
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val li = Tables.load(spark, dir, "lineitem")
    val supp = Tables.load(spark, dir, "supplier")
    cust
      .join(ord, cust("c_custkey") === ord("o_custkey"))
      .join(li, ord("o_orderkey") === li("l_orderkey"))
      .join(supp, li("l_suppkey") === supp("s_suppkey") &&
        cust("c_nationkey") === supp("s_nationkey"))
      .join(broadcast(nation), supp("s_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  // TPC-H Q7 analogue: bilateral shipping volume between two nations by
  // ship year. Two broadcast copies of the nation dim (supplier side /
  // customer side) with the pair filter pushed into each copy, so the
  // big three-way fact join never carries rows outside the two nations.
  def volumeShipping(spark: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_18", "NATION_19")
    val nation = Tables.load(spark, dir, "nation")
      .filter(col("n_name").isin(pair: _*))
    val suppNation = nation.select(
      col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val custNation = nation.select(
      col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  // TPC-H Q8 analogue: one nation's share of a region's market per
  // order-year. Both nation copies and the region dim broadcast; the
  // conditional (CASE) aggregate computes numerator and denominator in
  // ONE pass over the joined fact — no second scan, no self-join. The
  // share divides the two EXACT decimal sums as doubles (IEEE division
  // is engine-deterministic; decimal division scale rules are not).
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val custNation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_regionkey").as("cn_region"))
    val suppNation = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val america = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "AMERICA")
    val rev = dec(col("l_extendedprice")) *
      (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .join(broadcast(america), col("cn_region") === col("r_regionkey"))
      .join(Tables.load(spark, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(suppNation), col("s_nationkey") === col("sn_key"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        coalesce(sum(when(col("supp_nation") === "NATION_18", rev)),
          lit(0).cast(DecimalType(18, 2))).cast(DoubleType).as("nation_rev"),
        sum(rev).cast(DoubleType).as("total_rev"))
      .withColumn("mkt_share", col("nation_rev") / col("total_rev"))
      .orderBy(col("o_year"))
  }

  // TPC-H Q10 analogue: top customers by revenue lost to returned items.
  // The returnflag filter reaches the lineitem scan; the nation dim is
  // broadcast; the top-20 is a bounded sort after a per-customer
  // aggregate whose key count is already small.
  def returnedItems(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  // TPC-H Q9 analogue (product-type profit): name-substring part filter,
  // 5-way join, profit = revenue − cost proxy (this schema has no
  // partsupp, so p_retailprice×quantity stands in for supplycost — see
  // reference README.md:169-214 for the workload tier this extends).
  // All money math in exact DECIMAL; one hash-agg on (nation, year).
  def productProfit(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"), col("p_retailprice"))
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.load(spark, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.load(spark, dir, "nation")), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(
        dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
          - dec(col("p_retailprice")) * dec(col("l_quantity")))
        .cast(DoubleType).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  // TPC-H Q12 analogue (shipping lateness vs priority): derived
  // CASE-class grouping column + conditional counts in one pass. The
  // synthetic schema has no l_shipmode, so the class is ship delay.
  def lateShipments(spark: SparkSession, dir: String): DataFrame = {
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("ship_class",
        when(datediff(col("l_shipdate"), col("o_orderdate")) > 60, "LATE")
          .otherwise("ONTIME"))
      .groupBy(col("ship_class"))
      .agg(
        count(when(high, 1)).as("high_line_count"),
        count(when(!high, 1)).as("low_line_count"))
      .orderBy(col("ship_class"))
  }

  // TPC-H Q13 analogue (customer order-count distribution): LEFT OUTER
  // join so zero-order customers survive with c_count=0, then a second
  // aggregation over the first's result — a two-level agg no single
  // GROUP BY can express.
  def orderCountDistribution(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "5-LOW")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.load(spark, dir, "customer")
      .join(orders, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  // TPC-H Q14 analogue (promo revenue share): month-bounded scan,
  // broadcast part join, conditional numerator over the same rows as
  // the denominator — exact DECIMAL sums so the ratio is bit-stable.
  def promoRevenue(spark: SparkSession, dir: String): DataFrame = {
    val rev = dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount")))
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1997-10-01").cast(TimestampType))
      .join(broadcast(Tables.load(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", rev)).cast(DoubleType).as("promo_rev"),
        sum(rev).cast(DoubleType).as("total_rev"))
      .select(col("promo_rev"), col("total_rev"),
        (lit(100.0) * col("promo_rev") / col("total_rev")).as("promo_pct"))
  }

  // TPC-H Q17 analogue (small-quantity revenue): the correlated
  // per-part AVG subquery decorrelates to ONE window over the already
  // part-filtered lines — no second lineitem scan, no re-join. The
  // threshold avg is exact in IEEE double (integral quantities sum
  // exactly; one division), so the filter boundary is engine-stable.
  def smallQtyRevenue(spark: SparkSession, dir: String): DataFrame = {
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_brand") === "Brand#3" && col("p_type") === "SMALL")
      .select(col("p_partkey"))
    val byPart = Window.partitionBy(col("l_partkey"))
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"), "left_semi")
      .withColumn("avg_qty",
        sum(col("l_quantity")).over(byPart) / count(lit(1)).over(byPart))
      .filter(col("l_quantity") < lit(0.5) * col("avg_qty"))
      .agg((sum(dec(col("l_extendedprice"))).cast(DoubleType) / lit(7.0)).as("avg_yearly"))
  }

  // TPC-H Q18 analogue (large-volume orders): HAVING on a grouped sum,
  // then the qualifying keys rejoin the fact — the aggregate acts as a
  // semi-join filter. Quantities are integral doubles: exact sums.
  def largeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast(LongType).as("sum_qty"))
      .filter(col("sum_qty") > 300)
    Tables.load(spark, dir, "orders")
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.load(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  // TPC-H Q19 analogue (disjunctive predicate revenue): OR-of-ANDs over
  // both join sides. The equi-key (partkey) still drives a hash join;
  // the disjunction stays a residual filter — never a cartesian.
  def disjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#12" && col("p_size").between(1, 15) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" && col("p_size").between(1, 25) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#34" && col("p_size").between(1, 35) && col("l_quantity").between(20, 40))
    Tables.load(spark, dir, "lineitem")
      .join(broadcast(Tables.load(spark, dir, "part")), col("l_partkey") === col("p_partkey"))
      .filter(cond)
      .agg(
        sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast(DoubleType).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  // TPC-H Q22 analogue (global sales opportunity): derived "country
  // code" from the customer name tail, scalar-subquery threshold on
  // positive balances, NOT EXISTS recent orders as a left-anti join.
  def globalSalesOpportunity(spark: SparkSession, dir: String): DataFrame = {
    val codes = Seq("00", "11", "22", "33", "44", "55", "66")
    val cust = Tables.load(spark, dir, "customer")
      .withColumn("cntrycode", substring(col("c_name"), -2, 2))
      .filter(col("cntrycode").isin(codes: _*))
    // exact decimal sum / count, not avg(double): the threshold must be
    // bit-identical across engines or a boundary customer could flip
    val threshold = cust.filter(col("c_acctbal") > 0)
      .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
    val recentOrders = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2000-01-01").cast(TimestampType))
      .select(col("o_custkey"))
    cust.crossJoin(broadcast(threshold))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recentOrders, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  // TPC-H Q15 analogue (top supplier): quarter revenue per supplier,
  // then keep the max via a broadcast scalar — an agg OF an agg.
  // Equality on the revenue is safe: both sides derive the double from
  // the same exact DECIMAL sum.
  def topSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
        .cast(DoubleType).as("total_revenue"))
    val maxRev = rev.agg(max(col("total_revenue")).as("mr"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("mr"))
      .join(broadcast(Tables.load(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  // TPC-H Q16 analogue (part/supplier relationship counts): DISTINCT
  // pair extraction from the fact stands in for partsupp; negative-
  // balance suppliers are excluded NOT-IN-style via a left-anti join
  // (null-safe by construction), then COUNT(DISTINCT) per part group.
  def partSupplierCounts(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
    val excluded = Tables.load(spark, dir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    pairs
      .join(excluded, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.load(spark, dir, "part")
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 14, 23, 45))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  // TPC-H Q21 analogue (suppliers who kept orders waiting): the
  // EXISTS / NOT-EXISTS pair over other lineitems of the same order
  // decorrelates into ONE grouped pass over the order — count suppliers
  // and late suppliers per order, then a supplier is "waiting" on a
  // multi-supplier order where he is the ONLY late one. No receiptdate
  // in this schema: late = shipped > 90 days after the order date.
  def waitingSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val lines = Tables.load(spark, dir, "lineitem")
      .join(Tables.load(spark, dir, "orders").filter(col("o_orderstatus") === "F"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (datediff(col("l_shipdate"), col("o_orderdate")) > 90).as("late"))
    // perSupp feeds BOTH the per-order rollup and the late-supplier join
    // side; left lazy the whole lineitem ⋈ orders + aggregate subtree
    // executed twice (the q20/g01 canonicalization class — the join
    // branch's pushed filters differ). Eager cut: ~(orderkey, suppkey)
    // rows, 3 narrow columns, materialized once.
    val perSupp = lines.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
      .localCheckpoint()
    val perOrder = perSupp.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supps"),
        count(when(col("supp_late"), 1)).as("n_late_supps"))
    perSupp.filter(col("supp_late"))
      .join(perOrder.filter(col("n_supps") > 1 && col("n_late_supps") === 1), "l_orderkey")
      .join(broadcast(Tables.load(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(20)
  }

  // Q20-analogue (no partsupp table in the testdata): a supplier
  // DOMINATES a part when their shipped quantity exceeds 15% of that
  // part's total shipped across all suppliers. Two-level exact-DECIMAL
  // aggregation, the share test as cross-multiplied integers-in-decimal
  // (qty·20 > total·3 — no float division anywhere), then a broadcast
  // join to supplier names. The nested-subquery shape of TPC-H Q20
  // (EXISTS over a correlated aggregate) becomes two hash aggregates +
  // one join — the Spark-first rewrite of a correlated quantifier.
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    // byPs feeds BOTH the per-part total and the dominance join; left
    // lazy, the lineitem scan + (partkey,suppkey) aggregate executed
    // TWICE — the join branch gets isnotnull(partkey)/isnotnull(suppkey)
    // pushed below its exchange, the total branch does not, so the
    // subtrees stop canonicalizing equal and AQE cannot reuse the stage
    // (the g01 union class; measured: 3 lineitem FileScans,
    // 0 ReusedExchange). The eager cut materializes the ~|parts·suppliers
    // per part| aggregate once; both consumers read the RDD.
    val byPs = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_ps"))
      .localCheckpoint()
    val byP = byPs.groupBy(col("l_partkey"))
      .agg(sum(col("qty_ps")).as("qty_p"))
    val dominant = byPs.join(byP, "l_partkey")
      .filter(col("qty_ps") * 20 > col("qty_p") * 3)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_dominant_parts"))
    dominant.join(broadcast(Tables.load(spark, dir, "supplier")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_dominant_parts"))
      .orderBy(col("s_suppkey"))
  }

  // A6-shaped scalar aggregate (TPC-H Q6 analogue) — single-row result.
  def forecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1994-01-01").cast(TimestampType) &&
        col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
        col("l_discount") >= 0.02 && col("l_discount") <= 0.09 &&
        col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast(DoubleType).as("revenue"))

  // Correlated EXISTS subquery (TPC-H Q4 shape): orders in a quarter
  // with at least one line shipped >60 days after ordering, counted per
  // priority. Catalyst decorrelates the EXISTS into a left-semi hash
  // join — the plan to expect at scale, never a per-row subquery probe.
  def orderPriorityCheck(spark: SparkSession, dir: String): DataFrame = {
    Tables.load(spark, dir, "orders").createOrReplaceTempView("orders_q4")
    Tables.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders_q4
        |WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem_q4
        |              WHERE l_orderkey = o_orderkey
        |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  // TPC-H Q2 analogue (min-cost supplier per part). The testdata has no
  // partsupp table, so the supply relationship is derived from the
  // fact: supply_cost(part, supp) = MIN(l_extendedprice) over that
  // pair's lineitems (exact DECIMAL, order-free). The original's
  // correlated "cost = (SELECT MIN(..) ...)" subquery is decorrelated
  // into ONE window min over the per-pair aggregate — no second fact
  // scan, no self-join — and both the part filter and the region
  // filter are applied BEFORE the aggregate, so at scale the fact scan
  // is pruned by two broadcast joins and the window runs on the
  // already-small (part, supplier) aggregate.
  def minCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val euSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.load(spark, dir, "region")
          .filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
    val parts = Tables.load(spark, dir, "part")
      .filter(col("p_size") <= 10 && col("p_type") === "STANDARD")
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    val cost = Tables.load(spark, dir, "lineitem")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(dec(col("l_extendedprice"))).as("supply_cost"))
    cost
      .withColumn("min_cost",
        min(col("supply_cost")).over(Window.partitionBy(col("l_partkey"))))
      .filter(col("supply_cost") === col("min_cost"))
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .join(broadcast(euSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("p_partkey"), col("p_brand"), col("p_type"),
        col("s_name"), col("s_acctbal"),
        col("supply_cost").cast(DoubleType).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_name"))
  }

  // TPC-H Q11 analogue (important stock): per-part inventory value from
  // two nations' suppliers, kept where a part's value exceeds 0.1% of
  // the group total. The scalar total comes back via a broadcast cross
  // join (j10's shape), and the threshold compare is value*1000 > total
  // in exact DECIMAL — no double rounding at the cut boundary, so both
  // engines keep or drop the same borderline parts.
  def importantStock(spark: SparkSession, dir: String): DataFrame = {
    val natSupp = Tables.load(spark, dir, "supplier")
      .join(broadcast(Tables.load(spark, dir, "nation")
          .filter(col("n_name").isin("NATION_7", "NATION_12"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"))
    val v = Tables.load(spark, dir, "lineitem")
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_partkey"))
      // BOTH factors decimal: dec(price) * double coerces the product
      // back to DOUBLE, making the sum order-dependent — caught by the
      // layout sweep as the one divergent query under a multi-split
      // rewrite (the single-split gate masked it: Spark and DuckDB
      // happened to sum in the same row order)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_quantity"))).as("value"))
    val tot = v.agg(sum(col("value")).as("total"))
    v.crossJoin(broadcast(tot))
      .filter(col("value") * 1000 > col("total"))
      .select(col("l_partkey"), col("value").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }
}
