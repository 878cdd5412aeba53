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
object Relational {

  private def tmpTag(dir: String): String = graft.Fs.tmpTag(dir)

  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a money-like double column. */
  private def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)

  // S1/S2/P1/F1..F4: scan → filter → project, pushdown-friendly.
  def filterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .filter(col("o_orderstatus") === "O" && col("o_totalprice") > 100000.0)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

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
    val perSupp = lines.groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(col("late")).as("supp_late"))
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

  // J16: null-safe equality join (`<=>`): NULL keys match each other —
  // Spark's EqualNullSafe is still a hash-join key (no null-filter, no
  // nested loop), the semantic SQL can't express with plain `=`.
  // Nullable keys are derived: nation residue 0 → NULL on both sides.
  def nullSafeJoin(spark: SparkSession, dir: String): DataFrame = {
    def keyed(df: DataFrame, src: Column, name: String): DataFrame =
      df.select(when(src % 5 === 0, lit(null).cast(IntegerType))
        .otherwise(src % 5).as(name))
    val cust = keyed(Tables.load(spark, dir, "customer"), col("c_nationkey"), "ck")
    val supp = keyed(Tables.load(spark, dir, "supplier"), col("s_nationkey"), "sk")
    cust.join(supp, col("ck") <=> col("sk"))
      .groupBy(col("ck"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("ck"))
  }

  // J17: join-strategy hint — forces SHUFFLE_HASH where the optimizer
  // would pick broadcast/sort-merge; the per-partition hash table skips
  // both the broadcast and the sort at equal shuffle cost. PlanSpec
  // asserts the ShuffledHashJoin actually materializes.
  def hintedShuffleHashJoin(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "orders")
      .join(Tables.load(spark, dir, "customer").hint("shuffle_hash"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total"))
      .orderBy(col("c_mktsegment"))

  // DQ: expectations-style data-quality report — null rate, domain
  // violations, duplicate keys, and FK orphans, each a (check, count)
  // row. The FK checks are anti-join counts; everything else folds into
  // single aggregates so the whole report is a handful of passes that
  // each scan one table once.
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    def checkRow(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), col("violations").cast(LongType),
        col("checked").cast(LongType))
    val scalarChecks = li.agg(
      count(when(col("l_quantity").isNull, 1)).as("null_qty"),
      count(when(!col("l_discount").between(0.0, 1.0), 1)).as("bad_discount"),
      count(when(col("l_shipdate").isNull, 1)).as("null_shipdate"),
      count(lit(1)).as("checked"))
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
      .agg(count(when(col("n") > 1, 1)).as("violations"), count(lit(1)).as("checked"))
    val orphans = li.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(li.agg(count(lit(1)).as("checked")))
    checkRow("null_quantity", scalarChecks
        .select(col("null_qty").as("violations"), col("checked")))
      .unionAll(checkRow("discount_in_unit_range", scalarChecks
        .select(col("bad_discount").as("violations"), col("checked"))))
      .unionAll(checkRow("null_shipdate", scalarChecks
        .select(col("null_shipdate").as("violations"), col("checked"))))
      .unionAll(checkRow("unique_line_key", dupKeys))
      .unionAll(checkRow("orderkey_fk", orphans))
      .orderBy(col("check"))
  }

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

  // Q20-analogue (no partsupp table in the testdata): a supplier
  // DOMINATES a part when their shipped quantity exceeds 15% of that
  // part's total shipped across all suppliers. Two-level exact-DECIMAL
  // aggregation, the share test as cross-multiplied integers-in-decimal
  // (qty·20 > total·3 — no float division anywhere), then a broadcast
  // join to supplier names. The nested-subquery shape of TPC-H Q20
  // (EXISTS over a correlated aggregate) becomes two hash aggregates +
  // one join — the Spark-first rewrite of a correlated quantifier.
  def dominantSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val byPs = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("qty_ps"))
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

  // X15: MapType surface — per-priority status→count map built with
  // map_from_entries over SORTED entries (collect_list order is
  // partition-dependent; sorting the entry array before map
  // construction is what makes a map deterministic at all), then
  // consumed via element_at / map_keys / size. Published as scalars:
  // map columns don't hash-compare across engines, scalar lookups do.
  def mapOps(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "orders")
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

  // Moment statistics from exact sums: mean / variance / stddev derived
  // from DECIMAL Σx and Σx² (both exact), divided as doubles — the only
  // cross-engine-deterministic way to publish second moments (built-in
  // stddev/var aggregate in non-deterministic float order would not
  // hash-match any oracle). One pass, map-side combine.
  def momentStats(spark: SparkSession, dir: String): DataFrame = {
    val n = count(lit(1))
    val sumDec = sum(dec(col("o_totalprice")))
    val sumSq = sum(dec(col("o_totalprice")) * dec(col("o_totalprice")))
    val mean = sumDec.cast(DoubleType) / n
    // clamp: catastrophic cancellation can push a (near-)constant
    // group's variance to a tiny negative, where DuckDB's sqrt ERRORS
    // (killing the whole oracle query) while Spark returns NaN
    val variance = greatest(
      sumSq.cast(DoubleType) / n - mean * mean, lit(0.0))
    // Σx² grows past 2^53, and the engines' wide-DECIMAL→double
    // conversions round that last ulp differently, so the published
    // moments are quantized far above ulp scale. floor(x·s + 0.5)/s,
    // NOT round(): Spark's round() re-rounds via the decimal STRING
    // (HALF_UP on the shortest representation) while DuckDB rounds the
    // binary value — they disagree on half-boundary doubles. The
    // floor form is pure double arithmetic, bit-identical everywhere.
    def halfUp(c: Column, scale: Double): Column =
      floor(c * scale + 0.5) / scale
    Tables.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(
        n.as("n_orders"),
        sumDec.cast(DoubleType).as("total"),
        mean.as("mean_price"),
        halfUp(variance, 100.0).as("var_price"),
        halfUp(sqrt(variance), 10000.0).as("stddev_price"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"))
      .orderBy(col("o_orderpriority"))
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

  // J2: left outer join preserving unmatched left rows.
  def leftJoinOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("n_orders"))
  }

  // Semi join (EXISTS).
  def semiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders").filter(col("o_orderstatus") === "F")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
  }

  // Anti join (NOT EXISTS) — right side filtered to 'P' orders so the
  // result is non-empty (an anti join against ALL orders matches nothing
  // in this data and would verify the operator against the empty set).
  def antiJoinCustomers(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders").filter(col("o_orderstatus") === "P")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  // J6 + broadcast hint: fact ⋈ small dim.
  def broadcastPartJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val part = Tables.load(spark, dir, "part")
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(col("l_quantity")).cast(LongType).as("total_qty"),
        count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  // J10/A6: group counts + cross-join scalar total → percentage share.
  def nationOrderShare(spark: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(spark, dir, "customer")
    val ord = Tables.load(spark, dir, "orders")
    val nation = Tables.load(spark, dir, "nation")
    val perNation = ord.join(cust, ord("o_custkey") === cust("c_custkey"))
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name")).agg(count(lit(1)).as("cnt"))
    val total = ord.agg(count(lit(1)).as("total"))
    perNation.crossJoin(total)
      .select(col("n_name"), col("cnt"),
        round(lit(100.0) * col("cnt") / col("total"), 2).as("pct"))
      .orderBy(col("pct").desc, col("n_name"))
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

  // S5 (CSV sink) + S2 (CSV scan, explicit schema): round-trip through CSV
  // then aggregate — exercises both sides of the CSV path.
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    // per-input-dir unique path under the system temp dir — no repo
    // absolute path, no cross-run collision on a shared machine
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_roundtrip_${tmpTag(dir)}"
    val src = Tables.load(spark, dir, "nation")
    src.write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.option("header", "true").schema(schema).csv(tmp)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // S-tier fault tolerance: PERMISSIVE CSV scan over a file with
  // malformed rows — bad casts, extra tokens, short rows. Real 100 TB
  // ingests are never clean; FAILFAST aborts the job on row one and
  // DROPMALFORMED silently loses data, so the production posture is
  // PERMISSIVE + `_corrupt_record` quarantine (parse what parses,
  // null-fill the rest, keep the raw line for a dead-letter sink).
  // The malformed lines are derived deterministically from `nation`
  // (every 5th key: non-numeric field; every 7th: extra token; every
  // 11th: missing token), so the oracle rebuilds the same lines and
  // replays Spark's documented PERMISSIVE semantics token by token.
  def csvPermissive(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_permissive_${tmpTag(dir)}"
    val k = col("n_nationkey")
    Tables.load(spark, dir, "nation")
      .select(
        when(k % 5 === 0,
          concat_ws(",", k, col("n_name"), concat(lit("x"), col("n_regionkey"))))
        .when(k % 7 === 0,
          concat_ws(",", k, col("n_name"), col("n_regionkey"), lit("extra")))
        .when(k % 11 === 0, concat_ws(",", k, col("n_name")))
        .otherwise(concat_ws(",", k, col("n_name"), col("n_regionkey")))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("rk", LongType), StructField("_corrupt_record", StringType)))
    spark.read.option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(tmp)
      .select(col("id"), col("name"), col("rk"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        col("_corrupt_record").as("corrupt_raw"))
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

  // S20: globally-sorted shard output — the 100 TB "write a sorted
  // dataset" pattern: repartitionByRange gives disjoint ordered key
  // ranges across tasks, sortWithinPartitions orders each shard, and
  // together the files form one global order with NO single-task global
  // sort. The query re-reads the written files and proves the invariant
  // from their contents: per-file (lo, hi) key ranges must be pairwise
  // disjoint. Range boundaries come from sampling, so per-shard counts
  // are not deterministic — the published row is the invariant, which is.
  def sortedShards(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_sorted_shards_${tmpTag(dir)}"
    val key = Seq(col("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .repartitionByRange(8, key: _*)
      .sortWithinPartitions(key: _*)
      .write.mode("overwrite").parquet(path)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        min(struct(col("o_totalprice"), col("o_orderkey"))).as("lo"),
        max(struct(col("o_totalprice"), col("o_orderkey"))).as("hi"),
        count(lit(1)).as("n"))
    // 8 rows: the window is over the per-shard digest, not the data
    val w = Window.orderBy(col("lo"))
    perFile
      .withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n")).as("n_rows"),
        min(col("prev_hi").isNull || col("prev_hi") < col("lo")).as("shards_disjoint"))
  }

  // S24: small-file COMPACTION — the lakehouse maintenance pass. A
  // fragmented table (64 shards here, simulating per-micro-batch or
  // per-task small files) is rewritten into 4 key-clustered, in-shard-
  // sorted files. The published row proves BOTH invariants from the
  // actual filesystem state: the file counts (via input_file_name
  // distinct counts, not trusted constants) and content equality (exact
  // digest over the re-read compacted files, pinned by the oracle
  // computed from the source table — any lost/duplicated row breaks it).
  // At 100 TB this is the scheduled job that keeps scan task counts and
  // file-listing overhead bounded; clustering by user_id while
  // compacting also co-locates the per-user access path.
  def compaction(spark: SparkSession, dir: String): DataFrame = {
    val base = s"${sys.props("java.io.tmpdir")}/graft_compact_${tmpTag(dir)}"
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.repartition(64, col("event_id"))
      .write.mode("overwrite").parquet(s"$base/frag")
    val frag = spark.read.parquet(s"$base/frag")
    frag.repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(s"$base/compact")
    val nBefore = frag.select(input_file_name()).distinct().count()
    val compact = spark.read.parquet(s"$base/compact")
    val nAfter = compact.select(input_file_name()).distinct().count()
    // file counts are data-dependent (Spark emits NO file for an empty
    // hash partition), so the exact numbers can't be oracle constants;
    // publish the compaction INVARIANTS as measured booleans instead —
    // the oracle pins TRUE plus the exact content digest
    compact.agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_event"), max(col("event_id")).as("max_event"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"))
      .select(lit(nAfter < nBefore).as("files_reduced"),
        lit(nAfter <= 4L).as("files_at_most_target"),
        col("n_rows"), col("min_event"), col("max_event"), col("total_value"))
  }

  // S: raw `text` source/sink — the line-oriented format for log and
  // corpus ingestion (one string column per line, no schema at all).
  // Nation round-trips as TAB-joined lines; the read side re-parses
  // with split + casts. Same digest as s05/s13, so the shared oracle
  // proves the round-trip through the format was lossless.
  def textRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_text_roundtrip_${tmpTag(dir)}"
    Tables.load(spark, dir, "nation")
      .select(concat_ws("\t",
        col("n_nationkey"), col("n_name"), col("n_regionkey")).as("value"))
      .write.mode("overwrite").text(tmp)
    val parts = split(col("value"), "\t")
    spark.read.text(tmp)
      .select(
        parts.getItem(0).cast(IntegerType).as("n_nationkey"),
        parts.getItem(1).as("n_name"),
        parts.getItem(2).cast(IntegerType).as("n_regionkey"))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // S: data-skipping scan via a per-file min/max manifest — the pattern
  // behind every lakehouse file-pruning feature (Delta/Iceberg stats,
  // parquet row-group min/max): write range-clustered shards, derive a
  // (file → lo, hi) manifest of the clustering key, prune the MANIFEST
  // against the predicate, and scan only the surviving files. The
  // manifest prune is a driver-side collect, but over per-FILE metadata
  // (one row per shard — thousands of rows at 100 TB, same order as the
  // file listing Spark already collects), not data. Here the manifest is
  // derived by one extra pass at write time; a production table keeps it
  // in the commit log, amortized over every later query. The published
  // row is the box aggregate, which is file-layout-independent; the
  // PRUNING is asserted in LayoutSpec (surviving files < total shards).
  private val s21Box = (150000.0, 250000.0)

  /** Range-clustered shard layout + per-file (lo, hi) manifest of the
    * clustering key, built once per (session, dir).
    */
  private def statsManifest(spark: SparkSession, dir: String): Array[(String, Double, Double)] =
    SessionCache.memo(spark, s"s21_manifest_$dir") {
      val p = s"${sys.props("java.io.tmpdir")}/graft_stats_prune_${tmpTag(dir)}"
      Tables.load(spark, dir, "orders")
        .repartitionByRange(8, col("o_totalprice"), col("o_orderkey"))
        .write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    }

  /** Files whose [lo, hi] stats intersect the predicate range. */
  def statsSurvivors(spark: SparkSession, dir: String): (Array[String], Int) = {
    val m = statsManifest(spark, dir)
    val (loP, hiP) = s21Box
    (m.collect { case (f, lo, hi) if hi >= loP && lo <= hiP => f }, m.length)
  }

  def statsPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val (survivors, _) = statsSurvivors(spark, dir)
    val (loP, hiP) = s21Box
    spark.read.parquet(survivors: _*)
      .filter(col("o_totalprice") >= loP && col("o_totalprice") <= hiP)
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
  }

  // S: Z-order (Morton) clustering — the multi-dimensional companion to
  // s21's one-key layout. Both dims are normalized to 16-bit ints from
  // their global min/max (scalar-subquery cross join, integer floor
  // division — exact in both engines), bit-interleaved into a 32-bit
  // z-value, and sharded by the z-value's top 6 bits. The published row
  // compares file-skipping effectiveness for a 2-dim box predicate:
  // shards whose (min,max) stats intersect the box under Z-ORDER
  // sharding vs under single-dim (linear) sharding — z-order prunes on
  // BOTH dims, linear only on one, which is the entire reason lakehouse
  // tables z-order multi-predicate columns. Every number is a
  // deterministic function of the data (shard id is computed per row,
  // not sampled), so the whole comparison is oracle-checkable; the
  // physical write of a z-ordered layout is s20/s21's repartition+write
  // on the z-value and is omitted here to keep the query side-effect
  // free. LayoutSpec asserts the skipping inequality on hit fractions.
  private def interleave16(shl: (String, Int) => String, shr: (String, Int) => String,
                           ua: String, ub: String): String =
    (0 until 16).flatMap(i => Seq(
      shl(s"(${shr(ua, i)} & 1)", 2 * i),
      shl(s"(${shr(ub, i)} & 1)", 2 * i + 1))).mkString(" + ")

  private val zInterleaveSpark: String =
    interleave16((e, k) => s"shiftleft($e, $k)", (e, k) => s"shiftright($e, $k)", "ua", "ub")

  private val zInterleaveDuck: String =
    interleave16((e, k) => s"($e << $k)", (e, k) => s"($e >> $k)", "ua", "ub")

  private val zorderOracleSql: String =
    s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS a,
       |   CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS b,
       |   o_totalprice FROM orders),
       |bounds AS (SELECT MIN(a) AS amin, MAX(a) AS amax, MIN(b) AS bmin, MAX(b) AS bmax FROM base),
       |u AS (SELECT o_totalprice,
       |   ((a - amin) * 65535) // (amax - amin) AS ua,
       |   ((b - bmin) * 65535) // (bmax - bmin) AS ub FROM base CROSS JOIN bounds),
       |z AS (SELECT o_totalprice, ua, ub, ($zInterleaveDuck) AS zv FROM u),
       |t AS (SELECT o_totalprice, ua, ub, (zv >> 26) AS sz, (ua >> 10) AS sl,
       |   ua BETWEEN 28672 AND 36863 AND ub BETWEEN 28672 AND 36863 AS in_box FROM z),
       |zs AS (SELECT sz, MIN(ua) AS mna, MAX(ua) AS mxa, MIN(ub) AS mnb, MAX(ub) AS mxb
       |  FROM t GROUP BY 1),
       |ls AS (SELECT sl, MIN(ua) AS mna, MAX(ua) AS mxa, MIN(ub) AS mnb, MAX(ub) AS mxb
       |  FROM t GROUP BY 1)
       |SELECT
       | (SELECT COUNT(*) FROM zs) AS n_shards_z,
       | (SELECT CAST(SUM(CASE WHEN mxa >= 28672 AND mna <= 36863
       |     AND mxb >= 28672 AND mnb <= 36863 THEN 1 ELSE 0 END) AS BIGINT) FROM zs) AS n_hit_z,
       | (SELECT COUNT(*) FROM ls) AS n_shards_lin,
       | (SELECT CAST(SUM(CASE WHEN mxa >= 28672 AND mna <= 36863
       |     AND mxb >= 28672 AND mnb <= 36863 THEN 1 ELSE 0 END) AS BIGINT) FROM ls) AS n_hit_lin,
       | (SELECT COUNT(*) FROM t WHERE in_box) AS rows_in_box,
       | (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM t WHERE in_box)
       |   AS total_in_box""".stripMargin

  def zorderClustering(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      col("o_custkey").cast(LongType).as("a"),
      datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast(LongType).as("b"),
      col("o_totalprice"))
    val bounds = base.agg(
      min(col("a")).as("amin"), max(col("a")).as("amax"),
      min(col("b")).as("bmin"), max(col("b")).as("bmax"))
    val tagged = base.crossJoin(bounds)
      .selectExpr("o_totalprice",
        "((a - amin) * 65535) div (amax - amin) AS ua",
        "((b - bmin) * 65535) div (bmax - bmin) AS ub")
      .selectExpr("o_totalprice", "ua", "ub", s"($zInterleaveSpark) AS zv")
      .selectExpr("o_totalprice", "ua", "ub",
        "shiftright(zv, 26) AS sz", "shiftright(ua, 10) AS sl",
        "ua BETWEEN 28672 AND 36863 AND ub BETWEEN 28672 AND 36863 AS in_box")
    def hits(shard: String): DataFrame =
      tagged.groupBy(col(shard))
        .agg(min(col("ua")).as("mna"), max(col("ua")).as("mxa"),
          min(col("ub")).as("mnb"), max(col("ub")).as("mxb"))
        .agg(count(lit(1)).as(s"n_shards_$shard"),
          sum((col("mxa") >= 28672 && col("mna") <= 36863 &&
            col("mxb") >= 28672 && col("mnb") <= 36863).cast(LongType)).as(s"n_hit_$shard"))
    val box = tagged.filter(col("in_box"))
      .agg(count(lit(1)).as("rows_in_box"), dsum(col("o_totalprice")).as("total_in_box"))
    hits("sz").crossJoin(hits("sl")).crossJoin(box)
      .select(
        col("n_shards_sz").as("n_shards_z"), col("n_hit_sz").as("n_hit_z"),
        col("n_shards_sl").as("n_shards_lin"), col("n_hit_sl").as("n_hit_lin"),
        col("rows_in_box"), col("total_in_box"))
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

  // JSON-lines round-trip — the remaining text source format: write
  // nation as JSONL, read back with an explicit schema (inference is
  // non-deterministic at scale), same checksum aggregate as s05 so the
  // oracle proves the format preserved the data.
  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_json_roundtrip_${tmpTag(dir)}"
    Tables.load(spark, dir, "nation").write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.schema(schema).json(tmp)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // ORC round-trip — the second columnar format (parquet is everywhere
  // else): write orders as ORC, read back, aggregate. ORC carries its
  // own schema and supports the same predicate pushdown tier.
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_orc_roundtrip_${tmpTag(dir)}"
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  // S18: dynamic partition OVERWRITE — the lakehouse backfill primitive.
  // A full partitioned write, then a patch batch containing ONLY one
  // year rewrites JUST that partition (partitionOverwriteMode=dynamic;
  // static mode would truncate the whole table to the patch). At 100 TB
  // this is how a bad day/hour is recomputed without touching the other
  // partitions, and the readback aggregate proves the untouched
  // partitions survived byte-for-byte.
  def dynamicPartitionOverwrite(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_dyn_overwrite_${tmpTag(dir)}"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("o_year"))
    orders.write.partitionBy("o_year").mode("overwrite").parquet(tmp)
    orders.filter(col("o_year") === 1995)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.partitionBy("o_year").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(tmp)
    spark.read.parquet(tmp)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_year"))
  }

  // S19: schema evolution on read — batches written before a column
  // existed coexist with batches written after (mergeSchema=true unions
  // the file footers; old rows surface NULL for the new column). At
  // 100 TB nobody rewrites history for an added column — the READER
  // absorbs the evolution; this pins that old batches stay readable
  // and the new column is null exactly where it predates the schema.
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_schema_evo_${tmpTag(dir)}"
    val nation = Tables.load(spark, dir, "nation")
    nation.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    spark.read.option("mergeSchema", "true").option("basePath", tmp)
      .parquet(tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("batch").cast(IntegerType).as("batch"))
      .orderBy(col("batch"), col("n_nationkey"))
  }

  // S7: staging temp views + SQL entry point (reference COPY→staging +
  // ad-hoc SQL tier): every table registered in the catalog, the query
  // itself expressed in SQL text against the views.
  def sqlOverViews(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  // S8/S9: catalog DDL + table sinks (reference create_tables.py:6-28 +
  // sql_queries.py:149-152) — DROP/CREATE TABLE in the session catalog,
  // saveAsTable staging, INSERT INTO … SELECT materialization, then a
  // query over the re-read final table.
  def catalogRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val db = "graft_wh"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_wh_${tmpTag(dir)}"
    // the session catalog is in-memory: a fresh session won't know about
    // files a previous process left at the location — wipe them so the
    // managed-table CREATE below is reproducible
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    spark.sql(s"DROP TABLE IF EXISTS $db.nation_stage")
    Tables.load(spark, dir, "nation").write.saveAsTable(s"$db.nation_stage")
    spark.sql(s"DROP TABLE IF EXISTS $db.nation_final")
    spark.sql(
      s"CREATE TABLE $db.nation_final (n_regionkey INT, n_name STRING) USING parquet")
    spark.sql(
      s"INSERT INTO $db.nation_final SELECT n_regionkey, n_name FROM $db.nation_stage")
    spark.table(s"$db.nation_final")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("min_name"))
      .orderBy(col("n_regionkey"))
  }

  // Partitioned write + partition-pruned scan (the reference's own scale
  // wish, README.md:23,156): orders written partitioned by year, read
  // back with a partition filter — `.explain` shows PartitionFilters
  // with only the matching directory scanned.
  def partitionedScan(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_orders_byyear_${tmpTag(dir)}"
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    spark.read.parquet(path)
      .filter(col("o_year") === 1995)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // Dynamic partition pruning: the year filter lives on the DIM side of
  // the join, not the fact scan — at planning time the fact's partition
  // set is unknown, and Catalyst injects a runtime pruning subquery from
  // the broadcast dim so only the matching o_year directories are read
  // (PlanSpec asserts the dynamicpruning filter). THE star-schema scale
  // feature: a 100 TB fact never scans partitions the dims exclude.
  def dynamicPruning(spark: SparkSession, dir: String): DataFrame = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_orders_dpp_${tmpTag(dir)}"
    Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    // the dim must be a SCANNED relation with a selective filter for the
    // planner to judge pruning worthwhile — a VALUES relation gets
    // constant-folded and its filter disappears before the DPP rule runs
    val dimPath = s"${path}_dim"
    spark.sql("SELECT * FROM VALUES (1995, 'target'), (1996, 'other') AS t(d_year, d_label)")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("d_label") === "target")
    spark.read.parquet(path)
      .join(dim, col("o_year") === col("d_year"))
      .groupBy(col("d_label"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // Runtime Bloom-filter join pruning: the selective dim-side filter is
  // turned into a bloom_filter_might_contain predicate INJECTED on the
  // fact side before its shuffle (InjectRuntimeFilter), so rows that
  // cannot join are dropped at the scan instead of being shuffled —
  // the row-level sibling of s15's dynamic PARTITION pruning, and the
  // second runtime-filtering pillar for a 100 TB fact table. The MERGE
  // hint keeps the join sort-merge (a broadcast join needs no bloom);
  // injection fires when the application side clears the size
  // threshold — production-sized on the driver's session, scaled down
  // in PlanSpec, identical results either way (oracle = plain join).
  def bloomFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.load(spark, dir, "lineitem")
      .join(urgent.hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast(LongType).as("total_qty"))
      .orderBy(col("l_linestatus"))
  }

  // Bucketed table + shuffle-free aggregation: orders written bucketed
  // by o_custkey, so the per-customer aggregate runs with ZERO exchanges
  // (the bucketing satisfies the required hash distribution). This is
  // the co-location story for 100 TB: pay the shuffle once at write
  // time, every keyed agg/join after that is exchange-free.
  def bucketedAgg(spark: SparkSession, dir: String): DataFrame = {
    val db = "graft_whb"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_whb_${tmpTag(dir)}"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    Tables.load(spark, dir, "orders").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(s"$db.orders_bucketed")
    spark.table(s"$db.orders_bucketed")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
  }

  // S10: static VALUES row source joined against a table.
  def staticValuesJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zones = Seq((0, "ZONE-A"), (1, "ZONE-B"), (2, "ZONE-C"), (3, "ZONE-D"), (4, "ZONE-E"))
      .toDF("zone_key", "zone_name")
    Tables.load(spark, dir, "region")
      .join(zones, col("r_regionkey") === col("zone_key"))
      .select(col("r_regionkey"), col("r_name"), col("zone_name"))
      .orderBy(col("r_regionkey"))
  }

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

  // DQ: join-key SKEW REPORT — the pre-flight a 100 TB join runs before
  // committing to a partitioning: per-key row counts reduced to
  // key cardinality, max/median/p99 group sizes, the single heaviest
  // key and its share, and the skew factor (max over mean). One
  // hash-agg over the fact; the top key comes from a TakeOrdered
  // (orderBy + limit 1 — no full sort), and every published double is
  // a division of exact integers. Feeding j12's salting / j15's AQE
  // decision with MEASURED skew instead of a guess is the operational
  // point.
  def skewReport(spark: SparkSession, dir: String): DataFrame = {
    val g = Tables.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("k")).agg(count(lit(1)).as("n"))
    val s = g.agg(
      count(lit(1)).as("n_keys"),
      sum(col("n")).cast(LongType).as("n_rows"),
      max(col("n")).as("max_rows"),
      expr("percentile(n, 0.5)").as("p50_rows"),
      expr("percentile(n, 0.99)").as("p99_rows"))
    val top = g.orderBy(col("n").desc, col("k")).limit(1)
      .select(col("k").as("top_key"), col("n").as("top_rows"))
    s.crossJoin(broadcast(top))
      .select(col("n_keys"), col("n_rows"), col("max_rows"),
        col("p50_rows"), col("p99_rows"), col("top_key"), col("top_rows"),
        (col("top_rows").cast(DoubleType) / col("n_rows")).as("top_share"),
        ((col("max_rows") * col("n_keys")).cast(DoubleType) / col("n_rows"))
          .as("skew_factor"))
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
      .agg(sum(dec(col("l_extendedprice")) * col("l_quantity")).as("value"))
    val tot = v.agg(sum(col("value")).as("total"))
    v.crossJoin(broadcast(tot))
      .filter(col("value") * 1000 > col("total"))
      .select(col("l_partkey"), col("value").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  // Correlated LATERAL subquery with per-row ORDER BY + LIMIT (top-N
  // per group as the SQL standard writes it). Catalyst decorrelates
  // the lateral into a join + per-partition limit rather than running
  // the inner query once per outer row — the plan to check is that no
  // per-row re-execution survives.
  def lateralTopPerGroup(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n_name, c_custkey, c_acctbal
        |FROM nation, LATERAL (
        |  SELECT c_custkey, c_acctbal FROM customer
        |  WHERE c_nationkey = n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 3) top_c
        |ORDER BY n_name, c_acctbal DESC, c_custkey""".stripMargin)
  }

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
    "s16_bloom_filter_join" -> (bloomFilterJoin _),
    "s17_csv_permissive" -> (csvPermissive _),
    "s18_dynamic_overwrite" -> (dynamicPartitionOverwrite _),
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
        |    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * l_quantity) AS value
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
        |      FROM orders GROUP BY 1, 2)
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
