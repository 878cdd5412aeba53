package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** Data-quality reports: expectations, skew, exact moment statistics.
  *
  * Split out of the former monolithic Relational.scala along its
  * section families; mixed back into [[Relational]], so every member
  * keeps its `Relational.x` address and the query/oracle maps there.
  */
trait RelationalQuality extends RelationalBase {

  // DQ: expectations-style data-quality report — null rate, domain
  // violations, duplicate keys, and FK orphans, each a (check, count)
  // row. All scalar expectations AND the FK-orphan count fold into ONE
  // lineitem scan: the FK check is a left join against the distinct
  // order-key set with a presence marker, counted alongside the
  // null/domain checks in a single aggregate, unpivoted to rows with
  // explode (a per-check re-select of the 1-row aggregate would
  // re-execute the scan per union branch). The duplicate-key check is
  // the one irreducible second pass (it needs a per-key groupBy). Two
  // fact scans total, down from six. The key-set join carries NO
  // broadcast hint on purpose: AQE picks broadcast from the ACTUAL
  // distinct-key size (it does, at every test scale — PlanSpec pins
  // it), and at 100 TB, where the key set outgrows executor memory, a
  // forced hint would OOM where the planner's key-only shuffle is the
  // correct fallback.
  def qualityReport(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val orders = Tables.load(spark, dir, "orders")
    def checkRow(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check"), col("violations").cast(LongType),
        col("checked").cast(LongType))
    val joined = li
      .select(col("l_quantity"), col("l_discount"), col("l_shipdate"),
        col("l_orderkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey"))
        .distinct().withColumn("_hit", lit(1)), Seq("l_orderkey"), "left")
    val scalarRows = joined.agg(
        count(when(col("l_quantity").isNull, 1)).as("null_qty"),
        count(when(!col("l_discount").between(0.0, 1.0), 1)).as("bad_discount"),
        count(when(col("l_shipdate").isNull, 1)).as("null_shipdate"),
        count(when(col("_hit").isNull, 1)).as("orph"),
        count(lit(1)).as("checked"))
      .select(explode(array(
        struct(lit("null_quantity").as("check"), col("null_qty").as("violations")),
        struct(lit("discount_in_unit_range").as("check"), col("bad_discount").as("violations")),
        struct(lit("null_shipdate").as("check"), col("null_shipdate").as("violations")),
        struct(lit("orderkey_fk").as("check"), col("orph").as("violations")))).as("e"),
        col("checked"))
      .select(col("e.check").as("check"), col("e.violations").cast(LongType).as("violations"),
        col("checked").cast(LongType))
    val dupKeys = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(count(lit(1)).as("n"))
      .agg(count(when(col("n") > 1, 1)).as("violations"), count(lit(1)).as("checked"))
    scalarRows
      .unionAll(checkRow("unique_line_key", dupKeys))
      .orderBy(col("check"))
  }

  // DQ: full REFERENTIAL-INTEGRITY audit — every FK edge of the schema
  // as one (fk, n_rows, n_orphans, orphan_rate) row. Edges are grouped
  // by fact table so each fact is scanned ONCE (FK columns only): every
  // edge left-joins the distinct key set of its dimension with a
  // presence marker, and a single aggregate counts rows plus per-edge
  // missing markers, unpivoted to rows with explode (NOT a per-edge
  // re-select, which would re-execute the scan). The naive
  // one-anti-join-per-edge form pays two fact scans per edge — 6×
  // lineitem here, ruinous at 100 TB; this form pays one scan per fact.
  // The dim joins are deliberately un-hinted: AQE broadcasts every dim
  // key set at the scales it fits (PlanSpec pins broadcast-only plans),
  // and a dim too big to broadcast degrades to a key-only shuffle of
  // the fact's FK column instead of a forced-broadcast OOM. Null/
  // missing FK semantics match the anti-join (a NULL key never
  // equi-matches, so it counts as an orphan) — the oracle uses NOT
  // EXISTS, which matches, where NOT IN would not.
  def fkIntegrityReport(spark: SparkSession, dir: String): DataFrame = {
    def t(n: String) = Tables.load(spark, dir, n)
    val factsInOrder = FkEdges.map(_._2).distinct
    factsInOrder.map { factT =>
      val edges = FkEdges.filter(_._2 == factT)
      val joined = edges.zipWithIndex.foldLeft(
        t(factT).select(edges.map(e => col(e._3)): _*)) {
        case (df, ((_, _, fk, dimT, pk), i)) =>
          df.join(
            t(dimT).select(col(pk).as(fk)).distinct()
              .withColumn(s"_hit$i", lit(1)),
            Seq(fk), "left")
      }
      val orphanCounts = edges.zipWithIndex.map { case (_, i) =>
        count(when(col(s"_hit$i").isNull, 1)).as(s"_orph$i")
      }
      val perEdge = array(edges.zipWithIndex.map { case ((name, _, _, _, _), i) =>
        struct(lit(name).as("fk"), col(s"_orph$i").as("n_orphans"))
      }: _*)
      joined
        .agg(count(lit(1)).as("n_rows"), orphanCounts: _*)
        .select(explode(perEdge).as("e"), col("n_rows"))
        .select(col("e.fk"), col("n_rows"), col("e.n_orphans"))
    }.reduce(_.unionAll(_))
      // nullif guard: an EMPTY fact (zero-row shard, filtered-out day)
      // has no defined orphan rate — publish NULL, not an ANSI
      // divide-by-zero abort of the whole audit
      .withColumn("orphan_rate",
        round(col("n_orphans").cast(DoubleType) /
          nullif(col("n_rows"), lit(0L)), 6))
      .orderBy(col("fk"))
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
}
