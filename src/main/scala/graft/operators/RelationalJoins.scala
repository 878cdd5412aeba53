package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** Join-operator surface: outer/semi/anti, broadcast and shuffle-hash hints, null-safe keys, lateral top-k, scalar cross joins.
  *
  * Split out of the former monolithic Relational.scala along its
  * section families; mixed back into [[Relational]], so every member
  * keeps its `Relational.x` address and the query/oracle maps there.
  */
trait RelationalJoins extends RelationalBase {

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
}
