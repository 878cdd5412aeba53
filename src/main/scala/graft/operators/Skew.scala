package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** Skew mitigation: salted equi-join. When a join key is hot (one key
  * holds a disproportionate share of the fact rows), a plain hash join
  * funnels that key through a single reducer. Salting spreads it:
  *
  *  - the FACT side tags each row with a deterministic salt in
  *    [0, saltFactor) derived from a per-row unique column (never from
  *    the join key — that would keep the hot key together);
  *  - the DIM side is exploded saltFactor× (one copy per salt id);
  *  - the join runs on (key, salt), so a hot key occupies saltFactor
  *    reducers instead of one.
  *
  * Result is IDENTICAL to the unsalted join (each fact row still meets
  * exactly one copy of its dim row) — verified by the plain-join DuckDB
  * oracle. AQE's skew-join splitting handles moderate skew at runtime;
  * explicit salting is the deterministic-plan variant for extreme keys.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                 dimKey: String, rowTag: Column, saltFactor: Int): DataFrame = {
    val salted = fact.withColumn("__fsalt", pmod(xxhash64(rowTag), lit(saltFactor)))
    val dimExp = dim.withColumn("__dsalt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(dimExp,
      salted(factKey) === dimExp(dimKey) && col("__fsalt") === col("__dsalt"))
      .drop("__fsalt", "__dsalt")
  }

  /** lineitem ⋈ orders via an 8-way salted join, then a per-priority
    * rollup — the hot-key-safe formulation of the classic fact⋈fact
    * join. Output equals the plain join (oracle).
    */
  def saltedOrderJoin(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(spark, dir, "lineitem")
    val ord = Tables.load(spark, dir, "orders")
    saltedJoin(li, ord, "l_orderkey", "o_orderkey",
        rowTag = struct(col("l_orderkey"), col("l_linenumber")), saltFactor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast(LongType).as("total_qty"))
      .orderBy(col("o_orderpriority"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j12_salted_join" -> (saltedOrderJoin _))

  // plain join: the oracle proves salting changes the plan, not the result
  val oracles: Map[String, String] = Map(
    "j12_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
}
