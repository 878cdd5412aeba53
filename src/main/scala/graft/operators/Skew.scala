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

  /** j15: the RUNTIME-mitigated variant of j12 — no salting in the plan;
    * AQE's OptimizeSkewedJoin detects the hot reduce partition from the
    * map output statistics and splits it, duplicating the matching dim
    * rows. ~90% of lineitem rows are remapped onto one synthetic hot
    * key (joined via a planted dim row), and the MERGE hint keeps the
    * join sort-merge so skew splitting (not broadcast) is the
    * mitigation under test. Result is identical to the plain join —
    * the oracle — whether or not the optimization fires; SkewSpec runs
    * it with production-shaped thresholds scaled to test data and
    * asserts `skew=true` in the final adaptive plan.
    *
    * Salting (j12) vs AQE (j15) at 100 TB: AQE handles skew it can SEE
    * (one partition's bytes), needs no key knowledge, and is the right
    * default; explicit salting remains for extreme single keys beyond
    * the splitter's granularity or for deterministic plan shape.
    */
  def aqeSkewJoin(spark: SparkSession, dir: String): DataFrame = {
    // AQE splits a skewed reduce partition by MAPPER ranges, so the
    // skewed shuffle must have >1 map task: the single-split testdata
    // parquet would leave the hot partition as one unsplittable chunk
    // (skew detection then reports zero skewed partitions no matter the
    // thresholds). Round-robin repartition stands in for the many
    // input splits a real table has; it also spreads the hot key's rows
    // across mappers, which is what makes the reduce partition
    // splittable at all.
    val li = Tables.load(spark, dir, "lineitem").repartition(16)
    val fact = li.select(
      when(pmod(col("l_orderkey"), lit(10)) === 0, col("l_orderkey"))
        .otherwise(lit(0L)).as("skew_key"),
      col("l_quantity"))
    val dim = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey").as("d_key"), col("o_orderpriority").as("d_prio"))
      .unionAll(spark.range(1).select(lit(0L).as("d_key"), lit("0-HOT").as("d_prio")))
    fact.join(dim.hint("MERGE"), col("skew_key") === col("d_key"))
      .groupBy(col("d_prio"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast(LongType).as("total_qty"))
      .orderBy(col("d_prio"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j12_salted_join" -> (saltedOrderJoin _),
    "j15_aqe_skew_join" -> (aqeSkewJoin _))

  // plain join: the oracle proves salting changes the plan, not the result
  val oracles: Map[String, String] = Map(
    "j12_salted_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_items,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // plain join over the same skewed remapping: AQE must change the
    // execution, never the result
    "j15_aqe_skew_join" ->
      """WITH f AS (SELECT CASE WHEN l_orderkey % 10 = 0 THEN l_orderkey
        |    ELSE 0 END AS skew_key, l_quantity FROM lineitem),
        |d AS (SELECT o_orderkey AS d_key, o_orderpriority AS d_prio FROM orders
        |      UNION ALL SELECT 0, '0-HOT')
        |SELECT d_prio, COUNT(*) AS n_items,
        |  CAST(SUM(l_quantity) AS BIGINT) AS total_qty
        |FROM f JOIN d ON skew_key = d_key
        |GROUP BY d_prio ORDER BY d_prio""".stripMargin)
}
