package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.KmvDistinct

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
    val h = pmod(lit(A) * col("o_custkey") + lit(B), lit(P))
    Tables.load(spark, dir, "orders")
      .select(col("o_orderstatus"), h.as("hv"), col("o_custkey"))
      .groupBy(col("o_orderstatus"))
      .agg(
        call_function("kmv_distinct", col("hv")).as("kmv_estimate"),
        countDistinct(col("o_custkey")).as("exact_distinct"))
      .orderBy(col("o_orderstatus"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d06_kmv_distinct" -> (kmvDistinctCustomers _))

  val oracles: Map[String, String] = Map(
    "d06_kmv_distinct" ->
      s"""WITH h AS (SELECT o_orderstatus, o_custkey,
         |        ($A * o_custkey + $B) % $P AS hv FROM orders),
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
         |FROM km JOIN ex USING (o_orderstatus) ORDER BY 1""".stripMargin)
}
