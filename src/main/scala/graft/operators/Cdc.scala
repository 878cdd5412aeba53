package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.{DoubleType, StringType}
import graft.Tables

/** Change-data-capture log compaction — the ingestion-side complement
  * to the upsert/SCD family in [[Relational]] (u01-u03): a Debezium-style
  * op log (`I`/`U`/`D` rows with a per-key sequence) is folded to the
  * final table snapshot. Extension tier: the reference applies updates
  * in-place via Redshift `UPDATE … FROM` (capstone.py UPDATE step);
  * on immutable storage the same contract is "latest op wins, delete
  * tombstones drop the key", which is this operator.
  *
  * Shape at scale: ONE shuffle on the key (window `row_number` over
  * seq desc), no matter how many change batches are unioned — the
  * standard periodic-compaction job over a 100 TB CDC firehose. The
  * op log here is derived deterministically from `orders` so the
  * oracle can rebuild it: every key is inserted (seq 0), every 7th
  * updated (seq 1), every 13th deleted (seq 2), every 39th
  * re-inserted after its delete (seq 3) — exercising update-after-
  * insert, delete-wins, and insert-after-delete in one query.
  */
object Cdc {

  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val ins = orders
      .select(col("o_orderkey"), lit("I").as("op"), col("o_orderstatus"),
        col("o_totalprice"), lit(0).as("seq"))
    val upd = orders.filter(col("o_orderkey") % 7 === 0)
      .select(col("o_orderkey"), lit("U").as("op"),
        lit("U1").as("o_orderstatus"),
        (col("o_totalprice") * 2).as("o_totalprice"), lit(1).as("seq"))
    val del = orders.filter(col("o_orderkey") % 13 === 0)
      .select(col("o_orderkey"), lit("D").as("op"),
        lit(null).cast(StringType).as("o_orderstatus"),
        lit(null).cast(DoubleType).as("o_totalprice"), lit(2).as("seq"))
    val reins = orders.filter(col("o_orderkey") % 39 === 0)
      .select(col("o_orderkey"), lit("I").as("op"),
        lit("R").as("o_orderstatus"),
        (col("o_totalprice") * 3).as("o_totalprice"), lit(3).as("seq"))
    val log = ins.unionByName(upd).unionByName(del).unionByName(reins)
    val w = Window.partitionBy(col("o_orderkey")).orderBy(col("seq").desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("op") =!= "D")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "u04_cdc_apply" -> (cdcApply _))

  val oracles: Map[String, String] = Map(
    "u04_cdc_apply" ->
      """WITH log AS (
        |  SELECT o_orderkey, 'I' AS op, o_orderstatus, o_totalprice, 0 AS seq
        |  FROM orders
        |  UNION ALL SELECT o_orderkey, 'U', 'U1', o_totalprice * 2, 1
        |  FROM orders WHERE o_orderkey % 7 = 0
        |  UNION ALL SELECT o_orderkey, 'D', NULL, NULL, 2
        |  FROM orders WHERE o_orderkey % 13 = 0
        |  UNION ALL SELECT o_orderkey, 'I', 'R', o_totalprice * 3, 3
        |  FROM orders WHERE o_orderkey % 39 = 0),
        |last AS (SELECT *, ROW_NUMBER() OVER (
        |           PARTITION BY o_orderkey ORDER BY seq DESC) AS rn FROM log)
        |SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM last WHERE rn = 1 AND op <> 'D'""".stripMargin)
}
