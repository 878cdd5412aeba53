package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** As-of join — for each left row, the single right row with the
  * greatest timestamp ≤ the left timestamp, per key. Spark has no
  * native as-of operator; the naive formulation (inequality join +
  * per-pair max) is O(|L|·|R|) per key. This composes it scalably with
  * the union-and-scan pattern:
  *
  *   1. tag and UNION both sides into one (key, time, side, payload) set
  *   2. one shuffle: window over key ordered by (time, side) with
  *      rights sorting BEFORE lefts at equal time (≤ semantics)
  *   3. `last(right_payload, ignoreNulls)` up to the current row gives
  *      every left row its as-of match in a single linear scan
  *
  * Cost: one hash shuffle + per-partition sort over |L|+|R| rows —
  * the same shape as a sort-merge join, no inequality-join blowup.
  * SURVEY §2.4 notes the reference has no as-of joins; this is
  * extension-tier surface for feature-store-style training pipelines
  * ("latest signal value as of event time").
  */
object AsOf {

  /** Left rows (key, leftTime, left payload…) matched to the right
    * side's payload column as of leftTime. Right rows must be unique
    * per (key, rightTime) — pre-aggregate to enforce determinism.
    * Unmatched left rows keep a null match (filter for inner).
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: String): DataFrame = {
    // withColumn would silently overwrite these internal names and the
    // final select would return the wrong column — fail loudly instead
    val reserved = Set("__t", "__side", "__rp", "__asof")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"joinAsOf inputs must not contain reserved columns: ${clash.mkString(", ")}")
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rp", lit(null).cast(right.schema(rightPayload).dataType))
    val r = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"),
      col(rightPayload).as("__rp"))
    val lCols = left.columns
    val unioned = l.select(
      (lCols.map(col) :+ col("__t") :+ col("__side") :+ col("__rp")): _*)
      .unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at the same instant -> "<=" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) :+ col("__asof")): _*)
  }

  /** Each event matched to the customer's most recent order as of the
    * event time (orders pre-aggregated to one row per (customer, date),
    * max orderkey as the deterministic representative). Inner semantics
    * to mirror DuckDB's native ASOF JOIN, which is the oracle.
    */
  def eventsAsOfOrders(spark: SparkSession, dir: String): DataFrame = {
    val events = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        expr("ts div 1000").as("t_us"))
    val orders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"),
        // NTZ → TZ cast is identity under the UTC session timezone
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      .agg(max(col("o_orderkey")).as("ref_orderkey"))
    joinAsOf(events, orders, key = "user_id",
        leftTime = "t_us", rightTime = "o_us", rightPayload = "ref_orderkey")
      .filter(col("__asof").isNotNull)
      .select(col("event_id"), col("user_id"), col("__asof").as("ref_orderkey"))
  }

  /** Range (interval) join via banding — same-user event pairs within
    * 60 s of each other. The naive form is an inequality join (nested
    * loop); the scalable form buckets time into band-sized minutes and
    * equi-joins each right row into its own and the two adjacent
    * buckets: any |Δt| ≤ band pair shares exactly one (bucket_left,
    * exploded bucket_right) match, so the join is a plain hash join and
    * the precise predicate only filters bucket-mates.
    */
  def eventPairsWithinMinute(spark: SparkSession, dir: String): DataFrame = {
    val BandUs = 60L * 1000 * 1000
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us"))
      .withColumn("bucket", expr(s"t_us div $BandUs"))
    val a = ev.select(col("user_id"), col("event_id").as("id_a"),
      col("t_us").as("t_a"), col("bucket"))
    val b = ev.select(col("user_id"), col("event_id").as("id_b"),
        col("t_us").as("t_b"),
        explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("id_a") < col("id_b") &&
        abs(col("t_b") - col("t_a")) <= BandUs)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy(col("user_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j13_asof_join" -> (eventsAsOfOrders _),
    "j14_range_join" -> (eventPairsWithinMinute _))

  // DuckDB has a NATIVE ASOF JOIN — the composed Spark plan is checked
  // against the engine-native operator semantics.
  val oracles: Map[String, String] = Map(
    "j13_asof_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
        |o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_us,
        |        MAX(o_orderkey) AS ref_orderkey
        |      FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.ref_orderkey
        |FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.t_us >= o.o_us""".stripMargin,
    // plain inequality join: the oracle proves banding changes the
    // plan, not the result
    "j14_range_join" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us FROM events)
        |SELECT a.user_id, COUNT(*) AS n_pairs
        |FROM e a JOIN e b ON a.user_id = b.user_id
        |  AND a.event_id < b.event_id
        |  AND abs(b.t_us - a.t_us) <= 60000000
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin)
}
