package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DateType
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
    val eventsRaw = Tables.load(spark, dir, "events")
    val events = eventsRaw
      .select(col("event_id"), col("user_id"),
        Tables.tsUs(eventsRaw).as("t_us"))
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
    val evRaw = Tables.load(spark, dir, "events")
    val ev = evRaw
      .select(col("event_id"), col("user_id"), Tables.tsUs(evRaw).as("t_us"))
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

  /** Interval-OVERLAP join via banding — same-supplier shipment-window
    * pairs that overlap in time. Each lineitem carries a derived
    * delivery window [shipdate, shipdate + 1 + 3·linenumber days]
    * (deterministic, ≤ 22 days), so window spans are bounded by one
    * month and j14's banding generalizes from points to intervals: band
    * by the START month, explode one side to its adjacent months
    * (overlap ⇒ starts differ by under a month ⇒ each pair meets in
    * exactly one band), and the precise overlap predicate filters
    * band-mates. Pure equi-join on (supplier, band) — no nested loop;
    * the oracle is the naive inequality join, proving banding changes
    * the plan, not the result. At scale the band width is chosen ≥ the
    * max interval duration, exactly like j14's band ≥ the range radius.
    */
  def overlappingShipmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val iv = Tables.load(spark, dir, "lineitem")
      .select(
        col("l_suppkey").as("k"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("uid"),
        col("l_shipdate").cast(DateType).as("s"),
        (lit(1) + col("l_linenumber") * 3).as("dur"))
      .withColumn("e", date_add(col("s"), col("dur")))
      .withColumn("bucket", year(col("s")) * 12 + month(col("s")))
      // single-split testdata guard (TextAnalysis.docs pattern): without
      // this, BOTH band-join map stages — including the 3× explode —
      // run on the one scan core; the narrow 600 k-row shuffle is cheap
      // and identical for the two branches, so ReuseExchange shares it.
      // At 100 TB the scan yields enough splits and this is dropped.
      .repartition(col("uid"))
    val a = iv.select(col("k"), col("uid").as("uid_a"), col("s").as("s_a"),
      col("e").as("e_a"), col("bucket"))
    val b = iv.select(col("k"), col("uid").as("uid_b"), col("s").as("s_b"),
      col("e").as("e_b"),
      explode(array(col("bucket") - 1, col("bucket"), col("bucket") + 1)).as("bucket"))
    a.join(b, Seq("k", "bucket"))
      .filter(col("uid_a") < col("uid_b") &&
        col("s_a") <= col("e_b") && col("s_b") <= col("e_a"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("k").as("l_suppkey"), col("n_pairs"))
      .orderBy(col("l_suppkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "j13_asof_join" -> (eventsAsOfOrders _),
    "j14_range_join" -> (eventPairsWithinMinute _),
    "j18_interval_overlap_join" -> (overlappingShipmentPairs _))

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
        |GROUP BY a.user_id ORDER BY a.user_id""".stripMargin,
    // naive interval-overlap inequality join — same result, different plan
    "j18_interval_overlap_join" ->
      """WITH iv AS (SELECT l_suppkey AS k, l_orderkey * 10 + l_linenumber AS uid,
        |   CAST(l_shipdate AS DATE) AS s,
        |   CAST(l_shipdate AS DATE) + (1 + l_linenumber * 3) AS e
        | FROM lineitem)
        |SELECT a.k AS l_suppkey, COUNT(*) AS n_pairs
        |FROM iv a JOIN iv b ON a.k = b.k AND a.uid < b.uid
        |  AND a.s <= b.e AND b.s <= a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
