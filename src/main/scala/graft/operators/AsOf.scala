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
    *
    * Null-payload contract: a right row whose payload is NULL is itself
    * the as-of match (the left row gets a null `__asof`); it does NOT
    * fall through to the previous non-null payload. The payload rides
    * inside a non-null struct, so `last(_, ignoreNulls)` skips only
    * missing RIGHT ROWS, never a present row with a null value — the
    * usual feature-store reading ("the signal was observed as null"),
    * matching DuckDB's native ASOF JOIN. Filter null payloads from the
    * right side first for fall-through semantics.
    */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               rightPayload: String): DataFrame =
    joinAsOfCore(left, right, key, leftTime, rightTime, rightPayload)
      .drop("__asof_t")

  /** [[joinAsOf]] plus the matched right row's TIME as `__asof_t` — the
    * carrier for tolerance semantics (j20): staleness is `leftTime −
    * __asof_t`, computable without a second join. The struct payload
    * rides the same single window scan, so tolerance costs nothing over
    * the plain as-of.
    */
  private[graft] def joinAsOfCore(left: DataFrame, right: DataFrame, key: String,
                                  leftTime: String, rightTime: String,
                                  rightPayload: String): DataFrame = {
    // withColumn would silently overwrite these internal names and the
    // final select would return the wrong column — fail loudly instead
    val reserved = Set("__t", "__side", "__rp", "__asof", "__asof_t", "__m")
    val clash = (left.columns ++ right.columns).filter(reserved)
    require(clash.isEmpty,
      s"joinAsOf inputs must not contain reserved columns: ${clash.mkString(", ")}")
    val rp = struct(col(rightTime).cast("long").as("t"),
      col(rightPayload).as("p"))
    val l = left.withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__rp",
        lit(null).cast(right.select(rp).schema.head.dataType))
    val r = right.select(
      col(key), col(rightTime).as("__t"), lit(0).as("__side"), rp.as("__rp"))
    val lCols = left.columns
    val unioned = l.select(
      (lCols.map(col) :+ col("__t") :+ col("__side") :+ col("__rp")): _*)
      .unionByName(r, allowMissingColumns = true)
    // rights sort before lefts at the same instant -> "<=" semantics
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__m", last(col("__rp"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((lCols.map(col) :+ col("__m").getField("p").as("__asof")
        :+ col("__m").getField("t").as("__asof_t")): _*)
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

  /** Tolerance for [[eventsAsOfOrdersTol]]: 8400 days in microseconds —
    * a signal older than this is STALE and the event keeps no match.
    * The testdata's events (~2024) trail its orders (≤1998) by ≥ 8190
    * days at every scale factor, and 8400 sits between the staleness
    * median (~8370) and p90 (~8820), so the bound drops a real fraction
    * AND keeps a real fraction — a tolerance inside the data's gap
    * (e.g. 30 days) would gate an always-empty result. */
  val AsOfTolUs: Long = 8400L * 24 * 3600 * 1000 * 1000

  /** j20: as-of join with a STALENESS TOLERANCE — the feature-store
    * contract ("latest value as of event time, but only if fresher than
    * N"): j13's nearest-earlier match is kept only when `leftTime −
    * matchTime ≤ tol`, else the row is dropped (inner semantics).
    * Because the as-of match is the UNIQUE nearest-earlier row,
    * tolerance is a post-filter on the single window scan — no second
    * join, no inequality-join blowup; the oracle applies the same
    * filter over DuckDB's native ASOF JOIN. The report buckets matched
    * events by 30-day staleness months so the gate pins the staleness
    * distribution compactly, not just the cut.
    */
  def eventsAsOfOrdersTol(spark: SparkSession, dir: String): DataFrame = {
    val eventsRaw = Tables.load(spark, dir, "events")
    val events = eventsRaw
      .select(col("event_id"), col("user_id"),
        Tables.tsUs(eventsRaw).as("t_us"))
    val orders = Tables.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("user_id"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
      .agg(max(col("o_orderkey")).as("ref_orderkey"))
    joinAsOfCore(events, orders, key = "user_id",
        leftTime = "t_us", rightTime = "o_us", rightPayload = "ref_orderkey")
      .filter(col("__asof").isNotNull &&
        col("t_us") - col("__asof_t") <= AsOfTolUs)
      .select(col("user_id"),
        // div, not /: slash on longs is double division in Spark
        expr("(t_us - __asof_t) div 2592000000000").as("staleness_months"))
      .groupBy(col("staleness_months"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy(col("staleness_months"))
  }

  /** e26: STREAMING as-of enrichment — the j13 temporal join run as
    * stream-static enrichment: arriving events (replayed from the
    * events parquet as a file stream) are matched per micro-batch to
    * the customer's most recent order as of event time. Spark's
    * stream-stream joins have no as-of/ordering semantics, so the
    * composition is `foreachBatch` + the batch [[joinAsOf]] against the
    * STATIC pre-aggregated order frame (resolved once, outside the
    * stream) — per-batch cost is O(batch + matched keys' orders), and
    * each event's match depends only on the static right side, so the
    * result is invariant under micro-batching and equals the batch j13
    * oracle verbatim. The same shape serves online feature enrichment
    * at 100 TB: the right side is the feature store's compacted daily
    * snapshot, the left is the event firehose.
    */
  def streamAsOfEnrich(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.memo(spark, s"e26:$dir") {
      import org.apache.spark.sql.streaming.Trigger
      val orders = Tables.load(spark, dir, "orders")
        .groupBy(col("o_custkey").as("user_id"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"))
        .agg(max(col("o_orderkey")).as("ref_orderkey"))
        .localCheckpoint() // resolve the static side once, not per batch
      val evPath = Tables.path(dir, "events")
      val schema = spark.read.parquet(evPath).schema
      val stream = spark.readStream.schema(schema)
        .option("basePath", dir).parquet(s"$evPath*")
      val outBase =
        s"${sys.props("java.io.tmpdir")}/graft_e26_${graft.Fs.sessionTag(spark, dir)}"
      graft.Fs.rmTree(new java.io.File(outBase))
      val q = stream.writeStream
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          val ev = batch.select(col("event_id"), col("user_id"),
            Tables.tsUs(batch).as("t_us"))
          joinAsOf(ev, orders, key = "user_id",
              leftTime = "t_us", rightTime = "o_us", rightPayload = "ref_orderkey")
            .filter(col("__asof").isNotNull)
            .select(col("event_id"), col("user_id"),
              col("__asof").as("ref_orderkey"))
            .write.mode("overwrite").parquet(s"$outBase/b$batchId")
          ()
        }
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      graft.Fs.readBatchDirs(spark, outBase, org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_id",
          schema("event_id").dataType),
        org.apache.spark.sql.types.StructField("user_id",
          schema("user_id").dataType),
        // Flow the type from the resolved static frame, not a literal:
        // the non-empty path's type comes from max(o_orderkey) through
        // joinAsOf, so a schema change in orders must move both paths
        // together (round-11 advice).
        org.apache.spark.sql.types.StructField("ref_orderkey",
          orders.schema("ref_orderkey").dataType))))
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
    "j18_interval_overlap_join" -> (overlappingShipmentPairs _),
    "j20_asof_tolerance" -> (eventsAsOfOrdersTol _),
    "e26_stream_asof_enrich" -> (streamAsOfEnrich _))

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
    // native ASOF JOIN + the same staleness post-filter: tolerance only
    // DROPS matches, so filtering the unique nearest-earlier match is
    // exactly "as-of within tolerance"
    "j20_asof_tolerance" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
        |o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_us,
        |        MAX(o_orderkey) AS ref_orderkey
        |      FROM orders GROUP BY 1, 2),
        |m AS (SELECT e.user_id, e.t_us, o.o_us
        |      FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.t_us >= o.o_us
        |      WHERE e.t_us - o.o_us <= 725760000000000)
        |SELECT CAST((t_us - o_us) // 2592000000000 AS BIGINT) AS staleness_months,
        |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streaming enrichment must equal the batch as-of join verbatim
    // (j13's oracle): per-event purity against the static right side
    // makes the result micro-batch-invariant
    "e26_stream_asof_enrich" ->
      """WITH e AS (SELECT event_id, user_id, epoch_ns(ts) // 1000 AS t_us FROM events),
        |o AS (SELECT o_custkey AS user_id, epoch_us(o_orderdate) AS o_us,
        |        MAX(o_orderkey) AS ref_orderkey
        |      FROM orders GROUP BY 1, 2)
        |SELECT e.event_id, e.user_id, o.ref_orderkey
        |FROM e ASOF JOIN o ON e.user_id = o.user_id AND e.t_us >= o.o_us""".stripMargin,
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
