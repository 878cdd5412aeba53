package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Batch analytics over the `events` table — the batch twins of the
  * Structured Streaming pipelines in [[graft.streaming.StreamingOps]]
  * (e04 below runs the actual streaming plan and is held to the same
  * oracle as its batch twin e01).
  *
  * The events parquet stores `ts` as TIMESTAMP(NANOS) which Spark's
  * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong=true`
  * (set in Verify/Bench session builders) it arrives as exact integer
  * nanoseconds — all gap/window arithmetic below is integer-exact and
  * engine-independent. Derived instants are emitted as formatted strings
  * (micros precision) to avoid parquet ns/us type skew vs the oracle.
  *
  * NOTE: ns→µs must use integer `div` — `/` on longs is double division
  * in Spark and doubles cannot represent 1.7e18 exactly.
  */
object Events {

  private val SessionGapUs = 1800L * 1000 * 1000 // 30 min

  /** Shared events base: the testdata parquet is a single split, so any
    * per-row work (JSON parse, window fan-out) would otherwise run on
    * 1 of 32 cores. Repartition by `user_id` once, persist, and share
    * across the 6 batch e-queries — the hash partitioning also feeds
    * e02/e05's per-user windows and aggregations without a second
    * exchange. At real scale the scan has many splits and the
    * repartition becomes a no-op-cost co-partitioning step.
    */
  private def eventsBase(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.memo(spark, s"eventsBase:$dir") {
      Tables.load(spark, dir, "events").repartition(col("user_id")).persist()
    }

  /** events with `ts_us`: exact integer microseconds whichever physical
    * type the parquet carries (see [[graft.Tables.tsUs]]). */
  private[operators] def eventsUs(spark: SparkSession, dir: String): DataFrame = {
    val base = eventsBase(spark, dir)
    base.withColumn("ts_us", Tables.tsUs(base))
  }

  /** The events table as a file-based stream (the file source wants a
    * directory basePath; the testdata table is a single parquet file, so
    * glob it under its parent dir). */
  private[operators] def eventsStream(spark: SparkSession, dir: String): DataFrame = {
    val path = Tables.path(dir, "events")
    val schema = spark.read.parquet(path).schema
    spark.readStream.schema(schema).option("basePath", dir).parquet(s"$path*")
  }

  /** Child session for a streaming run: isolated SQLConf, so the
    * shuffle-partition override cannot escape into the caller's session
    * and silently re-plan queries compiled there. The child's SQLConf
    * does NOT inherit the parent's session-level settings (since Spark
    * 3.4 the builder keeps SQL confs session-scoped, out of the shared
    * SparkConf), so the entries the streaming plans depend on are copied
    * across explicitly — without nanosAsLong the child infers the events
    * `ts` as TIMESTAMP_NTZ and every `ts div 1000` plan breaks.
    */
  private def childSession(spark: SparkSession): SparkSession = {
    val s = spark.newSession()
    for (k <- Seq("spark.sql.legacy.parquet.nanosAsLong",
                  "spark.sql.session.timeZone"))
      spark.conf.getOption(k).foreach(s.conf.set(k, _))
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s
  }

  /** Run a streaming plan to completion with Trigger.AvailableNow into a
    * memory sink and return the sink table.
    *
    * Every stateful operator commits one state store per shuffle
    * partition per micro-batch; at the session's 32 partitions that
    * fixed commit cost dominates a single-batch replay (a stream-stream
    * join carries FOUR stores per partition — ~8 s of pure machinery,
    * data-size independent). State partition count is fixed at query
    * start, so size it to the run instead of the session default: a
    * long-lived production query with high key cardinality keeps it
    * high, a bounded replay wants it low.
    */
  private[operators] def runAvailableNow(spark: SparkSession, build: SparkSession => DataFrame,
                              sinkName: String, mode: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val s = childSession(spark)
    val q = build(s).writeStream.format("memory").queryName(sinkName)
      .outputMode(mode).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    // the memory sink registers its view in the session that started the
    // query; the returned frame stays valid for the caller (same context)
    s.table(sinkName)
  }

  // E: tumbling-window aggregation via Spark's `window()` operator
  // (streaming twin: e04 runs StreamingOps.hourlyCounts as a stream).
  def tumblingHourly(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("hour_start"), col("event_type"))

  // E: sessionization — 30-minute inactivity gap, lag + running-sum
  // session ids (streaming twin: [[graft.streaming.StreamingOps
  // .sessionize]] via flatMapGroupsWithState, exercised in ScalaTest).
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val gap = col("ts_us") - lag(col("ts_us"), 1).over(byUser)
    val isNew = when(gap.isNull || gap > SessionGapUs, 1).otherwise(0)
    eventsUs(spark, dir)
      .withColumn("session_id",
        sum(isNew).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        col("user_id"), col("session_id"), col("n_events"),
        date_format(timestamp_micros(col("start_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(timestamp_micros(col("end_us")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("total_value"))
  }

  // E: top event types per user by count — groupBy + window rank
  // (typical per-key top-k that must avoid a global sort at scale).
  def topEventTypesPerUser(spark: SparkSession, dir: String): DataFrame = {
    val counts = Tables.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= 2)
  }

  // E: the REAL Structured Streaming path — readStream over the events
  // parquet, StreamingOps.hourlyCounts plan, Trigger.AvailableNow into a
  // memory sink (complete mode: no watermark eviction on replay, so the
  // result equals the batch twin and shares e01's oracle shape).
  def streamHourly(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark,
        s => graft.streaming.StreamingOps.hourlyCounts(eventsStream(s, dir)),
        s"e04_mem_${Integer.toHexString(dir.hashCode)}", "complete")
      .orderBy(col("hour_start"), col("event_type"))

  // E: native session_window as a STREAM — StreamingOps.sessionCounts
  // over the events file source, AvailableNow into a memory sink
  // (complete mode: no watermark eviction on replay), held to the same
  // oracle as the batch twin e05.
  def streamSessionWindows(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark,
        s => graft.streaming.StreamingOps.sessionCounts(eventsStream(s, dir)),
        s"e17_mem_${Integer.toHexString(dir.hashCode)}", "complete")
      .orderBy(col("user_id"), col("session_start"))

  // E: built-in session windows (gap-merged event-time sessions) — the
  // declarative alternative to e02's lag/running-sum formulation; same
  // boundary as e02 (session_window MERGES events exactly 30 min apart;
  // a new session starts only when gap > 30 min), differing from e02
  // only in shape: window end = last event + gap duration.
  def sessionWindows(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(col("user_id"), session_window(col("t"), "30 minutes").as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("total_value"))

  // E: SLIDING windows (1 h length, 15 min slide) — each event lands in
  // exactly 4 overlapping windows; Spark's window() generator handles
  // the fan-out, the oracle reproduces it with integer-µs arithmetic.
  def slidingCounts(spark: SparkSession, dir: String): DataFrame =
    eventsUs(spark, dir)
      .withColumn("t", timestamp_micros(col("ts_us")))
      .groupBy(window(col("t"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("win_start"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy(col("win_start"), col("event_type"))

  // E: stream-static enrichment join — the events STREAM joins the
  // static customer dim (broadcast per micro-batch), aggregated per
  // segment; complete mode + AvailableNow replay makes the result equal
  // the batch join, which is what the oracle checks.
  def streamEnrich(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark, { s =>
        eventsStream(s, dir)
          .join(broadcast(Tables.load(s, dir, "customer")),
            col("user_id") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      },
        s"e08_mem_${Integer.toHexString(dir.hashCode)}", "complete")
      .orderBy(col("c_mktsegment"))

  // E: stream-STREAM join — the events stream self-joined (views vs
  // purchases) with watermarks on both sides and a time-range predicate
  // ([[graft.streaming.StreamingOps.viewPurchaseAttribution]]). The
  // memory sink collects the append-mode matches; the per-user rollup
  // below is a batch query over the sink table. Oracle = the equivalent
  // batch interval join, which AvailableNow replay must reproduce.
  def streamStreamAttribution(spark: SparkSession, dir: String): DataFrame = {
    runAvailableNow(spark,
        s => graft.streaming.StreamingOps
          .viewPurchaseAttribution(eventsStream(s, dir)),
        s"e09_mem_${Integer.toHexString(dir.hashCode)}", "append")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("purchase_id")).as("n_purchases"),
        countDistinct(col("view_id")).as("n_views"))
      .orderBy(col("user_id"))
  }

  // E: stream-stream LEFT OUTER join as a GATED query — purchases with
  // NO qualifying view in the preceding hour must still emit (null
  // view_id), which in append mode happens only once the global
  // watermark proves no match can arrive and the row is evicted from
  // state ([[graft.streaming.StreamingOps.viewPurchaseAttribution]]
  // with joinType=leftOuter; state eviction itself is pinned under
  // controlled micro-batches in StreamingSpec). The bounded replay ends
  // with the watermark at min(max view, max purchase) − 1 h, and rows
  // near it may or may not have flushed depending on engine eviction
  // boundaries — so the rollup keeps only purchases STRICTLY older than
  // that watermark minus a further 1 h join-range margin, a cutoff
  // derived from the batch data that the oracle applies verbatim. Every
  // purchase below it has provably either matched (emitted on arrival)
  // or been evicted with a null — the result is exact, not
  // approximately-flushed.
  def streamLeftOuterAttribution(spark: SparkSession, dir: String): DataFrame = {
    val sink = runAvailableNow(spark,
      s => graft.streaming.StreamingOps
        .viewPurchaseAttribution(eventsStream(s, dir), joinType = "leftOuter"),
      s"e21_mem_${Integer.toHexString(dir.hashCode)}", "append")
    val cut = eventsUs(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts_us")).as("mx"))
      .agg(min(col("mx")).as("m"))
      .select((col("m") - 2L * 3600000000L).as("cutoff_us"))
    sink.crossJoin(broadcast(cut))
      .filter(col("p_t") < timestamp_micros(col("cutoff_us")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("view_id")).as("n_matched"))
      .withColumn("n_unmatched", col("n_rows") - col("n_matched"))
      .orderBy(col("user_id"))
  }

  // E: stream-stream FULL OUTER join as a GATED query — BOTH sides
  // null-extend once the watermark proves no partner can arrive:
  // purchases with no view in the preceding hour AND views that never
  // preceded a purchase (the e21 story, symmetrized — per-side eviction
  // under controlled micro-batches is pinned in StreamingSpec; this
  // gates the bounded replay against the batch full-outer twin). The
  // cutoff is e21's (min of both sides' maxima − 1 h delay − 1 h
  // join-range margin) applied to WHICHEVER side a row carries:
  // a matched row's v_t ≤ p_t, so filtering on coalesce(p_t, v_t) is
  // the purchase time for matched/purchase-only rows and the view time
  // for view-only rows — below it, every row has provably either
  // matched on arrival or been evicted with its null extension. The
  // filter must run AFTER the join (a view whose only match is a
  // past-cutoff purchase is a MATCHED row that gets filtered, not an
  // unmatched one), which the oracle replicates.
  def streamFullOuterAttribution(spark: SparkSession, dir: String): DataFrame = {
    val sink = runAvailableNow(spark,
      s => graft.streaming.StreamingOps
        .viewPurchaseAttribution(eventsStream(s, dir), joinType = "fullOuter"),
      s"e24_mem_${Integer.toHexString(dir.hashCode)}", "append")
    val cut = eventsUs(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type")).agg(max(col("ts_us")).as("mx"))
      .agg(min(col("mx")).as("m"))
      .select((col("m") - 2L * 3600000000L).as("cutoff_us"))
    sink.crossJoin(broadcast(cut))
      .filter(coalesce(col("p_t"), col("v_t")) < timestamp_micros(col("cutoff_us")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("purchase_id").isNotNull && col("view_id").isNotNull, 1L)
          .otherwise(0L)).as("n_matched"),
        sum(when(col("view_id").isNull, 1L).otherwise(0L)).as("n_purchase_only"),
        sum(when(col("purchase_id").isNull, 1L).otherwise(0L)).as("n_view_only"))
      .orderBy(col("user_id"))
  }

  /** e25's per-side lateness budgets (µs): views lag hours behind the
    * on-time purchase feed — the CDN-log-vs-order-service deployment
    * shape ([[graft.streaming.StreamingOps.viewPurchaseAttribution]]'s
    * `viewWatermark`). */
  private val ViewLatenessUs = 4L * 3600000000L
  private val PurchaseLatenessUs = 3600000000L

  // E: ASYMMETRIC watermarks as a GATED query — the lagging view side
  // gets a 4 h budget while purchases keep 1 h, so the GLOBAL watermark
  // (min across both operators) trails the view clock by 4 h, and a
  // purchase can only be null-evicted once that slower watermark passes
  // it. The left-outer rollup therefore uses the ASYMMETRIC cutoff
  // min(max_v − 4 h, max_p − 1 h) − 1 h margin: had the engine applied
  // the symmetric budget, purchases between the two cutoffs would have
  // flushed too and the hash would differ — the gate pins the per-side
  // eviction arithmetic, not just the join result (per-batch lateness
  // drops are pinned in StreamingSpec's controlled-micro-batch case).
  def streamAsymmetricAttribution(spark: SparkSession, dir: String): DataFrame = {
    val sink = runAvailableNow(spark,
      s => graft.streaming.StreamingOps
        .viewPurchaseAttribution(eventsStream(s, dir), joinType = "leftOuter",
          viewWatermark = Some("4 hours")),
      s"e25_mem_${Integer.toHexString(dir.hashCode)}", "append")
    val cut = eventsUs(spark, dir)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(col("event_type"))
      .agg(max(col("ts_us")).as("mx"))
      .agg(min(when(col("event_type") === "view", col("mx") - ViewLatenessUs)
        .otherwise(col("mx") - PurchaseLatenessUs)).as("m"))
      .select((col("m") - 3600000000L).as("cutoff_us"))
    sink.crossJoin(broadcast(cut))
      .filter(col("p_t") < timestamp_micros(col("cutoff_us")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_rows"), count(col("view_id")).as("n_matched"))
      .withColumn("n_unmatched", col("n_rows") - col("n_matched"))
      .orderBy(col("user_id"))
  }

  // E: CHAINED stateful streaming — windowed aggregation downstream of
  // the watermarked stream-stream join (multiple stateful operators in
  // one query). Append mode emits a window only once the global
  // watermark (min of both sides' maxima, minus the delay) passes its
  // end, so the oracle applies the same cutoff to the batch twin.
  def streamAttributionHourly(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark,
        s => graft.streaming.StreamingOps
          .attributionHourly(eventsStream(s, dir)),
        s"e10_mem_${Integer.toHexString(dir.hashCode)}", "append")
      .orderBy(col("hour_start"))

  // E: streaming dedup/rate-limit as a GATED query — one event per
  // (user, type, clock-hour) via dropDuplicatesWithinWatermark
  // ([[graft.streaming.StreamingOps.rateLimitDedup]]); append mode
  // emits each first sighting immediately, so the AvailableNow replay
  // equals the batch DISTINCT the oracle computes.
  def streamDedup(spark: SparkSession, dir: String): DataFrame =
    runAvailableNow(spark,
        s => graft.streaming.StreamingOps.rateLimitDedup(eventsStream(s, dir)),
        s"e20_mem_${Integer.toHexString(dir.hashCode)}", "append")
      .orderBy(col("user_id"), col("event_type"), col("hour_start"))

  // E: transformWithState as a GATED query — Spark 4's arbitrary-state
  // API (typed ValueState on RocksDB, the provider it requires) keeps
  // ONE (count, cents) pair per user and emits the updated running
  // total each micro-batch the user appears in (update mode). The
  // rollup takes each user's FINAL emission — running totals are
  // monotone in n_events, so max(struct(n_events, total_cents)) is the
  // last state regardless of how the replay was split into batches —
  // and that batch-split independence is what makes the query gateable:
  // the oracle is the plain batch aggregate. Graduates the
  // StreamingSpec-only TWS machinery onto the correctness gate.
  def streamRunningTotals(spark: SparkSession, dir: String): DataFrame = {
    val sink = runAvailableNow(spark, { s =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import s.implicits._
        // a keyed running total can neither attribute a null-user event
        // nor add a null amount; drop both at ingest, BEFORE the typed
        // encoder whose primitive fields would otherwise throw
        // NOT_NULL_ASSERT_VIOLATION (NullSweep finding). No-op on the
        // gate tables (user_id/value are never null there).
        val ev = eventsStream(s, dir)
          .filter(col("user_id").isNotNull && col("value").isNotNull)
          .select(col("user_id"),
            (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
          .as[(Long, Long)]
        graft.streaming.RunningTotals.runningTotals(ev).toDF()
      }, s"e22_mem_${Integer.toHexString(dir.hashCode)}", "update")
    sink.groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("total_cents"))).as("s"))
      .select(col("user_id"), col("s.n_events").as("n_events"),
        col("s.total_cents").as("total_cents"))
      .orderBy(col("user_id"))
  }

  // E: foreachBatch incremental upsert — the streaming SINK-maintenance
  // pattern: each micro-batch folds into a persistent per-user summary
  // table (latest event + running totals) instead of a memory sink.
  // State lives as versioned parquet (write-new-then-swap — a batch must
  // never overwrite the directory it is reading), and the merge is a
  // pure aggregate both directions: per-batch rows and the previous
  // state round-trip through the SAME [[upsertMerge]], so associativity
  // is by construction and the final table equals the one-shot batch
  // aggregate (the oracle). At scale the same loop writes a keyed Delta/
  // Iceberg MERGE; parquet versions keep it dependency-free here.

  /** Merge rows of shape (user_id, n_events, total_dec, last_ts_us,
    * last_event_id, last_event_type) — single rows and prior summaries
    * alike: counts add, exact DECIMAL totals add, and the latest event
    * wins by (ts_us, event_id), which is a strict total order because
    * event ids are unique.
    */
  private[graft] def upsertMerge(df: DataFrame): DataFrame =
    df.groupBy(col("user_id"))
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("total_dec")).cast(DecimalType(18, 2)).as("total_dec"),
        max_by(
          struct(col("last_ts_us"), col("last_event_id"), col("last_event_type")),
          struct(col("last_ts_us"), col("last_event_id"))).as("last"))
      .select(col("user_id"), col("n_events"), col("total_dec"),
        col("last.last_ts_us").as("last_ts_us"),
        col("last.last_event_id").as("last_event_id"),
        col("last.last_event_type").as("last_event_type"))

  /** Raw events → the upsertMerge row shape (one summary row per event). */
  private[graft] def upsertRows(events: DataFrame): DataFrame =
    events.select(
      col("user_id"),
      lit(1L).as("n_events"),
      col("value").cast(DecimalType(18, 2)).as("total_dec"),
      Tables.tsUs(events).as("last_ts_us"),
      col("event_id").as("last_event_id"),
      col("event_type").as("last_event_type"))

  /** Drive a streaming events frame through foreachBatch upsert
    * maintenance; returns the final state table (versioned under
    * stateBase). Runs on a child session so the low shuffle-partition
    * override stays scoped (same contract as runAvailableNow).
    */
  private[graft] def runIncrementalUpsert(stream: DataFrame, stateBase: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    graft.Fs.rmTree(new java.io.File(stateBase))
    @volatile var current: Option[String] = None
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val delta = upsertMerge(upsertRows(batch))
        val merged = current match {
          case None => delta
          case Some(prev) =>
            upsertMerge(batch.sparkSession.read.parquet(prev).unionByName(delta))
        }
        val out = s"$stateBase/v$batchId"
        merged.write.mode("overwrite").parquet(out)
        current = Some(out)
      }
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val sess = stream.sparkSession
    current match {
      case Some(p) => sess.read.parquet(p)
      case None => upsertMerge(upsertRows(
        sess.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
          stream.schema)))
    }
  }

  // E: streaming PARQUET FILE SINK — the production persistence path
  // (exactly-once appends via checkpoint + _spark_metadata commit log),
  // where every other e-query sinks to memory or foreachBatch. The
  // stream filters/projects purchases into a fresh directory; the
  // result then re-reads the COMMITTED files and aggregates per user,
  // so the compare pins the sink contents, not just the plan.
  def streamFileSink(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged sink dir: the rmTree at build start must
   // never delete files a previous call's returned frame is lazily
   // pinned to (same re-call contract as e13 — IdempotenceSpec)
   graft.SessionCache.memo(spark, s"e16:$dir") {
    import org.apache.spark.sql.streaming.Trigger
    val base = s"${sys.props("java.io.tmpdir")}/graft_e16_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_e16_")
    graft.Fs.rmTree(new java.io.File(base))
    val s = childSession(spark)
    val q = eventsStream(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("value"))
      .writeStream.format("parquet")
      .option("path", s"$base/data")
      .option("checkpointLocation", s"$base/chk")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.read.parquet(s"$base/data")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_purchases"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"),
        min(col("event_id")).as("first_event_id"),
        max(col("event_id")).as("last_event_id"))
      .orderBy(col("user_id"))
  }

  def incrementalUpsert(spark: SparkSession, dir: String): DataFrame =
    // memoized + session-tagged state dirs: the returned frame stays
    // lazily pinned to this run's version files, so a RE-CALL must not
    // rewrite them in place — the session's stale FileStatusCache would
    // hand the old listing to the new scan (FILE_NOT_EXIST, caught by
    // IdempotenceSpec), and an in-place rewrite breaks e13's own
    // write-new-then-swap reader contract; a second SESSION gets its
    // own directory tree for the same reason (the c05/v16 pattern)
    graft.SessionCache.memo(spark, s"e13:$dir") {
      val stateBase =
        s"${sys.props("java.io.tmpdir")}/graft_e13_state_${graft.Fs.sessionTag(spark, dir)}"
      graft.Fs.sweepStaleScratch("graft_e13_state_")
      val s = childSession(spark)
      runIncrementalUpsert(eventsStream(s, dir), stateBase)
        .select(
          col("user_id"), col("n_events"),
          col("total_dec").cast(DoubleType).as("total_value"),
          col("last_ts_us"), col("last_event_id"), col("last_event_type"))
        .orderBy(col("user_id"))
    }

  // E: weekly cohort retention — users bucketed by first-active week,
  // counted at each week offset they return. Two hash aggregates and
  // one equi-join on user_id; the dedup before the final count keeps a
  // user from inflating an offset with repeat events.
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val WeekUs = 7L * 24 * 3600 * 1000 * 1000
    val ev = eventsUs(spark, dir)
      .select(col("user_id"), expr(s"ts_us div $WeekUs").as("week"))
    val first = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort"), (col("week") - col("cohort")).as("offset"))
      .distinct()
      .groupBy(col("cohort"), col("offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort"), col("offset"))
  }

  // E: funnel conversion — per-user FIRST view/purchase instants in one
  // conditional aggregate (no self-join), then one global rollup:
  // how many users viewed, purchased, and converted (first purchase at
  // or after first view). Two tiny shuffles; the per-user frame is the
  // classic map-side-combinable shape.
  def funnelConversion(spark: SparkSession, dir: String): DataFrame = {
    val perUser = eventsUs(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("first_view_us"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("first_purchase_us"))
    perUser.agg(
      count(col("first_view_us")).as("n_users_view"),
      count(col("first_purchase_us")).as("n_users_purchase"),
      count(when(col("first_purchase_us") >= col("first_view_us"), lit(1)))
        .as("n_converted"))
  }

  // E15: time-series gap fill / resample — the missing-bucket repair
  // every downstream forecaster needs: a sparse per-(hour, type) count
  // series (events sparsified to ~1% so gaps actually exist) is joined
  // against the full hour×type grid, absent buckets emitted as 0. The
  // grid is generated from the SCALAR min/max bounds (sequence +
  // explode + a broadcast cross join with the tiny type dim), so grid
  // cost is O(hours × types) — independent of event count — and the
  // only shuffle over real data is the pre-aggregated counts join.
  def gapFill(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600L * 1000 * 1000
    // sparse is consumed by counts, bounds and the type grid — three
    // filter passes over the events base; the eager cut pays one
    // (1/97-selective, so the checkpointed frame is tiny).
    val sparse = eventsUs(spark, dir)
      .filter(col("event_id") % 97 === 0)
      .withColumn("hour_us", expr(s"ts_us div $HourUs") * HourUs)
      .localCheckpoint()
    val counts = sparse.groupBy(col("hour_us"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    val bounds = sparse.agg(min(col("hour_us")).as("lo"), max(col("hour_us")).as("hi"))
    val grid = bounds
      .select(explode(sequence(col("lo"), col("hi"), lit(HourUs))).as("hour_us"))
      .crossJoin(broadcast(sparse.select(col("event_type")).distinct()))
    grid.join(counts, Seq("hour_us", "event_type"), "left")
      .select(
        date_format(timestamp_micros(col("hour_us")), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
      .orderBy(col("hour_start"), col("event_type"))
  }

  // E: semi-structured props — JSON string column parsed with schema'd
  // from_json (single-field schema prunes the parse to just `k`), over
  // the shared repartitioned frame so the parse runs on all cores.
  // (get_json_object here was the round-2 scale-killer: interpreted
  // full-document parse on the single input split = 1 core busy.)
  def jsonProps(spark: SparkSession, dir: String): DataFrame =
    eventsBase(spark, dir)
      .select(col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  // E: semi-structured props via the VARIANT type (Spark 4's native
  // semi-structured path, the successor to schema'd from_json for
  // open-schema payloads): parse_json once into a binary variant, then
  // typed path extraction with variant_get — parse cost is paid once
  // per row however many paths are read, extraction is codegen'd, and
  // a missing path is NULL (counted here to pin that contract), not an
  // error. try_parse_json, not parse_json: a MALFORMED document must
  // become a null variant (every variant_get on it → NULL, the same
  // missing-path contract), not kill the job — raw parse_json threw
  // MALFORMED_RECORD_IN_PARSING on the first corrupt document
  // (TextFuzzSweep finding: a prefix-corrupted JSON value, the
  // truncated/garbled record every web-scale props feed contains; its
  // trailing-garbage sibling parses fine, which is why the append-only
  // fuzz missed it). Identical on the gate tables (all props valid).
  // Distinct stats from e06 so the two JSON paths are independently
  // verified.
  def variantProps(spark: SparkSession, dir: String): DataFrame =
    eventsBase(spark, dir)
      .select(col("event_type"), try_parse_json(col("props")).as("v"))
      .select(col("event_type"),
        variant_get(col("v"), "$.k", "int").as("k"),
        variant_get(col("v"), "$.missing", "string").as("miss"))
      .groupBy(col("event_type"))
      .agg(
        countDistinct(col("k")).as("n_distinct_k"),
        sum(when(col("k") % 2 === 0, col("k")).otherwise(0)).cast(LongType)
          .as("sum_even_k"),
        count(col("miss")).as("n_missing"))
      .orderBy(col("event_type"))

  // E: event-transition matrix (path analysis) — each user's
  // time-ordered event sequence contributes its adjacent
  // (from_type, to_type) steps; output is the step count, distinct
  // movers, and the transition probability. ONE window shuffle on
  // user_id produces the next-event column; the probability divides
  // two exact counts (identical operands both engines → identical
  // IEEE result). At scale this is the per-user sequence model's
  // sufficient statistic, computed without a self-join.
  def transitionMatrix(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    eventsUs(spark, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_steps"),
        countDistinct(col("user_id")).as("n_users"))
      .withColumn("p",
        col("n_steps").cast(DoubleType) /
          sum(col("n_steps")).over(Window.partitionBy(col("from_type")))
            .cast(DoubleType))
      .orderBy(col("from_type"), col("to_type"))
  }

  // E: ROLLING DISTINCT users — WAU by day: for each observed day, the
  // number of distinct users active in the trailing 7 days. Rolling
  // DISTINCT cannot be a windowed sum of dailies (users overlap across
  // days); the exact scalable shape is the bounded fan-out join: the
  // corpus collapses to distinct (day, user) pairs ONCE, each pair
  // fans out to the ≤ 7 window days it serves (explode over a
  // 7-element sequence — an equi-joinable key, never a range/theta
  // join), dedup, count. Work is 7 × |active pairs| regardless of
  // event volume — at 100 TB the events table is touched once.
  def rollingUniqueUsers(spark: SparkSession, dir: String): DataFrame = {
    val ud = eventsUs(spark, dir)
      .select(expr("ts_us div 86400000000").as("day"), col("user_id"))
      .distinct()
    val grid = ud.select(col("day")).distinct()
    val daily = ud.groupBy(col("day")).agg(count(lit(1)).as("n_unique_1d"))
    val weekly = ud
      .withColumn("wday", explode(expr("sequence(day, day + 6)")))
      .select(col("wday"), col("user_id")).distinct()
      .join(grid.withColumnRenamed("day", "wday"), "wday")
      .groupBy(col("wday")).agg(count(lit(1)).as("n_unique_7d"))
    daily.join(weekly, col("day") === col("wday"))
      .select(
        date_format(timestamp_micros(col("day") * 86400000000L),
          "yyyy-MM-dd").as("day"),
        col("n_unique_1d"), col("n_unique_7d"))
      .orderBy(col("day"))
  }

  // DQ: daily VOLUME anomaly report — the ingest-governance twin of
  // dq02's value outliers: per-day event counts compared against the
  // sum of the trailing seven OBSERVED days (rows, not calendar days —
  // gap days don't dilute the baseline), flagging spikes (> 2× the
  // trailing mean) and drops (< ½×) with pure integer cross-products
  // (7·n vs 2·Σ), so the flags are engine-exact. Days without a full
  // trailing week never flag. The corpus collapses to one row per day
  // before the only window runs — bounded by the time range, not data
  // volume (the r02 aggregate-first discipline).
  def volumeAnomalyReport(spark: SparkSession, dir: String): DataFrame = {
    val days = eventsUs(spark, dir)
      .select(expr("ts_us div 86400000000").as("epoch_day"))
      .groupBy(col("epoch_day")).agg(count(lit(1)).as("n_events"))
    val w = Window.orderBy(col("epoch_day")).rowsBetween(-7, -1)
    days
      .withColumn("n_prior", count(col("n_events")).over(w))
      .withColumn("trail_sum", coalesce(sum(col("n_events")).over(w), lit(0L)))
      .select(
        date_format(timestamp_micros(col("epoch_day") * 86400000000L),
          "yyyy-MM-dd").as("day"),
        col("n_events"), col("n_prior"), col("trail_sum"),
        (col("n_prior") === 7 &&
          col("n_events") * 7 > col("trail_sum") * 2).as("spike"),
        (col("n_prior") === 7 &&
          col("n_events") * 14 < col("trail_sum")).as("drop"))
      .orderBy(col("day"))
  }

  // DQ: Tukey-fence outlier report per event_type — exact quartiles
  // over integer cents (quartile interpolation lands on .5 and the
  // 1.5*IQR fences on .25 steps, all exactly representable doubles, so
  // the fence comparison is engine-identical), then the 5-row fence
  // table broadcasts back onto the stream. The two-pass shape (agg →
  // broadcast join) is the one that scales: no per-row sort, no
  // whole-partition window over the fact.
  def outlierReport(spark: SparkSession, dir: String): DataFrame = {
    val cents = eventsBase(spark, dir)
      .select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast(LongType).as("cents"))
    val fences = cents.groupBy(col("event_type"))
      .agg(expr("percentile(cents, 0.25)").as("q1"),
        expr("percentile(cents, 0.75)").as("q3"))
      .select(col("event_type"),
        (col("q1") - (col("q3") - col("q1")) * 1.5).as("lo"),
        (col("q3") + (col("q3") - col("q1")) * 1.5).as("hi"))
    cents.join(broadcast(fences), "event_type")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("cents") < col("lo") || col("cents") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"),
        min(when(col("cents") < col("lo"), col("cents"))).as("worst_low"),
        max(when(col("cents") > col("hi"), col("cents"))).as("worst_high"))
      .orderBy(col("event_type"))
  }

  // R02: exponential moving average via WITH RECURSIVE — the honest way
  // to run a SEQUENTIAL recurrence (e_t = α·x_t + (1−α)·e_{t−1}) on
  // Spark: aggregate the event stream down to a BOUNDED series first
  // (distributed hash-agg), then recurse over it, one tiny join per
  // level. The anti-pattern is recursing over raw events; the
  // recurrence belongs on the aggregate, whose length — and therefore
  // the UnionLoop's iteration count, each a driver-scheduled job of
  // ~0.4 s fixed latency — is bounded by the time range, not data
  // volume. Weekly granularity keeps this at 5 levels (daily would be
  // 30 jobs for identical semantics). All multiplies are explicit
  // DOUBLE (a bare 0.25 literal is DECIMAL in both engines and would
  // change the type chain); the fold order is fixed by the recursion
  // itself, so the doubles are engine-identical.
  def emaWeekly(spark: SparkSession, dir: String): DataFrame = {
    val weekly = eventsUs(spark, dir)
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
      .withColumn("week_start", date_sub(col("day"), pmod(datediff(col("day"), lit("2024-01-01")), lit(7))))
      .groupBy(col("week_start"))
      .agg((sum(col("value").cast(DecimalType(18, 2)) * 100))
        .cast(LongType).as("cents"))
    // global row_number over the ~5-row aggregate, not the events
    // localCheckpoint BEFORE the view (round-17, measured): the
    // recursion's per-level join re-reads `graft_ema_series`, and an
    // uncut view re-ran the corpus-wide weekly aggregate once per
    // UnionLoop level — 5 full event scans per materialization
    // (isolated warm at sf0.1: 21-29 cpu-s → 7.7-10.9, one corpus
    // aggregate instead of five). The checkpointed frame is the
    // ≤|weeks|-row series itself.
    weekly.withColumn("seq",
        row_number().over(Window.orderBy(col("week_start"))))
      .localCheckpoint()
      .createOrReplaceTempView("graft_ema_series")
    spark.sql(
      """WITH RECURSIVE r AS (
        |  SELECT seq, week_start, cents, CAST(cents AS DOUBLE) AS ema
        |  FROM graft_ema_series WHERE seq = 1
        |  UNION ALL
        |  SELECT s.seq, s.week_start, s.cents,
        |    CAST(s.cents AS DOUBLE) * 0.25E0 + r.ema * 0.75E0
        |  FROM graft_ema_series s JOIN r ON s.seq = r.seq + 1)
        |SELECT date_format(week_start, 'yyyy-MM-dd') AS week_start, cents,
        |  floor(ema * 1e6 + 0.5) / 1e6 AS ema
        |FROM r ORDER BY week_start""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "r02_ema_weekly" -> (emaWeekly _),
    "e19_transition_matrix" -> (transitionMatrix _),
    "dq02_outlier_report" -> (outlierReport _),
    "dq06_volume_anomaly" -> (volumeAnomalyReport _),
    "e23_rolling_unique_users" -> (rollingUniqueUsers _),
    "e18_variant_props" -> (variantProps _),
    "e08_stream_enrich" -> (streamEnrich _),
    "e07_sliding_counts" -> (slidingCounts _),
    "e06_json_props" -> (jsonProps _),
    "e01_tumbling_hourly" -> (tumblingHourly _),
    "e02_sessionize" -> (sessionize _),
    "e03_top_types_per_user" -> (topEventTypesPerUser _),
    "e04_stream_hourly" -> (streamHourly _),
    "e05_session_window" -> (sessionWindows _),
    "e09_stream_stream_join" -> (streamStreamAttribution _),
    "e10_attribution_hourly" -> (streamAttributionHourly _),
    "e11_funnel_conversion" -> (funnelConversion _),
    "e12_cohort_retention" -> (cohortRetention _),
    "e13_incremental_upsert" -> (incrementalUpsert _),
    "e15_gap_fill" -> (gapFill _),
    "e16_stream_file_sink" -> (streamFileSink _),
    "e17_stream_session" -> (streamSessionWindows _),
    "e20_stream_dedup" -> (streamDedup _),
    "e21_stream_left_outer" -> (streamLeftOuterAttribution _),
    "e22_stream_running_totals" -> (streamRunningTotals _),
    "e24_stream_full_outer" -> (streamFullOuterAttribution _),
    "e25_stream_asymmetric" -> (streamAsymmetricAttribution _))

  val oracles: Map[String, String] = Map(
    // what the committed sink files must aggregate to: the batch twin
    // of the streamed filter/projection
    "e16_stream_file_sink" ->
      """SELECT user_id, COUNT(*) AS n_purchases,
        | CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value,
        | MIN(event_id) AS first_event_id, MAX(event_id) AS last_event_id
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    // the one-shot batch aggregate the incremental foreachBatch
    // maintenance must converge to
    "e13_incremental_upsert" ->
      """WITH e AS (SELECT user_id, event_id, event_type, value,
        |    epoch_ns(ts) // 1000 AS ts_us FROM events),
        |agg AS (SELECT user_id, COUNT(*) AS n_events,
        |    CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS DOUBLE) AS total_value
        |  FROM e GROUP BY 1),
        |l AS (SELECT user_id, ts_us AS last_ts_us, event_id AS last_event_id,
        |    event_type AS last_event_type
        |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |      ORDER BY ts_us DESC, event_id DESC) AS rn FROM e)
        |  WHERE rn = 1)
        |SELECT agg.user_id, n_events, total_value, last_ts_us, last_event_id, last_event_type
        |FROM agg JOIN l ON agg.user_id = l.user_id ORDER BY agg.user_id""".stripMargin,
    "e12_cohort_retention" ->
      """WITH x AS (SELECT user_id, epoch_ns(ts) // 1000 // 604800000000 AS week FROM events),
        |f AS (SELECT user_id, MIN(week) AS cohort FROM x GROUP BY 1),
        |d AS (SELECT DISTINCT x.user_id, f.cohort, x.week - f.cohort AS "offset"
        |      FROM x JOIN f USING (user_id))
        |SELECT cohort, "offset", COUNT(*) AS n_users
        |FROM d GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e11_funnel_conversion" ->
      """WITH u AS (SELECT user_id,
        |   MIN(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END) AS fv,
        |   MIN(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS fp
        | FROM events GROUP BY user_id)
        |SELECT COUNT(fv) AS n_users_view, COUNT(fp) AS n_users_purchase,
        |  COUNT(CASE WHEN fp >= fv THEN 1 END) AS n_converted
        |FROM u""".stripMargin,
    // batch interval join + hourly rollup, cut off at the final global
    // watermark exactly as the append-mode streaming query is: windows
    // whose end exceeds min(max view, max purchase) - 1h are still open
    // when the replay finishes and must not be in the result
    "e10_attribution_hourly" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, event_id AS view_id, tus AS v_us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT MAX(v_us) FROM v), (SELECT MAX(p_us) FROM p)) - 3600000000 AS wm_us),
        |j AS (SELECT p.user_id, purchase_id, view_id, p_us
        |      FROM p JOIN v ON p.user_id = v.user_id
        |        AND v.v_us <= p.p_us AND v.v_us >= p.p_us - 3600000000),
        |a AS (SELECT (p_us // 3600000000) * 3600000000 AS wstart, COUNT(*) AS n_pairs
        |      FROM j GROUP BY 1)
        |SELECT strftime(make_timestamp(wstart), '%Y-%m-%d %H:%M') AS hour_start, n_pairs
        |FROM a, wm WHERE wstart + 3600000000 <= wm_us ORDER BY 1""".stripMargin,
    // the streaming join is held to the equivalent batch interval join
    "e09_stream_stream_join" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, event_id AS view_id, tus AS v_us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
        |j AS (SELECT p.user_id, purchase_id, view_id
        |      FROM p JOIN v ON p.user_id = v.user_id
        |        AND v.v_us <= p.p_us AND v.v_us >= p.p_us - 3600000000)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  COUNT(DISTINCT purchase_id) AS n_purchases,
        |  COUNT(DISTINCT view_id) AS n_views
        |FROM j GROUP BY user_id ORDER BY user_id""".stripMargin,
    "e08_stream_enrich" ->
      """SELECT c_mktsegment, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // every event belongs to the 4 windows starting at
    // floor15(t) - i*15min, i in 0..3 (window length 4 slides)
    "e07_sliding_counts" ->
      """WITH x AS (SELECT event_type, value, epoch_ns(ts) // 1000 AS tus FROM events),
        |f AS (SELECT event_type, value,
        |        (tus // 900000000) * 900000000 - i * 900000000 AS wstart
        |      FROM x, unnest(range(0, 4)) AS u(i))
        |SELECT strftime(make_timestamp(wstart), '%Y-%m-%d %H:%M') AS win_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "r02_ema_weekly" ->
      """WITH RECURSIVE s0 AS (
        |  SELECT CAST(date_trunc('day', ts) AS DATE)
        |      - CAST(((datediff('day', DATE '2024-01-01', CAST(date_trunc('day', ts) AS DATE)) % 7) + 7) % 7 AS INTEGER) AS week_start,
        |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS cents
        |  FROM events GROUP BY 1),
        |series AS (SELECT ROW_NUMBER() OVER (ORDER BY week_start) AS seq, week_start, cents FROM s0),
        |r AS (
        |  SELECT seq, week_start, cents, CAST(cents AS DOUBLE) AS ema FROM series WHERE seq = 1
        |  UNION ALL
        |  SELECT s.seq, s.week_start, s.cents, CAST(s.cents AS DOUBLE) * 0.25e0 + r.ema * 0.75e0
        |  FROM series s JOIN r ON s.seq = r.seq + 1)
        |SELECT strftime(week_start, '%Y-%m-%d') AS week_start, cents,
        |  floor(ema * 1e6 + 0.5) / 1e6 AS ema
        |FROM r ORDER BY week_start""".stripMargin,
    "e19_transition_matrix" ->
      """WITH e AS (SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS ts_us FROM events),
        |s AS (SELECT user_id, event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS to_type
        |  FROM e),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n_steps,
        |    COUNT(DISTINCT user_id) AS n_users
        |  FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_steps, n_users,
        |  CAST(n_steps AS DOUBLE)
        |    / CAST(SUM(n_steps) OVER (PARTITION BY from_type) AS DOUBLE) AS p
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "dq02_outlier_report" ->
      """WITH c AS (SELECT event_type,
        |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events),
        |f AS (SELECT event_type,
        |    quantile_cont(cents, 0.25) AS q1, quantile_cont(cents, 0.75) AS q3
        |  FROM c GROUP BY 1),
        |b AS (SELECT event_type,
        |    q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi FROM f)
        |SELECT c.event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
        |  MIN(CASE WHEN cents < lo THEN cents END) AS worst_low,
        |  MAX(CASE WHEN cents > hi THEN cents END) AS worst_high
        |FROM c JOIN b ON c.event_type = b.event_type
        |GROUP BY c.event_type ORDER BY c.event_type""".stripMargin,
    "dq06_volume_anomaly" ->
      """WITH d AS (SELECT epoch_ns(ts) // 1000 // 86400000000 AS epoch_day FROM events),
        |g AS (SELECT epoch_day, COUNT(*) AS n_events FROM d GROUP BY 1),
        |t AS (SELECT epoch_day, n_events,
        |   CAST(COUNT(n_events) OVER (ORDER BY epoch_day
        |     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT) AS n_prior,
        |   CAST(COALESCE(SUM(n_events) OVER (ORDER BY epoch_day
        |     ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS trail_sum
        | FROM g)
        |SELECT strftime(make_timestamp(epoch_day * 86400000000), '%Y-%m-%d') AS day,
        | n_events, n_prior, trail_sum,
        | (n_prior = 7 AND n_events * 7 > trail_sum * 2) AS spike,
        | (n_prior = 7 AND n_events * 14 < trail_sum) AS drop
        |FROM t ORDER BY day""".stripMargin,
    "e23_rolling_unique_users" ->
      """WITH d AS (SELECT DISTINCT epoch_ns(ts) // 1000 // 86400000000 AS day, user_id
        |  FROM events),
        |g AS (SELECT DISTINCT day FROM d),
        |x AS (SELECT DISTINCT day + o AS wday, user_id
        |      FROM d, unnest(range(0, 7)) AS u(o)),
        |w AS (SELECT wday, COUNT(*) AS n7 FROM x JOIN g ON g.day = x.wday GROUP BY 1),
        |o1 AS (SELECT day, COUNT(*) AS n1 FROM d GROUP BY 1)
        |SELECT strftime(make_timestamp(o1.day * 86400000000), '%Y-%m-%d') AS day,
        | n1 AS n_unique_1d, CAST(n7 AS BIGINT) AS n_unique_7d
        |FROM o1 JOIN w ON w.wday = o1.day
        |ORDER BY day""".stripMargin,
    "e18_variant_props" ->
      """SELECT event_type,
        |  COUNT(DISTINCT k) AS n_distinct_k,
        |  CAST(SUM(CASE WHEN k % 2 = 0 THEN k ELSE 0 END) AS BIGINT) AS sum_even_k,
        |  COUNT(m) AS n_missing
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INTEGER) AS k,
        |        json_extract_string(props, '$.missing') AS m FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e06_json_props" ->
      """SELECT event_type, COUNT(k) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract(props, '$.k') AS INTEGER) AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "e15_gap_fill" ->
      """WITH sparse AS (SELECT date_trunc('hour', ts) AS h, event_type
        |  FROM events WHERE event_id % 97 = 0),
        |counts AS (SELECT h, event_type, COUNT(*) AS n FROM sparse GROUP BY 1, 2),
        |bounds AS (SELECT MIN(h) AS lo, MAX(h) AS hi FROM sparse),
        |grid AS (SELECT g.h, t.event_type FROM bounds,
        |  unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP), INTERVAL 1 HOUR)) AS g(h),
        |  (SELECT DISTINCT event_type FROM sparse) t)
        |SELECT strftime(grid.h, '%Y-%m-%d %H:%M') AS hour_start, grid.event_type,
        |  CAST(COALESCE(n, 0) AS BIGINT) AS n_events
        |FROM grid LEFT JOIN counts ON grid.h = counts.h AND grid.event_type = counts.event_type
        |ORDER BY 1, 2""".stripMargin,
    // the final TWS state per user must equal the batch aggregate
    "e22_stream_running_totals" ->
      """SELECT user_id, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents
        |FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // batch LEFT interval join under the same below-watermark cutoff
    // the gated rollup applies (see streamLeftOuterAttribution scaladoc)
    "e21_stream_left_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, event_id AS view_id, tus AS v_us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT MAX(v_us) FROM v), (SELECT MAX(p_us) FROM p)) - 7200000000 AS cutoff),
        |pp AS (SELECT p.* FROM p, wm WHERE p_us < cutoff),
        |j AS (SELECT pp.user_id, pp.purchase_id, v.view_id
        |      FROM pp LEFT JOIN v ON pp.user_id = v.user_id
        |        AND v.v_us <= pp.p_us AND v.v_us >= pp.p_us - 3600000000)
        |SELECT user_id, COUNT(*) AS n_rows, COUNT(view_id) AS n_matched,
        |  COUNT(*) - COUNT(view_id) AS n_unmatched
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // batch FULL OUTER interval join under the coalesced below-watermark
    // cutoff (see streamFullOuterAttribution scaladoc — the cutoff runs
    // AFTER the join, on whichever side a row carries)
    "e24_stream_full_outer" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, event_id AS view_id, tus AS v_us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT MAX(v_us) FROM v), (SELECT MAX(p_us) FROM p)) - 7200000000 AS cutoff),
        |j AS (SELECT COALESCE(p.user_id, v.user_id) AS user_id, purchase_id, view_id,
        |        COALESCE(p_us, v_us) AS eff_us
        |      FROM p FULL JOIN v ON p.user_id = v.user_id
        |        AND v.v_us <= p.p_us AND v.v_us >= p.p_us - 3600000000)
        |SELECT user_id, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN purchase_id IS NOT NULL AND view_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
        |  CAST(SUM(CASE WHEN view_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase_only,
        |  CAST(SUM(CASE WHEN purchase_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_view_only
        |FROM j, wm WHERE eff_us < cutoff
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // e21's rollup under the ASYMMETRIC cutoff: the view side's 4 h
    // budget drags the global watermark, so fewer purchases have
    // provably flushed — min(max_v − 4 h, max_p − 1 h) − 1 h margin
    "e25_stream_asymmetric" ->
      """WITH e AS (SELECT event_id, user_id, event_type, epoch_ns(ts) // 1000 AS tus FROM events),
        |v AS (SELECT user_id, event_id AS view_id, tus AS v_us FROM e WHERE event_type = 'view'),
        |p AS (SELECT user_id, event_id AS purchase_id, tus AS p_us FROM e WHERE event_type = 'purchase'),
        |wm AS (SELECT least((SELECT MAX(v_us) FROM v) - 14400000000,
        |                    (SELECT MAX(p_us) FROM p) - 3600000000) - 3600000000 AS cutoff),
        |pp AS (SELECT p.* FROM p, wm WHERE p_us < cutoff),
        |j AS (SELECT pp.user_id, pp.purchase_id, v.view_id
        |      FROM pp LEFT JOIN v ON pp.user_id = v.user_id
        |        AND v.v_us <= pp.p_us AND v.v_us >= pp.p_us - 3600000000)
        |SELECT user_id, COUNT(*) AS n_rows, COUNT(view_id) AS n_matched,
        |  COUNT(*) - COUNT(view_id) AS n_unmatched
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    // the streamed first-sighting-per-key rows must equal true DISTINCT
    "e20_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type,
        | strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start
        |FROM events""".stripMargin,
    "e01_tumbling_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "e02_sessionize" ->
      """WITH x AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events),
        |y AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |         OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM x),
        |z AS (SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM y)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        | strftime(make_timestamp(MIN(tus)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | strftime(make_timestamp(MAX(tus)), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM z GROUP BY 1, 2""".stripMargin,
    "e03_top_types_per_user" ->
      """WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
        |SELECT user_id, event_type, n,
        | CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS INTEGER) AS rk
        |FROM c QUALIFY rk <= 2""".stripMargin,
    // the streaming twin is held to the same result as batch e01
    "e04_stream_hourly" ->
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS hour_start,
        | event_type, COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // session_window boundary: same as e02 (NEW session only when
    // gap > 30 min — exact-boundary events merge); end = last + gap
    "e05_session_window" ->
      """WITH x AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events),
        |y AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |         OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM x),
        |z AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |         ROWS UNBOUNDED PRECEDING) AS sid FROM y)
        |SELECT user_id,
        | strftime(make_timestamp(MIN(tus)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | strftime(make_timestamp(MAX(tus) + 1800000000), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM z GROUP BY user_id, sid""".stripMargin,
    // the streaming session_window run is held to the batch-e05 result:
    // same gap-merge boundary, same window-end = last event + gap
    "e17_stream_session" ->
      """WITH x AS (SELECT user_id, event_id, value, epoch_ns(ts) // 1000 AS tus FROM events),
        |y AS (SELECT *, CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) IS NULL
        |         OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus, event_id) > 1800000000
        |       THEN 1 ELSE 0 END AS is_new FROM x),
        |z AS (SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tus, event_id
        |         ROWS UNBOUNDED PRECEDING) AS sid FROM y)
        |SELECT user_id,
        | strftime(make_timestamp(MIN(tus)), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
        | strftime(make_timestamp(MAX(tus) + 1800000000), '%Y-%m-%d %H:%M:%S.%f') AS session_end,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM z GROUP BY user_id, sid""".stripMargin)
}
