package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming twins of the batch event pipelines in
  * [[graft.operators.Events]]. Each transform takes a (possibly
  * streaming) events frame with the raw `ts` nanos column and returns a
  * plan valid under `writeStream`.
  *
  * State design at scale: hourly counts keep one row of state per
  * (window, event_type) bounded by the watermark; sessionization state
  * is one [[SessionState]] per active user key, closed and emitted via
  * the event-time timeout so idle users don't accumulate.
  */
object StreamingOps {

  /** Event time (micros precision) from the raw `ts`, whichever physical
    * type the parquet carries (see [[graft.Tables.tsUs]]).
    */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("t", timestamp_micros(graft.Tables.tsUs(events)))

  /** Tumbling 1-hour counts with a watermark — streaming twin of
    * e01_tumbling_hourly; identical output columns so the same oracle
    * applies when run with Trigger.AvailableNow + complete mode.
    */
  def hourlyCounts(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("t", watermark)
      .groupBy(window(col("t"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-merged session aggregation with the NATIVE `session_window`
    * operator — the streaming twin of e05_session_window (which is the
    * declarative twin of e02's lag/running-sum sessionizer). Spark
    * merges the per-key open windows on arrival, so state is one merged
    * window per (user, open session) — bounded by active users, not by
    * event count. Run in complete mode on a bounded replay the result
    * equals the batch twin; a production append-mode run adds a
    * watermark so each session emits once its close passes it.
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    withEventTime(events)
      .groupBy(col("user_id"), session_window(col("t"), gap).as("w"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).cast(DoubleType).as("total_value"))
      .select(
        col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming dedup: drop repeated event_ids while their first sighting
    * is still within the watermark — bounded state (one key per id per
    * watermark window), the streaming twin of d01's exact dedup.
    */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    withEventTime(events)
      .withWatermark("t", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** e20: streaming RATE-LIMIT dedup — at most one emitted event per
    * (user, type, clock-hour), the ingest-suppression stage in front of
    * a metered sink. `dropDuplicatesWithinWatermark` keeps one state
    * entry per live key and evicts it once the watermark passes first
    * sighting + delay, so state is bounded by keys live inside the
    * lateness budget, not by stream length — the contract that makes
    * dedup runnable on an unbounded stream (exact global dedup is the
    * batch tier's job, d01). Dups of one key share a clock-hour, so any
    * delay ≥ 1 h + ingest lateness suppresses them all; the replay
    * default covers the whole bounded run, making the gate comparable
    * to a true DISTINCT. Output is projected to the KEY columns before
    * emitting, so the result is arrival-order independent — whichever
    * physical row wins the race, the emitted key row is identical.
    *
    * Bounded-replay assumption behind the 35-day default: the gate's
    * events table replays as ONE micro-batch (single parquet split), so
    * no row is ever late relative to the watermark and the result equals
    * DISTINCT exactly. A multi-file replay of a table whose event-time
    * span EXCEEDS the budget would silently drop keys first seen more
    * than 35 days before the max event time — matching production
    * semantics (late data is late) but diverging from the e20 DISTINCT
    * oracle. Callers replaying a wider span must size `watermark` to
    * cover it (≥ the table's event-time span).
    */
  def rateLimitDedup(events: DataFrame, watermark: String = "35 days"): DataFrame =
    withEventTime(events)
      .withWatermark("t", watermark)
      .withColumn("hour", date_trunc("hour", col("t")))
      .dropDuplicatesWithinWatermark("user_id", "event_type", "hour")
      .select(col("user_id"), col("event_type"),
        date_format(col("hour"), "yyyy-MM-dd HH:mm").as("hour_start"))

  /** Watermarked stream-stream join — purchases attributed to any view
    * by the same user within the preceding hour (view ≤ purchase).
    *
    * Both inputs carry watermarks and the join predicate bounds the
    * event-time range, so the state store keeps each buffered view only
    * until `watermark − 1 h` passes it — bounded state per side, the
    * requirement for an unbounded run. Inner-join matches emit as soon
    * as both rows have arrived (append mode). With
    * `joinType = "leftOuter"`, purchases with NO qualifying view still
    * emit (null view_id) — but only once the watermark has passed their
    * join window, when the engine can PROVE no match is coming; until
    * then they sit in state (exercised under controlled micro-batches in
    * StreamingSpec). The output keeps the watermarked purchase time
    * `p_t` so further stateful operators can chain on it.
    *
    * `viewWatermark` makes the lateness budget ASYMMETRIC — the real
    * deployment shape when one feed lags (views batched hourly from a
    * CDN log, purchases on time from the order service): the slow side
    * gets a larger allowed lateness, the global watermark is the MIN
    * across both operators, and each side's state retention follows its
    * own bound plus the join range. A view arriving hours after the
    * purchase stream still joins as long as it is inside the view-side
    * budget (StreamingSpec pins this and the eviction math).
    */
  def viewPurchaseAttribution(events: DataFrame, watermark: String = "1 hour",
                              joinType: String = "inner",
                              viewWatermark: Option[String] = None): DataFrame = {
    val base = withEventTime(events)
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"), col("t").as("v_t"))
      .withWatermark("v_t", viewWatermark.getOrElse(watermark))
    val purchases = base.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"), col("t").as("p_t"))
      .withWatermark("p_t", watermark)
    val joined = purchases.join(views,
      col("p_user") === col("v_user") &&
        col("v_t") <= col("p_t") &&
        col("v_t") >= col("p_t") - expr("INTERVAL 1 HOUR"),
      joinType)
    // fullOuter null-extends BOTH sides, so the purchase-side columns
    // alone can't carry the row identity: coalesce the user and keep
    // both event times (a view-only row has null p_t — downstream
    // cutoffs must look at whichever side exists)
    if (joinType == "fullOuter")
      joined.select(coalesce(col("p_user"), col("v_user")).as("user_id"),
        col("purchase_id"), col("view_id"), col("p_t"), col("v_t"))
    else
      joined.select(col("p_user").as("user_id"), col("purchase_id"), col("view_id"), col("p_t"))
  }

  /** Chained stateful operators: hourly counts of attributed purchases
    * — a windowed aggregation DOWNSTREAM of [[viewPurchaseAttribution]]
    * (the purchase event time carried through the join). In append mode
    * a window only emits once the global watermark passes its end, so
    * the last partial hour stays in state — the batch oracle must apply
    * the same cutoff.
    */
  def attributionHourly(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    viewPurchaseAttribution(events, watermark)
      .groupBy(window(col("p_t"), "1 hour").as("w"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm").as("hour_start"),
        col("n_pairs"))

  /** Per-user session aggregate emitted when a session closes. */
  case class SessionOut(user_id: Long, n_events: Long, start_us: Long,
                        end_us: Long, total_cents: Long)

  /** Running state for one user's open session. `total_cents` keeps the
    * sum exact (value quantized at 2 decimals) — double accumulation
    * across micro-batches would drift order-dependently.
    */
  case class SessionState(n: Long, startUs: Long, endUs: Long, cents: Long)

  private val GapUs = 1800L * 1000 * 1000 // 30 min

  /** Custom stateful sessionization via flatMapGroupsWithState — the
    * streaming twin of e02_sessionize (30-minute inactivity gap).
    * Input must carry columns (user_id, ts_us, cents, t) where `t` is
    * the WATERMARKED event-time column (the analyzer requires the
    * event-time attribute to survive into the stateful operator for
    * event-time timeouts). Sessions close when a later event arrives
    * past the gap, or on event-time timeout.
    */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts_us"), col("cents"), col("t"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.n, s.startUs, s.endUs, s.cents))
          } else {
            // within a micro-batch, order by event time for gap logic
            val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
            var closed = List.empty[SessionOut]
            var cur = state.getOption
            sorted.foreach { case (_, tsUs, cents, _) =>
              cur match {
                case Some(s) if tsUs - s.endUs <= GapUs =>
                  // min/max, not assignment: a cross-micro-batch
                  // out-of-order event inside the gap must never SHRINK
                  // the session; kept in lockstep with TwsSessionizer
                  cur = Some(SessionState(s.n + 1, math.min(s.startUs, tsUs),
                    math.max(s.endUs, tsUs), s.cents + cents))
                case Some(s) =>
                  closed ::= SessionOut(user, s.n, s.startUs, s.endUs, s.cents)
                  cur = Some(SessionState(1L, tsUs, tsUs, cents))
                case None =>
                  cur = Some(SessionState(1L, tsUs, tsUs, cents))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close the session once the watermark passes end + gap
              state.setTimeoutTimestamp((s.endUs + GapUs) / 1000)
            }
            closed.reverseIterator
          }
      }
  }
}
