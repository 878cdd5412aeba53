package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.StreamingOps.{SessionOut, SessionState}

/** Gap sessionization re-expressed on `transformWithState` — the same
  * contract as [[StreamingOps.sessionize]] (30-minute inactivity gap,
  * close on gap or when the watermark passes end+gap), but on Spark 4's
  * arbitrary-state API, whose event-time TIMERS replace
  * `GroupStateTimeout.EventTimeTimeout`: the processor registers one
  * timer at (session end + gap) and Spark calls [[RunningTotals]]-style
  * `handleExpiredTimer` when the watermark crosses it — no sentinel
  * state, and the timer can be re-armed per batch (delete + register)
  * instead of the single implicit timeout slot the old API allowed.
  *
  * State per user is ONE [[SessionState]] plus at most one timer —
  * O(active users), RocksDB-backed, so the keyspace does not have to
  * fit in executor memory. StreamingSpec holds this implementation and
  * the flatMapGroupsWithState one to the same scenario.
  */
object TwsSessionizer {

  private val GapUs = 1800L * 1000 * 1000 // 30 min — same as StreamingOps

  class SessionProcessor
      extends StatefulProcessor[Long, (Long, Long, Long, java.sql.Timestamp), SessionOut] {
    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    /** The one timer armed for this key, re-armed as the session end
      * advances (event-time ms, as the timer API wants).
      */
    private def armTimer(endUs: Long): Unit = {
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer((endUs + GapUs) / 1000)
    }

    override def handleInputRows(user: Long,
        rows: Iterator[(Long, Long, Long, java.sql.Timestamp)],
        timerValues: TimerValues): Iterator[SessionOut] = {
      // within a micro-batch, order by event time for the gap logic
      val sorted = rows.toSeq.sortBy(r => (r._2, r._3))
      var closed = List.empty[SessionOut]
      var cur = if (session.exists()) Option(session.get()) else None
      sorted.foreach { case (_, tsUs, cents, _) =>
        cur match {
          case Some(s) if tsUs - s.endUs <= GapUs =>
            // min/max, not assignment: a cross-micro-batch out-of-order
            // event inside the gap must never SHRINK the session (a
            // shrunk end would re-arm the close timer early); kept in
            // lockstep with StreamingOps.sessionize
            cur = Some(SessionState(s.n + 1, math.min(s.startUs, tsUs),
              math.max(s.endUs, tsUs), s.cents + cents))
          case Some(s) =>
            closed ::= SessionOut(user, s.n, s.startUs, s.endUs, s.cents)
            cur = Some(SessionState(1L, tsUs, tsUs, cents))
          case None =>
            cur = Some(SessionState(1L, tsUs, tsUs, cents))
        }
      }
      cur.foreach { s => session.update(s); armTimer(s.endUs) }
      closed.reverseIterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[SessionOut] = {
      val out =
        if (session.exists()) {
          val s = session.get()
          session.clear()
          Iterator.single(SessionOut(user, s.n, s.startUs, s.endUs, s.cents))
        } else Iterator.empty
      out
    }
  }

  /** Input contract matches [[StreamingOps.sessionize]]: columns
    * (user_id, ts_us, cents, t) with `t` the watermarked event-time.
    */
  def sessionize(events: DataFrame): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.select(col("user_id"), col("ts_us"), col("cents"), col("t"))
      .as[(Long, Long, Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionProcessor,
        TimeMode.EventTime(), OutputMode.Append())
  }
}
