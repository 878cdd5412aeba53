package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}

/** Per-user running totals via `transformWithState` — Spark 4's
  * arbitrary-state API (the successor to mapGroupsWithState /
  * flatMapGroupsWithState): typed named state registered against a
  * [[org.apache.spark.sql.streaming.StatefulProcessorHandle]], optional
  * per-state TTL, and timer support, all backed by the RocksDB state
  * store (the provider this API requires — which is also the provider a
  * 100 TB keyspace needs, since state no longer has to fit in executor
  * memory).
  *
  * State per key is ONE (count, cents) pair — O(active users), not
  * O(events); each micro-batch folds its rows into the pair and emits
  * the updated running total (update semantics downstream).
  */
object RunningTotals {

  case class UserTotal(user_id: Long, n_events: Long, total_cents: Long)

  /** StatefulProcessor must be a top-level class: it is serialized to
    * the state operator, and an anonymous closure would drag the
    * enclosing suite/session in with it.
    */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, (Long, Long), UserTotal] {
    @transient private var totals: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Long)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[UserTotal] = {
      var (n, cents) = if (totals.exists()) totals.get() else (0L, 0L)
      rows.foreach { case (_, c) => n += 1; cents += c }
      totals.update((n, cents))
      Iterator.single(UserTotal(key, n, cents))
    }
  }

  /** events: (user_id, cents) pairs (streaming); emits one updated
    * running total per key per micro-batch it appears in.
    */
  def runningTotals(events: Dataset[(Long, Long)]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events.groupByKey(_._1)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
