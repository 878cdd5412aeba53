package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregate via the user-level `Aggregator` + `udaf()`
  * API — the third custom-aggregation tier next to the engine-level
  * `TypedImperativeAggregate` sketches ([[KmvDistinct]], [[CountMin]])
  * and plain built-ins: a case-class buffer through `Encoders.product`,
  * an associative/commutative `merge`, so Spark runs it with map-side
  * partial aggregation exactly like a built-in — no per-group row
  * buffering, state is one [[PriceStats.Stats]] per group per task.
  *
  * All fields are exact integer arithmetic over cents, so the result
  * is order-independent and oracle-comparable bit-for-bit.
  */
object PriceStats {

  case class Stats(min: Long, max: Long, sum: Long, cnt: Long)

  object StatsAgg extends Aggregator[Long, Stats, Stats] {
    override def zero: Stats = Stats(Long.MaxValue, Long.MinValue, 0L, 0L)
    override def reduce(b: Stats, cents: Long): Stats =
      Stats(math.min(b.min, cents), math.max(b.max, cents),
        b.sum + cents, b.cnt + 1)
    override def merge(a: Stats, b: Stats): Stats =
      Stats(math.min(a.min, b.min), math.max(a.max, b.max),
        a.sum + b.sum, a.cnt + b.cnt)
    override def finish(r: Stats): Stats = r
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("price_stats",
      org.apache.spark.sql.functions.udaf(StatsAgg))
}
