package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Count-min sketch as a custom TypedImperativeAggregate — the additive
  * counterpart to [[KmvDistinct]]'s order-statistic sketch: point
  * frequency estimates (`est(x) = min_j cell[j][h_j(x)]`, never an
  * underestimate) from a fixed `Depth × Width` counter grid.
  *
  * Like KMV, the hash family is engine-reproducible integer arithmetic
  * (`((a_j·x + b_j) mod (2³¹−1)) mod Width`, a_j/b_j affine in the row
  * index), so the full sketch — every counter, hence every estimate — is
  * a pure function of the data that a SQL oracle can replay exactly.
  * Spark's own `count_min_sketch` aggregate exists but hashes with
  * implementation-private murmur seeds, which is what makes it
  * un-oracle-checkable; this one trades two multiplications per update
  * for verifiability.
  *
  * Counters are ADDITIVE, so merge is element-wise sum: merge order can
  * never change the result (unlike Misra-Gries style heavy-hitter
  * summaries, whose eviction depends on arrival order — unusable under
  * a nondeterministic shuffle). Partial aggregation ships one
  * `Depth·Width`-long buffer per group regardless of input size — the
  * property that makes frequency estimation feasible where a 100 TB
  * exact GROUP BY key would itself be a top-10 shuffle.
  */
case class CountMin(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMin._

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a BIGINT key column, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < Depth) {
        buf(j * Width + cell(j, x)) += 1L
        j += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(Depth * Width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMin =
    copy(child = newChildren.head)
}

object CountMin {
  val Depth = 4
  val Width = 256
  val P = 2147483647L // 2^31 - 1

  def a(j: Int): Long = 2654435761L + j.toLong * 40503L
  def b(j: Int): Long = 104729L + j.toLong * 7919L

  /** Row-j column index for key x — mirrored verbatim by the oracle.
    * The key is pre-reduced mod P before the multiply (round-16 d06
    * lesson): a(j)·x raw wraps silently in JVM arithmetic and
    * ANSI-errors in the SQL mirror once keys exceed ~3.5·10⁹;
    * a(j)·(x mod P) < 2⁶³ for any non-negative int64 key and is
    * congruent mod P, so cells are unchanged wherever the raw form
    * didn't overflow. Both reductions use floorMod so NEGATIVE keys
    * pick the same residue representative as the SQL mirror's pmod
    * (round-16 advice: signed % differs from pmod by P for x < 0, and
    * P % Width ≠ 0 means the representatives land in different Width
    * cells — a sketch built via one path and probed via the other
    * would disagree). Positive keys are unchanged. */
  def cell(j: Int, x: Long): Int = {
    val h = Math.floorMod(a(j) * Math.floorMod(x, P) + b(j), P)
    (h % Width).toInt
  }

  /** Fallback registration for sessions built without
    * [[graft.GraftExtensions]].
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min_agg",
      { exprs: Seq[Expression] => CountMin(exprs.head) },
      "built-in")
  }

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("count_min_agg"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[CountMin].getName, "count_min_agg"),
    { exprs: Seq[Expression] => CountMin(exprs.head) })
}
