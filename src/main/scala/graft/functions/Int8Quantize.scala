package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Codegen'd symmetric max-abs int8 quantization of an `array<float>`
  * embedding: `round(x·127 / max|x|)` per element, the v08 coarse code.
  *
  * The higher-order-function formulation
  * (`array_max(transform(abs)) + transform(round)`) evaluates its
  * lambdas interpreted, one boxed element at a time — three interpreted
  * passes over every dimension of every vector, which round-17 measured
  * as v08's ENTIRE gap over the structurally identical v07 (2.6 s vs
  * 0.7 s cold). This compiles to two primitive loops inside whole-stage
  * codegen.
  *
  * Exact-parity contract with the builtin it replaces: the per-element
  * rounding is `java.math.BigDecimal.valueOf(v).setScale(0, HALF_UP)`
  * — bit-identical to Spark's `Round` on DoubleType (which goes through
  * the same decimal-string construction), with the multiply/divide in
  * the same `(x * 127) / m` association. An all-zero vector (max|x| = 0,
  * excluded by the old `maxabs > 0` pre-filter) quantizes to all zeros
  * here; its squared norm is 0, so the downstream `c2 > 0` filter drops
  * exactly the same rows. Null semantics: null on null input array
  * (UnaryExpression default); null ELEMENTS never occur in the
  * embeddings (the LongArrayDot contract).
  */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float>, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  override def nullSafeEval(input: Any): Any =
    Int8Quantize.compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Int8Quantize$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Int8Quantize =
    copy(child = newChild)
}

object Int8Quantize {
  private val FnName = "int8_quantize"

  /** Two primitive passes: max|x|, then the rounded scale. */
  def compute(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    var m = 0d
    var i = 0
    while (i < n) {
      val v = math.abs(arr.getFloat(i).toDouble)
      if (v > m) m = v
      i += 1
    }
    val out = new Array[Any](n)
    i = 0
    if (m == 0d) {
      while (i < n) { out(i) = 0L; i += 1 }
    } else {
      while (i < n) {
        // same association and rounding as the replaced builtins:
        // round((double)x * 127 / m) via decimal-string HALF_UP
        val d = arr.getFloat(i).toDouble * 127d / m
        out(i) = java.math.BigDecimal.valueOf(d)
          .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[Int8Quantize].getName, FnName),
    { exprs: Seq[Expression] => Int8Quantize(exprs.head) })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      { exprs: Seq[Expression] => Int8Quantize(exprs.head) },
      "built-in")
  }

  /** Column API (register or GraftExtensions required). */
  def of(c: Column): Column = call_function(FnName, c)
}
