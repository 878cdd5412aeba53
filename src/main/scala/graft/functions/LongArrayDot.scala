package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Codegen'd integer dot product of two `array<bigint>` columns.
  *
  * The higher-order-function formulation
  * (`aggregate(zip_with(a, b, _*_), 0, _+_)`) evaluates its lambdas
  * interpreted, one boxed element at a time — on a 64-dim O(n²)
  * similarity kernel that is the entire wall-clock. This expression
  * compiles to a tight primitive `long` loop inside whole-stage codegen
  * (~50× the throughput), which is what makes the brute-force cosine
  * baselines and the LSH verification passes affordable at bench scale.
  *
  * Null semantics: null if either array is null (BinaryExpression
  * default); null ELEMENTS read as 0 via ArrayData.getLong — quantized
  * embeddings never contain null elements.
  */
case class LongArrayDot(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<bigint> arguments, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "long_array_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

object LongArrayDot {
  private val FnName = "long_array_dot"

  /** Builder + metadata for [[org.apache.spark.sql.SparkSessionExtensions
    * .injectFunction]] — sessions built with
    * `spark.sql.extensions=graft.GraftExtensions` get the function
    * without any explicit registration call.
    */
  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(FnName),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[LongArrayDot].getName, FnName),
    { exprs: Seq[Expression] => LongArrayDot(exprs(0), exprs(1)) })

  /** Idempotently register the expression in the session's function
    * registry so it is callable as a Column via [[dot]] (Spark 4 removed
    * public Column-from-Expression construction). Redundant when the
    * session was built with [[graft.GraftExtensions]]; kept so operators
    * work in any session.
    */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName,
      { exprs: Seq[Expression] => LongArrayDot(exprs(0), exprs(1)) },
      "built-in")
  }

  /** Column API for the registered function — call [[register]] first. */
  def dot(a: Column, b: Column): Column = call_function(FnName, a, b)
}
