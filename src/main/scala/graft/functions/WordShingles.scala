package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word 3-gram shingles of a text column in ONE pass — the
  * codegen'd replacement for the built-in formulation in
  * [[graft.operators.TextAnalysis.shingles3]].
  *
  * The built-in zip_with/slice tree is evaluated interpreted and walks
  * the split array several times per row; this expression tokenizes
  * once and emits first-occurrence-distinct shingles in a single local
  * loop. Semantics replicate `split(trim(c), "\\s+")` exactly:
  * space-only trim (Spark `trim` trims 0x20, not all whitespace) and
  * regex split with limit −1. Null input propagates to null (the
  * operators filter null/short texts before shingling).
  *
  * Equality with the built-in formulation is asserted per-row in
  * DedupSpec, and the downstream near-dup results are DuckDB-oracle
  * checked — the expression cannot silently drift.
  */
case class WordShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles$$.MODULE$$.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** One-pass tokenize + 3-gram + first-occurrence distinct. */
  def compute(s: UTF8String): ArrayData = {
    // trimAll would differ from the `trim` builtin: spaces only
    val words = ws.split(s.trim().toString, -1)
    if (words.length < 3) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    var i = 0
    while (i + 2 < words.length) {
      seen.add(words(i) + " " + words(i + 1) + " " + words(i + 2))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }

  val functionDescriptor: (org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
      classOf[WordShingles].getName, "word_shingles"),
    { exprs: Seq[Expression] => WordShingles(exprs.head) })

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles",
      { exprs: Seq[Expression] => WordShingles(exprs.head) },
      "built-in")
  }

  /** Column API (register or GraftExtensions required). */
  def shingles(c: Column): Column = call_function("word_shingles", c)
}
