package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Session-extension entry point
  * (`spark.sql.extensions=graft.GraftExtensions`): injects the library's
  * custom Catalyst expressions into every session built with it, so SQL
  * text and Column code can call them without per-session registration.
  * Deliberately small — reference parity needs zero custom Catalyst
  * (SURVEY §4); only the performance-critical expressions live here.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(functions.LongArrayDot.functionDescriptor)
    ext.injectFunction(functions.KmvDistinct.functionDescriptor)
    ext.injectFunction(functions.CountMin.functionDescriptor)
    ext.injectFunction(functions.WordShingles.functionDescriptor)
    ext.injectFunction(functions.Int8Quantize.functionDescriptor)
  }
}
