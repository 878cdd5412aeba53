package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Shared helpers for the Relational* operator traits. */
trait RelationalBase {

  protected def tmpTag(dir: String): String = graft.Fs.tmpTag(dir)

  protected def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact, order-independent sum of a money-like double column. */
  protected def dsum(c: Column): Column = sum(dec(c)).cast(DoubleType)
}
