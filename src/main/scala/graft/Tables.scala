package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Readers for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Parquet carries its own schema, so no explicit StructType is needed
  * here; explicit schemas are used for CSV ingestion (see
  * [[graft.pipeline.Schemas]]) where inference would be
  * non-deterministic at scale.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  /** Register every table as a temp view (for spark.sql-driven queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Exact integer MICROSECONDS for an events-style `ts` column,
    * tolerant of the testdata's two physical encodings: TIMESTAMP(NANOS)
    * arrives as integer nanos under `parquet.nanosAsLong` (ns `div`
    * 1000 — SQL div, never `/`: double division corrupts 1.7e18-scale
    * longs), TIMESTAMP(MICROS) arrives natively as timestamp_ntz
    * (unix_micros after a cast that is instant-preserving in the UTC
    * sessions every main builds). All event-time arithmetic downstream
    * stays integer-exact and engine-independent either way.
    */
  def tsUs(df: DataFrame): Column = df.schema("ts").dataType match {
    case LongType => expr("ts div 1000")
    case _ => unix_micros(col("ts").cast(TimestampType))
  }
}
