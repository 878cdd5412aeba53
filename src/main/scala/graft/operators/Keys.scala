package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.LongType

/** Scalable surrogate-key assignment (reference `IDENTITY(1,1)` columns,
  * sql_queries.py:141,163,241) — dense 1-based ids in a global sort order
  * WITHOUT a single-partition global window.
  *
  * Plan shape: range-repartition on the sort keys (disjoint ordered key
  * ranges), rank within each partition (`Window.partitionBy(partition)`,
  * a balanced shuffle), then add per-partition offsets computed from a
  * tiny numPartitions-row aggregate that is broadcast back. Every stage
  * is bounded by the partition size — at 100 TB no executor ever holds
  * more than one partition of rows, unlike `Window.orderBy()` with no
  * partitionBy which funnels the whole table through one task.
  *
  * Determinism: ids equal `row_number() OVER (ORDER BY order...)` exactly,
  * for ANY range boundary placement, because range partitions are
  * disjoint and ordered — callers must pass a total order (include a
  * unique tiebreak column).
  */
object Keys {

  def scalableSurrogate(df: DataFrame, order: Seq[Column], idName: String,
                        numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
    val local = ranged.withColumn("__rn",
      row_number().over(Window.partitionBy(col("__pid")).orderBy(order: _*)))
    // numPartitions rows — the only global window runs over this tiny set.
    val offsets = local.groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__offset",
        coalesce(
          sum(col("__cnt")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(idName, (col("__offset") + col("__rn")).cast(LongType))
      .drop("__pid", "__rn", "__offset")
  }

  /** Exclusive prefix sum of `value` in the total order `order` — each
    * row gets the running total BEFORE it — with the same
    * partition-offset plan shape as [[scalableSurrogate]]: range
    * partitions carry disjoint ordered key ranges, the running sum is
    * windowed per partition (balanced), and only the numPartitions-row
    * per-partition totals pass through a global window before being
    * broadcast back. Equals `SUM(value) OVER (ORDER BY order ROWS
    * UNBOUNDED PRECEDING AND 1 PRECEDING)` for any boundary placement.
    */
  def scalablePrefixSum(df: DataFrame, order: Seq[Column], value: Column,
                        sumName: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200").toInt
    val ranged = df.repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__v", value.cast(LongType))
    val local = ranged.withColumn("__cum",
      coalesce(
        sum(col("__v")).over(
          Window.partitionBy(col("__pid")).orderBy(order: _*)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    val offsets = local.groupBy(col("__pid")).agg(sum(col("__v")).as("__tot"))
      .withColumn("__offset",
        coalesce(
          sum(col("__tot")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__pid"), col("__offset"))
    local.join(broadcast(offsets), "__pid")
      .withColumn(sumName, col("__offset") + col("__cum"))
      .drop("__pid", "__v", "__cum", "__offset")
  }
}
