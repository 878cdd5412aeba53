package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Keys

class KeysSpec extends SparkSpec {

  test("scalableSurrogate equals a global row_number window") {
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey", "c_name")
    val scalable = Keys.scalableSurrogate(
      cust, Seq(col("c_name"), col("c_custkey")), "id")
    val global = cust.withColumn("id",
      row_number().over(Window.orderBy(col("c_name"), col("c_custkey"))).cast("long"))
    assertSameRows(scalable, global)
  }

  test("ids are dense 1..n regardless of partition count") {
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey", "c_name")
    for (parts <- Seq(1, 3, 16)) {
      val ids = Keys.scalableSurrogate(
          cust, Seq(col("c_custkey")), "id", numPartitions = parts)
        .select("id").collect().map(_.getLong(0)).sorted
      assert(ids.head == 1L && ids.last == ids.length.toLong &&
        ids.length == ids.distinct.length)
    }
  }

  test("scalablePrefixSum equals a global exclusive running-sum window") {
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    for (parts <- Seq(1, 3, 16)) {
      val scalable = Keys.scalablePrefixSum(
        orders, Seq(col("o_orderkey")), col("o_custkey"), "cum", numPartitions = parts)
      val global = orders.withColumn("cum",
        coalesce(
          sum(col("o_custkey")).over(
            Window.orderBy(col("o_orderkey"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      assertSameRows(scalable, global)
    }
  }

  test("the data-bearing window is partitioned (no global funnel)") {
    val cust = Tables.load(spark, sfDir, "customer").select("c_custkey", "c_name")
    val plan = Keys.scalableSurrogate(cust, Seq(col("c_custkey")), "id")
      .queryExecution.optimizedPlan.toString()
    // the only acceptable empty partitionBy window is the one over the
    // numPartitions-row offset aggregate, which sits above an Aggregate
    // of spark_partition_id — the row-level window must carry __pid
    val windows = plan.linesIterator.filter(_.contains("windowspecdefinition")).toSeq
    assert(windows.exists(_.contains("__pid")), plan)
  }
}
