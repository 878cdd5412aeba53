package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

/** e13: the foreachBatch upsert must be genuinely incremental — folding
  * micro-batches one at a time through the state table converges to the
  * one-shot aggregate. The gate's file source delivers the single-split
  * events table as one batch, so this spec forces TWO batches (two
  * files, maxFilesPerTrigger=1) and checks the result is identical to
  * merging everything at once.
  */
class UpsertSpec extends SparkSpec {

  test("e13 two-batch incremental upsert equals the one-shot merge") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_e13_test_${Fs.tmpTag(sfDir)}"
    val inDir = s"$base/in"
    Fs.rmTree(new java.io.File(base))
    val events = Tables.load(spark, sfDir, "events")
    // two files split by event id parity -> two AvailableNow batches
    events.filter(pmod(col("event_id"), lit(2)) === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/even")
    events.filter(pmod(col("event_id"), lit(2)) === 1)
      .coalesce(1).write.mode("overwrite").parquet(s"$inDir/odd")

    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val stream = s.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$inDir/*/*.parquet")
    val got = Events.runIncrementalUpsert(stream, s"$base/state")

    // two state versions must exist: batch 0 and batch 1
    val versions = new java.io.File(s"$base/state").list()
    assert(versions != null && versions.count(_.startsWith("v")) == 2,
      s"expected 2 state versions, got ${Option(versions).map(_.toSeq)}")

    val expected = Events.upsertMerge(Events.upsertRows(events))
    assertSameRows(got, expected)
    Fs.rmTree(new java.io.File(base))
  }

  test("u05 incremental SCD2 merge equals the full rebuild") {
    assertSameRows(
      operators.Relational.scd2IncrementalMerge(spark, sfDir),
      operators.Relational.scd2CustomerStatus(spark, sfDir))
  }

  test("u04 CDC fold: delete wins unless re-inserted; latest op sets state") {
    val got = operators.Cdc.cdcApply(spark, sfDir)
    val keys = Tables.load(spark, sfDir, "orders").select(col("o_orderkey"))
    val n = keys.count()
    // deleted and not re-inserted (%13 but not %39) keys are gone
    val tombstoned = keys
      .filter(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 39 =!= 0)
      .count()
    assert(got.count() == n - tombstoned)
    assert(got.filter(col("o_orderkey") % 13 === 0 &&
      col("o_orderkey") % 39 =!= 0).count() == 0)
    // re-inserted keys carry the seq-3 state, updated keys the seq-1 state
    assert(got.filter(col("o_orderkey") % 39 === 0)
      .filter(col("o_orderstatus") =!= "R").count() == 0)
    assert(got.filter(col("o_orderkey") % 7 === 0 && col("o_orderkey") % 13 =!= 0)
      .filter(col("o_orderstatus") =!= "U1").count() == 0)
  }
}
