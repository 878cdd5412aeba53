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
}
