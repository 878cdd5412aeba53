package graft

import org.apache.spark.sql.functions._
import graft.operators.{Multimodal, Relational}

/** Ingestion-side semantics: PERMISSIVE CSV quarantine (s17) and
  * deterministic micro-batching for model inference (m06).
  */
class IngestSpec extends SparkSpec {

  test("s17 PERMISSIVE keeps parseable fields and quarantines raw lines") {
    val got = Relational.csvPermissive(spark, sfDir).cache()
    // corrupt set = %5 (bad int), %7 (extra token), %11 (short row)
    val corrupt = got.filter(col("is_corrupt")).cache()
    assert(corrupt.count() == 10) // 0,5,10,15,20 + 7,14,21 + 11,22
    assert(got.filter(!col("is_corrupt")).count() == 15)
    // bad-int rows keep the fields that DID parse; the broken one is null
    val badInt = corrupt.filter(col("id") % 5 === 0)
    assert(badInt.count() == 5)
    assert(badInt.filter(col("name").isNull || col("rk").isNotNull).count() == 0)
    // every corrupt row carries the raw line for a dead-letter sink
    assert(corrupt.filter(col("corrupt_raw").isNull).count() == 0)
    got.unpersist()
    corrupt.unpersist()
  }

  test("s20 shards are internally sorted and globally ordered") {
    // the query publishes disjointness; this pins the within-file order
    // and that concatenating shards by range yields the full global sort
    Relational.sortedShards(spark, sfDir).collect() // force the write
    val path = s"${sys.props("java.io.tmpdir")}/graft_sorted_shards_" +
      graft.Fs.sessionTag(spark, sfDir)
    val files = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
    assert(files.length == 8, files.length)
    val perFile = files.map { f =>
      spark.read.parquet(f)
        .select(col("o_totalprice"), col("o_orderkey"))
        .collect().map(r => (r.getDouble(0), r.getLong(1)))
    }
    perFile.foreach(rows => assert(rows.sameElements(rows.sorted), "shard not sorted"))
    val concatenated = perFile.sortBy(_.head).flatten
    val expected = Tables.load(spark, sfDir, "orders")
      .select(col("o_totalprice"), col("o_orderkey"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sorted
    assert(concatenated.sameElements(expected), "shard concatenation != global sort")
  }

  test("m06 batches are bounded, deterministic, and cover every doc") {
    val docs = Tables.load(spark, sfDir, "documents")
    val got = Multimodal.batchedScore(docs).cache()
    assert(got.count() == docs.count())
    // batch size never exceeds the model batch bound and matches the
    // actual membership count of its batch
    val sizes = got.groupBy(col("batch_id"))
      .agg(count(lit(1)).as("n"), max(col("batch_size")).as("bs"),
        min(col("batch_size")).as("bs2"))
    assert(sizes.filter(col("bs") > 32).count() == 0)
    assert(sizes.filter(col("n") =!= col("bs") || col("bs") =!= col("bs2")).count() == 0)
    // slots are a permutation of 0..size-1 per batch (sorted by doc_id)
    val slots = got.groupBy(col("batch_id"))
      .agg(min(col("slot")).as("lo"), max(col("slot")).as("hi"),
        countDistinct(col("slot")).as("nd"), count(lit(1)).as("n"))
    assert(slots.filter(col("lo") =!= 0 || col("hi") =!= col("n") - 1 ||
      col("nd") =!= col("n")).count() == 0)
    // repartitioning the input cannot change the result
    val reshuffled = Multimodal.batchedScore(docs.repartition(13)).toDF()
    assertSameRows(got.toDF(), reshuffled)
    got.unpersist()
  }
}
