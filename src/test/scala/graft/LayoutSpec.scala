package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Physical-layout operators: s21's manifest prune must actually skip
  * files, and s22's z-order sharding must prune a 2-dim box predicate at
  * least as well as single-dim (linear) sharding — the inequality that
  * justifies z-ordering at all.
  */
class LayoutSpec extends SparkSpec {

  test("s21 manifest prune skips files and loses no rows") {
    val (survivors, total) = Relational.statsSurvivors(spark, sf01Dir)
    assert(total == 8, s"expected 8 shards, got $total")
    assert(survivors.nonEmpty, "box matched no shard — predicate misconfigured")
    assert(survivors.length < total,
      s"no skipping: ${survivors.length} of $total files survive")
    val direct = Tables.load(spark, sf01Dir, "orders")
      .filter(col("o_totalprice") >= 150000.0 && col("o_totalprice") <= 250000.0)
      .count()
    val viaPrune = Relational.statsPrunedScan(spark, sf01Dir)
      .select(col("n_orders")).head().getLong(0)
    assert(viaPrune == direct, s"pruned scan lost rows: $viaPrune vs $direct")
  }

  test("s22 z-order shards prune the 2-dim box at least as well as linear") {
    val r = Relational.zorderClustering(spark, sf01Dir).head()
    val (nz, hz) = (r.getAs[Long]("n_shards_z"), r.getAs[Long]("n_hit_z"))
    val (nl, hl) = (r.getAs[Long]("n_shards_lin"), r.getAs[Long]("n_hit_lin"))
    assert(r.getAs[Long]("rows_in_box") > 0, "empty box — predicate misconfigured")
    assert(nz > 1 && nl > 1, s"degenerate sharding: nz=$nz nl=$nl")
    assert(hz < nz, s"z-order skipped nothing: $hz of $nz shards hit")
    // the z-order fraction hit must not exceed the linear fraction: the
    // box constrains both dims, and z shards are bounded in both
    assert(hz.toDouble / nz <= hl.toDouble / nl,
      s"z-order prunes worse than linear: $hz/$nz vs $hl/$nl")
  }

  test("s23 field codec: '' and NULL stay distinct, structural chars round-trip") {
    // round-14 advice: the earlier empty-field NULL encoding conflated
    // '' with NULL — pin the '%00' sentinel codec as an exact inverse
    // on every adversarial class, including values that LOOK like the
    // sentinel or the escapes
    val values = Seq(null, "", "%00", "%2500", "%", "%%", "%09", "%0A",
      "tab\there", "nl\nthere", "cr\rend", "\t", "\n", "%25",
      "a%00b", "mixed\t%\n\r%00", "plain")
    import spark.implicits._
    val df = values.toDF("v")
    val back = df.select(
        operators.Relational.textDecodeField(
          operators.Relational.textEncodeField(col("v"))).as("rt"),
        col("v"))
      .collect()
    for (r <- back)
      assert(r.get(0) == r.get(1), s"round-trip broke: ${r.get(1)} -> ${r.get(0)}")
    // the encoded field never contains a structural character, so the
    // TAB-joined line can never tear
    val enc = df.select(operators.Relational.textEncodeField(col("v")).as("e")).collect()
    for (r <- enc; bad <- Seq("\t", "\n", "\r"))
      assert(!r.getString(0).contains(bad), s"structural char survived encode: ${r.getString(0)}")
  }
}
