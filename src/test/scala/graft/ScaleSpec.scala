package graft

import org.apache.spark.sql.functions._

/** ScaleUp invariants at smoke scale (factor 3 over sf0.001): the
  * synthesized data must LOOK like real N× data — linear cardinalities,
  * intact referential integrity, preserved per-copy text statistics,
  * decorrelated cross-copy similarity. These are what make the roadmap's
  * headroom sweep (COVERAGE.md criterion 3) measure scaling and not a
  * dedup-rate artifact.
  */
class ScaleSpec extends SparkSpec {

  private val F = 3

  private def scaled(name: String) =
    ScaleUp.scaledTable(spark, sfDir, name, F)

  test("cardinalities scale by the factor; bounded dims do not") {
    for (name <- Seq("orders", "lineitem", "documents", "embeddings", "events"))
      assert(scaled(name).count() == F * Tables.load(spark, sfDir, name).count(), name)
    for (name <- Seq("region", "nation"))
      assert(scaled(name).count() == Tables.load(spark, sfDir, name).count(), name)
  }

  test("referential integrity survives the key shift") {
    val li = scaled("lineitem"); val o = scaled("orders")
    val orphans = li.join(o, li("l_orderkey") === o("o_orderkey"), "left_anti")
    assert(orphans.count() == 0L)
    val c = scaled("customer")
    val custOrphans = o.join(c, o("o_custkey") === c("c_custkey"), "left_anti")
    assert(custOrphans.count() == 0L)
    // keys are globally unique across copies
    assert(o.select("o_orderkey").distinct().count() == o.count())
  }

  test("copy>0 text is an order-preserving injective vocabulary relabel") {
    val docs = scaled("documents")
    val base = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text").as("base_text"))
    val copy1 = docs.filter(col("doc_id") >= ScaleUp.Stride &&
        col("doc_id") < 2 * ScaleUp.Stride)
      .select((col("doc_id") - ScaleUp.Stride).as("doc_id"),
        col("text"), col("n_chars"))
    val joined = copy1.join(base, "doc_id")
    // n_chars matches the relabeled text; token count preserved; every
    // token is either an exempted quality-gate stopword or carries the
    // copy-1 namespace prefix (cross-copy overlap = stopwords only)
    assert(joined.filter(length(col("text")) =!= col("n_chars")).count() == 0L)
    assert(joined.filter(size(split(col("text"), " ")) =!=
      size(split(col("base_text"), " "))).count() == 0L)
    assert(joined.filter(exists(split(col("text"), " "),
      w => !w.startsWith("w1x") &&
        !w.isin(operators.TextAnalysis.stopwords: _*))).count() == 0L)
    // the curation content gate (has_stop) decides identically per copy
    val gateFlips = joined.filter(
      exists(split(col("text"), " "),
        w => w.isin(operators.TextAnalysis.stopwords: _*)) =!=
      exists(split(col("base_text"), " "),
        w => w.isin(operators.TextAnalysis.stopwords: _*)))
    assert(gateFlips.count() == 0L)
    // injective on the vocabulary: distinct words in == distinct words out,
    // and equal source words map to equal tokens (same count per doc)
    val vocabIn = base.select(explode(split(col("base_text"), " ")).as("w"))
      .distinct().count()
    val vocabOut = copy1.select(explode(split(col("text"), " ")).as("w"))
      .distinct().count()
    assert(vocabOut == vocabIn, s"vocab not bijective: $vocabOut != $vocabIn")
  }

  test("dup RATE is preserved: near-dup pairs scale ~linearly with the factor") {
    // the property the headroom sweep depends on (see ScaleUp scaladoc).
    // Two signal classes, two guarantees:
    //  - Jaccard signals (d02) are HASH-FREE set overlaps, and an
    //    injective word map preserves every shingle-set Jaccard exactly,
    //    so the scaled corpus must yield EXACTLY F× the source's pairs
    //    (each copy reproduces the source's pair list, id-shifted);
    //  - hash-projection signals (SimHash d09) re-randomize near the
    //    Hamming threshold when the vocabulary is relabeled, so
    //    per-copy counts land in a band around the source's — the hard
    //    guarantee is ZERO cross-copy pairs (the F² artifact measured
    //    for byte-identical copies: 100× pairs at factor 10).
    val out = new java.io.File("target/scale-spec-sf")
    scaled("documents").write.mode("overwrite")
      .parquet(Tables.path(out.getPath, "documents"))
    val jBase = operators.TextAnalysis.ngramJaccard(spark, sfDir).count()
    val jScaled = operators.TextAnalysis.ngramJaccard(spark, out.getPath).count()
    assert(jScaled == F * jBase, s"jaccard pairs: $jScaled != $F x $jBase")
    val sBase = operators.TextAnalysis.simhashNearDup(spark, sfDir).count()
    val byCopy = operators.TextAnalysis.simhashNearDup(spark, out.getPath)
      .select((col("id_a") / ScaleUp.Stride).cast("int").as("ca"),
        (col("id_b") / ScaleUp.Stride).cast("int").as("cb"))
      .groupBy("ca", "cb").count()
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getLong(2))).toMap
    assert(byCopy.keys.forall { case (a, b) => a == b },
      s"cross-copy simhash pairs: $byCopy")
    assert(byCopy((0, 0)) == sBase)
    for (c <- 1 until F) {
      val n = byCopy.getOrElse((c, c), 0L)
      assert(n > sBase / 3 && n < sBase * 3,
        s"copy $c simhash pair count $n out of band vs $sBase")
    }
  }

  test("copy>0 embeddings are unit-norm, source-dimensional, and fresh") {
    val emb = scaled("embeddings")
    val dim = Tables.load(spark, sfDir, "embeddings")
      .select(size(col("embedding"))).head().getInt(0)
    val copies = emb.filter(col("vec_id") >= ScaleUp.Stride)
      .select(
        size(col("embedding")).as("d"),
        abs(sqrt(aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x * x)) - 1.0).as("norm_err"))
    assert(copies.filter(col("d") =!= dim || col("norm_err") > 1e-4).count() == 0L)
    // decorrelated: a copy-1 vector is not its copy-0 twin
    val base = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("base_id"), col("embedding").as("base_vec"))
    val twins = emb.filter(col("vec_id") >= ScaleUp.Stride &&
        col("vec_id") < 2 * ScaleUp.Stride)
      .join(base, col("vec_id") - ScaleUp.Stride === col("base_id"))
      .filter(abs(aggregate(zip_with(col("embedding"), col("base_vec"),
        (a, b) => a * b), lit(0.0), (acc, x) => acc + x)) > 0.9)
    assert(twins.count() == 0L)
  }
}
