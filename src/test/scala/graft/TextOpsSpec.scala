package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Semantics tests for the round-4 text/dedup additions: PII redaction
  * (t08), repetition ratio (t09), contamination scan (d11). The oracle
  * gate proves cross-engine equality; these pin the operator semantics
  * themselves (redaction completeness, hand-computed ratios, hit-count
  * bounds) independent of DuckDB.
  */
class TextOpsSpec extends SparkSpec {

  test("t08 redaction scrubs every planted PII token") {
    val out = TextAnalysis.piiRedact(spark, sfDir).cache()
    val n = out.count()
    assert(n > 0)
    // every row planted exactly one email, one phone, one IPv4 …
    assert(out.filter(col("n_emails") === 1 && col("n_phones") === 1 &&
      col("n_ips") === 1).count() == n)
    // … and the redacted text carries none of the three patterns
    assert(out.filter(col("n_residual") =!= 0).count() == 0)
    val sample = out.orderBy(col("doc_id")).select(col("redacted")).head().getString(0)
    assert(sample.contains("[EMAIL]") && sample.contains("[PHONE]") && sample.contains("[IP]"))
    assert(!sample.contains("@example.com"))
    out.unpersist()
  }

  test("t09 repetition ratios match a hand computation") {
    val out = TextAnalysis.repetitionRatio(spark, sfDir).cache()
    // bounds: ratios live in [0, 1)
    assert(out.filter(col("dup_word_ratio") < 0 || col("dup_word_ratio") >= 1).count() == 0)
    assert(out.filter(col("dup_gram_ratio") < 0 || col("dup_gram_ratio") >= 1).count() == 0)
    // spot-check the smallest doc_id against plain Scala collections
    val row = out.orderBy(col("doc_id")).head()
    val docId = row.getLong(0)
    val text = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") === docId).select(col("text")).head().getString(0)
    val words = text.trim.split("\\s+").toSeq
    val grams = words.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSeq
    assert(row.getAs[Int]("n_words") == words.size)
    assert(row.getAs[Int]("n_distinct_words") == words.distinct.size)
    assert(row.getAs[Int]("n_grams") == grams.size)
    assert(row.getAs[Int]("n_distinct_grams") == grams.distinct.size)
    assert(row.getAs[Double]("dup_word_ratio") ==
      1.0 - words.distinct.size.toDouble / words.size)
    out.unpersist()
  }

  test("d11 contamination: bench docs excluded, hit counts bounded and exact") {
    val out = TextAnalysis.contaminationScan(spark, sfDir).cache()
    assert(out.count() > 0)
    // the benchmark slice itself never appears in the output
    assert(out.filter(pmod(col("doc_id"), lit(TextAnalysis.ContaminationBenchMod)) === 0)
      .count() == 0)
    // hits can never exceed the doc's own shingle count
    assert(out.filter(col("n_hit") > col("n_sh")).count() == 0)
    // recompute one doc's hit count via array_intersect against the
    // collected benchmark set (test-only collect; independent path)
    val shingled = TextAnalysis.shingledDocs(spark, sfDir)
    val bench = shingled
      .filter(pmod(col("doc_id"), lit(TextAnalysis.ContaminationBenchMod)) === 0)
      .select(explode(col("sh")).as("s")).distinct()
      .collect().map(_.getString(0)).toSet
    val probe = out.orderBy(col("contamination").desc, col("doc_id")).head()
    val probeSh = shingled.filter(col("doc_id") === probe.getLong(0))
      .select(col("sh")).head().getSeq[String](0)
    assert(probe.getAs[Int]("n_hit") == probeSh.count(bench.contains))
    out.unpersist()
  }

  test("k01 packing conserves docs/tokens and bins are contiguous id ranges") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    val totalTokens = docs
      .select(sum(size(graft.operators.TextAnalysis.wordsOf(col("text")))).cast("long"))
      .head().getLong(0)
    val bins = graft.operators.TextAnalysis.tokenPacking(spark, sfDir)
      .orderBy(col("bin_id")).collect()
    assert(bins.map(_.getAs[Long]("n_docs")).sum == nDocs)
    assert(bins.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
    // bins partition the doc_id order: ranges are adjacent and disjoint
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("last_doc") < b.getAs[Long]("first_doc"))
      case _ =>
    }
    // every bin except possibly the last holds at least a full budget
    // across its docs plus the one that straddles its end
    assert(bins.forall(r => r.getAs[Long]("n_docs") > 0))
  }

  test("t23 normalization strips exactly the planted control/zero-width noise") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.normalizeText(spark, sfDir).cache()
    val n = out.count()
    assert(n > 0)
    // planted: one BEL, one ZWSP, one BOM per row (tabs are whitespace,
    // handled by the collapse pass, not the control class)
    assert(out.filter(col("n_control") === 1 && col("n_zerowidth") === 2).count() == n)
    // normalization can only shrink, and removes at least the 3 planted
    // invisibles plus collapsed runs
    assert(out.filter(col("n_norm") > col("n_raw") - 3).count() == 0)
    out.unpersist()
  }

  test("k02 shards balance doc counts to ±1 and partition the corpus exactly") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val shards = graft.operators.TextAnalysis.shardAssignment(spark, sfDir).cache()
    val counts = shards.select(col("n_docs")).collect().map(_.getLong(0))
    assert(counts.max - counts.min <= 1) // round-robin balance
    assert(counts.sum == docs.count())   // every doc in exactly one shard
    // exact-membership checksum conserves the corpus id sum
    val idSum = docs.select(sum(col("doc_id"))).head().getLong(0)
    assert(shards.select(sum(col("id_checksum"))).head().getLong(0) == idSum)
    // the assignment is a pure function of content, not of input layout
    shards.unpersist()
  }

  test("k03 concat-and-cut: every sequence but the last holds exactly the budget") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sfDir, "documents")
    val totalTokens = docs
      .select(sum(size(graft.operators.TextAnalysis.wordsOf(col("text")))).cast("long"))
      .head().getLong(0)
    val bins = graft.operators.TextAnalysis.packedSequences(spark, sfDir)
      .orderBy(col("bin_id")).collect()
    // exact occupancy: all bins full except possibly the final one
    bins.init.foreach(r => assert(r.getAs[Long]("total_tokens") == 2048L))
    assert(bins.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
    // boundary bookkeeping: a doc crossing out of bin i is not a start in bin i+1
    bins.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_docs") == b.getAs[Long]("n_starts") + a.getAs[Long]("n_crossing"))
      case _ =>
    }
  }

  test("t11 chunks tile each document with stride-48 starts and W-bounded sizes") {
    import org.apache.spark.sql.functions._
    val chunks = graft.operators.TextAnalysis.chunkOverlap(spark, sfDir)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        max(col("start") + col("chunk_tokens")).cast("long").as("covered_to"),
        min(col("start")).cast("long").as("first_start"),
        max(col("chunk_tokens")).cast("int").as("max_chunk"))
      .collect()
    val nTokens = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        size(graft.operators.TextAnalysis.wordsOf(col("text"))).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    chunks.foreach { r =>
      val n = nTokens(r.getLong(0))
      assert(r.getAs[Long]("first_start") == 0L)
      assert(r.getAs[Long]("covered_to") >= n, s"doc ${r.getLong(0)} uncovered tail")
      assert(r.getAs[Int]("max_chunk") <= 64)
      assert(r.getAs[Long]("n_chunks") == (n + 47) / 48)
    }
  }

  test("t14 boilerplate counts equal a direct df-threshold recomputation") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextAnalysis.boilerplateDetect(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("n_sh"), r.getAs[Long]("n_boiler"), r.getAs[Double]("boiler_pct"))).toMap
    assert(out.nonEmpty)
    // independent recomputation from the shingle postings
    val posts = graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
      .select(col("doc_id"), explode(col("sh")).as("s")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val df = posts.groupBy(_._2).view.mapValues(_.length).toMap
    val boiler = df.filter(_._2 >= graft.operators.TextAnalysis.BoilerDf).keySet
    assert(boiler.nonEmpty, "cap marks no shingle as boilerplate — threshold test is vacuous")
    posts.groupBy(_._1).foreach { case (id, sh) =>
      val nb = sh.count(p => boiler(p._2)).toLong
      val (nSh, gotNb, pct) = out(id)
      assert(nSh == sh.length && gotNb == nb, s"doc $id: got ($nSh,$gotNb) expected (${sh.length},$nb)")
      assert(pct == nb.toDouble / sh.length, s"doc $id pct")
    }
  }

  test("t16 mixture weights equalize expected post-sampling mass across sources") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextAnalysis.mixtureWeights(spark, sfDir).collect()
    val n = out.length.toDouble
    val byLang = out.groupBy(_.getAs[String]("lang"))
    assert(byLang.size > 1, "single source — mixing test is vacuous")
    val expectedMass = n / byLang.size
    byLang.foreach { case (lang, rows) =>
      val mass = rows.map(_.getAs[Double]("weight")).sum
      assert(math.abs(mass - expectedMass) < 1e-6 * expectedMass,
        s"$lang mass $mass != $expectedMass")
    }
  }

  test("t12 tf-idf: dense rank 1..5 per doc, scores consistent with tf·ln(N/df)") {
    import org.apache.spark.sql.functions._
    val out = graft.operators.TextAnalysis.tfidf(spark, sfDir).collect()
    val n = Tables.load(spark, sfDir, "documents").count().toDouble
    val perDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(perDoc.nonEmpty)
    perDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getAs[Int]("rk")).sorted.sameElements(1 to rows.length), s"doc $id ranks")
      assert(rows.length <= 5)
    }
    out.foreach { r =>
      val expect = math.floor(
        r.getAs[Int]("tf") * math.log(n / r.getAs[Int]("df")) * 1e6 + 0.5) / 1e6
      assert(r.getAs[Double]("tfidf") == expect, s"score mismatch at $r")
    }
  }

  test("t17 BPE pair counts: vocab pre-aggregation equals per-occurrence counting") {
    val got = TextAnalysis.bpePairCounts(spark, sfDir)
    // recompute WITHOUT the distinct-word trick: explode every word
    // OCCURRENCE, then its character pairs, count directly — the
    // pre-aggregated path must be a pure optimization, not a semantic
    // change
    val words = Tables.load(spark, sfDir, "documents")
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(length(col("word")) >= 2)
    val chars = split(col("word"), "")
    val pairs = zip_with(
      slice(chars, lit(1), size(chars) - 1), slice(chars, lit(2), size(chars) - 1),
      (a, b) => concat_ws(" ", a, b))
    val direct = words.select(explode(pairs).as("pair"))
      .groupBy(col("pair")).agg(count(lit(1)).as("pair_count"))
      .orderBy(col("pair_count").desc, col("pair"))
      .limit(50)
    assertSameRows(got, direct)
  }

  test("t19 BPE merge rounds: frequency weighting and greedy-left overlap") {
    import spark.implicits._
    // round 1: "a b" counts 10 (ab) + 4 (abab, twice per word) = 14
    // round 2: "a a" counts 3 in aaaa (overlapping pairs all count);
    //          merging it greedy-left gives aa|aa — NOT aa|a|a, which a
    //          scan that fails to re-match after a consumed delimiter
    //          would produce
    // round 3: only "ab ab" (from abab) and "aa aa" remain; ab ab wins 2>1
    val words = Seq(("aaaa", 1L), ("ab", 10L), ("abab", 2L)).toDF("word", "freq")
    val got = graft.operators.TextAnalysis.bpeMergesFromWords(words, 3)
      .as[(Int, String, Long)].collect().toSeq
    assert(got == Seq((1, "a b", 14L), (2, "a a", 3L), (3, "ab ab", 2L)), got.toString)
  }
}
