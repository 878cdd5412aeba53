package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.Tables

/** Similarity search over the `embeddings` table (`Array[Float]` column).
  *
  * Cross-engine determinism: float embeddings are quantized to integers
  * (`round(x * 4096)` — exact because scaling by a power of two is exact
  * in both float and double), so dot products and norms are exact integer
  * arithmetic; the final cosine is a division of identical doubles in
  * both engines — bit-identical, no tolerance needed.
  *
  * All array math runs through the codegen'd
  * [[graft.functions.LongArrayDot]] expression — no UDFs, no interpreted
  * higher-order lambdas in the O(n²) hot path.
  *
  * Scale path for 100 TB: the brute-force variants here are the
  * correctness baseline; [[CosineLsh]] (random-hyperplane bucketing)
  * bounds the candidate set so the shuffle is per-bucket rather than a
  * full cross join.
  */
object VectorSearch {
  import graft.functions.LongArrayDot

  /** Integer-quantized embedding: round(x * 4096) as long per element. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast(DoubleType) * 4096).cast(LongType))

  /** Exact integer dot product of two quantized vectors (codegen'd). */
  def idot(a: Column, b: Column): Column = LongArrayDot.dot(a, b)

  /** Squared L2 norm of a quantized vector (exact integer). */
  def inorm2(a: Column): Column = idot(a, a)

  /** Cosine similarity from quantized ints — deterministic double. */
  def qcosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot.cast(DoubleType) / (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType)))

  /** Brute-force cosine top-k: queries = vec_id < 10, k = 5.
    * The query side is tiny → broadcast; the scan side streams once.
    */
  def annBruteForce(spark: SparkSession, dir: String): DataFrame =
    bruteTopK(spark, dir, labelMax = None)

  /** The exact-top-k core, with an optional index-side label predicate
    * — `labelMax = Some(m)` is the ground truth for the FILTERED ANN
    * (v10): the searchable side is restricted exactly as the index is.
    */
  private def bruteTopK(spark: SparkSession, dir: String,
                        labelMax: Option[Int]): DataFrame = {
    graft.functions.LongArrayDot.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"), col("label"))
      .withColumn("n2", inorm2(col("qv")))
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val idx = labelMax.map(m => emb.filter(col("label") < m)).getOrElse(emb)
    val cand = broadcast(q).join(
      idx.select(col("vec_id").as("neighbor_id"), col("qv").as("n_qv"), col("n2").as("n_n2")),
      col("neighbor_id") =!= col("query_id"))
    val sim = qcosine(idot(col("q_qv"), col("n_qv")), col("q_n2"), col("n_n2"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("neighbor_id"))
    cand.select(col("query_id"), col("neighbor_id"), sim.as("sim"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 5)
  }

  /** v12: ANN RECALL REPORT — recall@5 of every approximate method
    * (v02 banded LSH, v04 IVF, v09 PQ re-rank, v10 filtered IVF)
    * against the exact brute-force top-k, as exact hit fractions: the
    * governance artifact an index owner reads before trusting an
    * approximate index, promoted from test-only floors (VectorSpec) to
    * the same oracle gate as everything else. v10 is scored against the
    * FILTERED exact truth (its index never contained the excluded
    * vectors). All counts are exact integers; recall is one division —
    * deterministic in both engines. The oracle composes each method's
    * FULL replay (training included) as subqueries off the shared
    * chain, so the report verifies end-to-end, not against cached
    * Spark results.
    */
  def annRecallReport(spark: SparkSession, dir: String): DataFrame = {
    val exact = annBruteForce(spark, dir).select(col("query_id"), col("neighbor_id"))
    val exactF = bruteTopK(spark, dir, Some(Ivf.FilterMaxLabel))
      .select(col("query_id"), col("neighbor_id"))
    def row(name: String, topk: DataFrame, baseline: DataFrame): DataFrame = {
      val hits = topk.select(col("query_id"), col("neighbor_id"))
        .join(baseline, Seq("query_id", "neighbor_id"), "left_semi")
        .agg(count(lit(1)).as("n_hits"))
      val total = baseline.agg(count(lit(1)).as("n_total"))
      hits.crossJoin(broadcast(total))
        // nullif guard: an empty ground truth (no vectors indexed yet)
        // has no defined recall — NULL, not an ANSI divide-by-zero
        .select(lit(name).as("method"), col("n_hits"), col("n_total"),
          (col("n_hits").cast(DoubleType) / nullif(col("n_total"), lit(0L)))
            .as("recall"))
    }
    row("v02_lsh", CosineLsh.annTopK(spark, dir), exact)
      .unionAll(row("v04_ivf", Ivf.annTopKIvf(spark, dir), exact))
      .unionAll(row("v09_pq", annRerankPq(spark, dir), exact))
      .unionAll(row("v10_ivf_filtered", Ivf.annTopKIvfFiltered(spark, dir), exactF))
      .orderBy(col("method"))
  }

  /** Embedding-cosine near-duplicate pairs (sim >= 0.4), brute force. */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.LongArrayDot.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("n2", inorm2(col("qv")))
    val a = emb.select(col("vec_id").as("id_a"), col("qv").as("qv_a"), col("n2").as("n2_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("qv").as("qv_b"), col("n2").as("n2_b"))
    val sim = qcosine(idot(col("qv_a"), col("qv_b")), col("n2_a"), col("n2_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), sim.as("sim"))
      .filter(col("sim") >= 0.4)
  }

  /** v05: per-label centroid of the quantized embeddings — the group
    * aggregation primitive behind IVF coarse-quantizer training (v04
    * iterates exactly this) and class prototypes. posexplode fans each
    * vector into (label, dim, value) rows; ONE hash aggregate with
    * map-side combine reduces them, so the shuffle carries labels ×
    * dims rows, never vectors × dims. The centroid is re-assembled in
    * dim order; sums stay exact integers (published as a joined string
    * — nested arrays don't hash-compare portably), and the only double
    * published is dim 0's mean, an identical division in both engines.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame = {
    val dims = Tables.load(spark, dir, "embeddings")
      .select(col("label"), posexplode(quantize(col("embedding"))))
      .withColumnRenamed("col", "v")
    dims.groupBy(col("label"), col("pos"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
      .groupBy(col("label"))
      .agg(
        max(col("n")).as("n_vecs"), // every dim sees all of the label's vectors
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("s")))),
            e => e.getField("s").cast(StringType)), ",").as("centroid_sums"),
        max(when(col("pos") === 0, col("s"))).as("dim0_sum"))
      .withColumn("dim0_mean", col("dim0_sum").cast(DoubleType) / col("n_vecs"))
      .orderBy(col("label"))
  }

  /** X: higher-order array-function surface — transform / filter /
    * exists / aggregate / zip_with over the embedding column, the
    * declarative array API for one-off vector math. All arithmetic is
    * integer-exact (via [[quantize]]) so the oracle hash-matches. These
    * lambdas are INTERPRETED by Spark — acceptable off the hot path
    * (and guarded by a repartition since the testdata is one split);
    * the O(n²)/O(n·q) paths above use the codegen'd LongArrayDot
    * instead, which is the point of having both.
    */
  def higherOrderOps(spark: SparkSession, dir: String): DataFrame = {
    val q = quantize(col("embedding"))
    Tables.load(spark, dir, "embeddings")
      .repartition(col("vec_id"))
      .select(col("vec_id"),
        aggregate(q, lit(0L), (acc, x) => acc + x).as("sum_q"),
        size(filter(q, _ > lit(0L))).as("n_pos"),
        exists(q, _ > lit(3500L)).as("has_large"),
        aggregate(zip_with(q, reverse(q), (a, b) => a * b), lit(0L),
          (acc, x) => acc + x).as("dot_rev"))
  }

  /** Coarse candidate depth for the re-rank stage (v07). */
  val RerankCoarseK = 50

  /** Coarse low-precision quantization: round(x·16) — 256× coarser than
    * [[quantize]]'s ×4096, standing in for the int8 codes a 100 TB
    * vector store keeps resident in RAM.
    */
  def coarseQuantize(c: Column): Column =
    transform(c, x => round(x.cast(DoubleType) * 16).cast(LongType))

  /** v07: two-stage retrieval — coarse-quantized scores prune the
    * corpus to [[RerankCoarseK]] candidates per query (total-ordered
    * cut: ties break on neighbor_id), then the EXACT full-precision
    * cosine re-ranks just those candidates. The coarse stage streams
    * the corpus once against broadcast queries; the exact stage costs
    * O(queries × [[RerankCoarseK]]), not O(queries × corpus). This is
    * the memory-hierarchy shape production ANN uses alongside the
    * bucketing variants (v02 LSH, v03 multi-probe, v04 IVF):
    * quantization bounds the RAM-resident index, re-rank restores
    * precision. Recall vs exact top-k is measured in VectorSpec.
    *
    * Zero-norm coarse codes (a vector whose every |x| < 1/32) cannot
    * be cosine-ranked and are excluded from the coarse stage on both
    * sides — replicated in the oracle.
    */
  def annRerank(spark: SparkSession, dir: String): DataFrame = {
    val coarse = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), coarseQuantize(col("embedding")).as("cv"))
      .withColumn("c2", inorm2(col("cv")))
      .filter(col("c2") > 0)
    twoStageRerank(spark, dir, coarse)
  }

  /** v08: two-stage retrieval whose coarse codes are TRUE int8 —
    * symmetric max-abs quantization `round(x·127/max|x|)` ∈ [-127,127],
    * the 1-byte/dim representation a 100 TB vector store keeps
    * RAM-resident (8× smaller than float32; v07's ×16 codes stay
    * unbounded longs). Cosine is invariant to the per-vector scale, so
    * the codes rank directly with no dequantize step, and with 127
    * levels against ×16's ~5 on these |x|≤0.3 embeddings the coarse
    * ordering is strictly finer — VectorSpec asserts recall ≥ v07's at
    * the same [[RerankCoarseK]] budget. Exact stage is identical.
    */
  def annRerankInt8(spark: SparkSession, dir: String): DataFrame = {
    // codegen'd quantizer (round 17): the HOF formulation —
    // array_max(transform(abs)) + transform(round) — ran three
    // interpreted lambda passes per vector and was v08's entire gap
    // over the structurally identical v07 (2.6 s vs 0.7 s cold). The
    // old `maxabs > 0` pre-filter is subsumed by `c2 > 0`: an all-zero
    // vector quantizes to all zeros, whose norm is 0 (see
    // Int8Quantize's exact-parity contract).
    graft.functions.Int8Quantize.register(spark)
    val coarse = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        graft.functions.Int8Quantize.of(col("embedding")).as("cv"))
      .withColumn("c2", inorm2(col("cv")))
      .filter(col("c2") > 0)
    twoStageRerank(spark, dir, coarse)
  }

  /** PQ geometry: 64 dims → [[PqSubspaces]] subspaces of [[PqSubDim]],
    * [[PqK]] centroids each — codes are 8 × 4 bits = 4 bytes/vector,
    * 64× smaller than float32.
    */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqK = 16

  /** v09: PRODUCT QUANTIZATION two-stage ANN — the real codebook path
    * beyond v08's scalar int8: each vector's m-th 8-dim subvector is
    * encoded as the id of its nearest trained subspace centroid
    * ([[Ivf]]'s deterministic Lloyd machinery per subspace: integer
    * arithmetic, lowest-vec_id seeds, argmin ties on cid), so storage
    * is 8 nibbles/vector. Coarse scoring is symmetric-distance PQ: the
    * cosine of the RECONSTRUCTIONS (concatenated code centroids), which
    * is exactly what the shared two-stage skeleton scores when handed
    * (vec_id, reconstruction, ‖recon‖²); the exact ×4096 re-rank then
    * restores precision on the 50-candidate short list. The oracle
    * replays the entire pipeline — 8 subspace trainings, encoding,
    * reconstruction, both stages — so the gate verifies the trained
    * codebooks, not just the final cosine.
    *
    * At 100 TB: codebooks are 8×16 tiny rows (broadcast), encoding is
    * one broadcast-join pass per subspace, and the RAM-resident index
    * is 4 bytes/vector + the LUT trick at query time; training runs on
    * a sample exactly as v06 does for IVF.
    */
  def annRerankPq(spark: SparkSession, dir: String): DataFrame = {
    val emb = CosineLsh.quantized(spark, dir)
    val coarse = graft.SessionCache.memo(spark, s"pqRecon:$dir") {
      // ALL subspaces as one keyed frame (m, vec_id, qv): training and
      // encoding run every subspace in one pass ([[Ivf.centroidsKeyed]])
      // — the per-subspace sequential formulation cost 16 Lloyd job
      // chains (~11 s at sf0.1, pure fixed overhead); keyed it is 2.
      val subs = emb.select(col("vec_id"), posexplode(
          array((0 until PqSubspaces).map(m =>
            slice(col("qv"), m * PqSubDim + 1, PqSubDim)): _*))
        .as(Seq("m", "qv")))
      // 8×16 rows; checkpoint cuts the Lloyd lineage out of the encode
      val codebooks = graft.SessionCache.memo(spark, s"pqCodebooks:$dir") {
        Ivf.centroidsKeyed(subs, col("vec_id") < PqK).localCheckpoint()
      }
      // encode + reconstruct: nearest code per (vec_id, m), regroup the
      // code centroids in subspace order into one 64-dim reconstruction
      Ivf.assignKeyed(subs, codebooks)
        .select(col("m"), col("vec_id"), col("cid"))
        .join(broadcast(codebooks), Seq("m", "cid"))
        .groupBy(col("vec_id"))
        .agg(flatten(transform(
          array_sort(collect_list(struct(col("m"), col("cv")))),
          s => s.getField("cv"))).as("cv"))
        .withColumn("c2", inorm2(col("cv")))
        .filter(col("c2") > 0)
        .persist()
    }
    twoStageRerank(spark, dir, coarse)
  }

  /** Shared two-stage skeleton: `coarse` supplies (vec_id, cv, c2)
    * low-precision codes for the candidate cut; the exact stage always
    * re-ranks the short list with the ×4096 full-precision codes.
    */
  private def twoStageRerank(spark: SparkSession, dir: String, coarse: DataFrame): DataFrame = {
    graft.functions.LongArrayDot.register(spark)
    val emb = Tables.load(spark, dir, "embeddings")
    val fine = emb.select(col("vec_id"), quantize(col("embedding")).as("qv"))
      .withColumn("n2", inorm2(col("qv")))
    val cq = coarse.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("cv").as("q_cv"), col("c2").as("q_c2"))
    val coarseSim = qcosine(idot(col("q_cv"), col("cv")), col("q_c2"), col("c2"))
    val wCoarse = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse_sim").desc, col("neighbor_id"))
    val cand = broadcast(cq)
      .join(coarse.select(col("vec_id").as("neighbor_id"), col("cv"), col("c2")),
        col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), coarseSim.as("coarse_sim"))
      .withColumn("crk", row_number().over(wCoarse))
      .filter(col("crk") <= RerankCoarseK)
      .select(col("query_id"), col("neighbor_id"))
    val fq = fine.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("n2").as("q_n2"))
    val exactSim = qcosine(idot(col("q_qv"), col("qv")), col("q_n2"), col("n2"))
    val wExact = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id"))
    cand
      .join(fine.withColumnRenamed("vec_id", "neighbor_id"), "neighbor_id")
      .join(broadcast(fq), "query_id")
      .select(col("query_id"), col("neighbor_id"), exactSim.as("sim"))
      .withColumn("rank", row_number().over(wExact))
      .filter(col("rank") <= 5)
      .select(col("query_id"), col("neighbor_id"), col("sim"), col("rank"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v01_ann_bruteforce_topk" -> (annBruteForce _),
    "v07_ann_rerank_topk" -> (annRerank _),
    "v08_ann_rerank_int8" -> (annRerankInt8 _),
    "v09_ann_rerank_pq" -> (annRerankPq _),
    "v05_label_centroids" -> (labelCentroids _),
    "ml02_centroid_confusion" -> (centroidConfusion _),
    "v12_ann_recall_report" -> (annRecallReport _),
    "x18_higher_order" -> (higherOrderOps _),
    "d03_dedup_embedding" -> (dedupEmbedding _))

  // ML: nearest-centroid (Rocchio) classifier EVAL — train one
  // integer-mean centroid per label (one posexplode + hash-agg, the v05
  // shape with Ivf's truncating-mean arithmetic), classify every
  // vector to its nearest centroid by exact integer squared distance
  // (cv·cv − 2·qv·cv rank, ties on label), and publish the confusion
  // matrix — the resubstitution eval a labeling pipeline reads to see
  // which classes collapse into each other. All arithmetic integer, so
  // the whole train→classify→evaluate loop hash-gates exactly; the
  // oracle replays centroid training and the argmin. Scale: centroids
  // are label-cardinality (broadcast), classification is one pass, the
  // matrix is |labels|² rows.
  def centroidConfusion(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.LongArrayDot.register(spark)
    val labeled = Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qv"))
      .repartition(col("vec_id"))
    val cents = labeled
      .select(col("label").as("pred"), posexplode(col("qv")).as(Seq("pos", "v")))
      .groupBy(col("pred"), col("pos"))
      .agg(expr("sum(v) div count(1)").as("m"))
      .groupBy(col("pred"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s.getField("m")).as("cv"))
    val cost = idot(col("cv"), col("cv")) - lit(2L) * idot(col("qv"), col("cv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id")).orderBy(col("cost"), col("pred"))
    labeled.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("label"), col("pred"), cost.as("cost"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("label"), col("pred"))
      .agg(count(lit(1)).as("n_vecs"))
      .orderBy(col("label"), col("pred"))
  }

  private val qexpr = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 4096) AS BIGINT))"
  private val cexpr = "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 16) AS BIGINT))"

  /** Exact brute-force top-k with an index-side predicate — "TRUE" is
    * v01's oracle; "d.label < m" is the filtered ground truth v12
    * scores v10 against.
    */
  private def bruteOracleSql(indexFilter: String): String =
    s"""WITH e AS (SELECT vec_id, $qexpr AS qv, label FROM embeddings),
       |n AS (SELECT vec_id, qv, label,
       |   CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS n2 FROM e),
       |p AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |   CAST(CAST(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*d.qv[i])) AS BIGINT) AS DOUBLE)
       |     / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(d.n2 AS DOUBLE))) AS sim
       | FROM n q JOIN n d ON q.vec_id < 10 AND d.vec_id <> q.vec_id AND ($indexFilter)),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank FROM p)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5""".stripMargin

  /** v12 oracle: each method's FULL oracle replay (k-means / PQ
    * training included) nested as a subquery, intersected with the
    * exact baselines — the whole report derived from raw parquet in one
    * statement. Baselines are MATERIALIZED (referenced per method).
    */
  private def v12OracleSql: String = {
    def sub(name: String, sql: String): String =
      s"$name AS (SELECT query_id, neighbor_id FROM (\n$sql\n) t)"
    def scored(method: String, m: String, baseline: String): String =
      s"""SELECT '$method' AS method,
         | (SELECT COUNT(*) FROM $m JOIN $baseline USING (query_id, neighbor_id)) AS n_hits,
         | (SELECT COUNT(*) FROM $baseline) AS n_total""".stripMargin
    s"""WITH exact AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |${bruteOracleSql("TRUE")}
       |) t),
       |exactf AS MATERIALIZED (SELECT query_id, neighbor_id FROM (
       |${bruteOracleSql(s"d.label < ${Ivf.FilterMaxLabel}")}
       |) t),
       |${sub("m02", CosineLsh.oracles("v02_ann_lsh_topk"))},
       |${sub("m04", Ivf.oracles("v04_ann_ivf_topk"))},
       |${sub("m09", pqOracleSql)},
       |${sub("m10", Ivf.oracles("v10_ann_filtered"))}
       |SELECT method, n_hits, n_total,
       |  CAST(n_hits AS DOUBLE) / n_total AS recall
       |FROM (
       |${scored("v02_lsh", "m02", "exact")}
       |UNION ALL
       |${scored("v04_ivf", "m04", "exact")}
       |UNION ALL
       |${scored("v09_pq", "m09", "exact")}
       |UNION ALL
       |${scored("v10_ivf_filtered", "m10", "exactf")}
       |) ORDER BY method""".stripMargin
  }

  private def pqDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> $a[i]*$b[i])) AS BIGINT)"

  /** One Lloyd iteration for subspace `m` (mirrors Ivf.iterSql with a
    * per-subspace CTE prefix).
    */
  private def pqIterSql(m: Int, i: Int): String =
    s"""m${m}a$i AS (SELECT vec_id, qv, cid FROM (
       |  SELECT s$m.vec_id, s$m.qv, c.cid,
       |    ROW_NUMBER() OVER (PARTITION BY s$m.vec_id ORDER BY
       |      ${pqDot("c.cv", "c.cv")} - 2 * ${pqDot(s"s$m.qv", "c.cv")}, c.cid) AS rn
       |  FROM s$m, m${m}c${i - 1} c) WHERE rn = 1),
       |m${m}c$i AS (SELECT cid, list(m ORDER BY pos) AS cv FROM (
       |  SELECT cid, pos, CAST(SUM(v) AS BIGINT) // COUNT(*) AS m FROM (
       |    SELECT cid, i AS pos, qv[i] AS v FROM m${m}a$i, unnest(range(1, len(qv)+1)) AS u(i))
       |  GROUP BY cid, pos) GROUP BY cid)""".stripMargin

  /** Full PQ replay: per-subspace training + encoding + reconstruction,
    * then the shared two-stage coarse-cut/exact-re-rank SQL.
    */
  private def pqOracleSql: String = {
    val iters = Ivf.KMeansIters
    val perSub = (0 until PqSubspaces).map { m =>
      val lo = m * PqSubDim + 1
      val hi = (m + 1) * PqSubDim
      val cFinal = s"m${m}c$iters"
      s"""s$m AS (SELECT vec_id, qv[$lo:$hi] AS qv FROM e),
         |m${m}c0 AS (SELECT CAST(vec_id AS INTEGER) AS cid, qv AS cv FROM s$m WHERE vec_id < $PqK),
         |${(1 to iters).map(pqIterSql(m, _)).mkString(",\n")},
         |m${m}e AS (SELECT vec_id, cid FROM (
         |  SELECT s$m.vec_id, c.cid,
         |    ROW_NUMBER() OVER (PARTITION BY s$m.vec_id ORDER BY
         |      ${pqDot("c.cv", "c.cv")} - 2 * ${pqDot(s"s$m.qv", "c.cv")}, c.cid) AS rn
         |  FROM s$m, $cFinal c) WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    val reconJoins = (0 until PqSubspaces).map { m =>
      val e = s"m${m}e"
      val c = s"m${m}c$iters"
      if (m == 0) s"$e JOIN $c ON $c.cid = $e.cid"
      else s"JOIN $e ON $e.vec_id = m0e.vec_id JOIN $c ON $c.cid = $e.cid"
    }.mkString("\n  ")
    val reconCv = (0 until PqSubspaces).map(m => s"m${m}c$iters.cv").mkString(" || ")
    s"""WITH e AS (SELECT vec_id, $qexpr AS qv FROM embeddings),
       |n AS (SELECT vec_id, qv, ${pqDot("qv", "qv")} AS n2 FROM e),
       |$perSub,
       |recon AS (SELECT m0e.vec_id, $reconCv AS cv FROM $reconJoins),
       |c AS (SELECT vec_id, cv, ${pqDot("cv", "cv")} AS c2 FROM recon
       |      WHERE ${pqDot("cv", "cv")} > 0),
       |p AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |   CAST(${pqDot("q.cv", "d.cv")} AS DOUBLE)
       |     / (sqrt(CAST(q.c2 AS DOUBLE)) * sqrt(CAST(d.c2 AS DOUBLE))) AS coarse_sim
       | FROM c q JOIN c d ON q.vec_id < 10 AND d.vec_id <> q.vec_id),
       |k AS (SELECT query_id, neighbor_id FROM
       |   (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY coarse_sim DESC, neighbor_id) AS crk FROM p)
       |   WHERE crk <= $RerankCoarseK),
       |x AS (SELECT k.query_id, k.neighbor_id,
       |   CAST(${pqDot("q.qv", "d.qv")} AS DOUBLE)
       |     / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(d.n2 AS DOUBLE))) AS sim
       | FROM k JOIN n q ON q.vec_id = k.query_id JOIN n d ON d.vec_id = k.neighbor_id),
       |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank FROM x)
       |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    // index-based list math — different formulation, same integer
    // semantics (DuckDB list indexing is O(1); Spark's zip_with avoids
    // the per-element re-evaluation its element_at form would cost)
    "x18_higher_order" ->
      s"""WITH e AS (SELECT vec_id, $qexpr AS q FROM embeddings)
         |SELECT vec_id,
         | CAST(list_sum(q) AS BIGINT) AS sum_q,
         | CAST(len(list_filter(q, x -> x > 0)) AS INTEGER) AS n_pos,
         | len(list_filter(q, x -> x > 3500)) > 0 AS has_large,
         | CAST(list_sum(list_transform(range(1, len(q)+1),
         |   i -> q[i] * q[len(q)-i+1])) AS BIGINT) AS dot_rev
         |FROM e""".stripMargin,
    // centroid training replay (truncating integer means) + the same
    // integer argmin and confusion aggregation
    "ml02_centroid_confusion" ->
      s"""WITH e AS (SELECT vec_id, label, $qexpr AS qv FROM embeddings),
         |d AS (SELECT label AS pred, i AS pos, qv[i] AS v
         |      FROM e, unnest(range(1, len(qv)+1)) AS u(i)),
         |c AS (SELECT pred, list(m ORDER BY pos) AS cv FROM (
         |      SELECT pred, pos, CAST(SUM(v) AS BIGINT) // COUNT(*) AS m
         |      FROM d GROUP BY 1, 2) GROUP BY pred),
         |a AS (SELECT vec_id, label, pred FROM (
         |  SELECT e.vec_id, e.label, c.pred,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |      CAST(list_sum(list_transform(range(1, len(c.cv)+1), i -> c.cv[i]*c.cv[i])) AS BIGINT)
         |      - 2 * CAST(list_sum(list_transform(range(1, len(c.cv)+1), i -> e.qv[i]*c.cv[i])) AS BIGINT),
         |      c.pred) AS rn
         |  FROM e, c) WHERE rn = 1)
         |SELECT label, pred, COUNT(*) AS n_vecs
         |FROM a GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "v05_label_centroids" ->
      s"""WITH e AS (SELECT label, $qexpr AS qv FROM embeddings),
         |d AS (SELECT label, i-1 AS pos, qv[i] AS v
         |      FROM e, unnest(range(1, len(qv)+1)) AS u(i)),
         |g AS (SELECT label, pos, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
         |      FROM d GROUP BY 1, 2)
         |SELECT label, CAST(MAX(n) AS BIGINT) AS n_vecs,
         | string_agg(CAST(s AS VARCHAR), ',' ORDER BY pos) AS centroid_sums,
         | CAST(MAX(CASE WHEN pos = 0 THEN s END) AS BIGINT) AS dim0_sum,
         | CAST(MAX(CASE WHEN pos = 0 THEN s END) AS DOUBLE) / MAX(n) AS dim0_mean
         |FROM g GROUP BY label ORDER BY label""".stripMargin,
    "v01_ann_bruteforce_topk" -> bruteOracleSql("TRUE"),
    // both stages replicated: the coarse cut (top-RerankCoarseK by
    // ×16-quantized cosine, ties on neighbor_id) and the exact re-rank
    "v07_ann_rerank_topk" ->
      s"""WITH e AS (SELECT vec_id, $qexpr AS qv, $cexpr AS cv FROM embeddings),
         |n AS (SELECT vec_id, qv, cv,
         |   CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS n2,
         |   CAST(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i])) AS BIGINT) AS c2
         | FROM e),
         |c AS (SELECT * FROM n WHERE c2 > 0),
         |p AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |   CAST(CAST(list_sum(list_transform(range(1, len(q.cv)+1), i -> q.cv[i]*d.cv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(q.c2 AS DOUBLE)) * sqrt(CAST(d.c2 AS DOUBLE))) AS coarse_sim
         | FROM c q JOIN c d ON q.vec_id < 10 AND d.vec_id <> q.vec_id),
         |k AS (SELECT query_id, neighbor_id FROM
         |   (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY coarse_sim DESC, neighbor_id) AS crk FROM p)
         |   WHERE crk <= $RerankCoarseK),
         |x AS (SELECT k.query_id, k.neighbor_id,
         |   CAST(CAST(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*d.qv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(d.n2 AS DOUBLE))) AS sim
         | FROM k JOIN n q ON q.vec_id = k.query_id JOIN n d ON d.vec_id = k.neighbor_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank FROM x)
         |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    // the ENTIRE PQ pipeline replayed: 8 subspace k-means trainings,
    // encoding, reconstruction, then the shared two-stage SQL
    "v09_ann_rerank_pq" -> pqOracleSql,
    "v12_ann_recall_report" -> v12OracleSql,
    // int8 encode replayed exactly: max-abs scale, round(x·127/maxabs),
    // then the same coarse-cut + exact-re-rank pipeline as v07's oracle
    "v08_ann_rerank_int8" ->
      s"""WITH e AS (SELECT vec_id, $qexpr AS qv,
         |   list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs,
         |   embedding FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |   CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS n2,
         |   maxabs, embedding FROM e),
         |c0 AS (SELECT vec_id, list_transform(embedding,
         |     x -> CAST(round(CAST(x AS DOUBLE) * 127 / maxabs) AS BIGINT)) AS cv
         | FROM n WHERE maxabs > 0),
         |c AS (SELECT vec_id, cv,
         |   CAST(list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i])) AS BIGINT) AS c2
         | FROM c0 WHERE list_sum(list_transform(range(1, len(cv)+1), i -> cv[i]*cv[i])) > 0),
         |p AS (SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |   CAST(CAST(list_sum(list_transform(range(1, len(q.cv)+1), i -> q.cv[i]*d.cv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(q.c2 AS DOUBLE)) * sqrt(CAST(d.c2 AS DOUBLE))) AS coarse_sim
         | FROM c q JOIN c d ON q.vec_id < 10 AND d.vec_id <> q.vec_id),
         |k AS (SELECT query_id, neighbor_id FROM
         |   (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY coarse_sim DESC, neighbor_id) AS crk FROM p)
         |   WHERE crk <= $RerankCoarseK),
         |x AS (SELECT k.query_id, k.neighbor_id,
         |   CAST(CAST(list_sum(list_transform(range(1, len(q.qv)+1), i -> q.qv[i]*d.qv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(q.n2 AS DOUBLE)) * sqrt(CAST(d.n2 AS DOUBLE))) AS sim
         | FROM k JOIN n q ON q.vec_id = k.query_id JOIN n d ON d.vec_id = k.neighbor_id),
         |r AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS INTEGER) AS rank FROM x)
         |SELECT query_id, neighbor_id, sim, rank FROM r WHERE rank <= 5""".stripMargin,
    "d03_dedup_embedding" ->
      s"""WITH e AS (SELECT vec_id, $qexpr AS qv FROM embeddings),
         |n AS (SELECT vec_id, qv,
         |   CAST(list_sum(list_transform(range(1, len(qv)+1), i -> qv[i]*qv[i])) AS BIGINT) AS n2 FROM e)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |   CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) AS sim
         |FROM n a JOIN n b ON a.vec_id < b.vec_id
         |WHERE CAST(CAST(list_sum(list_transform(range(1, len(a.qv)+1), i -> a.qv[i]*b.qv[i])) AS BIGINT) AS DOUBLE)
         |     / (sqrt(CAST(a.n2 AS DOUBLE)) * sqrt(CAST(b.n2 AS DOUBLE))) >= 0.4""".stripMargin)
}
