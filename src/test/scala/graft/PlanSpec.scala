package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import graft.operators.Relational

/** Physical-plan assertions: the scale behaviors (pruning, pushdown,
  * broadcast) must actually appear in the executed plans, not just in
  * comments.
  */
class PlanSpec extends SparkSpec {

  /** All parquet scans, recursing through AQE wrappers/query stages. */
  private def allScans(p: SparkPlan): Seq[FileSourceScanExec] = p.collect {
    case f: FileSourceScanExec => Seq(f)
    case a: AdaptiveSparkPlanExec => allScans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allScans(q.plan)
  }.flatten

  private def firstScan(df: DataFrame): FileSourceScanExec =
    allScans(df.queryExecution.executedPlan).head

  test("partitioned scan prunes to the matching o_year directory") {
    val df = Relational.partitionedScan(spark, sfDir)
    df.collect() // force the write + read
    val scan = firstScan(df)
    val parts = scan.metadata.getOrElse("PartitionFilters", "")
    assert(parts.contains("o_year"), s"no partition filter: $parts")
    // pruned result equals a source-level year filter
    val expected = Tables.load(spark, sfDir, "orders")
      .filter(year(col("o_orderdate")) === 1995).count()
    assert(df.agg(sum(col("n_orders"))).head().getLong(0) == expected)
  }

  test("filter + projection push down to the parquet scan") {
    val df = Relational.filterProject(spark, sfDir)
    val scan = firstScan(df)
    assert(scan.metadata("PushedFilters").contains("IsNotNull(o_orderstatus)"))
    val read = scan.metadata("ReadSchema")
    assert(!read.contains("o_orderdate") && !read.contains("o_orderpriority"),
      s"scan reads pruned columns: $read")
  }

  test("small dims are broadcast in the star join (q05)") {
    val plan = Relational.localSupplierVolume(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("d02 plan contains no cartesian/nested-loop join") {
    val plan = graft.operators.TextAnalysis.ngramJaccard(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("d04/d05 candidate generation is equi-join only") {
    // d04 via the raw candidate pipeline: the memoized nearDupPairs is
    // lineage-cut (localCheckpoint), so its plan is just an RDD scan and
    // would pass this assertion vacuously
    for (df <- Seq(
        graft.operators.MinHash.candidatePairs(
          graft.operators.TextAnalysis.shingledDocs(spark, sfDir)
            .select(org.apache.spark.sql.functions.col("doc_id"),
              org.apache.spark.sql.functions.col("sh"))),
        graft.operators.CosineLsh.nearDupPairs(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("v10 filtered ANN pushes the label predicate into the parquet scan") {
    // assert on the scans' PushedFilters metadata mentioning `label`,
    // not the literal "LessThan(label,5)" rendering — the filter
    // toString is Spark-version/datasource-format dependent and a
    // version bump must not fail the test without a behavior change
    val df = graft.operators.Ivf.annTopKIvfFiltered(spark, sfDir)
    val pushed = allScans(df.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PushedFilters", ""))
    assert(pushed.exists(_.contains("label")),
      s"no scan pushes a label predicate: $pushed")
  }

  /** All plan nodes, recursing through AQE wrappers/query stages. */
  private def allNodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => allNodes(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => allNodes(q.plan)
    case n => Seq(n)
  }.flatten

  test("c01 composed pipeline reads documents exactly once across all stages") {
    val df = graft.operators.Curation.curatedPackedBins(spark, sfDir)
    df.collect()
    // every stage consumes the persisted feature base, so the composed
    // plan itself must contain NO documents file scan — its leaves are
    // InMemoryTableScans and checkpointed RDDs
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans == 0, s"$docScans documents scans in the composed plan")
    // ... and across ALL cached stage frames (transitively — stage
    // caches nest the base cache), the corpus file scan appears exactly
    // once (the base build) — the bound that rules out a per-stage
    // re-scan explosion at 100 TB
    def cachedPlans(p: SparkPlan): Seq[SparkPlan] = {
      val direct = allNodes(p).collect {
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          s.relation.cachedPlan
      }
      direct ++ direct.flatMap(cachedPlans)
    }
    val cached = cachedPlans(df.queryExecution.executedPlan).distinct
    assert(cached.nonEmpty, "no InMemoryTableScan — stages are not sharing the base")
    val cachedDocScans = cached.flatMap(allScans)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(cachedDocScans == 1,
      s"$cachedDocScans documents scans across cached stage frames")
  }

  test("c03 incremental funnel never re-scans the documents file") {
    // both days' stages consume the shared persisted feature base;
    // the funnel plan's leaves must be cached/checkpointed frames only
    val df = graft.operators.Curation.incrementalCurationFunnel(spark, sfDir)
    df.collect()
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans == 0, s"$docScans documents scans in the incremental funnel plan")
  }

  test("c04 training shards ride the cached curation lineage, not a corpus re-scan") {
    val df = graft.operators.Curation.trainingShards(spark, sfDir)
    df.collect()
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans == 0, s"$docScans documents scans in the shard-export plan")
  }

  test("dq04 FK audit scans each fact table once, joins broadcast-only") {
    // the naive form (one anti-join + one count per edge) pays two fact
    // scans per edge — 6× lineitem; the grouped form must scan each
    // fact exactly once (facts with several edges: lineitem 3, nothing
    // else shares a scan budget) and resolve every edge as a broadcast
    // join of the dim key set
    val df = Relational.fkIntegrityReport(spark, sfDir)
    df.collect()
    val scans = allScans(df.queryExecution.executedPlan)
    def tableScans(t: String) =
      scans.count(_.metadata.getOrElse("Location", "").contains(t))
    assert(tableScans("lineitem") == 1,
      s"${tableScans("lineitem")} lineitem scans — the 3 lineitem edges must share one pass")
    assert(tableScans("events") == 1, s"${tableScans("events")} events scans")
    // orders: once as a fact (o_custkey edge) + once as l_orderkey's dim
    assert(tableScans("orders") == 2, s"${tableScans("orders")} orders scans")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("dq01 quality report folds scalar checks + FK orphans into one lineitem pass") {
    val df = Relational.qualityReport(spark, sfDir)
    df.collect()
    val liScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("lineitem"))
    // one combined scalar/orphan pass + the irreducible dup-key groupBy
    assert(liScans == 2, s"$liScans lineitem scans — expected the two-pass shape")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("dq05 drift report tokenizes the corpus at most twice") {
    // the per-branch form paid 6 documents scans (4 re-tokenizing);
    // the two-pass form is one stats scan + one vocab scan
    val df = graft.operators.TextAnalysis.driftReport(spark, sfDir)
    df.collect()
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans == 2, s"$docScans documents scans — expected the two-pass shape")
  }

  test("k06 temperature mixture scans the corpus at most twice") {
    // quota table = one scan (window totals, localCheckpoint'd for its
    // two consumers); the ranked sample = the second
    val df = graft.operators.TextAnalysis.temperatureMixture(spark, sfDir)
    df.collect()
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans <= 2, s"$docScans documents scans — quota subtree is re-executing")
  }

  test("s22 z-order comparison is one grouping-sets pass over the fact") {
    // bounds pass + ONE Expand pass for z-extents, linear-extents and
    // the in-box scalars; the three-consumer form re-executed the
    // tagged subtree per reference (6 fact scans)
    val df = Relational.zorderClustering(spark, sfDir)
    df.collect()
    val ordersScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("orders"))
    assert(ordersScans == 2, s"$ordersScans orders scans — expected bounds + grouping-sets")
    assert(df.queryExecution.executedPlan.toString().contains("Expand"))
  }

  test("t18 length mixture tokenizes the corpus at most twice") {
    val df = graft.operators.TextAnalysis.lengthMixtureReport(spark, sfDir)
    df.collect()
    val docScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("documents"))
    assert(docScans <= 2, s"$docScans documents scans — histogram subtree is re-executing")
  }

  test("ml03 elbow: explode fan-out + checkpointed Lloyd keep the final plan to one corpus scan") {
    // un-checkpointed, iteration N nested iteration N-1's whole plan
    // (21 embeddings scans across the sweep); the per-iteration
    // localCheckpoint + the explode(Ks) fan-out leave the final plan
    // scanning the corpus once (training scans ran in their own jobs)
    val df = graft.operators.Ivf.kmeansElbow(spark, sfDir)
    df.collect()
    val embScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("embeddings"))
    assert(embScans <= 2, s"$embScans embeddings scans — Lloyd lineage is nesting again")
  }

  test("g04 k-core peel round: semi joins only, no cartesian, no window") {
    // one peel round on a tiny in-memory edge list — the shape every
    // round of the bounded peel executes at any scale
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("s1", "s2")
    val deg = edges.select(col("s1").as("v"))
      .unionAll(edges.select(col("s2").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("d"))
      .filter(col("d") >= 2).select(col("v"))
    val kept = edges
      .join(deg.select(col("v").as("s1")), Seq("s1"), "left_semi")
      .join(deg.select(col("v").as("s2")), Seq("s2"), "left_semi")
    val plan = kept.queryExecution.executedPlan.toString()
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("Window"), plan)
  }

  test("v11 stored-index probe prunes to the probed cid partitions") {
    // the claim in Ivf.vectorStore's scaladoc: the index is
    // partitionBy(cid), so the probe join must reach the stored table
    // as directory-level partition pruning, not a full index scan
    val df = graft.operators.Ivf.annTopKIvfStored(spark, sfDir)
    df.collect() // force the store build + the runtime filter
    val idxScans = allScans(df.queryExecution.executedPlan)
      .filter(_.metadata.getOrElse("Location", "").contains("ivf_index"))
    assert(idxScans.nonEmpty, "stored index table not scanned")
    val parts = idxScans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(parts.contains("cid"),
      s"index scan carries no cid partition filter: $parts")
    assert(parts.contains("dynamicpruning"),
      s"cid filter is not a runtime (probe-derived) pruning filter: $parts")
  }

  test("d21 semantic dedup pair generation is a hash/merge join on cid, no cartesian") {
    // the centroid ASSIGNMENT crossJoin (16 broadcast rows) is the
    // deliberate bounded fan-out every IVF plan carries; the vector×
    // vector candidate join must never be an unbounded product
    val plan = graft.operators.Ivf.semanticClusterDedup(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("cid"), plan)
    val pairJoinIsHashed = plan.contains("SortMergeJoin") ||
      Seq("BroadcastHashJoin", "ShuffledHashJoin").exists(plan.contains)
    assert(pairJoinIsHashed, s"cid pair join not a hash/merge join:\n$plan")
  }

  test("d32/k07 ride the d21 assignment: no cartesian beyond the broadcast fan-out, k07 windows stay per-cell") {
    // d32's only additions over d21 are a filter + hash-agg + left join
    val d32 = graft.operators.Ivf.semanticContamination(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(!d32.contains("CartesianProduct"), d32)
    // k07's rank windows must be partitioned by cid — a global
    // (unpartitioned) window would serialize the corpus on one task
    val k07plan = graft.operators.Ivf.clusterBalancedSample(spark, sfDir)
      .queryExecution.executedPlan
    val windows = k07plan.toString().linesIterator
      .filter(_.contains("Window")).toSeq
    assert(windows.nonEmpty, "expected a rank window in the k07 plan")
    assert(windows.forall(_.contains("cid")),
      s"unpartitioned window in k07:\n${windows.mkString("\n")}")
    assert(!k07plan.toString().contains("CartesianProduct"))
  }

  test("d08/d09 candidate generation stays equi-join (no cartesian)") {
    for (df <- Seq(
        graft.operators.TextAnalysis.ngramJaccardCapped(spark, sfDir),
        graft.operators.TextAnalysis.simhashNearDup(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("v03 broadcasts only the filtered probe vectors, not the table") {
    val df = graft.operators.CosineLsh.annTopKMultiProbe(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    // the vec_id < 10 probe filter must be pushed into a scan feeding
    // the broadcast side (the full-table broadcast was a round-2 bug);
    // require the column AND the bound so a pushed IsNotNull(vec_id)
    // can't satisfy this, without pinning the exact filter rendering
    val probeScan = allScans(df.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PushedFilters", ""))
      .exists(s => s.contains("vec_id") && s.contains("10"))
    assert(probeScan, "no scan with the probe filter pushed down")
  }

  test("a11 cube is a single Expand pass (one aggregate exchange)") {
    val plan = Relational.cubeCounts(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("Expand"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("s15 fact scan carries a dynamic (runtime) partition pruning filter") {
    val df = Relational.dynamicPruning(spark, sfDir)
    df.collect() // force the write + the runtime subquery
    val parts = allScans(df.queryExecution.executedPlan)
      .map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(parts.contains("dynamicpruning"), s"no dynamic pruning filter: $parts")
  }

  test("p14 partitioned-star Q1 prunes the travelers fact via DPP") {
    val df = graft.pipeline.PipelineQueries.partitionedQ1(spark)
    df.collect() // force the partitioned write + the runtime subquery
    val scans = allScans(df.queryExecution.executedPlan)
    val factParts = scans.filter(_.metadata.getOrElse("Location", "").contains("graft_star_part"))
      .map(_.metadata.getOrElse("PartitionFilters", "")).mkString
    assert(factParts.contains("dynamicpruning"),
      s"partitioned travelers scan carries no dynamic pruning filter: $factParts")
  }

  test("bucketed aggregation runs with zero shuffle exchanges") {
    val df = Relational.bucketedAgg(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("s26 co-located bucketed join: sort-merge with zero hash exchanges") {
    val df = Relational.bucketedJoinInner(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("SortMergeJoin"), plan)
    // both join inputs AND the downstream agg ride the bucket layout
    assert(!plan.contains("Exchange hashpartitioning"), plan)
  }

  test("LongArrayDot participates in whole-stage codegen") {
    // quantize (an interpreted higher-order transform) must sit in a
    // SEPARATE projection; over materialized arrays — the hot post-join
    // shape in d03/d05 — the dot product codegens
    graft.functions.LongArrayDot.register(spark)
    val df = spark.range(10)
      .select(array(col("id"), col("id") + 1).as("a"),
        array(col("id") * 2, lit(3L)).as("b"))
      .select(col("a"), col("b"),
        graft.functions.LongArrayDot.dot(col("a"), col("b")).as("d"))
    // "*(n)" marks operators inside WholeStageCodegen stage n
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.linesIterator.next().startsWith("*("), plan)
    // id=2: [2,3]·[4,3] = 17
    assert(df.filter(col("d") === 17L).count() == 1)
  }

  test("q10 pushes the returnflag filter to the scan and broadcasts dims") {
    val df = Relational.returnedItems(spark, sfDir)
    val lineitemScan = allScans(df.queryExecution.executedPlan)
      .find(_.metadata("Location").contains("lineitem")).get
    assert(lineitemScan.metadata("PushedFilters").contains("EqualTo(l_returnflag,R)"),
      lineitemScan.metadata("PushedFilters"))
    assert(df.queryExecution.executedPlan.toString().contains("BroadcastHashJoin"))
  }

  test("d11 contamination joins via broadcast, never a cartesian product") {
    val plan = graft.operators.TextAnalysis.contaminationScan(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("w06 range window costs exactly one exchange") {
    val plan = Relational.rangeWindow(spark, sfDir).queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size +
      "Exchange rangepartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges exchanges in:\n$plan")
  }

  test("q08 broadcasts all three dims; facts join without cartesian") {
    val plan = Relational.marketShare(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q09 profit star broadcasts part/supplier/nation; orders joins hash") {
    val plan = Relational.productProfit(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q19 disjunctive predicate stays a hash equi-join with residual filter") {
    val plan = Relational.disjunctiveRevenue(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q17 correlated-avg rewrite scans lineitem exactly once") {
    val df = Relational.smallQtyRevenue(spark, sfDir)
    val lineitemScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("lineitem"))
    assert(lineitemScans == 1, s"$lineitemScans lineitem scans")
  }

  test("q22 anti join plans as BroadcastHashJoin/SortMergeJoin LeftAnti, no NL") {
    val plan = Relational.globalSalesOpportunity(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin") || plan.contains("LeftAnti"), plan)
  }

  test("j16 null-safe equality still plans as a hash equi-join") {
    val plan = Relational.nullSafeJoin(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("HashJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("j17 shuffle_hash hint materializes a ShuffledHashJoin") {
    val plan = Relational.hintedShuffleHashJoin(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("ShuffledHashJoin"), plan)
  }

  test("j18 interval-overlap banding stays a hash equi-join (no NL)") {
    val plan = graft.operators.AsOf.overlappingShipmentPairs(spark, sfDir)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("HashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("j19 lateral top-N decorrelates to a window, not per-row re-execution") {
    val df = Relational.lateralTopPerGroup(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    // Catalyst must rewrite the correlated LATERAL (ORDER BY ... LIMIT)
    // into a per-group window/limit; a surviving per-outer-row plan
    // shows up as a nested-loop join over the full inner table
    assert(plan.contains("Window") || plan.contains("Limit"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    df.collect()
  }

  test("r01 recursive CTE plans as an iterative UnionLoop") {
    val df = Relational.recursiveHierarchy(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("UnionLoop"), plan)
  }

  test("q23 min-cost decorrelation: one lineitem scan, dims broadcast") {
    val df = Relational.minCostSupplier(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), plan)
    val liScans = allScans(df.queryExecution.executedPlan)
      .count(_.metadata.getOrElse("Location", "").contains("lineitem"))
    assert(liScans == 1, s"$liScans lineitem scans in:\n$plan")
  }

  test("CBO: ANALYZE TABLE stats drive join reordering") {
    // the optimizer tier beyond rule-based rewrites: with per-column
    // stats in the catalog and CBO on, Catalyst reorders a join chain
    // WRITTEN worst-first (fact x fact, dim last) so the selective dim
    // join applies first / the tiny side broadcasts — stats, not the
    // author's join order, pick the plan
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    s.conf.set("spark.sql.cbo.joinReorder.enabled", "true")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val db = "graft_cbo"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_cbo_${graft.Fs.tmpTag(sfDir)}"
    s.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    s.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    Tables.load(s, sfDir, "orders").write.saveAsTable(s"$db.orders")
    Tables.load(s, sfDir, "lineitem").write.saveAsTable(s"$db.lineitem")
    Tables.load(s, sfDir, "nation").write.saveAsTable(s"$db.nation")
    Tables.load(s, sfDir, "customer").write.saveAsTable(s"$db.customer")
    Seq("orders", "lineitem", "nation", "customer").foreach { t =>
      s.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    // worst-first author order: the two facts joined before any
    // filtering dim is in sight
    val df = s.sql(
      s"""SELECT n_name, COUNT(*) AS n
         |FROM $db.lineitem
         |JOIN $db.orders   ON l_orderkey = o_orderkey
         |JOIN $db.customer ON o_custkey = c_custkey
         |JOIN $db.nation   ON c_nationkey = n_nationkey AND n_name = 'NATION_3'
         |GROUP BY n_name""".stripMargin)
    val optimized = df.queryExecution.optimizedPlan.toString()
    val physical = df.queryExecution.executedPlan.toString()
    // stats present: every leaf should carry rowCount; the physical
    // plan must broadcast the post-filter 1-row nation (and with
    // reorder, customer⋈nation happens before the fact join)
    assert(physical.contains("BroadcastHashJoin"), physical)
    val stats = s.sql(s"DESC EXTENDED $db.nation n_nationkey").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(stats.get("distinct_count").exists(_.toLong > 0), stats.toString)
    // CBO reorder proof, order-sensitive: the SQL writes nation as the
    // FINAL join (its subtree would contain the whole fact chain); after
    // reorder the Join node on n_nationkey must sit on the dim side —
    // its subtree joins customer/orders but NOT the lineitem fact
    val joinOrder = "Join".r.findAllIn(optimized).size
    assert(joinOrder == 3, optimized)
    val natJoin = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.exists(_.references.exists(_.name == "n_nationkey")) => j
    }
    assert(natJoin.nonEmpty, optimized)
    val natSubtree = natJoin.map(_.toString).mkString
    assert(!natSubtree.contains("lineitem"),
      s"nation still joins the full fact chain (no CBO reorder):\n$natSubtree")
    df.collect() // runs end-to-end
    s.sql(s"DROP DATABASE $db CASCADE")
  }

  test("u04 CDC fold costs exactly one hash exchange for any log depth") {
    val plan = graft.operators.Cdc.cdcApply(spark, sfDir)
      .queryExecution.executedPlan.toString()
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges == 1, s"$exchanges exchanges in:\n$plan")
  }

  test("d23/d24 corpus dedup: aggregates only — no window, no cartesian") {
    // keep-first is an integer argmin AGGREGATE and the span df an
    // inverted-index aggregate; neither may plan a corpus-wide window
    // (single-partition sort at scale) or a non-equi join
    for (df <- Seq(
        graft.operators.TextAnalysis.spanDupReport(spark, sfDir),
        graft.operators.TextAnalysis.segmentDedup(spark, sfDir))) {
      val plan = df.queryExecution.executedPlan.toString()
      assert(!plan.contains("Window"), plan.linesIterator.take(30).mkString("\n"))
      assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
        plan.linesIterator.take(30).mkString("\n"))
    }
  }

  test("g01 pagerank round: co-partitioned shuffle join — no score broadcast, no edge exchange") {
    // assert on ONE round's plan — the loop result is lineage-cut by
    // localCheckpoint, so the returned frame shows only the final scan.
    // The contract (Graph.round scaladoc): scores are node-cardinality,
    // so a broadcast is an OOM at 10⁸ nodes; the persisted edge frame
    // is hash-partitioned by src once and must join with ZERO per-round
    // exchange on its side.
    val e = graft.operators.Graph.edgesFor(spark, sfDir)
    val scores = e.select(col("src").as("node")).distinct()
      .withColumn("score", org.apache.spark.sql.functions.lit(1000000L))
    // node-level assertions: toString would also print the cached edge
    // BUILD subtree (inside InMemoryRelation), which is allowed to
    // sort-merge once — collect() does not recurse into it
    val plan = graft.operators.Graph.round(e, scores, 1L)
      .queryExecution.executedPlan
    val nodes = allNodes(plan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      nodes.map(_.nodeName).mkString(", "))
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]),
      nodes.map(_.nodeName).mkString(", "))
    val join = nodes.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(join.isDefined, s"no shuffled hash join: ${nodes.map(_.nodeName).mkString(", ")}")
    // the edge side (the subtree scanning the persisted frame, whose
    // non-adaptive cached plan pins HashPartitioning(src)) moves no
    // data; the score side is allowed its single co-partitioning
    // exchange
    val edgeSides = join.get.children.filter(c => allNodes(c).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]))
    assert(edgeSides.nonEmpty, "no cached edge scan under the join")
    for (s <- edgeSides)
      assert(!allNodes(s).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
        s"edge side reshuffled:\n$s")
  }

  test("g02 BFS relax round: frontier never broadcast, edges never reshuffled") {
    // same contract as the g01 round: the frontier is worst-case
    // node-cardinality (early rounds of a small-diameter graph), so it
    // must arrive via a co-partitioned shuffle, and the pre-partitioned
    // edge side must add zero exchange
    val e = graft.operators.Graph.edgesFor(spark, sfDir)
      .select(col("src"), col("dst"))
    val frontier = e.select(col("src").as("node")).distinct()
      .withColumn("d", org.apache.spark.sql.functions.lit(0L))
    val nodes = allNodes(graft.operators.Graph.relaxRound(e, frontier)
      .queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[
      org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      nodes.map(_.nodeName).mkString(", "))
    val join = nodes.collectFirst {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    assert(join.isDefined, s"no shuffled hash join: ${nodes.map(_.nodeName).mkString(", ")}")
    val edgeSides = join.get.children.filter(c => allNodes(c).exists(
      _.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec]))
    assert(edgeSides.nonEmpty, "no cached edge scan under the join")
    for (s <- edgeSides)
      assert(!allNodes(s).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]),
        s"edge side reshuffled:\n$s")
  }

  test("cc jump-propagate round: the propagation pass is materialized once, both self-join sides scan it") {
    // Broadcast disabled so the plan takes its cluster-scale shape.
    // Un-checkpointed, the propagation subtree (edges⋈labels → agg →
    // labels⋈nbr) duplicates under BOTH sides of the pointer-jump
    // self-join and exchange reuse does not cover it (measured: 9
    // SortMergeJoins / 17 Exchanges per round). Checkpointed, the round
    // plan is ONE join whose two inputs scan the materialized `prop` —
    // no aggregate, no edge join, bounded exchanges. This is the plan
    // fact behind the sf1 d30 win (249.8 → 98.5 cpu-s).
    val edges = spark.range(1, 40)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val sym = edges.unionByName(
      edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val labels = sym.select(col("id_a").as("v")).distinct()
      .withColumn("label", col("v")).localCheckpoint()
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", -1)
    try {
      val round = graft.operators.MinHash.ccRound(sym, labels)
      round.collect()
      val nodes = allNodes(round.queryExecution.executedPlan)
      assert(!nodes.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.aggregate.BaseAggregateExec]),
        s"propagation aggregate leaked into the round plan (checkpoint removed?): ${nodes.map(_.nodeName).mkString(", ")}")
      assert(nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]) == 1,
        s"round plan should contain exactly the pointer-jump join: ${nodes.map(_.nodeName).mkString(", ")}")
      assert(nodes.count(_.nodeName.contains("Scan ExistingRDD")) >= 2,
        s"both self-join sides should scan the checkpointed prop: ${nodes.map(_.nodeName).mkString(", ")}")
      assert(nodes.count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike]) <= 4,
        s"round plan exchange count regressed: ${nodes.map(_.nodeName).mkString(", ")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("v13 tombstoned probe keeps cid partition pruning and anti-joins broadcast tombstones") {
    val df = graft.operators.Ivf.annTopKIvfTombstoned(spark, sfDir)
    df.collect()
    val exec = df.queryExecution.executedPlan
    val idxScans = allScans(exec)
      .filter(_.metadata.getOrElse("Location", "").contains("ivf_index"))
    assert(idxScans.nonEmpty, "stored index table not scanned")
    assert(idxScans.map(_.metadata.getOrElse("PartitionFilters", "")).mkString.contains("cid"),
      "tombstone filtering lost the probe's cid partition pruning")
    assert(exec.toString().contains("BroadcastHashJoin LeftAnti") ||
      exec.toString().contains("LeftAnti, BuildRight"),
      s"tombstones not applied as a broadcast anti-join")
  }
}
