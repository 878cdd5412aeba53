package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Iterative GRAPH analytics — PageRank over the customer–supplier
  * trade graph (who is central to the supply network?), the power-
  * iteration family the d14 connected-components loop doesn't cover:
  * per-round scores are WEIGHTED sums over incoming edges, not label
  * minima.
  *
  * Determinism contract: the usual float PageRank cannot hash-gate
  * (iterated double sums are order-dependent), so scores are
  * integer-scaled — mass starts at `Scale`/n per node and every
  * operation is integer multiply/floor-divide (damping 0.85 as ·17/20),
  * making each iteration an exact function of the previous one in any
  * engine. Floor arithmetic can 2-cycle at the last unit, so the loop
  * runs a FIXED `Iters` rounds (no early-exit) and the oracle replays
  * the same rounds as chained CTEs. Overflow bound: score ≤ `Scale`, so
  * the per-edge product (score·17/20)·w stays inside Int64 for edge
  * weights up to ~10⁵ — beyond that, pre-divide the weight or raise to
  * DECIMAL(38,0).
  *
  * Scale design: edges build once (join + one hash-agg), get their
  * source out-weight attached once, and persist; each round is then
  * edges ⋈ scores on src → hash-agg on dst — the canonical distributed
  * PageRank round (co-partition edges by src and the join is
  * shuffle-free; scores here are node-cardinality and broadcast). The
  * graph is bidirectional by construction so every node has in- and
  * out-edges — no dangling-mass redistribution step. Per-round
  * localCheckpoint cuts the 8-deep lineage exactly like the d14 loop.
  */
object Graph {

  /** Fixed-point scale: scores are fractions of `Scale` total mass. */
  private val Scale = 1000000000000L
  /** Fixed power-iteration rounds (see determinism note above). */
  private val Iters = 8

  /** Bidirectional weighted trade edges: customer node = 2·custkey,
    * supplier node = 2·suppkey+1; weight = lineitems traded between
    * them. Persisted with the source out-weight attached.
    */
  private def tradeEdges(spark: SparkSession, dir: String): DataFrame =
    graft.SessionCache.memo(spark, s"g01edges:$dir") {
      val b = Tables.load(spark, dir, "lineitem")
        .join(Tables.load(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy((col("o_custkey") * 2).as("cnode"),
          (col("l_suppkey") * 2 + 1).as("snode"))
        .agg(count(lit(1)).as("w"))
      val e = b.select(col("cnode").as("src"), col("snode").as("dst"), col("w"))
        .unionByName(b.select(col("snode").as("src"), col("cnode").as("dst"), col("w")))
      val out = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      e.join(out, "src").repartition(col("src")).persist()
    }

  // G: weighted PageRank, top-20 central nodes. One driver-side scalar
  // (the node count — needed as a literal in the teleport term) and a
  // fixed 8-round loop; everything else is joins and hash-aggs.
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val e = tradeEdges(spark, dir)
    val n = e.select(col("src")).distinct().count()
    val tele = Scale * 3 / (20 * n)
    var scores = e.select(col("src").as("node")).distinct()
      .withColumn("score", lit(Scale / n))
    for (_ <- 1 to Iters) {
      scores = e.join(broadcast(scores), col("src") === col("node"))
        .select(col("dst"), expr("((score * 17) div 20) * w div wout").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("c"))
        .select(col("dst").as("node"), (col("c") + tele).as("score"))
        .localCheckpoint()
    }
    scores.orderBy(col("score").desc, col("node")).limit(20)
      .select(
        when(pmod(col("node"), lit(2)) === 0, "customer").otherwise("supplier").as("node_type"),
        expr("node div 2").as("node_key"),
        col("score"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> (pagerank _))

  /** The oracle replays the same `Iters` integer rounds as chained
    * CTEs (not a recursive CTE: the recursive term would need GROUP BY).
    */
  val oracles: Map[String, String] = Map(
    "g01_pagerank" -> {
      val rounds = (1 to Iters).map { i =>
        s"""s$i AS (SELECT e2.dst AS node,
           |  (SELECT t FROM tele) + CAST(SUM(((s${i - 1}.score * 17) // 20) * e2.w // e2.wout) AS BIGINT) AS score
           |  FROM s${i - 1} JOIN e2 ON e2.src = s${i - 1}.node GROUP BY e2.dst)""".stripMargin
      }.mkString(",\n")
      s"""WITH b AS (SELECT o_custkey*2 AS cnode, l_suppkey*2+1 AS snode, COUNT(*) AS w
         |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey GROUP BY 1, 2),
         |e AS (SELECT cnode AS src, snode AS dst, w FROM b
         |      UNION ALL SELECT snode, cnode, w FROM b),
         |o AS MATERIALIZED (SELECT src, CAST(SUM(w) AS BIGINT) AS wout FROM e GROUP BY 1),
         |e2 AS MATERIALIZED (SELECT e.src, e.dst, e.w, o.wout FROM e JOIN o USING (src)),
         |nn AS (SELECT COUNT(*) AS n FROM o),
         |tele AS (SELECT $Scale * 3 // (20 * n) AS t FROM nn),
         |s0 AS (SELECT src AS node, $Scale // (SELECT n FROM nn) AS score FROM o),
         |$rounds
         |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_type,
         |  node // 2 AS node_key, score
         |FROM s$Iters ORDER BY score DESC, node LIMIT 20""".stripMargin
    })
}
