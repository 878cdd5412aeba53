package graft

/** The RE-CALL INVARIANCE rail for the stateful query family: a query
  * whose implementation writes state (catalog store tables, parquet
  * sinks, streaming checkpoints) must return IDENTICAL rows when its
  * entry-point is called again — in the same session (where the
  * SessionCache memo / Fs.onceInJvm guards are the contract under
  * test: a guard drifting out of sync re-runs an INSERT/append and
  * silently doubles rows) and from a SECOND SparkSession in the same
  * JVM (where the per-session store names and scratch tags are the
  * contract: round-11's interference class was exactly a second
  * session DROPping a shared-name table out from under the first).
  *
  * The driver gate calls each query once and the bench's warm pass
  * re-calls without comparing values, so neither detects silent
  * divergence; this spec closes that hole at the smoke scale.
  */
class IdempotenceSpec extends SparkSpec {

  /** Queries that materialize state somewhere a re-call could observe:
    * evolving/persisted stores (d17/d19/d22/d33, v11/v13/v15/v16/v17),
    * frozen-deployment incrementals (c03/c05), catalog DDL + INSERT
    * (s08), tmp-dir sinks rewritten per call (s18/s24/s25), and
    * streaming file sinks (e13/e16). */
  private val stateful = Seq(
    "c03_incremental_funnel", "c05_streaming_admission",
    "d17_stored_incremental", "d19_evolving_store",
    "d22_streaming_store_dedup", "d33_semantic_store_dedup",
    "e13_incremental_upsert", "e16_stream_file_sink",
    "s05_csv_roundtrip", "s08_catalog_roundtrip",
    "s11_partitioned_scan", "s12_bucketed_agg", "s13_json_roundtrip",
    "s14_orc_roundtrip", "s15_dynamic_pruning", "s17_csv_permissive",
    "s18_dynamic_overwrite", "s19_schema_evolution", "s20_sorted_shards",
    "s21_stats_pruned_scan", "s23_text_roundtrip", "s24_compaction",
    "s25_time_travel", "s26_bucketed_join",
    "v11_ann_stored", "v13_ann_tombstoned", "v15_ann_main_delta",
    "v16_ann_stream_serve", "v17_ann_rebuilt")

  test("stateful queries return identical rows on a second same-session call") {
    val failed = stateful.flatMap { n =>
      try {
        val fn = SparkEntry.queries(n)
        val first = fn(spark, sfDir)
        val again = fn(spark, sfDir)
        assertSameRows(again, first)
        None
      } catch {
        case e: Throwable => Some(s"$n: " +
          Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
            .linesIterator.take(2).mkString(" "))
      }
    }
    assert(failed.isEmpty,
      s"${failed.size} stateful queries break on re-call:\n" + failed.mkString("\n"))
  }

  test("a second session's call neither diverges nor disturbs the first session's result") {
    // the two heaviest state owners: d19 DROPs + rebuilds + appends to
    // its evolving signature store; d33 DDLs the semantic index tables
    for (n <- Seq("d19_evolving_store", "d33_semantic_store_dedup")) {
      val fn = SparkEntry.queries(n)
      val first = fn(spark, sfDir)
      val expected = first.collect().map(_.toString).sorted.toSeq
      val s2 = spark.newSession()
      try {
        withClue(s"$n cross-session: ") { assertSameRows(fn(s2, sfDir), first) }
        // the first session's frame must survive the second session's
        // state build untouched (per-session names, not shared ones)
        withClue(s"$n after second session: ") {
          assert(first.collect().map(_.toString).sorted.toSeq == expected)
        }
      } finally SessionCache.clear(s2)
    }
  }
}
