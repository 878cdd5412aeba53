package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Stateful streaming semantics under controlled micro-batches: the
  * flatMapGroupsWithState sessionizer must close sessions both on a
  * later event past the gap and on event-time timeout, and must match
  * the batch gap-sessionization on the same data.
  */
class StreamingSpec extends SparkSpec {

  private val Min = 60L * 1000 * 1000 // one minute in micros

  test("sessionize closes on gap and on event-time timeout") {
    val sqlCtx = spark.sqlContext
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    val input = MemoryStream[(Long, Long, Long)]
    val withTs = input.toDF().toDF("user_id", "ts_us", "cents")
      .withColumn("t", timestamp_micros(col("ts_us")))
      .withWatermark("t", "0 seconds")
    val q = StreamingOps.sessionize(withTs).writeStream
      .format("memory").queryName("sess_out").outputMode("append").start()
    try {
      // base offset: an event at exactly the initial watermark (epoch 0)
      // would be dropped as late
      val B = 10000 * Min
      // batch 1: user 1, two events 10 min apart -> one open session
      input.addData((1L, B, 100L), (1L, B + 10 * Min, 50L))
      q.processAllAvailable()
      // batch 2: user 1 again 60 min later -> gap closes session A
      input.addData((1L, B + 70 * Min, 25L))
      q.processAllAvailable()
      // batch 3+4: unrelated users far in the future advance the
      // watermark past session B's (end + gap) -> event-time timeout
      input.addData((2L, B + 500 * Min, 1L))
      q.processAllAvailable()
      input.addData((3L, B + 1000 * Min, 1L))
      q.processAllAvailable()
      val rows = spark.table("sess_out")
        .select("user_id", "n_events", "start_us", "end_us", "total_cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(rows.contains((1L, 2L, B, B + 10 * Min, 150L)), s"session A missing: $rows")
      assert(rows.contains((1L, 1L, B + 70 * Min, B + 70 * Min, 25L)), s"session B missing: $rows")
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long)]
    val events = input.toDF().toDF("event_id", "ts_ns")
      .withColumn("ts", col("ts_ns")) // raw nanos column shape
    val q = StreamingOps.dedupWithinWatermark(events).writeStream
      .format("memory").queryName("dedup_out").outputMode("append").start()
    try {
      val B = 10000L * 60 * 1000 * 1000 * 1000 // base offset in nanos
      val Min = 60L * 1000 * 1000 * 1000
      input.addData((1L, B), (1L, B + Min), (2L, B + Min)) // dup in-batch
      q.processAllAvailable()
      input.addData((1L, B + 2 * Min), (3L, B + 3 * Min))  // dup across batches
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id")
        .collect().map(_.getLong(0)).toSeq
      assert(ids.sorted == Seq(1L, 2L, 3L), s"got $ids")
    } finally q.stop()
  }

  test("e20 rate-limit dedup evicts key state once the watermark passes its budget") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
    // tight 1-minute budget so the test can step the watermark past it
    val q = StreamingOps.rateLimitDedup(events, watermark = "1 minute").writeStream
      .format("memory").queryName("rld_evict_out").outputMode("append").start()
    try {
      val H = 3600L * 1000 * 1000 * 1000
      val M = 60L * 1000 * 1000 * 1000
      val B = 10000L * H
      input.addData((1L, "view", B))
      q.processAllAvailable()
      // advance the watermark far past B + 1 min — key state evicts
      input.addData((9L, "view", B + 30 * M))
      q.processAllAvailable()
      // a LATE duplicate of the same (user,type,hour) after eviction is
      // NOT suppressed — the bounded-state trade dropDuplicatesWithin-
      // Watermark makes (suppression is only guaranteed inside the
      // lateness budget; global dedup is the batch tier's job)
      input.addData((1L, "view", B + 30 * M))
      q.processAllAvailable()
      val n = spark.table("rld_evict_out")
        .filter(col("user_id") === 1L).count()
      assert(n == 2, s"expected the post-eviction duplicate to re-emit, got $n rows")
    } finally q.stop()
  }

  test("e20 rate-limit dedup keeps one row per (user,type,hour) across batches") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, String, Long)]
    val events = input.toDF().toDF("user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns")) // raw nanos column shape
    val q = StreamingOps.rateLimitDedup(events).writeStream
      .format("memory").queryName("rld_out").outputMode("append").start()
    try {
      val H = 3600L * 1000 * 1000 * 1000 // one hour in nanos
      val B = 10000L * H
      // in-batch duplicate of (1, view, hour0)
      input.addData((1L, "view", B + H / 4), (1L, "view", B + H / 2))
      q.processAllAvailable()
      // across-batch duplicate, a next-hour row, and another user
      input.addData((1L, "view", B + 3 * H / 4), (1L, "view", B + H + H / 4),
        (2L, "view", B + H / 4))
      q.processAllAvailable()
      val rows = spark.table("rld_out").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
      assert(rows.size == 3, s"got $rows")
      assert(rows.count(_._1 == 1L) == 2, s"user 1 hours: $rows")
      assert(rows.count(_._1 == 2L) == 1, s"user 2 hours: $rows")
    } finally q.stop()
  }

  test("stream-stream join matches in range, drops out of range, evicts state") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
      .withColumn("value", lit(0.0)) // schema shape parity with events
    val q = StreamingOps.viewPurchaseAttribution(events).writeStream
      .format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      val MinNs = 60L * 1000 * 1000 * 1000
      val B = 10000 * MinNs
      // view at B, purchase 30 min later -> in range (joins);
      // purchase 90 min after the view -> out of the 1 h range
      input.addData(
        (10L, 1L, "view", B),
        (20L, 1L, "purchase", B + 30 * MinNs),
        (21L, 1L, "purchase", B + 90 * MinNs))
      q.processAllAvailable()
      val got = spark.table("ssj_out").select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((20L, 10L)), s"got $got")
      // advance the watermark far past B + 1 h ON BOTH SIDES (the query
      // watermark is the MIN across the two watermark operators, so a
      // future view alone would pin it at the purchases side's last
      // event): batch-1 state must then be evicted — numRowsTotal drops
      // to the recent rows only, not everything ever seen
      input.addData(
        (90L, 8L, "view", B + 5000 * MinNs),
        (91L, 9L, "purchase", B + 5000 * MinNs))
      q.processAllAvailable()
      input.addData(
        (92L, 8L, "view", B + 10000 * MinNs),
        (93L, 9L, "purchase", B + 10000 * MinNs))
      q.processAllAvailable()
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"state not evicted: $stateRows rows buffered (7 ever seen)")
    } finally q.stop()
  }

  test("asymmetric watermarks: a view hours behind the purchase stream still joins, then evicts") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
      .withColumn("value", lit(0.0))
    // purchases on time (10 min budget); views lag by hours (4 h budget)
    val q = StreamingOps.viewPurchaseAttribution(events, watermark = "10 minutes",
        joinType = "inner", viewWatermark = Some("4 hours"))
      .writeStream.format("memory").queryName("ssj_asym_out").outputMode("append").start()
    try {
      val MinNs = 60L * 1000 * 1000 * 1000
      val B = 10000 * MinNs
      def rows() = spark.table("ssj_asym_out").select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // batch 1: the purchase arrives on time; its view is still in flight
      input.addData((20L, 1L, "purchase", B + 120 * MinNs))
      q.processAllAvailable()
      assert(rows().isEmpty, s"nothing should match yet: ${rows()}")
      // batch 2: the view arrives a batch later with an event time 30 min
      // before the purchase — hours behind the purchase stream's clock
      // but inside the view side's 4 h budget AND the 1 h join range
      input.addData((10L, 1L, "view", B + 90 * MinNs))
      q.processAllAvailable()
      assert(rows() == Set((20L, 10L)), s"late view failed to join: ${rows()}")
      // batches 3+4: both sides advance ~83 h; the global watermark
      // (min of p_t−10min, v_t−4h) sweeps far past batch 1/2 state
      input.addData(
        (90L, 8L, "view", B + 5000 * MinNs),
        (91L, 8L, "purchase", B + 5000 * MinNs))
      q.processAllAvailable()
      // a view for user 1 whose event time is now beyond the 4 h budget:
      // dropped at ingestion — a batch join WOULD match it to purchase 20
      // (it is in the 1 h range), so the cutoff itself is what's pinned
      input.addData((95L, 1L, "view", B + 100 * MinNs))
      q.processAllAvailable()
      input.addData(
        (92L, 8L, "view", B + 10000 * MinNs),
        (93L, 8L, "purchase", B + 10000 * MinNs))
      q.processAllAvailable()
      // batch-cutoff oracle: the same tuples inner-joined with the range
      // predicate, minus inputs that arrived past their side's watermark
      // (only the too-late view 95) — parity, not just spot values
      val kept = Seq(
        (10L, 1L, B + 90 * MinNs), (90L, 8L, B + 5000 * MinNs), (92L, 8L, B + 10000 * MinNs))
        .toDF("view_id", "v_user", "v_ns")
      val purch = Seq(
        (20L, 1L, B + 120 * MinNs), (91L, 8L, B + 5000 * MinNs), (93L, 8L, B + 10000 * MinNs))
        .toDF("purchase_id", "p_user", "p_ns")
      val expected = purch.join(kept,
          col("p_user") === col("v_user") && col("v_ns") <= col("p_ns") &&
            col("v_ns") >= col("p_ns") - lit(60 * MinNs))
        .select("purchase_id", "view_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows() == expected, s"stream ${rows()} != batch-cutoff oracle $expected")
      val stateRows = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(stateRows <= 4, s"state not evicted: $stateRows rows buffered (8 ever seen)")
    } finally q.stop()
  }

  test("left-outer stream-stream join emits unmatched rows only past the watermark") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
      .withColumn("value", lit(0.0))
    val q = StreamingOps.viewPurchaseAttribution(events, joinType = "leftOuter")
      .writeStream.format("memory").queryName("ssj_outer_out")
      .outputMode("append").start()
    try {
      val MinNs = 60L * 1000 * 1000 * 1000
      val B = 10000 * MinNs
      def rows() = spark.table("ssj_outer_out")
        .select("purchase_id", "view_id").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // P1 has no view; P2 matches V — only the MATCH emits now (P1
      // might still find a matching view until the watermark passes it)
      input.addData(
        (10L, 1L, "view", B),
        (20L, 1L, "purchase", B + 30 * MinNs),
        (21L, 2L, "purchase", B))
      q.processAllAvailable()
      assert(rows() == Set((20L, 10L)), s"after batch 1: ${rows()}")
      // advance both sides' watermarks far past P1's join window, plus
      // one more batch for the eviction to surface the null-extended row
      input.addData(
        (90L, 8L, "view", B + 5000 * MinNs),
        (91L, 9L, "purchase", B + 5000 * MinNs))
      q.processAllAvailable()
      input.addData(
        (92L, 8L, "view", B + 10000 * MinNs),
        (93L, 9L, "purchase", B + 10000 * MinNs))
      q.processAllAvailable()
      assert(rows().contains((21L, -1L)),
        s"unmatched purchase never emitted null-extended: ${rows()}")
    } finally q.stop()
  }

  test("chained join+window agg holds a window open until the watermark passes it") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
      .withColumn("value", lit(0.0))
    val q = StreamingOps.attributionHourly(events).writeStream
      .format("memory").queryName("attr_hourly_out").outputMode("append").start()
    try {
      val MinNs = 60L * 1000 * 1000 * 1000
      val B = 12000 * MinNs // hour-aligned base (12000 min = 200 h)
      // one attributed pair inside hour [B, B+60min)
      input.addData(
        (10L, 1L, "view", B),
        (20L, 1L, "purchase", B + 30 * MinNs))
      q.processAllAvailable()
      // watermark is still inside the window -> nothing emitted yet
      assert(spark.table("attr_hourly_out").count() == 0,
        "window emitted before the watermark passed it")
      // advance BOTH sides far past the window end
      input.addData(
        (90L, 8L, "view", B + 5000 * MinNs),
        (91L, 9L, "purchase", B + 5000 * MinNs))
      q.processAllAvailable()
      val rows = spark.table("attr_hourly_out")
        .select("hour_start", "n_pairs").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(rows.exists(_._2 == 1L), s"finalized window missing: $rows")
    } finally q.stop()
  }

  test("streaming hourly counts equal the batch twin") {
    import org.apache.spark.sql.streaming.Trigger
    val path = Tables.path(sfDir, "events")
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("basePath", sfDir).parquet(s"$path*")
    val q = StreamingOps.hourlyCounts(stream).writeStream
      .format("memory").queryName("hourly_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = graft.operators.Events.tumblingHourly(spark, sfDir)
    assertSameRows(spark.table("hourly_out"), batch)
  }

  test("native session_window stream equals the batch twin") {
    import org.apache.spark.sql.streaming.Trigger
    val path = Tables.path(sfDir, "events")
    val schema = spark.read.parquet(path).schema
    val stream = spark.readStream.schema(schema)
      .option("basePath", sfDir).parquet(s"$path*")
    val q = StreamingOps.sessionCounts(stream).writeStream
      .format("memory").queryName("sessw_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = graft.operators.Events.sessionWindows(spark, sfDir)
    assertSameRows(spark.table("sessw_out"), batch)
  }

  test("append mode drops a late row once the watermark has passed its window") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val HourNs = 3600L * 1000 * 1000 * 1000
    val input = MemoryStream[(Long, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val q = StreamingOps.hourlyCounts(events, watermark = "0 seconds")
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      // two rows in hour 10, plus an hour-13 row that advances the
      // watermark past hour 10's end -> the 10:00 window emits (n=2)
      input.addData((10 * HourNs, "view", 1.0), (10 * HourNs + HourNs / 2, "view", 1.0),
        (13 * HourNs, "view", 1.0))
      q.processAllAvailable()
      // a LATE hour-10 row: watermark (13:00) is past the window end
      // (11:00), so the row must be discarded, not re-emitted
      input.addData((10 * HourNs + HourNs / 4, "view", 1.0))
      q.processAllAvailable()
      // flush: advance watermark further; nothing about hour 10 changes
      input.addData((15 * HourNs, "view", 1.0))
      q.processAllAvailable()
      val hour10 = spark.table("late_out")
        .filter(col("hour_start").endsWith("10:00"))
        .select("n_events").collect().map(_.getLong(0)).toSeq
      assert(hour10 == Seq(2L), s"hour-10 emissions: $hour10")
    } finally q.stop()
  }

  test("update mode re-emits only the groups each batch changed") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val Hour = 3600L * 1000 * 1000 * 1000 // nanos
    val input = MemoryStream[(Long, Long, String, Double)]
    val events = input.toDF().toDF("event_id", "ts", "event_type", "value")
    val q = StreamingOps.hourlyCounts(events).writeStream
      .format("memory").queryName("hourly_upd").outputMode("update").start()
    try {
      // batch 1: two t1 events and one t2 event, all in hour 100
      input.addData((1L, 100 * Hour, "t1", 1.0), (2L, 100 * Hour + 1000, "t1", 2.0),
        (3L, 100 * Hour + 2000, "t2", 5.0))
      q.processAllAvailable()
      // batch 2: one more t1 in hour 100, one t3 in hour 101 — t2 untouched
      input.addData((4L, 100 * Hour + 3000, "t1", 3.0), (5L, 101 * Hour, "t3", 7.0))
      q.processAllAvailable()
      val rows = spark.table("hourly_upd")
        .select("event_type", "n_events").collect()
        .map(r => (r.getString(0), r.getLong(1))).toList
      // t2's group was only touched in batch 1 → exactly one emission;
      // t1 was updated in both batches → two emissions, final count 3
      assert(rows.count(_._1 == "t2") == 1, s"t2 re-emitted: $rows")
      assert(rows.count(_._1 == "t1") == 2, s"t1 emissions: $rows")
      assert(rows.filter(_._1 == "t1").map(_._2).max == 3L, s"t1 final count: $rows")
      assert(rows.count(_._1 == "t3") == 1, s"t3 emissions: $rows")
    } finally q.stop()
  }

  test("stateful agg under the RocksDB state store matches the batch twin") {
    // same pipeline as the in-memory-provider test above, but with
    // state in RocksDB — the provider that keeps streaming viable when
    // aggregate state outgrows executor memory (100 TB keyspaces).
    // Results must be provider-independent; this pins that.
    import org.apache.spark.sql.streaming.Trigger
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val path = Tables.path(sfDir, "events")
    val schema = s.read.parquet(path).schema
    val stream = s.readStream.schema(schema)
      .option("basePath", sfDir).parquet(s"$path*")
    val q = StreamingOps.hourlyCounts(stream).writeStream
      .format("memory").queryName("hourly_rocks")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val batch = graft.operators.Events.tumblingHourly(spark, sfDir)
    assertSameRows(s.table("hourly_rocks"), batch)
  }

  test("foreachBatch maintains the signature store: later batches match earlier docs") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    import graft.operators.MinHash
    graft.functions.WordShingles.register(spark)
    val store = s"${sys.props("java.io.tmpdir")}/graft_stream_store_${graft.Fs.tmpTag("spec")}"
    graft.Fs.rmTree(new java.io.File(store))
    // seed: one unrelated corpus doc, so every batch probes a real store
    def shingled(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), graft.functions.WordShingles.shingles(col("text")).as("sh"))
        .filter(size(col("sh")) > 0)
    MinHash.sigsWithN(shingled(Seq((1L, "totally unrelated corpus text about storage engines"))
      .toDF("doc_id", "text"))).write.mode("overwrite").parquet(store)
    val matches = scala.collection.mutable.Set.empty[(Long, Long)]
    val input = MemoryStream[(Long, String)]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // the d19 lifecycle, streamed: probe against the CURRENT store,
        // then append this batch's signatures for the batches after it
        val sh = shingled(batch).persist()
        matches ++= MinHash.bandCandidates(spark.read.parquet(store), sh)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        MinHash.sigsWithN(sh).write.mode("append").parquet(store)
        sh.unpersist(); ()
      }
      .start()
    try {
      val textA = "the quick brown fox jumps over the lazy dog near the riverbank every morning"
      input.addData((100L, textA))
      q.processAllAvailable()
      // batch B: a near-copy of batch A's doc — it can only match doc
      // 100 through the signatures batch A appended to the store
      input.addData((200L, textA + " extra"))
      q.processAllAvailable()
      assert(matches.contains((200L, 100L)),
        s"batch-B doc failed to match the batch-A doc via the store: $matches")
      assert(matches.forall(_._2 != 1L), s"unrelated seed doc matched: $matches")
      val ids = spark.read.parquet(store).select("doc_id").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 100L, 200L), s"store contents wrong: $ids")
    } finally q.stop()
  }

  test("restart from checkpoint resumes the source offset exactly-once") {
    // the recovery contract a production pipeline actually relies on:
    // run 1 commits batch-1 files through the sink's _spark_metadata
    // log; run 2 (same checkpoint, new query instance) must process
    // ONLY the file added in between — no re-emit, no loss
    val base = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_restart_${graft.Fs.tmpTag(sfDir)}")
    graft.Fs.rmTree(base)
    val in = s"$base/in"; val out = s"$base/data"; val chk = s"$base/chk"
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(s"$in/b1")
    def runOnce(): Unit = {
      val q = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
        .option("basePath", in).parquet(s"$in/*")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    runOnce()
    spark.range(100, 150).toDF("id").coalesce(1).write.parquet(s"$in/b2")
    runOnce() // restart: same checkpoint, fresh query
    val got = spark.read.parquet(out)
    assert(got.count() == 150, "row count after restart")
    assert(got.distinct().count() == 150, "batch-1 rows were re-emitted")
    assert(got.agg(min(col("id")), max(col("id"))).head().toSeq == Seq(0L, 149L))
  }

  test("crash-replay fault injection: a batch whose commit marker is lost replays exactly-once from rolled-back state") {
    // the failure the clean-restart test can't reach: a crash AFTER the
    // sink wrote batch N but BEFORE the checkpoint's commit marker
    // landed. Simulated faithfully by deleting the newest file under
    // chk/commits — on restart the engine sees offsets for N but no
    // commit, so it must re-execute N with the SAME offsets against the
    // state store rolled back to version N-1; with an idempotent sink
    // the replay must reproduce the no-crash result, no dupes, no loss.
    val base = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_crash_${graft.Fs.tmpTag(sfDir)}")
    graft.Fs.rmTree(base)
    val in = s"$base/in"; val out = s"$base/out"; val chk = s"$base/chk"
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    def runOnce(): Unit = {
      val q = s.readStream
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id", org.apache.spark.sql.types.LongType))))
        .option("basePath", in).parquet(s"$in/*")
        .groupBy(expr("id % 10").as("bucket")).agg(count(lit(1)).as("n"))
        .writeStream
        .outputMode("update")
        .foreachBatch { (df: org.apache.spark.sql.DataFrame, batchId: Long) =>
          // idempotent by construction: replaying batchId overwrites its
          // own directory; the read below takes the newest batch dir
          df.write.mode("overwrite").parquet(s"$out/b$batchId"); ()
        }
        .option("checkpointLocation", chk)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def latest(): Seq[Seq[Any]] = {
      val dirs = new java.io.File(out).listFiles.filter(_.getName.startsWith("b"))
      val newest = dirs.maxBy(_.getName.drop(1).toLong)
      spark.read.parquet(newest.getPath).collect()
        .map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    }
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(s"$in/b1")
    runOnce()
    spark.range(100, 150).toDF("id").coalesce(1).write.parquet(s"$in/b2")
    runOnce()
    val good = latest()
    // fault: lose the newest commit marker (crash between sink and commit)
    val commits = new java.io.File(s"$chk/commits").listFiles
      .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toLong)
    assert(commits.length >= 2, "expected one commit per AvailableNow run")
    // also drop the local FS's checksum sidecar (.N.crc) — a real crash
    // loses both, and a stale sidecar blocks the replay's commit rename
    val crc = new java.io.File(commits.last.getParent, s".${commits.last.getName}.crc")
    assert(commits.last.delete())
    if (crc.exists) assert(crc.delete())
    runOnce() // replay: same offsets, state rolled back one version
    assert(latest() == good,
      "replayed batch diverged from the committed result (state rollback or idempotence broken)")
    // the update-mode counts must also equal the batch twin over all input
    val twin = spark.read.parquet(s"$in/b1", s"$in/b2")
      .groupBy(expr("id % 10").as("bucket")).agg(count(lit(1)).as("n"))
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long]).toSeq
    assert(latest() == twin, "replayed totals differ from the batch twin")
  }

  test("transformWithState sessionizer closes on gap and on event-time timer") {
    // same scenario as the flatMapGroupsWithState test above — the new
    // API's event-time TIMER must close session B exactly where the
    // old API's EventTimeTimeout did
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Long, Long)]
    val withTs = input.toDF().toDF("user_id", "ts_us", "cents")
      .withColumn("t", timestamp_micros(col("ts_us")))
      .withWatermark("t", "0 seconds")
    val q = graft.streaming.TwsSessionizer.sessionize(withTs).writeStream
      .format("memory").queryName("tws_sess_out").outputMode("append").start()
    try {
      val B = 10000 * Min
      input.addData((1L, B, 100L), (1L, B + 10 * Min, 50L))
      q.processAllAvailable()
      input.addData((1L, B + 70 * Min, 25L)) // gap closes session A
      q.processAllAvailable()
      input.addData((2L, B + 500 * Min, 1L)) // advance watermark
      q.processAllAvailable()
      input.addData((3L, B + 1000 * Min, 1L)) // past B's end+gap -> timer fires
      q.processAllAvailable()
      val rows = s.table("tws_sess_out")
        .select("user_id", "n_events", "start_us", "end_us", "total_cents")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toSet
      assert(rows.contains((1L, 2L, B, B + 10 * Min, 150L)), s"session A missing: $rows")
      assert(rows.contains((1L, 1L, B + 70 * Min, B + 70 * Min, 25L)), s"session B missing: $rows")
    } finally q.stop()
  }

  test("transformWithState keeps one running total per user across batches") {
    // Spark 4's arbitrary-state API requires the RocksDB provider;
    // plan the stream on a child session so the override stays scoped
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s.conf.set("spark.sql.shuffle.partitions", "4")
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext
    import s.implicits._
    val input = MemoryStream[(Long, Long)]
    val q = graft.streaming.RunningTotals.runningTotals(input.toDS())
      .writeStream.format("memory").queryName("tws_out")
      .outputMode("update").start()
    try {
      input.addData((1L, 100L), (1L, 50L), (2L, 10L))
      q.processAllAvailable()
      input.addData((1L, 25L), (3L, 5L))
      q.processAllAvailable()
      val rows = s.table("tws_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // batch 1 emissions reflect batch-1 state; batch 2 emissions
      // prove the ValueState carried across micro-batches
      assert(rows == Set(
        (1L, 2L, 150L), (2L, 1L, 10L),   // after batch 1
        (1L, 3L, 175L), (3L, 1L, 5L)),   // after batch 2
        s"got: $rows")
    } finally q.stop()
  }

  test("full-outer stream-stream join null-extends BOTH sides past the watermark") {
    val sqlCtx = spark.sqlContext
    implicit val ctx: org.apache.spark.sql.SQLContext = sqlCtx
    import spark.implicits._
    val input = MemoryStream[(Long, Long, String, Long)]
    val events = input.toDF().toDF("event_id", "user_id", "event_type", "ts_ns")
      .withColumn("ts", col("ts_ns"))
      .withColumn("value", lit(0.0))
    val q = StreamingOps.viewPurchaseAttribution(events, joinType = "fullOuter")
      .writeStream.format("memory").queryName("ssj_full_out")
      .outputMode("append").start()
    try {
      val MinNs = 60L * 1000 * 1000 * 1000
      val B = 20000 * MinNs
      def rows() = spark.table("ssj_full_out")
        .select("purchase_id", "view_id").collect()
        .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
          if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      // V10 matches P20; V11 (user 3) and P21 (user 2) have no partner
      input.addData(
        (10L, 1L, "view", B),
        (11L, 3L, "view", B),
        (20L, 1L, "purchase", B + 30 * MinNs),
        (21L, 2L, "purchase", B))
      q.processAllAvailable()
      assert(rows() == Set((20L, 10L)), s"after batch 1: ${rows()}")
      // push both watermarks far past the join window, then one more
      // batch so eviction surfaces the null-extended rows of BOTH sides
      input.addData(
        (90L, 8L, "view", B + 5000 * MinNs),
        (91L, 9L, "purchase", B + 5000 * MinNs))
      q.processAllAvailable()
      input.addData(
        (92L, 8L, "view", B + 10000 * MinNs),
        (93L, 9L, "purchase", B + 10000 * MinNs))
      q.processAllAvailable()
      assert(rows().contains((21L, -1L)),
        s"unmatched purchase not null-extended: ${rows()}")
      assert(rows().contains((-1L, 11L)),
        s"unmatched view not null-extended: ${rows()}")
    } finally q.stop()
  }

  test("d22 novelty is micro-batch-split independent (two-batch MemoryStream)") {
    import spark.implicits._
    import graft.operators.MinHash
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val storeTbl = MinHash.signatureStore(spark, sfDir)
    val arrivals = Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") >= MinHash.IncrementalSplit)
      .select(col("doc_id"), col("text")).as[(Long, String)].collect()
    assert(arrivals.length > 2, "vacuous: no arrivals past the split")
    val (h1, h2) = arrivals.splitAt(arrivals.length / 2)
    val input = MemoryStream[(Long, String)]
    val got = scala.collection.mutable.Set.empty[Long]
    val q = input.toDF().toDF("doc_id", "text").writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        got ++= MinHash.probeNovel(b, sfDir, storeTbl).collect().map(_.getLong(0))
        ()
      }.start()
    try {
      input.addData(h1.toIndexedSeq); q.processAllAvailable()
      input.addData(h2.toIndexedSeq); q.processAllAvailable()
    } finally q.stop()
    // the same arrivals replayed as ONE bounded file stream (the gate
    // query) must emit exactly the same novel set
    val expected = MinHash.streamingNovelDocs(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    assert(got.toSet == expected,
      s"split-dependent novelty: only-two-batch=${got.toSet -- expected} only-single=${expected -- got.toSet}")
  }

  test("c05 admission is invariant under micro-batch splits (per-doc purity)") {
    import org.apache.spark.sql.functions._
    val arrivals = Tables.load(spark, sfDir, "documents")
      .filter(pmod(col("doc_id"), lit(3)) === 2)
    // two arbitrary halves through the frozen rules...
    val lo = graft.operators.Curation
      .admitBatch(spark, sfDir, arrivals.filter(col("doc_id") % 2 === 0))
    val hi = graft.operators.Curation
      .admitBatch(spark, sfDir, arrivals.filter(col("doc_id") % 2 === 1))
    def ids(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    val twoBatch = ids(lo) ++ ids(hi)
    // ...must admit exactly what the bounded stream replay admits
    val streamed = ids(graft.operators.Curation.streamingAdmission(spark, sfDir))
    assert(twoBatch == streamed,
      s"split-dependent admission: only-two-batch=${twoBatch -- streamed} only-stream=${streamed -- twoBatch}")
    assert(streamed.nonEmpty)
  }
}
