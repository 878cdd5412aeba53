package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.{SessionCache, Tables}

/** Storage layout + source/sink operators: format round-trips, partitioned/bucketed/sorted/z-ordered writes, stats pruning, compaction, catalog DDL, runtime filters.
  *
  * Split out of the former monolithic Relational.scala along its
  * section families; mixed back into [[Relational]], so every member
  * keeps its `Relational.x` address and the query/oracle maps there.
  */
trait RelationalLayout extends RelationalBase {

  // S5 (CSV sink) + S2 (CSV scan, explicit schema): round-trip through CSV
  // then aggregate — exercises both sides of the CSV path.
  def csvRoundTrip(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch: a re-call (or second session)
   // overwriting the written files would break the first call's lazily
   // pinned frame — the re-call contract IdempotenceSpec pins for the
   // whole scratch-writing family
   graft.SessionCache.memo(spark, s"s05:$dir") {
    // per-input-dir unique path under the system temp dir — no repo
    // absolute path, no cross-run collision on a shared machine
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_roundtrip_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_csv_roundtrip_")
    val src = Tables.load(spark, dir, "nation")
    src.write.mode("overwrite").option("header", "true").csv(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.option("header", "true").schema(schema).csv(tmp)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // S-tier fault tolerance: PERMISSIVE CSV scan over a file with
  // malformed rows — bad casts, extra tokens, short rows. Real 100 TB
  // ingests are never clean; FAILFAST aborts the job on row one and
  // DROPMALFORMED silently loses data, so the production posture is
  // PERMISSIVE + `_corrupt_record` quarantine (parse what parses,
  // null-fill the rest, keep the raw line for a dead-letter sink).
  // The malformed lines are derived deterministically from `nation`
  // (every 5th key: non-numeric field; every 7th: extra token; every
  // 11th: missing token), so the oracle rebuilds the same lines and
  // replays Spark's documented PERMISSIVE semantics token by token.
  def csvPermissive(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s17:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_csv_permissive_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_csv_permissive_")
    val k = col("n_nationkey")
    Tables.load(spark, dir, "nation")
      .select(
        when(k % 5 === 0,
          concat_ws(",", k, col("n_name"), concat(lit("x"), col("n_regionkey"))))
        .when(k % 7 === 0,
          concat_ws(",", k, col("n_name"), col("n_regionkey"), lit("extra")))
        .when(k % 11 === 0, concat_ws(",", k, col("n_name")))
        .otherwise(concat_ws(",", k, col("n_name"), col("n_regionkey")))
        .as("value"))
      .coalesce(1).write.mode("overwrite").text(tmp)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("rk", LongType), StructField("_corrupt_record", StringType)))
    spark.read.option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(schema).csv(tmp)
      .select(col("id"), col("name"), col("rk"),
        col("_corrupt_record").isNotNull.as("is_corrupt"),
        col("_corrupt_record").as("corrupt_raw"))
  }

  // S20: globally-sorted shard output — the 100 TB "write a sorted
  // dataset" pattern: repartitionByRange gives disjoint ordered key
  // ranges across tasks, sortWithinPartitions orders each shard, and
  // together the files form one global order with NO single-task global
  // sort. The query re-reads the written files and proves the invariant
  // from their contents: per-file (lo, hi) key ranges must be pairwise
  // disjoint. Range boundaries come from sampling, so per-shard counts
  // are not deterministic — the published row is the invariant, which is.
  def sortedShards(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s20:$dir") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_sorted_shards_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_sorted_shards_")
    val key = Seq(col("o_totalprice"), col("o_orderkey"))
    Tables.load(spark, dir, "orders")
      .repartitionByRange(8, key: _*)
      .sortWithinPartitions(key: _*)
      .write.mode("overwrite").parquet(path)
    val perFile = spark.read.parquet(path)
      .groupBy(input_file_name().as("f"))
      .agg(
        min(struct(col("o_totalprice"), col("o_orderkey"))).as("lo"),
        max(struct(col("o_totalprice"), col("o_orderkey"))).as("hi"),
        count(lit(1)).as("n"))
    // 8 rows: the window is over the per-shard digest, not the data
    val w = Window.orderBy(col("lo"))
    perFile
      .withColumn("prev_hi", lag(col("hi"), 1).over(w))
      .agg(
        count(lit(1)).as("n_shards"),
        sum(col("n")).as("n_rows"),
        min(col("prev_hi").isNull || col("prev_hi") < col("lo")).as("shards_disjoint"))
  }

  // S24: small-file COMPACTION — the lakehouse maintenance pass. A
  // fragmented table (64 shards here, simulating per-micro-batch or
  // per-task small files) is rewritten into 4 key-clustered, in-shard-
  // sorted files. The published row proves BOTH invariants from the
  // actual filesystem state: the file counts (via input_file_name
  // distinct counts, not trusted constants) and content equality (exact
  // digest over the re-read compacted files, pinned by the oracle
  // computed from the source table — any lost/duplicated row breaks it).
  // At 100 TB this is the scheduled job that keeps scan task counts and
  // file-listing overhead bounded; clustering by user_id while
  // compacting also co-locates the per-user access path.
  def compaction(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s24:$dir") {
    val base = s"${sys.props("java.io.tmpdir")}/graft_compact_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_compact_")
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    ev.repartition(64, col("event_id"))
      .write.mode("overwrite").parquet(s"$base/frag")
    val frag = spark.read.parquet(s"$base/frag")
    frag.repartition(4, col("user_id"))
      .sortWithinPartitions(col("user_id"), col("event_id"))
      .write.mode("overwrite").parquet(s"$base/compact")
    val nBefore = frag.select(input_file_name()).distinct().count()
    val compact = spark.read.parquet(s"$base/compact")
    val nAfter = compact.select(input_file_name()).distinct().count()
    // file counts are data-dependent (Spark emits NO file for an empty
    // hash partition), so the exact numbers can't be oracle constants;
    // publish the compaction INVARIANTS as measured booleans instead —
    // the oracle pins TRUE plus the exact content digest
    compact.agg(
        count(lit(1)).as("n_rows"),
        min(col("event_id")).as("min_event"), max(col("event_id")).as("max_event"),
        sum(dec(col("value"))).cast(DoubleType).as("total_value"))
      .select(lit(nAfter < nBefore).as("files_reduced"),
        lit(nAfter <= 4L).as("files_at_most_target"),
        col("n_rows"), col("min_event"), col("max_event"), col("total_value"))
  }

  /** Field-level encoder for the s23 line format: percent-escape the
    * structural characters (escape '%' FIRST, so it appears in encoded
    * text only as the escape initiator), NULL as the lone '%00' token —
    * impossible in escaped text, where a literal '%' always becomes
    * '%25', so '' and NULL stay distinct through the round-trip
    * (round-14 advice: the earlier empty-field encoding conflated
    * them). LayoutSpec pins the inverse pair on adversarial values. */
  private[graft] def textEncodeField(c: Column): Column =
    coalesce(
      replace(replace(replace(replace(c.cast(StringType),
        lit("%"), lit("%25")), lit("\t"), lit("%09")),
        lit("\n"), lit("%0A")), lit("\r"), lit("%0D")),
      lit("%00"))

  /** Inverse of [[textEncodeField]]: the sentinel check runs on the RAW
    * field (a source value of literally "%00" arrives here as "%2500"),
    * then unescape with %25 LAST — sequential decode is order-safe
    * because '%' appears in encoded text only as the escape initiator. */
  private[graft] def textDecodeField(c: Column): Column =
    replace(replace(replace(replace(nullif(c, lit("%00")),
      lit("%09"), lit("\t")), lit("%0A"), lit("\n")),
      lit("%0D"), lit("\r")), lit("%25"), lit("%"))

  // S: raw `text` source/sink — the line-oriented format for log and
  // corpus ingestion (one string column per line, no schema at all).
  // Nation round-trips as TAB-joined lines; the read side re-parses
  // with split + casts. Same digest as s05/s13, so the shared oracle
  // proves the round-trip through the format was lossless.
  def textRoundTrip(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s23:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_text_roundtrip_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_text_roundtrip_")
    // NULL-safe, DELIMITER-SAFE line format (NullSweep + TextFuzzSweep
    // findings): concat_ws SKIPS null fields, and a field containing
    // the format's own structural characters (tab separator, newline
    // record terminator) would tear the line apart on re-parse — both
    // shift later fields and throw INVALID_ARRAY_INDEX under ANSI.
    // [[textEncodeField]]/[[textDecodeField]] own the escaping and the
    // '%00' NULL sentinel; no-op on the gate tables.
    def enc(c: String) = textEncodeField(col(c))
    Tables.load(spark, dir, "nation")
      .select(concat_ws("\t",
        enc("n_nationkey"), enc("n_name"), enc("n_regionkey")).as("value"))
      .write.mode("overwrite").text(tmp)
    val parts = split(col("value"), "\t")
    def dec(i: Int) = textDecodeField(parts.getItem(i))
    spark.read.text(tmp)
      .select(
        dec(0).cast(IntegerType).as("n_nationkey"),
        dec(1).as("n_name"),
        dec(2).cast(IntegerType).as("n_regionkey"))
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // S: data-skipping scan via a per-file min/max manifest — the pattern
  // behind every lakehouse file-pruning feature (Delta/Iceberg stats,
  // parquet row-group min/max): write range-clustered shards, derive a
  // (file → lo, hi) manifest of the clustering key, prune the MANIFEST
  // against the predicate, and scan only the surviving files. The
  // manifest prune is a driver-side collect, but over per-FILE metadata
  // (one row per shard — thousands of rows at 100 TB, same order as the
  // file listing Spark already collects), not data. Here the manifest is
  // derived by one extra pass at write time; a production table keeps it
  // in the commit log, amortized over every later query. The published
  // row is the box aggregate, which is file-layout-independent; the
  // PRUNING is asserted in LayoutSpec (surviving files < total shards).
  private val s21Box = (150000.0, 250000.0)

  /** Range-clustered shard layout + per-file (lo, hi) manifest of the
    * clustering key, built once per (session, dir).
    */
  private def statsManifest(spark: SparkSession, dir: String): Array[(String, Option[Double], Option[Double])] =
    SessionCache.memo(spark, s"s21_manifest_$dir") {
      // session-tagged: statsPrunedScan's returned frame reads the
      // surviving shard FILES lazily — a second session rewriting the
      // same per-pid path would pull them out from under it
      val p = s"${sys.props("java.io.tmpdir")}/graft_stats_prune_${graft.Fs.sessionTag(spark, dir)}"
      graft.Fs.sweepStaleScratch("graft_stats_prune_")
      val orders = Tables.load(spark, dir, "orders")
      orders.repartitionByRange(8, col("o_totalprice"), col("o_orderkey"))
        .write.mode("overwrite").parquet(p)
      // explicit schema (s11's empty-sink rule): an empty table writes
      // zero shards and the manifest degrades to zero entries
      spark.read.schema(orders.schema).parquet(p)
        .groupBy(input_file_name().as("f"))
        .agg(min(col("o_totalprice")).as("lo"), max(col("o_totalprice")).as("hi"))
        // a file whose key column is ALL null has no min/max — a real
        // stats manifest records "no stats" for such a chunk (NullSweep
        // finding: getDouble threw ROW_VALUE_IS_NULL)
        .collect().map(r => (r.getString(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    }

  /** Files whose [lo, hi] stats intersect the predicate range. A file
    * WITHOUT stats must survive — absent stats cannot prove exclusion
    * (the row filter still applies; null keys never match the box). */
  def statsSurvivors(spark: SparkSession, dir: String): (Array[String], Int) = {
    val m = statsManifest(spark, dir)
    val (loP, hiP) = s21Box
    (m.collect { case (f, lo, hi) if hi.forall(_ >= loP) && lo.forall(_ <= hiP) => f },
      m.length)
  }

  def statsPrunedScan(spark: SparkSession, dir: String): DataFrame = {
    val (survivors, _) = statsSurvivors(spark, dir)
    val (loP, hiP) = s21Box
    // a predicate box every file's stats exclude — the best case for a
    // skipping scan — prunes to ZERO paths; read the empty relation
    // under the table schema instead of asking inference for one
    val pruned =
      if (survivors.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          Tables.load(spark, dir, "orders").schema)
      else spark.read.parquet(survivors.toIndexedSeq: _*)
    pruned
      .filter(col("o_totalprice") >= loP && col("o_totalprice") <= hiP)
      .agg(
        count(lit(1)).as("n_orders"),
        dsum(col("o_totalprice")).as("total"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
  }

  // S: Z-order (Morton) clustering — the multi-dimensional companion to
  // s21's one-key layout. Both dims are normalized to 16-bit ints from
  // their global min/max (scalar-subquery cross join, integer floor
  // division — exact in both engines), bit-interleaved into a 32-bit
  // z-value, and sharded by the z-value's top 6 bits. The published row
  // compares file-skipping effectiveness for a 2-dim box predicate:
  // shards whose (min,max) stats intersect the box under Z-ORDER
  // sharding vs under single-dim (linear) sharding — z-order prunes on
  // BOTH dims, linear only on one, which is the entire reason lakehouse
  // tables z-order multi-predicate columns. Every number is a
  // deterministic function of the data (shard id is computed per row,
  // not sampled), so the whole comparison is oracle-checkable; the
  // physical write of a z-ordered layout is s20/s21's repartition+write
  // on the z-value and is omitted here to keep the query side-effect
  // free. LayoutSpec asserts the skipping inequality on hit fractions.
  private def interleave16(shl: (String, Int) => String, shr: (String, Int) => String,
                           ua: String, ub: String): String =
    (0 until 16).flatMap(i => Seq(
      shl(s"(${shr(ua, i)} & 1)", 2 * i),
      shl(s"(${shr(ub, i)} & 1)", 2 * i + 1))).mkString(" + ")

  private val zInterleaveSpark: String =
    interleave16((e, k) => s"shiftleft($e, $k)", (e, k) => s"shiftright($e, $k)", "ua", "ub")

  private val zInterleaveDuck: String =
    interleave16((e, k) => s"($e << $k)", (e, k) => s"($e >> $k)", "ua", "ub")

  protected val zorderOracleSql: String =
    s"""WITH base AS (SELECT CAST(o_custkey AS BIGINT) AS a,
       |   CAST(date_diff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS b,
       |   o_totalprice FROM orders),
       |bounds AS (SELECT MIN(a) AS amin, MAX(a) AS amax, MIN(b) AS bmin, MAX(b) AS bmax FROM base),
       |u AS (SELECT o_totalprice,
       |   ((a - amin) * 65535) // (amax - amin) AS ua,
       |   ((b - bmin) * 65535) // (bmax - bmin) AS ub FROM base CROSS JOIN bounds),
       |z AS (SELECT o_totalprice, ua, ub, ($zInterleaveDuck) AS zv FROM u),
       |t AS (SELECT o_totalprice, ua, ub, (zv >> 26) AS sz, (ua >> 10) AS sl,
       |   ua BETWEEN 28672 AND 36863 AND ub BETWEEN 28672 AND 36863 AS in_box FROM z),
       |zs AS (SELECT sz, MIN(ua) AS mna, MAX(ua) AS mxa, MIN(ub) AS mnb, MAX(ub) AS mxb
       |  FROM t GROUP BY 1),
       |ls AS (SELECT sl, MIN(ua) AS mna, MAX(ua) AS mxa, MIN(ub) AS mnb, MAX(ub) AS mxb
       |  FROM t GROUP BY 1)
       |SELECT
       | (SELECT COUNT(*) FROM zs) AS n_shards_z,
       | (SELECT CAST(SUM(CASE WHEN mxa >= 28672 AND mna <= 36863
       |     AND mxb >= 28672 AND mnb <= 36863 THEN 1 ELSE 0 END) AS BIGINT) FROM zs) AS n_hit_z,
       | (SELECT COUNT(*) FROM ls) AS n_shards_lin,
       | (SELECT CAST(SUM(CASE WHEN mxa >= 28672 AND mna <= 36863
       |     AND mxb >= 28672 AND mnb <= 36863 THEN 1 ELSE 0 END) AS BIGINT) FROM ls) AS n_hit_lin,
       | (SELECT COUNT(*) FROM t WHERE in_box) AS rows_in_box,
       | (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) FROM t WHERE in_box)
       |   AS total_in_box""".stripMargin

  def zorderClustering(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.load(spark, dir, "orders").select(
      col("o_custkey").cast(LongType).as("a"),
      datediff(col("o_orderdate"), to_date(lit("1990-01-01"))).cast(LongType).as("b"),
      col("o_totalprice"))
    val bounds = base.agg(
      min(col("a")).as("amin"), max(col("a")).as("amax"),
      min(col("b")).as("bmin"), max(col("b")).as("bmax"))
    val tagged = base.crossJoin(bounds)
      .selectExpr("o_totalprice",
        "((a - amin) * 65535) div (amax - amin) AS ua",
        "((b - bmin) * 65535) div (bmax - bmin) AS ub")
      .selectExpr("o_totalprice", "ua", "ub", s"($zInterleaveSpark) AS zv")
      .selectExpr("o_totalprice", "ua", "ub",
        "shiftright(zv, 26) AS sz", "shiftright(ua, 10) AS sl",
        "ua BETWEEN 28672 AND 36863 AND ub BETWEEN 28672 AND 36863 AS in_box")
    // one GROUPING SETS pass computes the per-z-shard extents, the
    // per-linear-shard extents, AND the global in-box scalars: the
    // Expand triples rows map-side but partial aggregation collapses
    // them per partition, so the fact is scanned once here (plus the
    // irreducible bounds pass above) instead of once per consumer —
    // the previous three-consumer form re-executed the tagged subtree
    // (scan + bounds) per reference, 6 fact scans for the same report
    val grouped = tagged
      .groupingSets(Seq(Seq(col("sz")), Seq(col("sl")), Seq()),
        col("sz"), col("sl"))
      .agg(
        min(col("ua")).as("mna"), max(col("ua")).as("mxa"),
        min(col("ub")).as("mnb"), max(col("ub")).as("mxb"),
        count(when(col("in_box"), 1)).as("rows_in_box_g"),
        dsum(when(col("in_box"), col("o_totalprice"))).as("total_in_box_g"),
        grouping_id().as("gid"))
    // gid: 1 = per-sz rows, 2 = per-sl rows, 3 = the single global row
    val hit = (col("mxa") >= 28672 && col("mna") <= 36863 &&
      col("mxb") >= 28672 && col("mnb") <= 36863).cast(LongType)
    grouped.agg(
      count(when(col("gid") === 1, 1)).as("n_shards_z"),
      sum(when(col("gid") === 1, hit)).as("n_hit_z"),
      count(when(col("gid") === 2, 1)).as("n_shards_lin"),
      sum(when(col("gid") === 2, hit)).as("n_hit_lin"),
      max(when(col("gid") === 3, col("rows_in_box_g"))).as("rows_in_box"),
      max(when(col("gid") === 3, col("total_in_box_g"))).as("total_in_box"))
  }

  // JSON-lines round-trip — the remaining text source format: write
  // nation as JSONL, read back with an explicit schema (inference is
  // non-deterministic at scale), same checksum aggregate as s05 so the
  // oracle proves the format preserved the data.
  def jsonRoundTrip(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s13:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_json_roundtrip_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_json_roundtrip_")
    Tables.load(spark, dir, "nation").write.mode("overwrite").json(tmp)
    val schema = StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType)))
    spark.read.schema(schema).json(tmp)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), max(col("n_name")).as("max_name"))
      .orderBy(col("n_regionkey"))
  }

  // ORC round-trip — the second columnar format (parquet is everywhere
  // else): write orders as ORC, read back, aggregate. ORC carries its
  // own schema and supports the same predicate pushdown tier.
  def orcRoundTrip(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s14:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_orc_roundtrip_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_orc_roundtrip_")
    Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      .write.mode("overwrite").orc(tmp)
    spark.read.orc(tmp)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus"))
  }

  // S18: dynamic partition OVERWRITE — the lakehouse backfill primitive.
  // A full partitioned write, then a patch batch containing ONLY one
  // year rewrites JUST that partition (partitionOverwriteMode=dynamic;
  // static mode would truncate the whole table to the patch). At 100 TB
  // this is how a bad day/hour is recomputed without touching the other
  // partitions, and the readback aggregate proves the untouched
  // partitions survived byte-for-byte.
  def dynamicPartitionOverwrite(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s18:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_dyn_overwrite_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_dyn_overwrite_")
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        year(col("o_orderdate")).as("o_year"))
    orders.write.partitionBy("o_year").mode("overwrite").parquet(tmp)
    orders.filter(col("o_year") === 1995)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .write.partitionBy("o_year").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(tmp)
    // explicit schema: a backfill whose patch (and table) matched zero
    // rows leaves no data files — the reader must not depend on
    // inference (s11's empty-sink rule)
    spark.read.schema(orders.schema).parquet(tmp)
      .groupBy(col("o_year"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_year"))
  }

  // S25: TIME TRAVEL over a versioned table — the snapshot-isolation
  // read every lakehouse format (Delta/Iceberg) sells, on plain
  // parquet: each version directory is a full consistent snapshot
  // (write-new-then-swap, the e13 protocol — a writer never mutates a
  // directory a reader may be pinned to), so a reader pinned "as of
  // v1" is untouched by v2 landing next to it. v2 applies a
  // deterministic balance adjustment to 1 in 10 customers; the query
  // reads BOTH versions side by side — the audit a backfill publishes:
  // per-version row count, exact decimal-summed balance total, and the
  // changed-row count vs the pinned v1 (a join the 100 TB version
  // diffs via the same key equi-join). Proves isolation (v1's numbers
  // are bit-identical to the pre-write table) and change accounting.
  def timeTravel(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s08): a
   // re-call rewriting v=1/v=2 in place is exactly the mutate-a-pinned-
   // snapshot violation this query exists to demonstrate against
   graft.SessionCache.memo(spark, s"s25:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_time_travel_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_time_travel_")
    val cust = Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    cust.write.mode("overwrite").parquet(s"$tmp/v=1")
    cust.withColumn("c_acctbal",
        when(pmod(col("c_custkey"), lit(10)) === 0, col("c_acctbal") + 100.0)
          .otherwise(col("c_acctbal")))
      .write.mode("overwrite").parquet(s"$tmp/v=2")
    val v1 = spark.read.parquet(s"$tmp/v=1")
      .select(col("c_custkey"), col("c_acctbal").as("bal_v1"))
    val perVersion = Seq(1, 2).map { v =>
      val snap = spark.read.parquet(s"$tmp/v=$v")
      val agg = snap.agg(count(lit(1)).as("n_rows"),
        dsum(col("c_acctbal")).as("total_acctbal"))
      val changed = snap.join(v1, "c_custkey")
        .filter(col("c_acctbal") =!= col("bal_v1"))
        .agg(count(lit(1)).as("n_changed_vs_v1"))
      agg.crossJoin(changed).select(lit(v).as("version"),
        col("n_rows"), col("total_acctbal"), col("n_changed_vs_v1"))
    }
    perVersion.reduce(_.unionAll(_)).orderBy(col("version"))
  }

  // S19: schema evolution on read — batches written before a column
  // existed coexist with batches written after (mergeSchema=true unions
  // the file footers; old rows surface NULL for the new column). At
  // 100 TB nobody rewrites history for an added column — the READER
  // absorbs the evolution; this pins that old batches stay readable
  // and the new column is null exactly where it predates the schema.
  def schemaEvolution(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s05)
   graft.SessionCache.memo(spark, s"s19:$dir") {
    val tmp = s"${sys.props("java.io.tmpdir")}/graft_schema_evo_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_schema_evo_")
    val nation = Tables.load(spark, dir, "nation")
    nation.select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$tmp/batch=1")
    nation.select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").parquet(s"$tmp/batch=2")
    spark.read.option("mergeSchema", "true").option("basePath", tmp)
      .parquet(tmp)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("batch").cast(IntegerType).as("batch"))
      .orderBy(col("batch"), col("n_nationkey"))
  }

  // S7: staging temp views + SQL entry point (reference COPY→staging +
  // ad-hoc SQL tier): every table registered in the catalog, the query
  // itself expressed in SQL text against the views.
  def sqlOverViews(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders WHERE o_orderstatus = 'F'
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  // S8/S9: catalog DDL + table sinks (reference create_tables.py:6-28 +
  // sql_queries.py:149-152) — DROP/CREATE TABLE in the session catalog,
  // saveAsTable staging, INSERT INTO … SELECT materialization, then a
  // query over the re-read final table.
  def catalogRoundTrip(spark: SparkSession, dir: String): DataFrame =
   // memoized + per-session names: the DDL round-trip IS the operator,
   // but a re-call (or a second session) re-running DROP/CREATE would
   // delete the files under the first call's returned frame — the
   // re-call contract IdempotenceSpec pins across the whole
   // scratch-writing family
   graft.SessionCache.memo(spark, s"s08:$dir") {
    val db = s"graft_wh_s${graft.Fs.sessionToken(spark)}"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_wh_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_wh_")
    // the session catalog is in-memory: a fresh session won't know about
    // files a previous process left at the location — wipe them so the
    // managed-table CREATE below is reproducible
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    spark.sql(s"DROP TABLE IF EXISTS $db.nation_stage")
    Tables.load(spark, dir, "nation").write.saveAsTable(s"$db.nation_stage")
    spark.sql(s"DROP TABLE IF EXISTS $db.nation_final")
    spark.sql(
      s"CREATE TABLE $db.nation_final (n_regionkey INT, n_name STRING) USING parquet")
    spark.sql(
      s"INSERT INTO $db.nation_final SELECT n_regionkey, n_name FROM $db.nation_stage")
    spark.table(s"$db.nation_final")
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"), min(col("n_name")).as("min_name"))
      .orderBy(col("n_regionkey"))
  }

  // Partitioned write + partition-pruned scan (the reference's own scale
  // wish, README.md:23,156): orders written partitioned by year, read
  // back with a partition filter — `.explain` shows PartitionFilters
  // with only the matching directory scanned.
  def partitionedScan(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s11:$dir") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_orders_byyear_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_orders_byyear_")
    val byYear = Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    byYear.write.mode("overwrite").partitionBy("o_year").parquet(path)
    // explicit schema: a sink written from an EMPTY batch (the zero-
    // matching-rows backfill) has no data files to infer from, and the
    // production reader of a partitioned table gets its schema from the
    // catalog, not from sampling files
    spark.read.schema(byYear.schema).parquet(path)
      .filter(col("o_year") === 1995)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // Dynamic partition pruning: the year filter lives on the DIM side of
  // the join, not the fact scan — at planning time the fact's partition
  // set is unknown, and Catalyst injects a runtime pruning subquery from
  // the broadcast dim so only the matching o_year directories are read
  // (PlanSpec asserts the dynamicpruning filter). THE star-schema scale
  // feature: a 100 TB fact never scans partitions the dims exclude.
  def dynamicPruning(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-tagged scratch (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s15:$dir") {
    val path = s"${sys.props("java.io.tmpdir")}/graft_orders_dpp_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_orders_dpp_")
    val byYear = Tables.load(spark, dir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    byYear.write.mode("overwrite").partitionBy("o_year").parquet(path)
    // the dim must be a SCANNED relation with a selective filter for the
    // planner to judge pruning worthwhile — a VALUES relation gets
    // constant-folded and its filter disappears before the DPP rule runs
    val dimPath = s"${path}_dim"
    spark.sql("SELECT * FROM VALUES (1995, 'target'), (1996, 'other') AS t(d_year, d_label)")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter(col("d_label") === "target")
    // explicit schema for the same empty-sink reason as s11 (the dim is
    // a 2-row literal write, never empty)
    spark.read.schema(byYear.schema).parquet(path)
      .join(dim, col("o_year") === col("d_year"))
      .groupBy(col("d_label"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  // Runtime Bloom-filter join pruning: the selective dim-side filter is
  // turned into a bloom_filter_might_contain predicate INJECTED on the
  // fact side before its shuffle (InjectRuntimeFilter), so rows that
  // cannot join are dropped at the scan instead of being shuffled —
  // the row-level sibling of s15's dynamic PARTITION pruning, and the
  // second runtime-filtering pillar for a 100 TB fact table. The MERGE
  // hint keeps the join sort-merge (a broadcast join needs no bloom);
  // injection fires when the application side clears the size
  // threshold — production-sized on the driver's session, scaled down
  // in PlanSpec, identical results either way (oracle = plain join).
  def bloomFilterJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    Tables.load(spark, dir, "lineitem")
      .join(urgent.hint("MERGE"), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast(LongType).as("total_qty"))
      .orderBy(col("l_linestatus"))
  }

  // Bucketed table + shuffle-free aggregation: orders written bucketed
  // by o_custkey, so the per-customer aggregate runs with ZERO exchanges
  // (the bucketing satisfies the required hash distribution). This is
  // the co-location story for 100 TB: pay the shuffle once at write
  // time, every keyed agg/join after that is exchange-free.
  def bucketedAgg(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-scoped warehouse (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s12:$dir") {
    val db = s"graft_whb_${tmpTag(dir)}_s${graft.Fs.sessionToken(spark)}"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_whb_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_whb_")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    Tables.load(spark, dir, "orders").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(s"$db.orders_bucketed")
    spark.table(s"$db.orders_bucketed")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
  }

  // Bucketed CO-LOCATED join: customer and orders BOTH written bucketed
  // (and sorted) on the join key into the warehouse, then joined — the
  // sort-merge join runs with ZERO hash exchanges on either side and no
  // per-query sort, because bucket layout satisfies the join's required
  // distribution and ordering. s12 showed the agg half of the
  // co-location story; this is the join half — at 100 TB the difference
  // between reshuffling two fact tables per query and reading aligned
  // buckets. The downstream per-customer agg is ALSO exchange-free (agg
  // key = bucket key). MERGE hints pin SMJ so AQE's broadcast choice at
  // toy scale doesn't hide the layout contract PlanSpec asserts.
  def bucketedJoin(spark: SparkSession, dir: String): DataFrame =
    bucketedJoinInner(spark, dir).orderBy(col("c_custkey"))

  private[graft] def bucketedJoinInner(spark: SparkSession, dir: String): DataFrame =
   // memoized + session-scoped warehouse (re-call contract, see s08)
   graft.SessionCache.memo(spark, s"s26:$dir") {
    // per-dir name (vecDb's contract): a second data dir in the same
    // JVM must not DROP this dir's tables out from under lazy frames;
    // per-session suffix: nor may a second session or a re-call
    val db = s"graft_whbj_${tmpTag(dir)}_s${graft.Fs.sessionToken(spark)}"
    val loc = s"${sys.props("java.io.tmpdir")}/graft_whbj_${graft.Fs.sessionTag(spark, dir)}"
    graft.Fs.sweepStaleScratch("graft_whbj_")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    graft.Fs.rmTree(new java.io.File(loc))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db LOCATION '$loc'")
    Tables.load(spark, dir, "customer").write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable(s"$db.customer_bucketed")
    Tables.load(spark, dir, "orders").write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable(s"$db.orders_bucketed")
    spark.table(s"$db.customer_bucketed").hint("MERGE")
      .join(spark.table(s"$db.orders_bucketed").hint("MERGE"),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_price"))
  }

  // S10: static VALUES row source joined against a table.
  def staticValuesJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val zones = Seq((0, "ZONE-A"), (1, "ZONE-B"), (2, "ZONE-C"), (3, "ZONE-D"), (4, "ZONE-E"))
      .toDF("zone_key", "zone_name")
    Tables.load(spark, dir, "region")
      .join(zones, col("r_regionkey") === col("zone_key"))
      .select(col("r_regionkey"), col("r_name"), col("zone_name"))
      .orderBy(col("r_regionkey"))
  }
}
