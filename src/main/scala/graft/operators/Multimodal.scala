package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * runs as per-partition batch code over those bytes (the shape a real
  * image/audio decoder needs — one native handle per partition, bytes
  * in, typed feature rows out).
  *
  * STUB DECODER: this container has no image/audio libraries, so
  * [[fakeDecodeFeatures]] derives deterministic pseudo-features
  * (dimensions, channel count, frame count) from the md5 hex of the
  * payload instead of decoding it. The Spark-side plumbing — binary
  * column in, mapPartitions with per-partition decoder init, case-class
  * Encoder out — is real, and the fake is pure so the DuckDB oracle
  * cross-checks the full path.
  */
object Multimodal {

  /** Typed feature row a real decoder would emit. */
  case class MediaFeatures(doc_id: Long, n_bytes: Int, width: Int,
                           height: Int, n_channels: Int, n_frames: Int)

  /** Per-partition "decode": md5-derived pseudo-features. A production
    * build swaps the body of `decode` for the real library call — the
    * partition-level structure (one decoder instance per partition,
    * streaming iterator, no per-row init) stays identical.
    */
  def fakeDecodeFeatures(docs: DataFrame): Dataset[MediaFeatures] = {
    val spark = docs.sparkSession
    import spark.implicits._
    // a media row without an id or payload is un-decodable: production
    // ingest rejects it upstream of the decoder (NullSweep finding: a
    // null payload NPE'd the whole decode stage); no-op on gate data
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition decoder init (the real-decoder handle analogue)
        val md = java.security.MessageDigest.getInstance("MD5")
        def decode(id: Long, bytes: Array[Byte]): MediaFeatures = {
          md.reset()
          val hex = md.digest(bytes).map("%02x".format(_)).mkString
          def a(i: Int): Int = hex.charAt(i).toInt // ascii of hex char
          MediaFeatures(
            doc_id = id,
            n_bytes = bytes.length,
            width = 16 + (a(0) % 16) * 8,
            height = 16 + (a(1) % 16) * 8,
            n_channels = 1 + a(2) % 3,
            n_frames = 1 + a(3) % 8)
        }
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  def decodeQuery(spark: SparkSession, dir: String): DataFrame =
    fakeDecodeFeatures(Tables.load(spark, dir, "documents")).toDF()

  /** One sampled frame row per (payload, frame index). */
  case class Frame(doc_id: Long, frame_idx: Int, frame_hash: String)

  /** Frame sampling: a video-shaped payload fans out to n_frames rows
    * (frame count md5-derived like m02), one content hash per frame —
    * the 1-row-in/N-rows-out decode shape (a UDTF in other engines;
    * mapPartitions + flatMap here). A real build would decode and
    * sample actual frames; the per-frame hash keys the downstream
    * dedup/embedding stages either way.
    */
  def fakeSampleFrames(docs: DataFrame): Dataset[Frame] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull) // m02's ingest rule
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        it.flatMap { case (id, text) =>
          val n = 1 + hex(text).charAt(3).toInt % 8 // same n_frames as m02
          (0 until n).iterator.map(i => Frame(id, i, hex(s"$text#$i")))
        }
      }
  }

  def frameQuery(spark: SparkSession, dir: String): DataFrame =
    fakeSampleFrames(Tables.load(spark, dir, "documents")).toDF()

  /** Binary-file ingestion: media assets arrive as FILES; Spark's
    * binaryFile source reads each as one row of (path, length, content
    * bytes) — the entry point for payloads that aren't already in a
    * table. Ingests the repo's fixture CSVs as stand-in assets.
    */
  def binaryIngest(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile")
      .load("/root/repo/fixtures/*.csv")
      .select(
        regexp_extract(col("path"), "[^/]+$", 0).as("file_name"),
        col("length"),
        md5(col("content")).as("content_md5"))
      .orderBy(col("file_name"))

  /** Container-header field parse in pure SQL over the binary payload:
    * the leading bytes read as big-endian integers via hex slicing
    * (magic tag = bytes 1-4, second field = bytes 5-8) — the declarative
    * complement to the mapPartitions decoders, for formats whose header
    * fields are worth predicate-pushing on before any decode runs.
    */
  def headerFields(spark: SparkSession, dir: String): DataFrame = {
    val bin = encode(col("text"), "UTF-8")
    val hx = hex(bin)
    Tables.load(spark, dir, "documents")
      .filter(octet_length(encode(col("text"), "UTF-8")) >= 8)
      .select(
        col("doc_id"),
        conv(substring(hx, 1, 8), 16, 10).cast("long").as("tag_be"),
        conv(substring(hx, 9, 8), 16, 10).cast("long").as("field2_be"),
        octet_length(bin).as("n_bytes"))
  }

  /** One scored item out of a fixed-size model batch. */
  case class BatchScored(doc_id: Long, batch_id: Long, batch_size: Int,
                         slot: Int, item_hash: String)

  /** m06: BATCHED decode/inference — the GPU-model shape the per-row
    * decoders above can't express: accelerators want fixed-size input
    * batches, so items are grouped into deterministic micro-batches
    * (`batch_id = doc_id div 32`), each batch materialized in memory,
    * "scored" in one call, and emitted item-by-item with its batch
    * coordinates. `groupByKey.flatMapGroups` is the idiomatic typed
    * carrier: ONE shuffle on batch_id co-locates each batch, group size
    * is bounded by construction (≤32 — never a whole partition in
    * memory), and a real build swaps the hash for the model call while
    * the partition/batch plumbing stays identical. Deterministic batch
    * membership (id-derived, not arrival-derived) is also what makes
    * resumable/retryable inference possible at 100 TB — and what lets
    * the oracle replay batch_size/slot/hash exactly.
    */
  def batchedScore(docs: DataFrame): Dataset[BatchScored] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.filter(col("doc_id").isNotNull && col("text").isNotNull) // m02's ingest rule
      .select(col("doc_id"), col("text")).as[(Long, String)]
      .groupByKey { case (id, _) => id / 32 }
      .flatMapGroups { (batchId: Long, it: Iterator[(Long, String)]) =>
        val items = it.toArray.sortBy(_._1) // ≤32 rows by construction
        val md = java.security.MessageDigest.getInstance("MD5")
        def hex(s: String): String = {
          md.reset()
          md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
        }
        items.iterator.zipWithIndex.map { case ((id, text), slot) =>
          BatchScored(id, batchId, items.length, slot, hex(s"$text:$batchId"))
        }
      }
  }

  def batchQuery(spark: SparkSession, dir: String): DataFrame =
    batchedScore(Tables.load(spark, dir, "documents")).toDF()

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m02_fake_decode" -> (decodeQuery _),
    "m06_batched_decode" -> (batchQuery _),
    "m03_frame_sample" -> (frameQuery _),
    "m04_binary_ingest" -> (binaryIngest _),
    "m05_header_fields" -> (headerFields _))

  val oracles: Map[String, String] = Map(
    "m06_batched_decode" ->
      """WITH b AS (SELECT doc_id, text, doc_id // 32 AS batch_id FROM documents
        |           WHERE doc_id IS NOT NULL AND text IS NOT NULL),
        |r AS (SELECT doc_id, batch_id, text,
        |   CAST(COUNT(*) OVER (PARTITION BY batch_id) AS INTEGER) AS batch_size,
        |   CAST(ROW_NUMBER() OVER (PARTITION BY batch_id ORDER BY doc_id) - 1 AS INTEGER) AS slot
        | FROM b)
        |SELECT doc_id, batch_id, batch_size, slot,
        |  md5(text || ':' || batch_id) AS item_hash FROM r""".stripMargin,
    "m02_fake_decode" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | CAST(16 + (ascii(substr(md5(text), 1, 1)) % 16) * 8 AS INTEGER) AS width,
        | CAST(16 + (ascii(substr(md5(text), 2, 1)) % 16) * 8 AS INTEGER) AS height,
        | CAST(1 + ascii(substr(md5(text), 3, 1)) % 3 AS INTEGER) AS n_channels,
        | CAST(1 + ascii(substr(md5(text), 4, 1)) % 8 AS INTEGER) AS n_frames
        |FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL""".stripMargin,
    "m03_frame_sample" ->
      """WITH n AS (SELECT doc_id, text,
        |   1 + ascii(substr(md5(text), 4, 1)) % 8 AS n_frames FROM documents
        |   WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        |SELECT doc_id, CAST(i AS INTEGER) AS frame_idx,
        |  md5(text || '#' || i) AS frame_hash
        |FROM n, unnest(range(n_frames)) AS u(i)""".stripMargin,
    "m05_header_fields" ->
      """SELECT doc_id,
        | CAST(('0x' || substring(hex(encode(text)), 1, 8)) AS BIGINT) AS tag_be,
        | CAST(('0x' || substring(hex(encode(text)), 9, 8)) AS BIGINT) AS field2_be,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes
        |FROM documents WHERE octet_length(encode(text)) >= 8""".stripMargin,
    // decode(), not CAST: casting a blob to VARCHAR escapes bytes
    "m04_binary_ingest" ->
      """SELECT regexp_extract(filename, '[^/]+$', 0) AS file_name,
        | CAST(size AS BIGINT) AS length,
        | md5(decode(content)) AS content_md5
        |FROM read_blob('/root/repo/fixtures/*.csv')
        |ORDER BY 1""".stripMargin)
}
