package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** One media item: opaque binary payload + typed metadata. */
final case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

/** Decoded features for one media item. */
final case class MediaFeatures(doc_id: Long, media_type: String,
    n_bytes: Int, width: Int, height: Int, features: Array[Float])

/** One sampled "frame" of a media payload. */
final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

/** One resized media payload (checksum = sum of output byte values —
  * lets an oracle verify the exact byte selection, not just the size). */
final case class MediaResized(doc_id: Long, width: Int, height: Int,
    n_bytes: Int, checksum: Long)

/** Multimodal column support: treat image/audio/video as opaque `binary`
  * columns with typed metadata, and run decode / feature-extraction /
  * frame-sampling as partition-batched functions over `Dataset[T]`.
  *
  * The DECODE STEP IS A STUB — this container has no image/audio codecs,
  * so `decodeStub` computes a deterministic fake (byte histogram as the
  * "feature vector", dimensions derived from payload length). Everything
  * around it is real and load-bearing: binary schema, encoder-backed
  * `mapPartitions` (the Scala analog of `mapInPandas` — per-partition
  * batches, constant memory), partitioning, and the feature schema
  * downstream consumers (e.g. [[Similarity]]) expect. Swapping in a real
  * codec changes only the body of `decodeStub`.
  */
object Multimodal {

  val FeatureDim = 16

  /** Deterministic fake decoder: 16-bin byte histogram as features,
    * width/height derived from length. Replace with a real codec call. */
  def decodeStub(r: MediaRow): MediaFeatures = {
    val hist = new Array[Float](FeatureDim)
    var i = 0
    while (i < r.payload.length) {
      hist((r.payload(i) & 0xFF) / FeatureDim) += 1f
      i += 1
    }
    val w = math.max(1, math.sqrt(r.payload.length.toDouble).toInt)
    MediaFeatures(r.doc_id, r.media_type, r.payload.length, w,
      (r.payload.length + w - 1) / w, hist)
  }

  /** documents.text bytes as a stand-in media payload (real pipelines
    * read `binary` parquet columns the same way). */
  def asMedia(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs.select(col("doc_id"), lit("image/fake").as("media_type"),
      encode(col("text"), "UTF-8").as("payload")).as[MediaRow]
  }

  /** Feature extraction: partition-batched map — the mapInPandas-shaped
    * hot loop. No shuffle; output schema is fixed and columnar. */
  def extractFeatures(media: Dataset[MediaRow])
      (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }

  /** Deterministic fake resize: nearest-neighbor byte selection into a
    * target-area output (out[i] = payload[i·n/area]) — a real resampler
    * swaps only this function's body; the Dataset plumbing (1 row in →
    * 1 smaller row out, partition-batched, no shuffle) is the shape a
    * real image resize runs in. */
  def resizeStub(r: MediaRow, targetW: Int, targetH: Int): MediaResized = {
    require(targetW > 0 && targetH > 0 &&
      targetW.toLong * targetH <= Int.MaxValue,
      s"invalid resize target ${targetW}x$targetH")
    val area = targetW * targetH
    val n = r.payload.length
    var sum = 0L
    var i = 0
    while (i < area) {
      val b = if (n == 0) 0 else r.payload((i.toLong * n / area).toInt) & 0xFF
      sum += b
      i += 1
    }
    MediaResized(r.doc_id, targetW, targetH, area, sum)
  }

  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int)
      (implicit spark: SparkSession): Dataset[MediaResized] = {
    import spark.implicits._
    media.mapPartitions(_.map(resizeStub(_, targetW, targetH)))
  }

  /** Frame sampling: every `stride`-th 64-byte slice of the payload —
    * the video-frame-extraction shape (1 input row → n output rows). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int)
      (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    media.flatMap { r =>
      r.payload.grouped(64).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 => MediaFrame(r.doc_id, idx, chunk)
      }
    }
  }

  // --------------------------------------------------------- driver queries
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary metadata — oracle-checkable (byte-based oracle below)
    "mm_meta" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      asMedia(Tables.load(s, dir, "documents")).toDF()
        .select(col("doc_id"), col("media_type"),
          octet_length(col("payload")).as("n_bytes"))
        .orderBy(col("doc_id"))
    }),
    // full decode pipeline; histogram mass == payload bytes gives an
    // independent oracle over the stubbed decoder's plumbing
    "mm_features" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      extractFeatures(asMedia(Tables.load(s, dir, "documents"))).toDF()
        .select(col("doc_id"), col("n_bytes"),
          size(col("features")).as("n_features"),
          aggregate(col("features"), lit(0.0d),
            (acc, x) => acc + x.cast("double")).cast("long").as("feat_mass"))
        .orderBy(col("doc_id"))
    }),
    // resize: exact byte selection verified via the checksum (the
    // oracle re-derives every selected byte from hex(encode(text)))
    "mm_resize" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      resize(asMedia(Tables.load(s, dir, "documents")), 8, 8).toDF()
        .orderBy(col("doc_id"))
    }),
    // frame sampling: 1→n row expansion shape
    "mm_frames" -> ((s, dir) => {
      implicit val sp: SparkSession = s
      sampleFrames(asMedia(Tables.load(s, dir, "documents")), stride = 2).toDF()
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(octet_length(col("frame"))).as("sampled_bytes"))
        .orderBy(col("doc_id"))
    })
  )

  // Every oracle below is BYTE-based (octet_length over the UTF-8
  // encoding; byte values re-derived from substr of hex(encode(text))) —
  // NOT character-based — so a corpus with non-ASCII text (the '•'/'…'
  // the Gopher rules handle) still compares exactly against the
  // byte-indexed stubs instead of silently diverging at the checksum.
  def oracleSql: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, 'image/fake' AS media_type,
        |  octet_length(encode(text)) AS n_bytes
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_features" ->
      s"""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
        |  $FeatureDim AS n_features,
        |  octet_length(encode(text)) AS feat_mass
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the nearest-neighbor byte selection re-derived byte by byte: byte
    // i of the payload is hex chars [2i+1, 2i+2] of hex(encode(text));
    // integer division mirrors the stub's (i·n)/area index
    "mm_resize" ->
      """WITH h AS (
        |  SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents)
        |SELECT doc_id, 8 AS width, 8 AS height, 64 AS n_bytes,
        |  CAST(CASE WHEN n = 0 THEN 0 ELSE
        |    list_sum([CAST(('0x' || substr(hx, 2 * ((i * n) // 64) + 1, 2))
        |       AS INT) for i in range(64)]) END AS BIGINT) AS checksum
        |FROM h ORDER BY doc_id""".stripMargin,
    "mm_frames" ->
      """WITH t AS (
        |  SELECT doc_id, octet_length(encode(text)) AS n,
        |    (octet_length(encode(text)) + 63) // 64 AS nch
        |  FROM documents)
        |SELECT doc_id,
        |  CAST((nch + 1) // 2 AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN (nch - 1) % 2 = 0
        |       THEN 64 * ((nch + 1) // 2 - 1) + (n - 64 * (nch - 1))
        |       ELSE 64 * ((nch + 1) // 2) END AS BIGINT) AS sampled_bytes
        |FROM t ORDER BY doc_id""".stripMargin
  )
}
