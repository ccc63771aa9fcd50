package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with typed metadata, processed in distributed batches.
  *
  * The decode step itself is STUBBED (this container has no image/audio
  * codecs): [[FakeDecoder]] is a deterministic stand-in that derives
  * "decoded" properties from the bytes. Everything around it — the binary
  * column schema, the typed `Dataset` shape, per-partition batched
  * processing (`mapPartitions`, the Scala analogue of `mapInPandas`
  * batches), partition sizing, and the declarative metadata path — is real
  * and tested.
  *
  * Scale notes: payload bytes never hit a shuffle — the decode is a narrow
  * map over the scan, and the metadata-only projection (`mm_meta`) prunes
  * the payload column entirely when only metadata is needed (column
  * pruning reaches the parquet scan).
  */
object Multimodal {

  /** A multimodal record: opaque payload + typed envelope. */
  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

  /** Decoded (stub) features — the schema a real decoder would produce. */
  case class MediaFeatures(
      doc_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Deterministic fake decode — replace with a real codec binding in
    * production. Derives pseudo-dimensions from the payload bytes.
    */
  object FakeDecoder {
    def decode(r: MediaRecord): MediaFeatures = {
      var h = 0L
      var i = 0
      while (i < r.payload.length) {
        h = (h * 31L + (r.payload(i) & 0xff)) % 1000000007L
        i += 1
      }
      MediaFeatures(r.doc_id, r.kind, r.payload.length,
        width = (h % 640L).toInt + 1, height = (h % 480L).toInt + 1,
        n_frames = if (r.kind == "video") (h % 120L).toInt + 1 else 1,
        checksum = h)
    }
  }

  /** The events->media source: payload = UTF-8 bytes of a synthesized
    * body (stands in for image bytes; deterministic in both engines).
    */
  def mediaRecords(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** The full typed decode pipeline: binary in, features out, batched per
    * partition (no shuffle). Exercised by ScalaTest; the oracle-checkable
    * projection is [[meta]].
    */
  def decodeAll(spark: SparkSession, sfDir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaRecords(spark, sfDir).mapPartitions(_.map(FakeDecoder.decode))
  }

  /** Declarative metadata extraction over the binary column — the
    * checksum here is the same fold as the stub decoder, expressed as a
    * column over the payload bytes (ASCII text payload -> PolyHash on the
    * string equals the byte fold), proving the mapPartitions pipeline and
    * the declarative path agree.
    */
  def meta(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.PolyHash.poly_hash
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"),
        poly_hash(decode(col("payload"), "UTF-8")).as("checksum"))
      .withColumn("width", (col("checksum") % 640 + 1).cast("int"))
      .withColumn("height", (col("checksum") % 480 + 1).cast("int"))
  }

  val metaSql: String = {
    import graft.functions.PolyHash.{sql => polySql}
    s"""SELECT doc_id,
          CASE WHEN doc_id % 3 = 0 THEN 'image'
               WHEN doc_id % 3 = 1 THEN 'audio'
               ELSE 'video' END AS kind,
          octet_length(encode(text)) AS n_bytes,
          ${polySql("text")} AS checksum,
          CAST(${polySql("text")} % 640 + 1 AS INT) AS width,
          CAST(${polySql("text")} % 480 + 1 AS INT) AS height
        FROM documents"""
  }

  /** Frame sampling — the video-pipeline primitive (probe every k-th
    * frame, fingerprint it for frame-level dedup / shot detection): the
    * payload is treated as a dense sequence of fixed-size frames; the
    * operator emits one row per SAMPLED frame with its index, offset and
    * content fingerprint. Pure column expressions (sequence + explode +
    * substring + PolyHash) — a narrow map over the scan with a ×(frames/
    * stride) fan-out and no shuffle; at 100 TB the payload bytes never
    * leave their input split. (A real codec would replace the fixed-size
    * slicing with keyframe offsets from the container index — the
    * sampling/fingerprint plumbing is identical.)
    */
  def frameSample(spark: SparkSession, sfDir: String,
      frameLen: Int = 64, sampleEvery: Int = 4): DataFrame = {
    import graft.functions.PolyHash.poly_hash
    val body = decode(encode(col("text"), "UTF-8"), "UTF-8") // payload round-trip
    val nFrames = ceil(length(body).cast("double") / frameLen).cast("long")
    Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        body.as("body"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("kind"), col("n_frames"), col("body"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(sampleEvery.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("kind"), col("n_frames"), col("frame_idx"),
        (col("frame_idx") * frameLen + 1).as("offset"),
        poly_hash(expr(s"substring(body, CAST(frame_idx * $frameLen + 1 AS INT), $frameLen)"))
          .as("frame_fp"))
  }

  def frameSampleSql(frameLen: Int = 64, sampleEvery: Int = 4): String = {
    import graft.functions.PolyHash.{sql => polySql}
    s"""WITH d AS (
          SELECT doc_id,
            CASE WHEN doc_id % 3 = 0 THEN 'image'
                 WHEN doc_id % 3 = 1 THEN 'audio'
                 ELSE 'video' END AS kind,
            text AS body,
            CAST(ceil(length(text) / $frameLen.0) AS BIGINT) AS n_frames
          FROM documents),
        f AS (
          SELECT doc_id, kind, n_frames,
            unnest(range(0, n_frames, $sampleEvery)) AS frame_idx, body
          FROM d WHERE n_frames > 0)
        SELECT doc_id, kind, n_frames, frame_idx,
          frame_idx * $frameLen + 1 AS offset,
          ${polySql(s"substring(body, CAST(frame_idx * $frameLen + 1 AS INT), $frameLen)")} AS frame_fp
        FROM f"""
  }
}
