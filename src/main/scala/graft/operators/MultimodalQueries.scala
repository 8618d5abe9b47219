package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (extension suite): media as opaque binary
  * columns + typed metadata, with decode / feature-extract / frame-sample
  * kernels run per-partition in batches.
  *
  * The decode step is STUBBED with a deterministic fake (no image/audio
  * libraries in this container — see MediaKernels.decodeStub); everything
  * around it — binary column handling, schema, batched mapPartitions
  * shape, partition sizing — is real and tested. At 100 TB the media
  * bytes never leave their partition: the kernel is a map, and only the
  * small extracted features flow onward.
  */
object MultimodalQueries {

  /** Input row for the media kernel: id + opaque bytes + typed metadata. */
  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String,
      n_bytes: Long)

  /** Extracted features (what a real decoder would emit). */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, first_byte: Int,
      checksum: Long, fake_score: Double)

  object MediaKernels {
    /** STUB for the real decoder (would be libjpeg/ffmpeg/soundfile via a
      * native batch API). Deterministic fake derived from the bytes so
      * results are oracle-checkable; replace body with the real decode
      * when the libraries exist. */
    def decodeStub(r: MediaRow): MediaFeatures = {
      val first = if (r.media.nonEmpty) r.media(0) & 0xff else -1
      var crc = 0L
      var i = 0
      while (i < r.media.length) { crc = crc * 31 + (r.media(i) & 0xffL); i += 1 }
      MediaFeatures(
        doc_id = r.doc_id,
        media_type = r.media_type,
        n_bytes = r.n_bytes,
        width = (first % 64) + 1, // fake "decoded" dimensions
        height = ((r.n_bytes % 64) + 1).toInt,
        n_frames = (r.n_bytes / 1000 + 1).toInt, // fake frame-sample count
        first_byte = first,
        checksum = crc,
        fake_score = (r.n_bytes % 256).toDouble / 255.0)
    }

    /** Batched kernel driver: groups rows into fixed-size batches the way a
      * GPU/native decoder wants its input (batch shape is the real part). */
    def decodePartition(rows: Iterator[MediaRow],
        batchSize: Int = 64): Iterator[MediaFeatures] =
      rows.grouped(batchSize).flatMap { batch =>
        // a real implementation would hand `batch` to the native API once
        batch.map(decodeStub)
      }
  }

  /** Binary ingest → batched decode → feature table. The media column here
    * is the utf-8 bytes of documents.text (the container has no real media
    * files); schema/partitioning/kernel shape are identical for real bytes. */
  val decodePipeline: QueryDef = QueryDef(
    "x_media_decode",
    (s, dir) => {
      import s.implicits._
      val media = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          encode(col("text"), "UTF-8").as("media"),
          when(col("doc_id") % 3 === 0, "image")
            .when(col("doc_id") % 3 === 1, "audio")
            .otherwise("video").as("media_type"),
          octet_length(encode(col("text"), "UTF-8")).cast("bigint")
            .as("n_bytes"))
        .as[MediaRow]
      media.mapPartitions(rows => MediaKernels.decodePartition(rows))
        .toDF()
        .select(col("doc_id"), col("media_type"), col("n_bytes"),
          col("width"), col("height"), col("n_frames"), col("first_byte"),
          col("fake_score"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             CAST(octet_length(text::BLOB) AS BIGINT) AS n_bytes,
             (ascii(text[1]) % 64) + 1 AS width,
             CAST((octet_length(text::BLOB) % 64) + 1 AS INTEGER) AS height,
             CAST(octet_length(text::BLOB) // 1000 + 1 AS INTEGER) AS n_frames,
             ascii(text[1]) AS first_byte,
             CAST(octet_length(text::BLOB) % 256 AS DOUBLE) / 255.0 AS fake_score
      FROM documents ORDER BY doc_id""")
  )

  /** Frame sampling: slice the binary into fixed-stride "frames" and emit
    * one row per sampled frame (explode over the media column) — the
    * video-pipeline shape (decode → sample every Nth frame → per-frame
    * features). */
  val frameSample: QueryDef = QueryDef(
    "x_media_frame_sample",
    (s, dir) => {
      val stride = 500
      Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("media"))
        .withColumn("n_bytes", octet_length(col("media")).cast("bigint"))
        .withColumn("frame_idx", explode(expr(
          s"sequence(0, cast(greatest((n_bytes - 1) / $stride, 0) as int))")))
        .withColumn("frame",
          expr(s"substring(media, frame_idx * $stride + 1, $stride)"))
        .select(col("doc_id"), col("frame_idx"),
          octet_length(col("frame")).as("frame_bytes"),
          expr("ascii(substring(cast(frame as string), 1, 1))")
            .as("frame_first_byte"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    oracle = Some(s"""
      WITH d AS (SELECT doc_id, text, octet_length(text::BLOB) AS n_bytes
                 FROM documents WHERE doc_id < 100),
           f AS (SELECT doc_id, n_bytes,
                        unnest(range(0, CAST(greatest((n_bytes - 1) // 500, 0)
                                             AS BIGINT) + 1)) AS frame_idx
                 FROM d)
      SELECT f.doc_id, CAST(f.frame_idx AS INTEGER) AS frame_idx,
             CAST(least(500, d.n_bytes - f.frame_idx * 500) AS INTEGER)
               AS frame_bytes,
             ascii(d.text[CAST(f.frame_idx * 500 + 1 AS INTEGER)])
               AS frame_first_byte
      FROM f JOIN d USING (doc_id)
      ORDER BY doc_id, frame_idx""")
  )

  def defs: Seq[QueryDef] = Seq(decodePipeline, frameSample)
}
