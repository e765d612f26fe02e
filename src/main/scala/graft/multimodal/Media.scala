package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Typed multimodal records: opaque binary payload + structured metadata,
  * the column layout a 100 TB image/audio/video corpus uses (content stays
  * an opaque blob; everything queryable lives in typed metadata).
  */
case class MediaMeta(mime: String, width: Int, height: Int, durationMs: Long)
case class MediaRecord(docId: Long, content: Array[Byte], meta: MediaMeta)
case class MediaFeatures(docId: Long, mime: String, nBytes: Long,
                         byteMean: Double, phash: Long)

/** Multimodal decode/feature pipeline over typed Datasets.
  *
  * `decode` is the seam where a real codec would run (mapPartitions =
  * batch-at-a-time, exactly the mapInPandas shape); the container has no
  * image/audio libs, so the body is a DETERMINISTIC STUB (byte statistics
  * + a fake perceptual hash) — the schema, partitioning, and typed-batch
  * plumbing around it are the real, tested part.
  */
object Media {

  /** Build typed media records from the documents table (text bytes stand
    * in for image payloads; metadata is derived deterministically).
    */
  def fromDocuments(spark: SparkSession, sfDir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text").cast("binary").as("content"),
        col("n_chars"), col("lang"))
      .as[(Long, Array[Byte], Long, String)]
      .map { case (id, bytes, nChars, lang) =>
        MediaRecord(id, bytes,
          MediaMeta(mime = s"text/$lang",
            width = (nChars % 640).toInt, height = (nChars % 480).toInt,
            durationMs = nChars * 10))
      }
  }

  /** STUB decode: batch-wise feature extraction over the binary payload. */
  def decode(records: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        var sum = 0L; var ph = 1125899906842597L // fake perceptual hash seed
        var i = 0
        while (i < r.content.length) {
          val b = r.content(i) & 0xff
          sum += b
          ph = ph * 31 + b
          i += 1
        }
        val mean = if (r.content.length == 0) 0.0 else sum.toDouble / r.content.length
        MediaFeatures(r.docId, r.meta.mime, r.content.length.toLong, mean, ph)
      }
    }
  }

  /** Frame sampling: every `stride`-th byte as a "frame", typed output. */
  def sampleFrames(records: Dataset[MediaRecord], stride: Int): DataFrame = {
    import records.sparkSession.implicits._
    records.flatMap { r =>
      Iterator.range(0, r.content.length, stride).map { off =>
        (r.docId, off, r.content(off) & 0xff)
      }
    }.toDF("doc_id", "frame_offset", "frame_value")
  }
}
