package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder brief): images/audio/video ride as
  * opaque `binary` payload columns with a typed metadata struct; decode /
  * feature-extract steps are imperative per-partition stages with a
  * STUBBED deterministic "decoder" (no codec libraries in this
  * environment — the Spark-side schema, partitioning, and batch shape are
  * the real, tested part).
  *
  * Scale notes: payloads stay columnar (Parquet binary) and are only
  * materialized inside the mapPartitions stage that needs the bytes;
  * metadata-only queries prune the payload column at the scan. The
  * feature extractor emits fixed-width vectors so downstream is plain
  * relational/ANN work ([[Similarity]]).
  */
object Multimodal {

  /** A decoded media record: fixed-shape feature vector + passthrough id.
    * Mirrors the (id, features) hand-off a real image/audio decoder batch
    * would produce. */
  final case class MediaFeatures(media_id: Long, byte_len: Int, features: Array[Float])

  /** Attach a payload (binary) + metadata struct to a text frame — the
    * ingestion shape for media tables: (id, payload, meta{width, fmt}). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(col("n_chars").cast("int").as("width"), lit("txt").as("fmt")).as("meta"))

  /** STUB decoder: a deterministic 16-bin byte histogram, L1-normalized —
    * stands in for image decode + feature extraction. Runs per-partition
    * over the raw bytes (the real-decoder integration point: swap the
    * body, keep the signature). */
  def decodeFeatures(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, bytes) =>
        val hist = new Array[Float](16)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) >> 4) += 1f; i += 1 }
        val n = math.max(bytes.length, 1).toFloat
        var j = 0
        while (j < 16) { hist(j) /= n; j += 1 }
        MediaFeatures(id, bytes.length, hist)
      }
    }
  }

}
