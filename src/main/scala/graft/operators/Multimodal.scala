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

  /** Frame sampling over the binary payload: treat the payload as a
    * sequence of fixed-size `frameBytes` frames and keep every
    * `everyK`-th one — the video frame-sample step with a bytes-level
    * frame model (a real container parser would replace the fixed
    * stride with codec frame boundaries; the Spark-side plumbing —
    * binary slicing, per-frame explode, content keys — is the real,
    * tested part).
    *
    * Pure map-side: one generator per media row emits only the SAMPLED
    * frames (the filter sits under the projection, so skipped frames
    * are never materialized); payload bytes never shuffle — downstream
    * gets (media_id, frame_idx, frame md5) plus the frame bytes for
    * the decode stage. Partial trailing frames are dropped (floor).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, everyK: Int): DataFrame = {
    require(frameBytes > 0 && everyK > 0, "frameBytes and everyK must be positive")
    val nFrames = (length(col("payload")) / frameBytes).cast("int")
    // sequence(0, n-1) defaults to step -1 when n-1 < 0 — guard the
    // sub-frame payload with an explicit empty array
    val frameIds = when(nFrames > 0, sequence(lit(0), nFrames - 1))
      .otherwise(array().cast("array<int>"))
    media
      .select(col("media_id"), col("payload"),
        explode(frameIds).as("f"))
      .where(col("f") % everyK === 0)
      .select(col("media_id"), col("f").cast("long").as("frame_idx"),
        col("payload").substr(col("f") * frameBytes + 1, lit(frameBytes))
          .as("frame"))
      .select(col("media_id"), col("frame_idx"),
        length(col("frame")).cast("long").as("frame_len"),
        md5(col("frame")).as("frame_key"))
  }

  /** L87 — PCM window energy: interpret the binary payload as a
    * little-endian signed 16-bit sample stream and report, per
    * `windowSamples`-sample window, the exact integer energy Σ s² and
    * the RMS — REAL signal-processing compute with zero codec
    * dependency (int16 PCM is arithmetic, not a format), which makes
    * this the multimodal path whose compute is NOT a stub: silence
    * detection, loudness normalization, and VAD-style gating all start
    * from exactly this number.
    *
    * Decode rides the hex representation (`hex(payload)` is engine-
    * portable; `conv` accepts either case), so the oracle computes the
    * identical samples; energies are integer-exact (≤ W·2³⁰ per
    * window — long math), RMS is one sqrt per window.
    *
    * Pure map-side: one generator per media row emits one row per
    * window; payload bytes never shuffle; the per-window fold is an
    * integer sum (order-free). Partial trailing windows are dropped. */
  def pcmWindowEnergy(media: DataFrame, windowSamples: Int): DataFrame = {
    require(windowSamples > 0, "windowSamples must be positive")
    val w = windowSamples
    // Native kernel: one codegen'd byte loop emits the per-window
    // energy array (the hex + HOF-fold formulation of the same sums is
    // CodegenFallback and measured ~9× slower at sf1 — see SCALE.md;
    // PcmEnergiesSpec pins bit-parity between the two).
    media
      .select(col("media_id"),
        posexplode(graft.functions.PcmEnergies
          .pcmEnergies(col("payload"), w)).as(Seq("win", "energy")))
      .select(col("media_id"), col("win").cast("long").as("win_idx"),
        col("energy"),
        sqrt(col("energy").cast("double") / w).as("rms"))
  }

  /** The portable hex + higher-order-fold formulation [[pcmWindowEnergy]]
    * replaced — kept as the independent parity witness (and the exact
    * shape of the DuckDB oracle). */
  private[graft] def pcmWindowEnergyHof(media: DataFrame,
                                        windowSamples: Int): DataFrame = {
    val w = windowSamples
    val nWin = (length(col("payload")) / (2 * w)).cast("int")
    val winIds = when(nWin > 0, sequence(lit(0), nWin - 1))
      .otherwise(array().cast("array<int>"))
    media
      .select(col("media_id"), hex(col("payload")).as("_hx"),
        explode(winIds).as("win"))
      .withColumn("energy", expr(
        s"""aggregate(transform(sequence(0, ${w - 1}), i ->
              CAST(conv(substring(_hx, (win * $w + i) * 4 + 3, 2) ||
                        substring(_hx, (win * $w + i) * 4 + 1, 2), 16, 10)
                AS BIGINT)),
            CAST(0 AS BIGINT),
            (acc, u) -> acc + CASE WHEN u >= 32768 THEN (u - 65536) * (u - 65536)
                                   ELSE u * u END)"""))
      .select(col("media_id"), col("win").cast("long").as("win_idx"),
        col("energy"),
        sqrt(col("energy").cast("double") / w).as("rms"))
  }

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
