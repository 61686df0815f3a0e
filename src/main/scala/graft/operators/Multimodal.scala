package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (SURVEY.md §2.7): opaque `binary`
  * payloads + typed metadata, with a batched per-partition
  * "decode → feature-extract" stage.
  *
  * The container has no image/audio codecs, so the decode itself is a
  * clearly-marked DETERMINISTIC STUB (byte-histogram features); every
  * Spark-side piece — binary schema, metadata struct, batch shape,
  * partition-parallel mapPartitions, fixed-width output vector — is
  * real and is exactly what a libjpeg/ffmpeg-backed decoder would plug
  * into. At 100 TB this stage is map-only: no shuffle, payload bytes
  * never leave their partition.
  */
object Multimodal {

  val FeatureDim = 16

  /** Synthesizes a binary payload column from document text (the test
    * corpus has no real media; payload bytes are deterministic), plus
    * the typed metadata a real media table carries. */
  def withPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        length(encode(col("text"), "UTF-8")).cast("long").as("size_bytes"),
        lit("application/octet-stream").as("mime"),
        xxhash64(col("text")).as("content_hash")).as("meta"))

  /** STUB decoder (integer form): a real implementation would hand
    * `bytes` to an image/audio codec here. The stand-in computes a
    * deterministic 16-bin byte histogram — same shape, same batch
    * semantics, zero external deps. Counts (not ratios) so the driver
    * oracle compares exact integers with no float-rounding hazard. */
  private[operators] def stubHistogram(bytes: Array[Byte]): Array[Long] = {
    val hist = new Array[Long](FeatureDim)
    if (bytes != null) {
      var i = 0
      while (i < bytes.length) { hist((bytes(i) & 0xff) % FeatureDim) += 1L; i += 1 }
    }
    hist
  }

  /** Normalized-feature view of the stub histogram (the shape an
    * embedding-producing codec would emit). */
  private[operators] def stubDecode(bytes: Array[Byte]): Array[Double] = {
    val hist = stubHistogram(bytes)
    val out = new Array[Double](FeatureDim)
    if (bytes != null && bytes.nonEmpty) {
      var j = 0
      while (j < FeatureDim) { out(j) = hist(j).toDouble / bytes.length; j += 1 }
    }
    out
  }

  private val outSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("size_bytes", LongType),
    StructField("format", StringType),
    StructField("features", ArrayType(DoubleType)),
    StructField("hist", ArrayType(LongType))))

  /** Decode + feature-extract over partition-local batches. Magic-byte
    * sniffing happens before decode (a real pipeline routes JPEG/PNG/
    * WAV to different codecs from the same dispatch point). */
  def mmDecode(s: SparkSession, dir: String): DataFrame = {
    val src = withPayload(Tables.documents(s, dir))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    src.select(col("doc_id"), col("payload"), col("meta.size_bytes").as("size_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val format = // magic-byte sniff — real dispatch point for codecs
            if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
            else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
            else "raw"
          Row(r.getAs[Long]("doc_id"), r.getAs[Long]("size_bytes"), format,
            stubDecode(bytes).toSeq, stubHistogram(bytes).toSeq)
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** Driver-facing projection of [[mmDecode]]: the histogram widened to
    * scalar BIGINT columns `f0..f15` (the driver's pandas compare can't
    * sort/hash array cells; integers also hash exactly). The oracle
    * mirrors the stub's byte arithmetic — the corpus is pure ASCII, so
    * DuckDB's per-character codepoints ARE the payload bytes. */
  def mmDecodeChecked(s: SparkSession, dir: String): DataFrame = {
    val bins = (0 until FeatureDim).map(j => col("hist")(j).as(s"f$j"))
    mmDecode(s, dir)
      .select(col("doc_id") +: col("size_bytes") +: col("format") +: bins: _*)
      .orderBy("doc_id")
  }

  /** STUB resize: a real implementation re-rasterizes decoded pixels;
    * the stand-in folds the feature histogram to `dim` bins — same
    * contract (fixed input shape → smaller fixed output shape). */
  private[operators] def stubResize(features: Array[Double], dim: Int): Array[Double] = {
    val out = new Array[Double](dim)
    var i = 0
    while (i < features.length) { out(i % dim) += features(i); i += 1 }
    out
  }

  /** Integer-count twin of [[stubResize]] for the histogram form. */
  private[operators] def stubResizeCounts(hist: Array[Long], dim: Int): Array[Long] = {
    val out = new Array[Long](dim)
    var i = 0
    while (i < hist.length) { out(i % dim) += hist(i); i += 1 }
    out
  }

  /** Frame sampling for video/audio-shaped payloads: split the binary
    * payload into fixed-size blocks ("frames"), keep every `stride`-th
    * block, emit per-frame features. The explode keeps frame rows
    * partition-local until an aggregate asks for a shuffle — at 100 TB
    * frames never leave the partition that decoded them. Codec is the
    * same deterministic stub as mmDecode. */
  def mmFrameSample(s: SparkSession, dir: String, frameBytes: Int = 64,
                    stride: Int = 4, resizeDim: Int = 4): DataFrame = {
    val src = withPayload(Tables.documents(s, dir))
    val frameSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("frame_idx", LongType),
      StructField("n_frames", LongType),
      StructField("features", ArrayType(DoubleType)),
      StructField("hist", ArrayType(LongType))))
    val enc = org.apache.spark.sql.Encoders.row(frameSchema)
    src.select(col("doc_id"), col("payload"))
      .flatMap { r =>
        val bytes = r.getAs[Array[Byte]]("payload")
        val frames = bytes.grouped(frameBytes).toArray
        val sampled = frames.zipWithIndex.filter(_._2 % stride == 0)
        sampled.map { case (frame, idx) =>
          Row(r.getAs[Long]("doc_id"), idx.toLong, sampled.length.toLong,
            stubResize(stubDecode(frame), resizeDim).toSeq,
            stubResizeCounts(stubHistogram(frame), resizeDim).toSeq)
        }
      }(enc)
      .orderBy("doc_id", "frame_idx")
  }

  /** Driver-facing projection of [[mmFrameSample]]: per-frame resized
    * histogram counts widened to BIGINT columns `c0..c3`. Folding the
    * 16 byte-mod bins into 4 means `c_j` counts bytes with
    * `byte % 4 == j` — exactly what the DuckDB oracle computes. */
  def mmFrameSampleChecked(s: SparkSession, dir: String, resizeDim: Int = 4): DataFrame = {
    val bins = (0 until resizeDim).map(j => col("hist")(j).as(s"c$j"))
    mmFrameSample(s, dir, resizeDim = resizeDim)
      .select(col("doc_id") +: col("frame_idx") +: col("n_frames") +: bins: _*)
      .orderBy("doc_id", "frame_idx")
  }

  /** Oracle-checkable metadata projection (`mm_meta`): payload size and
    * a prefix of the payload re-decoded to string — DuckDB can compute
    * both from the raw table. */
  def mmMeta(s: SparkSession, dir: String): DataFrame =
    withPayload(Tables.documents(s, dir))
      .select(
        col("doc_id"),
        col("meta.size_bytes").as("size_bytes"),
        substring(decode(col("payload"), "UTF-8"), 1, 16).as("head"))
      .orderBy("doc_id")
}
