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
          val format = sniffFormat(bytes)
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

  // --- real codec path: PNG via javax.imageio (ships inside the JDK,
  // no external libraries) ---------------------------------------------

  // keep ImageIO memory-only on executors (default stream cache spills
  // to a temp FILE per decode — pure overhead for byte-array payloads)
  javax.imageio.ImageIO.setUseCache(false)

  /** Synthesizes a REAL, valid PNG whose pixels are a closed-form
    * function of `docId` — so a SQL oracle can compute the expected
    * decode output without any codec:
    * `w = 4 + id%8`, `h = 4 + id%5`,
    * pixel(x,y) = (r,g,b) = ((x+id)%256, (y+2id)%256, (x+y+3id)%256).
    * PNG is lossless, so a correct decoder must recover these exactly. */
  private[graft] def pngBytes(docId: Long): Array[Byte] = {
    val w = (4 + docId % 8).toInt; val h = (4 + docId % 5).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((x + docId) % 256).toInt
        val g = ((y + 2 * docId) % 256).toInt
        val b = ((x + y + 3 * docId) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL image decode: hands the bytes to the JDK's PNG codec and
    * reduces the raster to (width, height, per-channel sums). Returns
    * None when the bytes aren't a decodable image (corrupt payload →
    * caller falls back to the raw/stub path instead of failing the
    * partition). */
  private[graft] def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Long, Long, Long)] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        var sr = 0L; var sg = 0L; var sb = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            val p = img.getRGB(x, y)
            sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
            x += 1
          }
          y += 1
        }
        Some((img.getWidth, img.getHeight, sr, sg, sb))
      }
    } catch { case _: Exception => None }

  /** Magic-byte sniff shared by the decode operators — the dispatch
    * point where a production pipeline routes payloads to codecs. */
  private[graft] def sniffFormat(bytes: Array[Byte]): String =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8) "jpeg"
    else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P') "png"
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E') "wav"
    else "raw"

  // --- real codec path #2: WAV via javax.sound.sampled (also inside
  // the JDK — the audio modality with zero new dependencies) -----------

  /** Synthesizes a REAL, valid RIFF/WAVE payload (PCM signed 16-bit
    * little-endian mono @ 8 kHz) whose samples are a closed-form
    * function of `docId` — the [[pngBytes]] trick for the audio
    * modality: `n = 16 + id%16` samples,
    * `sample(i) = ((i·(1 + id%7)·257 + id) mod 65536) − 32768`.
    * PCM is lossless, so a correct decoder must recover these
    * exactly, and a SQL oracle can aggregate them without a codec. */
  private[graft] def wavBytes(docId: Long): Array[Byte] = {
    val n = (16 + docId % 16).toInt
    val step = (1 + docId % 7).toInt
    val pcm = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val v = (((i.toLong * step * 257 + docId) % 65536L) - 32768L).toInt
      pcm(2 * i) = (v & 0xff).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    wavWriter.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** The WAVE SPI writer, loaded once per JVM — same per-call
    * `AudioSystem.write` provider-scan cost as the reader side. */
  @transient private lazy val wavWriter: javax.sound.sampled.spi.AudioFileWriter = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileWriter])
      .iterator().asScala
      .find(_.isFileTypeSupported(javax.sound.sampled.AudioFileFormat.Type.WAVE))
      .getOrElse(sys.error("no WAVE AudioFileWriter installed in this JRE"))
  }

  /** The installed WAV/audio SPI readers, loaded ONCE per JVM.
    * `AudioSystem.getAudioInputStream` re-runs the synchronized
    * ServiceLoader provider scan on EVERY call — measured as the
    * dominant cost of `mm_decode_wav` at the 10× replica scale (20×
    * wall at 10× data, 32 threads contending on the scan). Caching
    * the readers through the same public SPI AudioSystem itself uses
    * keeps the real JDK codec and drops the per-payload lookup. */
  @transient private lazy val audioReaders: Seq[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    java.util.ServiceLoader.load(classOf[javax.sound.sampled.spi.AudioFileReader])
      .iterator().asScala.toSeq
  }

  private def audioStreamOf(bytes: Array[Byte]): Option[javax.sound.sampled.AudioInputStream] = {
    val it = audioReaders.iterator
    while (it.hasNext) {
      val r = it.next()
      try return Some(r.getAudioInputStream(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: Exception => () } // not this provider's format — try the next
    }
    None
  }

  /** REAL audio decode: hands the bytes to the JDK's WAV reader and
    * reduces the PCM stream to (n_samples, sum, min, max). None when
    * the bytes aren't decodable 16-bit mono PCM — caller degrades to
    * the raw path instead of failing the partition. */
  private[graft] def decodeWav(bytes: Array[Byte]): Option[(Long, Long, Long, Long)] =
    try {
      val ais = audioStreamOf(bytes).getOrElse(return None)
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n == 0) None
        else {
          var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
          var i = 0
          while (i < n) {
            val v = (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          Some((n.toLong, sum, mn, mx))
        }
      }
    } catch { case _: Exception => None }

  private val wavSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("n_samples", LongType),
    StructField("sum_s", LongType),
    StructField("min_s", LongType),
    StructField("max_s", LongType),
    StructField("n_bytes", LongType)))

  /** Mixed real/stub AUDIO decode (`mm_decode_wav`): every 5th
    * document carries a real synthesized WAV, the rest raw UTF-8
    * bytes; dispatch on the sniffed RIFF/WAVE magic, decode through
    * the in-JDK codec, degrade to the raw byte-sum path on corrupt
    * payloads. Same map-only 100 TB shape as [[mmDecodeReal]] —
    * payload bytes never leave their partition — making the
    * multimodal story two-modality with zero new dependencies.
    * `n_bytes` is decoder-derived PCM data length (2·n_samples) for
    * audio rows and payload length for raw rows, so the oracle needs
    * no knowledge of the RIFF container layout. */
  def mmDecodeWav(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(wavSchema)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload =
            if (id % 5 == 0) wavBytes(id)
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          def rawRow = {
            var sum = 0L; var i = 0
            while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
            Row(id, "raw", 0L, sum, 0L, 0L, payload.length.toLong)
          }
          sniffFormat(payload) match {
            case "wav" =>
              decodeWav(payload) match {
                case Some((n, sum, mn, mx)) => Row(id, "wav", n, sum, mn, mx, 2 * n)
                case None => rawRow
              }
            case _ => rawRow
          }
        }
      }(enc)
      .orderBy("doc_id")
  }

  /** Raw PCM samples through the real codec path — [[decodeWav]]'s
    * decode with the sample VALUES kept (the feature-extraction
    * consumer needs the waveform, not just its aggregate). None on
    * anything that isn't decodable 16-bit mono PCM. */
  private[graft] def decodePcmSamples(bytes: Array[Byte]): Option[Array[Long]] =
    try {
      val ais = audioStreamOf(bytes).getOrElse(return None)
      val fmt = ais.getFormat
      if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 || fmt.isBigEndian ||
        fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) None
      else {
        val data = ais.readAllBytes()
        val n = data.length / 2
        if (n == 0) None
        else {
          val out = new Array[Long](n)
          var i = 0
          while (i < n) {
            out(i) = (((data(2 * i + 1) << 8) | (data(2 * i) & 0xff)).toShort).toLong
            i += 1
          }
          Some(out)
        }
      }
    } catch { case _: Exception => None }

  private val audioFeatSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("win", LongType),
    StructField("n", LongType),
    StructField("sum_sq", LongType),
    StructField("zc", LongType),
    StructField("peak", LongType)))

  /** Windowed audio FEATURE EXTRACTION over the real decode path
    * (`mm_audio_features`) — the frame-level DSP step an audio
    * training pipeline runs after decode (VAD, silence trimming,
    * loudness normalization all start from these): per 8-sample
    * window, energy (Σv², the RMS numerator), zero-crossing count,
    * and peak amplitude. The WAV payloads decode through the SAME
    * in-JDK codec as [[mmDecodeWav]] ([[decodePcmSamples]]) — PCM is
    * lossless, so the features are integer-exact and the oracle
    * recomputes them from the closed-form sample formula with no
    * codec at all. Integer features on purpose: no float epsilon in
    * the contract. Map-only (payloads never leave their partition),
    * windows emitted per row; a payload that fails the codec emits
    * nothing (degrade spec'd). */
  def mmAudioFeatures(s: SparkSession, dir: String, winSize: Int = 8): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioFeatSchema)
    Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 5 === 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          decodePcmSamples(wavBytes(id)) match {
            case Some(samples) =>
              val out = scala.collection.mutable.ArrayBuffer.empty[Row]
              var w = 0
              while (w * winSize < samples.length) {
                val start = w * winSize
                val end = math.min(start + winSize, samples.length)
                var ss = 0L; var zc = 0L; var pk = 0L
                var i = start
                while (i < end) {
                  val v = samples(i)
                  ss += v * v
                  if (math.abs(v) > pk) pk = math.abs(v)
                  if (i > start && ((v >= 0) != (samples(i - 1) >= 0))) zc += 1
                  i += 1
                }
                out += Row(id, w.toLong, (end - start).toLong, ss, zc, pk)
                w += 1
              }
              out
            case None => Iterator.empty
          }
        }
      }(enc)
      .orderBy("doc_id", "win")
  }

  private val imageFeatSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("y", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("grad_r", LongType)))

  /** Per-scanline image FEATURE EXTRACTION over the real decode path
    * (`mm_image_features`) — the [[mmAudioFeatures]] shape for the
    * image modality: for every row y of the decoded raster, the
    * per-channel sums plus the horizontal gradient energy
    * Σ|r(x,y) − r(x−1,y)| (the edge-detector numerator a vision
    * pipeline's blur/quality filters start from). The PNG payloads
    * decode through the SAME in-JDK codec as [[mmDecodeReal]] — PNG
    * is lossless, so every feature is integer-exact and the oracle
    * recomputes them from the closed-form pixel formula with no codec
    * at all. Map-only: payload bytes never leave their partition; a
    * payload that fails the codec emits nothing (degrade spec'd). */
  def mmImageFeatures(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatSchema)
    Tables.documents(s, dir).select(col("doc_id"))
      .filter(col("doc_id") % 5 === 0)
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          decodeRaster(pngBytes(id)) match {
            case Some(img) =>
              (0 until img.getHeight).iterator.map { y =>
                var sr = 0L; var sg = 0L; var sb = 0L; var gr = 0L
                var prevR = 0
                var x = 0
                while (x < img.getWidth) {
                  val p = img.getRGB(x, y)
                  val rr = (p >> 16) & 0xff
                  sr += rr; sg += (p >> 8) & 0xff; sb += p & 0xff
                  if (x > 0) gr += math.abs(rr - prevR)
                  prevR = rr
                  x += 1
                }
                Row(id, y.toLong, sr, sg, sb, gr)
              }
            case None => Iterator.empty
          }
        }
      }(enc)
      .orderBy("doc_id", "y")
  }

  /** The decoded raster itself, for feature extractors that need
    * pixels rather than [[decodeImage]]'s whole-image aggregate. */
  private[graft] def decodeRaster(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  private val realSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("format", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sum_r", LongType),
    StructField("sum_g", LongType),
    StructField("sum_b", LongType),
    StructField("n_px", LongType)))

  /** Mixed real/stub decode (`mm_decode_real`): every 5th document
    * carries a REAL synthesized PNG payload, the rest keep raw UTF-8
    * bytes. The map dispatches on sniffed magic bytes: PNG → the JDK
    * codec decodes actual pixels (width/height/channel sums); raw →
    * the stub byte-sum path; a payload that SNIFFS as an image but
    * fails to decode also degrades to the raw path. One map-only pass,
    * payload bytes never leave their partition — the same 100 TB shape
    * as [[mmDecode]], now with a real codec behind one branch. */
  def mmDecodeReal(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(realSchema)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload =
            if (id % 5 == 0) pngBytes(id)
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          def rawRow = {
            var sum = 0L; var i = 0
            while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
            Row(id, "raw", 0L, 0L, sum, 0L, 0L, payload.length.toLong)
          }
          sniffFormat(payload) match {
            case "png" =>
              decodeImage(payload) match {
                case Some((w, h, sr, sg, sb)) =>
                  Row(id, "png", w.toLong, h.toLong, sr, sg, sb, w.toLong * h)
                case None => rawRow
              }
            case _ => rawRow
          }
        }
      }(enc)
      .orderBy("doc_id")
  }

  // --- real codec path #3: animated GIF via javax.imageio (the
  // multi-frame/"video" modality, still zero new dependencies) ---------

  /** Synthesizes a REAL multi-frame animated GIF whose per-frame
    * pixels are a closed-form function of `docId` — the [[pngBytes]]
    * trick for the frame-sampled modality:
    * `nF = 2 + id%4` frames of `w = 4 + id%5` × `h = 3 + id%4`
    * 8-bit grayscale, `pixel(x,y,f) = (x + 3y + 5f + id) mod 256`.
    * The palette is an explicit 256-entry identity grayscale
    * IndexColorModel, so GIF's palette indirection is lossless and a
    * SQL oracle can sum expected pixels with no codec knowledge. */
  private[graft] def gifBytes(docId: Long): Array[Byte] = {
    val nF = (2 + docId % 4).toInt
    val w = (4 + docId % 5).toInt; val h = (3 + docId % 4).toInt
    val gray = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, gray, gray, gray)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    // the JDK GIF writer defaults to INTERLACED output, and its
    // interlace row scheduling drops/zeroes pass rows for images
    // shorter than a full pass cycle (measured: row 2 of every h ≤ 4
    // frame decoded as zeros) — force sequential row order
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nF) {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, ((x + 3 * y + 5 * f + docId) % 256).toInt)
          x += 1
        }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), param)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    bos.toByteArray
  }

  /** REAL multi-frame decode: hands the bytes to the JDK's GIF reader
    * and reduces each frame to (width, height, pixel sum) — grayscale,
    * so one channel carries the value. None when the bytes aren't a
    * decodable GIF (corrupt payload → caller degrades to the raw
    * framing path instead of failing the partition). Reader instances
    * are per-call (ImageIO readers are not thread-safe) but come from
    * ImageIO's STATIC plugin registry — a map lookup, not the
    * per-call ServiceLoader rescan that stalled the WAV path. */
  private[graft] def decodeGif(bytes: Array[Byte]): Option[Array[(Int, Int, Long)]] = {
    var iis: javax.imageio.stream.ImageInputStream = null
    var reader: javax.imageio.ImageReader = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      reader = readers.next()
      reader.setInput(iis)
      val n = reader.getNumImages(true)
      if (n <= 0) return None
      val out = new Array[(Int, Int, Long)](n)
      var i = 0
      while (i < n) {
        val img = reader.read(i)
        var sum = 0L
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            sum += img.getRGB(x, y) & 0xff // grayscale: any channel
            x += 1
          }
          y += 1
        }
        out(i) = (img.getWidth, img.getHeight, sum)
        i += 1
      }
      Some(out)
    } catch { case _: Exception => None }
    finally {
      if (reader != null) reader.dispose()
      if (iis != null) try iis.close() catch { case _: Exception => () }
    }
  }

  /** GIF87a/89a magic sniff, the [[sniffFormat]] entry for the
    * multi-frame modality. */
  private[graft] def isGif(bytes: Array[Byte]): Boolean =
    bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a'

  private val gifSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", LongType),
    StructField("format", StringType),
    StructField("n_frames", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("sum_px", LongType)))

  /** Mixed real/stub FRAME SAMPLING (`mm_frame_sample_gif`): every 5th
    * document carries a real synthesized animated GIF — frames decoded
    * through the in-JDK multi-frame reader, every `stride`-th frame
    * kept (the video keyframe-sampling shape); the rest split their
    * raw UTF-8 bytes into fixed 64-byte blocks and sample those, so
    * BOTH branches exercise the same sample-then-reduce plumbing. One
    * map-only pass, frames never leave the partition that decoded
    * them; a payload that sniffs as GIF but fails to decode degrades
    * to the raw framing path. Completes the third (multi-frame/video)
    * modality with a real codec, zero new dependencies. */
  def mmFrameSampleGif(s: SparkSession, dir: String, stride: Int = 2,
                       rawFrameBytes: Int = 64, rawStride: Int = 4): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(gifSchema)
    Tables.documents(s, dir).select(col("doc_id"), col("text"))
      .flatMap { r =>
        val id = r.getLong(0)
        val payload =
          if (id % 5 == 0) gifBytes(id)
          else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
        def rawRows = {
          val frames = payload.grouped(rawFrameBytes).toArray
          frames.zipWithIndex.filter(_._2 % rawStride == 0).map { case (fr, idx) =>
            var sum = 0L; var i = 0
            while (i < fr.length) { sum += fr(i) & 0xff; i += 1 }
            Row(id, idx.toLong, "raw", frames.length.toLong, 0L, 0L, sum)
          }.toSeq
        }
        if (isGif(payload)) {
          decodeGif(payload) match {
            case Some(frames) =>
              frames.zipWithIndex.filter(_._2 % stride == 0).map { case ((w, h, sum), f) =>
                Row(id, f.toLong, "gif", frames.length.toLong, w.toLong, h.toLong, sum)
              }.toSeq
            case None => rawRows
          }
        } else rawRows
      }(enc)
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

  // --- image-modality dedup (`mm_image_dedup`) ------------------------

  /** 63-bit difference hash (dHash — Krawetz's perceptual-hash family)
    * of a decoded raster: grayscale g = r+g+b (the sum, kept integer)
    * sampled on a fixed 8-row × 9-column nearest-neighbor grid
    * (x_j = ⌊j·w/9⌋, y_i = ⌊i·h/8⌋ — no interpolation, so every bit is
    * exact integer arithmetic a SQL oracle replays from the closed-form
    * pixels), bit(i,j) = g(x_j,y_i) > g(x_{j+1},y_i). Bit 63 is kept
    * clear (the [[graft.operators.Dedup.md5Hash60Sql]] discipline: the
    * hash stays in the positive BIGINT range both engines share — a
    * 1<<63 literal overflows DuckDB's shift and flips Long sign order).
    * Gradient-based, so globally brightness-shifted copies collide —
    * the property the spec pins. */
  private[graft] def dHash63(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth; val h = img.getHeight
    def gray(x: Int, y: Int): Int = {
      val p = img.getRGB(x, y)
      ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
    }
    var hash = 0L
    var i = 0
    while (i < 8) {
      val y = i * h / 8
      var j = 0
      while (j < 8) {
        if (!(i == 7 && j == 7) &&
          gray(j * w / 9, y) > gray((j + 1) * w / 9, y))
          hash |= 1L << (i * 8 + j)
        j += 1
      }
      i += 1
    }
    hash
  }

  private val imageDedupSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("dh", LongType, nullable = false)))

  /** IMAGE-MODALITY dedup (`mm_image_dedup`) — completes the dedup
    * family across text / embedding / image payloads: per-image
    * [[dHash63]] over the real in-JDK PNG decode, then the
    * `dedup_simhash` Hamming machinery applied EXACT-FIRST:
    *
    *  1. exact level — images collapse to their hash group
    *     (groupBy dh, keeper = min doc_id): mass duplication is
    *     handled by one partial-aggregated shuffle, never a pair list
    *     (this corpus's closed-form gradients collide heavily by
    *     construction — 100 images / 6 hashes — exactly the shape a
    *     crawl's template images have at 100 TB);
    *  2. near level — only the DISTINCT hashes (cardinality ∝ unique
    *     content, not corpus) go through pigeonhole banding (4 chunks
    *     of the 63 bits; hamming ≤ 3 ⇒ some chunk equal) +
    *     bit_count(xor) verification; `near_keeper` = min exact-keeper
    *     over each hash's ≤ maxHamming neighborhood (including
    *     itself).
    *
    * Non-image payloads are EXCLUDED by the magic-byte sniff before
    * any decode ([[sniffFormat]] — the mmDecodeReal dispatch), and a
    * PNG that fails the codec degrades to no row rather than a task
    * failure. Map-only decode; two vocabulary-sized shuffles. */
  def mmImageDedup(s: SparkSession, dir: String, maxHamming: Int = 3): DataFrame = {
    // the 4-chunk pigeonhole only guarantees a shared band at
    // hamming <= 3; a larger threshold would verify correctly but
    // MISS candidates the banding never generates — fail loudly
    // rather than return a silently incomplete near_keeper
    require(maxHamming >= 0 && maxHamming <= 3,
      s"maxHamming must be in [0, 3] (4-chunk pigeonhole bound), got $maxHamming")
    val enc = org.apache.spark.sql.Encoders.row(imageDedupSchema)
    // non-image rows only need the magic-byte prefix (<= 12 bytes), so
    // the bound lives IN THE PLAN: the columnar scan materializes 16
    // chars per row instead of the whole body — an in-lambda take(16)
    // would still deserialize every full document string through the
    // row encoder first (review catch, r19)
    val hashes = Tables.documents(s, dir)
      .select(col("doc_id"), substring(col("text"), 1, 16).as("head"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val payload =
            if (id % 5 == 0) pngBytes(id)
            else r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8)
          sniffFormat(payload) match {
            case "png" => decodeRaster(payload).map(img => Row(id, dHash63(img)))
            case _ => None
          }
        }
      }(enc)
    import graft.CacheRegistry.Cacheable
    val cached = hashes.cacheTracked
    val keepers = cached.groupBy("dh").agg(min("doc_id").as("keeper"))
    val chunked = keepers.select(col("dh"), col("keeper"),
      explode(array((0 until 4).map { c =>
        struct(lit(c).as("chunk"),
          shiftright(col("dh"), c * 16).bitwiseAND(0xffffL).as("cv"))
      }: _*)).as("cb"))
      .select(col("dh"), col("keeper"), col("cb.chunk"), col("cb.cv"))
    val nearKeeper = chunked.select(col("dh"), col("chunk"), col("cv"))
      .join(chunked.select(col("dh").as("dh_b"), col("keeper").as("keeper_b"),
        col("chunk"), col("cv")), Seq("chunk", "cv"))
      .filter(bit_count(col("dh").bitwiseXOR(col("dh_b"))) <= maxHamming)
      .groupBy("dh").agg(min("keeper_b").as("near_keeper"))
    cached.join(keepers, "dh").join(nearKeeper, "dh")
      .select(col("doc_id"), col("dh"), col("keeper"), col("near_keeper"),
        (col("doc_id") =!= col("keeper")).as("is_dup"))
      .orderBy("doc_id")
  }
}
