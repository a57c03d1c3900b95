package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: treat image/audio/video payloads as
  * opaque `binary` columns with typed metadata, and run batched
  * decode / feature-extraction over them.
  *
  * The decoder is REAL for images: `javax.imageio` (ships with the
  * JDK — PNG/JPEG/GIF/BMP) decodes the payload and emits
  * (width, height, mean_luma). Payloads ImageIO cannot decode (text
  * bytes, unknown codecs) fall back to byte-level features with
  * `decoded = false` — a 100 TB load quarantines undecodable rows by
  * filtering that flag instead of failing the job.
  */
object Multimodal {

  /** Extracted per-payload features. `decoded` marks a successful
    * image decode; byte-level features are always present so the
    * output is total over any payload. */
  case class PayloadFeatures(doc_id: Long, byte_len: Int, decoded: Boolean,
                             width: Int, height: Int, mean_luma: Double,
                             head_int: Long, mean_byte: Double)

  /** Attach a binary payload column (UTF-8 bytes of `textCol` — in a
    * real pipeline this is the stored media blob). */
  def withPayload(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("payload", col(textCol).cast("binary"))

  // ImageIO's default scratch-file cache would put a disk write in
  // every executor decode; in-memory streams only.
  ImageIO.setUseCache(false)

  private def byteFeatures(bytes: Array[Byte]): (Long, Double) = {
    val head = bytes.take(8).foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))
    val mean = if (bytes.isEmpty) 0.0
      else bytes.foldLeft(0L)((acc, b) => acc + (b & 0xff)).toDouble / bytes.length
    (head, mean)
  }

  /** Decode one batch. Batching mirrors how a real model/codec
    * amortizes setup across rows; ImageIO itself is stateless, but
    * the contract — decode N payloads per call, never one-off — is
    * what a GPU feature extractor slots into. */
  private def decodeBatch(batch: Array[(Long, Array[Byte])]): Iterator[PayloadFeatures] =
    batch.iterator.map { case (id, bytes) =>
      val (head, meanByte) = byteFeatures(bytes)
      val img =
        try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
        catch { case _: Exception => None }
      img match {
        case Some(im) =>
          val (w, h) = (im.getWidth, im.getHeight)
          var sum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = im.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          PayloadFeatures(id, bytes.length, decoded = true, w, h,
            sum / (w.toLong * h), head, meanByte)
        case None =>
          PayloadFeatures(id, bytes.length, decoded = false, 0, 0, 0.0, head, meanByte)
      }
    }

  /** Batched feature extraction over a binary column: partitions are
    * consumed in `batchSize` groups (the mapInPandas batch shape, in
    * Scala). Runs fully parallel per partition — no driver-side
    * collection. */
  def extractFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                      batchSize: Int = 64): Dataset[PayloadFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(g => decodeBatch(g.toArray)))
  }

  /** A resized payload: re-encoded PNG bytes, or `ok = false` with an
    * empty payload when the input didn't decode. */
  case class ResizedPayload(doc_id: Long, ok: Boolean, width: Int, height: Int,
                            payload: Array[Byte])

  /** Batched image resize: decode → scale to (w, h) → re-encode PNG.
    * Pure JDK (AWT bilinear scaling), same batched-mapPartitions
    * contract as `extractFeatures`; undecodable payloads pass through
    * flagged instead of failing the job. */
  def resizeImages(spark: SparkSession, df: DataFrame, idCol: String,
                   w: Int, h: Int, batchSize: Int = 64): Dataset[ResizedPayload] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, bytes) =>
        val img = try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(im) =>
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(im, 0, 0, w, h, null)
            g.dispose()
            val buf = new java.io.ByteArrayOutputStream()
            ImageIO.write(out, "png", buf)
            ResizedPayload(id, ok = true, w, h, buf.toByteArray)
          case None => ResizedPayload(id, ok = false, 0, 0, Array.emptyByteArray)
        }
      }))
  }

  /** Extracted per-audio-payload features. `decoded` marks a
    * successful parse; RMS/peak are normalized to [0, 1]. */
  case class AudioFeatures(doc_id: Long, byte_len: Int, decoded: Boolean,
                           sample_rate: Double, channels: Int, n_frames: Long,
                           duration_sec: Double, rms: Double, peak: Double)

  /** Deterministic synthetic WAV (16-bit PCM mono 8 kHz sine, freq a
    * pure function of `id`) — the m03 driver check and specs generate
    * audio payloads with this, since the test corpus carries no real
    * media blobs. Same bytes on every executor and every run. */
  def syntheticWav(id: Long, seconds: Double = 0.25, amplitude: Double = 0.5): Array[Byte] = {
    val sampleRate = 8000f
    val freq = 200.0 + (id % 20) * 50.0
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val v = (amplitude * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** Deterministic multi-segment WAV: consecutive sine segments of
    * `(seconds, amplitude)` — amplitude 0 is digital silence. The
    * m07 specs plant tone-silence-tone payloads with this. */
  def syntheticWavSegments(id: Long, segs: Seq[(Double, Double)]): Array[Byte] = {
    val sampleRate = 8000f
    val freq = 200.0 + (id % 20) * 50.0
    val pcm = segs.flatMap { case (seconds, amplitude) =>
      val n = (sampleRate * seconds).toInt
      (0 until n).flatMap { i =>
        val v = (amplitude * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toInt
        Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      }
    }.toArray
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(pcm), fmt, pcm.length / 2L)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  /** One detected audio segment: `kind` is "active" or "silence",
    * boundaries in seconds on the window grid. */
  case class AudioSegment(doc_id: Long, seg_idx: Int, kind: String,
                          start_s: Double, end_s: Double)

  /** Silence/activity segmentation (VAD-lite): split each payload's
    * PCM into fixed `windowMs` windows, classify each by RMS against
    * `rmsThreshold`, and coalesce consecutive same-kind windows into
    * segments — the trim-silence / speech-chunking primitive an audio
    * training pipeline runs before transcription or packing (m06 is
    * the video sibling: boundaries, not per-item features). Decode +
    * windowing + coalescing all happen inside the same batched
    * mapPartitions pass as the other media decoders (the legitimate
    * non-Catalyst spot); output is segment rows, O(segments) per
    * payload, never per-sample rows. Undecodable payloads emit one
    * `kind = "undecodable"` row — quarantine, never a job failure. */
  def segmentAudio(spark: SparkSession, df: DataFrame, idCol: String,
                   windowMs: Int = 20, rmsThreshold: Double = 0.01,
                   batchSize: Int = 64): Dataset[AudioSegment] = {
    import spark.implicits._
    require(windowMs >= 1, s"windowMs must be >= 1, got $windowMs")
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, bytes) =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
            val pcm = in.readAllBytes()
            val nSamples = pcm.length / bytesPerSample
            val full = (1L << (bytesPerSample * 8 - 1)).toDouble
            def sample(i: Int): Double = {
              val off = i * bytesPerSample
              if (bytesPerSample == 1) ((pcm(off) & 0xff) - 128).toDouble / 128.0
              else {
                var acc = 0L; var b = 0
                while (b < bytesPerSample) {
                  acc |= (pcm(off + b) & 0xffL) << (8 * b); b += 1
                }
                val bits = bytesPerSample * 8
                ((acc << (64 - bits)) >> (64 - bits)).toDouble / full
              }
            }
            // per-window RMS classification over ALL interleaved
            // channels (energy, not phase — channel mixing is fine)
            val samplesPerWin =
              math.max(1, (fmt.getSampleRate * fmt.getChannels * windowMs / 1000.0).toInt)
            val nWins = (nSamples + samplesPerWin - 1) / samplesPerWin
            val winSec = samplesPerWin.toDouble /
              (fmt.getSampleRate * math.max(1, fmt.getChannels))
            val kinds = (0 until nWins).map { w =>
              var sumSq = 0.0; var i = w * samplesPerWin
              val end = math.min(nSamples, i + samplesPerWin)
              val n = end - i
              while (i < end) { val v = sample(i); sumSq += v * v; i += 1 }
              if (n > 0 && math.sqrt(sumSq / n) >= rmsThreshold) "active" else "silence"
            }
            // coalesce runs of the same kind into segments
            val segs = scala.collection.mutable.ArrayBuffer.empty[AudioSegment]
            var runStart = 0
            for (w <- 1 to nWins) {
              if (w == nWins || kinds(w) != kinds(runStart)) {
                segs += AudioSegment(id, segs.size, kinds(runStart),
                  runStart * winSec, math.min(w * winSec, nSamples.toDouble /
                    (fmt.getSampleRate * math.max(1, fmt.getChannels))))
                runStart = w
              }
            }
            segs.toSeq
          } finally in.close()
        } catch { case _: Exception =>
          Seq(AudioSegment(id, 0, "undecodable", 0.0, 0.0))
        }
      }))
  }

  /** Batched audio feature extraction — REAL decode via
    * `javax.sound.sampled` (ships with the JDK: WAV/AIFF/AU, PCM).
    * Per payload: format metadata (sample rate, channels, frame
    * count, duration) plus signal stats (RMS, peak) from the PCM
    * samples. Same batched-mapPartitions contract and quarantine
    * discipline as the image path: undecodable payloads come back
    * with `decoded = false`, never a job failure. Compressed codecs
    * (mp3/ogg) have no JDK decoder — they take this fallback path,
    * and a real deployment swaps in a codec library behind the same
    * batch shape. */
  def extractAudioFeatures(spark: SparkSession, df: DataFrame, idCol: String,
                           batchSize: Int = 64): Dataset[AudioFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, bytes) =>
        try {
          val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val bytesPerSample = math.max(1, fmt.getSampleSizeInBits / 8)
            val pcm = in.readAllBytes()
            val nSamples = pcm.length / bytesPerSample
            var sumSq = 0.0; var peak = 0.0; var i = 0
            val full = (1L << (bytesPerSample * 8 - 1)).toDouble
            while (i < nSamples) {
              // little-endian signed PCM (the WAV norm); 8-bit WAV is
              // unsigned by spec — recentre it.
              val off = i * bytesPerSample
              val v =
                if (bytesPerSample == 1) ((pcm(off) & 0xff) - 128).toDouble / 128.0
                else {
                  var acc = 0L; var b = 0
                  while (b < bytesPerSample) {
                    acc |= (pcm(off + b) & 0xffL) << (8 * b); b += 1
                  }
                  val bits = bytesPerSample * 8
                  val signed = (acc << (64 - bits)) >> (64 - bits)
                  signed.toDouble / full
                }
              sumSq += v * v
              if (math.abs(v) > peak) peak = math.abs(v)
              i += 1
            }
            val frames = nSamples.toLong / math.max(1, fmt.getChannels)
            AudioFeatures(id, bytes.length, decoded = true,
              fmt.getSampleRate.toDouble, fmt.getChannels, frames,
              frames / fmt.getSampleRate.toDouble,
              if (nSamples > 0) math.sqrt(sumSq / nSamples) else 0.0, peak)
          } finally in.close()
        } catch { case _: Exception =>
          AudioFeatures(id, bytes.length, decoded = false, 0.0, 0, 0L, 0.0, 0.0, 0.0)
        }
      }))
  }

  /** Deterministic synthetic image (PNG): a smooth 2-D sine pattern
    * whose shape is a pure function of `seed`, sampled at NORMALIZED
    * coordinates — so re-rendering the same seed at a different size
    * yields (approximately) the same picture, which is exactly what a
    * perceptual hash must be invariant to. The m04 driver check and
    * specs plant near-duplicates with this, since the test corpus
    * carries no real media blobs. */
  def syntheticImage(seed: Long, w: Int = 64, h: Int = 64): Array[Byte] = {
    val fx = 1 + (seed % 3).toInt
    val fy = 1 + ((seed / 3) % 3).toInt
    val phase = (seed % 7).toDouble / 7.0 * 2 * math.Pi
    val im = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val u = (x + 0.5) / w
        val v = (y + 0.5) / h
        val lum = (127.5 * (1 + math.sin(2 * math.Pi * fx * u + phase) *
          math.cos(2 * math.Pi * fy * v))).toInt.max(0).min(255)
        im.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
        x += 1
      }
      y += 1
    }
    val buf = new java.io.ByteArrayOutputStream()
    ImageIO.write(im, "png", buf)
    buf.toByteArray
  }

  /** A 64-bit perceptual fingerprint. `decoded = false` rows carry
    * fp = 0 and must be filtered before pairing. */
  case class PerceptualHash(doc_id: Long, decoded: Boolean, fp: Long)

  private def dhashOf(im: java.awt.image.BufferedImage): Long = {
    // 9×8 grayscale thumbnail → 64 horizontal gradient-sign bits: the
    // standard dHash. Gradient SIGNS survive resizing, re-encoding and
    // global brightness shifts — pixel values don't.
    val small = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = small.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(im, 0, 0, 9, 8, null)
    g.dispose()
    val r = small.getRaster
    var bits = 0L
    var i = 0
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (r.getSample(x + 1, y, 0) > r.getSample(x, y, 0)) bits |= 1L << i
        i += 1
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Batched perceptual hashing (dHash) over a binary image column —
    * the fingerprint side of image near-dup detection: a resized or
    * re-encoded copy of an image lands within a few hamming bits of
    * the original, so dedup is a hamming band join over these 64-bit
    * fingerprints (`Dedup.hammingPairs`), the exact machinery the
    * SimHash text path uses. Same batched-mapPartitions contract and
    * quarantine discipline as `extractFeatures`. */
  def dHash(spark: SparkSession, df: DataFrame, idCol: String,
            batchSize: Int = 64): Dataset[PerceptualHash] = {
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.map { case (id, bytes) =>
        val img = try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
          catch { case _: Exception => None }
        img match {
          case Some(im) => PerceptualHash(id, decoded = true, dhashOf(im))
          case None     => PerceptualHash(id, decoded = false, 0L)
        }
      }))
  }

  /** One sampled frame of a multi-frame payload. */
  case class FrameFeatures(doc_id: Long, frame_idx: Int, width: Int, height: Int,
                           mean_luma: Double)

  /** Codec seam for [[sampleFrames]]: the payload-format decode is
    * the ONLY format-specific piece of the frame pipeline, so it is a
    * pluggable strategy. This container ships the `javax.imageio`
    * multi-frame reader ([[ImageIoFrameDecoder]], animated GIF); a
    * video deployment plugs an FFmpeg/JCodec-backed instance with the
    * same contract, and the Spark-side plumbing — batching, schema,
    * one row per sampled frame — is untouched (spec-verified against
    * a synthetic decoder). Contract: yield `(frame_idx, frame)` for
    * every `step`-th frame in order (a seekable codec should skip,
    * not decode-and-drop); yield NOTHING for an undecodable payload;
    * never throw; be Serializable (instances ship to executors). */
  trait FrameDecoder extends Serializable {
    def frames(payload: Array[Byte], step: Int): Iterator[(Int, java.awt.image.BufferedImage)]
  }

  /** The in-container default: `javax.imageio` frame sequences.
    * `reader.read(i)` seeks, so `step` skips decode work, not just
    * output rows; frames materialize eagerly because the reader is
    * disposed on exit. */
  object ImageIoFrameDecoder extends FrameDecoder {
    def frames(payload: Array[Byte], step: Int): Iterator[(Int, java.awt.image.BufferedImage)] = {
      val stream = ImageIO.createImageInputStream(new ByteArrayInputStream(payload))
      val readers = ImageIO.getImageReaders(stream)
      if (!readers.hasNext) { stream.close(); Iterator.empty }
      else {
        val reader = readers.next()
        try {
          reader.setInput(stream)
          val n = reader.getNumImages(true)
          (0 until n by step).map(i => (i, reader.read(i))).iterator
        } catch { case _: Exception => Iterator.empty }
        finally { reader.dispose(); stream.close() }
      }
    }
  }

  /** A REAL video container in pure JVM: MJPEG-in-AVI. The AVI RIFF
    * structure is a public format (fourcc chunks: `"RIFF" size "AVI "`
    * then nested `LIST`s; the `movi` list's `##dc`/`##db` chunks are
    * the video frames, optionally grouped in `rec ` lists, everything
    * even-byte aligned) and an MJPEG frame is a plain JPEG —
    * decodable by `javax.imageio` with no native libs. This makes the
    * codec seam more than a GIF toy: any camera/capture MJPEG AVI
    * samples frames end-to-end in this container, and `step` skips
    * JPEG decodes entirely (the chunk walk is just offset arithmetic,
    * so seeking is free — the contract's "skip, not decode-and-drop").
    * Non-MJPEG AVIs (a DivX fourcc, say) yield nothing rather than
    * throwing, per the [[FrameDecoder]] contract. */
  object MjpegAviFrameDecoder extends FrameDecoder {
    private def le32(b: Array[Byte], off: Int): Long =
      ((b(off) & 0xffL)) | ((b(off + 1) & 0xffL) << 8) |
        ((b(off + 2) & 0xffL) << 16) | ((b(off + 3) & 0xffL) << 24)
    private def fourcc(b: Array[Byte], off: Int): String =
      new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)

    /** Collect (stream, offset, size) of every video-frame chunk inside
      * a chunk range, recursing into LISTs. The two-digit prefix of a
      * `##dc`/`##db` id is the AVI stream number: a multi-stream AVI
      * interleaves several `##dc` sequences, and mixing them into one
      * frame_idx order would sample across tracks — the caller keeps
      * only the first video stream seen. */
    private def frameChunks(b: Array[Byte], from: Long, until: Long,
                            acc: scala.collection.mutable.ArrayBuffer[(String, Long, Long)]): Unit = {
      var off = from
      while (off + 8 <= until) {
        val id = fourcc(b, off.toInt)
        val size = le32(b, off.toInt + 4)
        if (id == "LIST" && off + 12 <= until)
          frameChunks(b, off + 12, math.min(off + 8 + size, until), acc)
        else if (id.length == 4 && id(0).isDigit && id(1).isDigit &&
          (id.endsWith("dc") || id.endsWith("db")) && size > 0 &&
          off + 8 + size <= until)
          acc += ((id.substring(0, 2), off + 8, size))
        off += 8 + size + (size % 2) // chunks are even-byte aligned
      }
    }

    def frames(payload: Array[Byte], step: Int): Iterator[(Int, java.awt.image.BufferedImage)] = {
      if (payload.length < 12 || fourcc(payload, 0) != "RIFF" ||
        fourcc(payload, 8) != "AVI ") return Iterator.empty
      val chunks = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long)]
      try frameChunks(payload,
        12L, math.min(8L + le32(payload, 4), payload.length.toLong), chunks)
      catch { case _: Exception => return Iterator.empty }
      // One video track only: follow the first video stream's number
      // (stream 00 in practice) so multi-stream AVIs don't interleave.
      val videoStream = chunks.headOption.map(_._1)
      chunks.iterator.filter(c => videoStream.contains(c._1)).map(c => (c._2, c._3))
        .zipWithIndex.collect { case ((off, size), i) if i % step == 0 =>
          try {
            val img = ImageIO.read(
              new ByteArrayInputStream(payload, off.toInt, size.toInt))
            if (img == null) None else Some((i, img))
          } catch { case _: Exception => None }
        }.flatten
    }
  }

  /** Plug ANY external video decoder as a [[FrameDecoder]] with no new
    * JVM dependencies: the payload reaches `command` (stdin pipe, or a
    * temp file substituted for a `{}` placeholder — the temp-file form
    * is what seek-hungry containers like non-faststart MP4 need) and
    * the command emits the decoded frames as a CONCATENATED-JPEG
    * stream (MJPEG) on stdout — exactly what
    * `ffmpeg -i INPUT -f image2pipe -vcodec mjpeg pipe:1` produces for
    * any codec ffmpeg understands (H.264/VP9/AV1…).
    * [[FfmpegFrameDecoder]] is that instance; the class itself is
    * command-agnostic, which is how the spec drives the full plumbing
    * (`cat` / `cat {}` over an already-concatenated-JPEG payload) in
    * this offline container, where no ffmpeg binary exists.
    *
    * Sampling: the stream is SPLIT on JPEG SOI/EOI markers (offset
    * arithmetic — JPEG byte-stuffing guarantees FF D9 cannot occur
    * inside entropy-coded data) and only every `step`-th frame pays a
    * JPEG decode. A missing binary, failing command, or timeout
    * yields nothing, per the contract. Scale shape: one short-lived
    * process per payload inside the batched mapPartitions — the same
    * per-task process discipline any external-tool UDF pipeline runs;
    * size `batchSize` to amortize. */
  final class ProcessFrameDecoder(command: Seq[String],
                                  timeoutSec: Long = 300) extends FrameDecoder {
    def frames(payload: Array[Byte], step: Int): Iterator[(Int, java.awt.image.BufferedImage)] = {
      val viaFile = command.exists(_.contains("{}"))
      val tmp: Option[java.nio.file.Path] =
        if (!viaFile) None
        else try {
          val p = java.nio.file.Files.createTempFile("graft_frames", ".bin")
          java.nio.file.Files.write(p, payload)
          Some(p)
        } catch { case _: Exception => return Iterator.empty }
      val out: Array[Byte] =
        try {
          val cmd = tmp.fold(command)(p =>
            command.map(_.replace("{}", p.toString)))
          val pb = new ProcessBuilder(cmd: _*)
          pb.redirectError(ProcessBuilder.Redirect.DISCARD)
          val proc = pb.start()
          val writer = new Thread(() => {
            try {
              if (!viaFile) proc.getOutputStream.write(payload)
              proc.getOutputStream.close()
            } catch { case _: java.io.IOException => () } // decoder exited early
          })
          writer.setDaemon(true); writer.start()
          val buf = new java.io.ByteArrayOutputStream()
          proc.getInputStream.transferTo(buf)
          val done = proc.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)
          if (!done) { proc.destroyForcibly(); return Iterator.empty }
          writer.join(10000)
          if (proc.exitValue() != 0) return Iterator.empty
          buf.toByteArray
        } catch { case _: Exception => return Iterator.empty }
        finally tmp.foreach(p =>
          try java.nio.file.Files.deleteIfExists(p) catch { case _: Exception => () })
      val spans = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      var i = 0
      while (i + 1 < out.length) {
        if ((out(i) & 0xff) == 0xff && (out(i + 1) & 0xff) == 0xd8) {
          var j = i + 2
          var end = -1
          while (end < 0 && j + 1 < out.length) {
            if ((out(j) & 0xff) == 0xff && (out(j + 1) & 0xff) == 0xd9) end = j + 2
            j += 1
          }
          if (end < 0) i = out.length else { spans += ((i, end)); i = end }
        } else i += 1
      }
      spans.zipWithIndex.iterator.collect { case ((s, e), idx) if idx % step == 0 =>
        (try Option(ImageIO.read(new ByteArrayInputStream(out, s, e - s)))
         catch { case _: Exception => None }).map((idx, _))
      }.flatten
    }
  }

  /** [[ProcessFrameDecoder]] wired to the ffmpeg CLI — the production
    * H.264/VP9/AV1 path: `sampleFrames(..., decoder =
    * FfmpegFrameDecoder())` on a cluster whose executor images carry
    * the ffmpeg binary. Uses the temp-file input form so non-faststart
    * MP4s (moov atom at the end) decode too. Not runnable in this
    * offline container (no binary); the process/split/decode plumbing
    * is spec-covered command-agnostically via `cat`. */
  object FfmpegFrameDecoder {
    def apply(ffmpeg: String = "ffmpeg"): ProcessFrameDecoder =
      new ProcessFrameDecoder(Seq(ffmpeg, "-v", "error", "-i", "{}",
        "-f", "image2pipe", "-vcodec", "mjpeg", "pipe:1"))
  }

  /** Frame sampling over multi-frame payloads: every `step`-th frame
    * decodes to (width, height, mean_luma), one output row per
    * sampled frame; single-frame and undecodable payloads yield their
    * 0 or 1 rows rather than erroring. The decode is batched
    * `mapPartitions` (the one legitimate non-Catalyst spot — binary
    * codecs have no Catalyst expression); the codec itself is the
    * pluggable [[FrameDecoder]], GIF-via-imageio by default. */
  def sampleFrames(spark: SparkSession, df: DataFrame, idCol: String,
                   step: Int = 2, batchSize: Int = 16,
                   decoder: FrameDecoder = ImageIoFrameDecoder): Dataset[FrameFeatures] = {
    import spark.implicits._
    require(step >= 1, "step must be >= 1")
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, bytes) =>
        decoder.frames(bytes, step).map { case (i, im) =>
          var sum = 0.0
          var y = 0
          while (y < im.getHeight) {
            var x = 0
            while (x < im.getWidth) {
              val rgb = im.getRGB(x, y)
              sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
              x += 1
            }
            y += 1
          }
          FrameFeatures(id, i, im.getWidth, im.getHeight,
            sum / (im.getWidth.toLong * im.getHeight))
        }
      }))
  }

  /** Deterministic synthetic MJPEG-AVI: one RIFF("AVI ") container
    * whose 00dc chunks are JPEG re-encodes of [[syntheticImage]]
    * patterns — a pure function of `frameSeeds`, so planted
    * shared-frame videos (the m05 driver check) need no real media
    * blobs, same argument as syntheticImage for m04. */
  def syntheticVideo(frameSeeds: Seq[Long], w: Int = 64, h: Int = 64): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    val jpegs = frameSeeds.map { s =>
      val im = ImageIO.read(new ByteArrayInputStream(syntheticImage(s, w, h)))
      val buf = new java.io.ByteArrayOutputStream()
      ImageIO.write(im, "jpg", buf)
      buf.toByteArray
    }
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val movi = list("movi", jpegs.flatMap(j => chunk("00dc", j)).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  /** One sampled frame's perceptual fingerprint. */
  case class FrameHash(doc_id: Long, frame_idx: Int, dhash: Long)

  /** Per-frame dHash over sampled video frames — [[dHash]]'s video
    * twin, through the same pluggable [[FrameDecoder]] seam. */
  def frameHashes(spark: SparkSession, df: DataFrame, idCol: String,
                  step: Int = 2, batchSize: Int = 16,
                  decoder: FrameDecoder = ImageIoFrameDecoder): Dataset[FrameHash] = {
    import spark.implicits._
    require(step >= 1, "step must be >= 1")
    df.select(col(idCol).cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.grouped(batchSize).flatMap(_.iterator.flatMap { case (id, bytes) =>
        decoder.frames(bytes, step).map { case (i, im) => FrameHash(id, i, dhashOf(im)) }
      }))
  }

  /** Video near-dup pairs: two videos are near-dups when at least
    * `minShared` of their SAMPLED frames are perceptually identical
    * (frame dHash within `maxHamming` — re-encodes and resizes
    * survive, m04's image argument frame-wise). Composes
    * [[frameHashes]] with the text/image hamming band join
    * (Dedup.hammingPairs): frames get composite ids (video-major, so
    * the band join's `a < b` canonicalizes the VIDEO pair too), and
    * the per-pair rollup counts distinct matched probe frames. The
    * shape is the m04/d04 one — band-bucket candidates only, never
    * all-frame-pairs — so it holds at crawl scale where frames ≫
    * videos. */
  def videoDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
                    step: Int = 2, maxHamming: Int = 6, minShared: Int = 2,
                    decoder: FrameDecoder = ImageIoFrameDecoder): DataFrame = {
    require(step >= 1, "step must be >= 1")
    val fps = frameHashes(spark, df, idCol, step, decoder = decoder).toDF()
      .select((col("doc_id") * lit(1L << 20) + col("frame_idx")).as("doc_id"),
        col("dhash").as("fp"))
    graft.operators.Dedup.hammingPairs(fps, maxHamming)
      .select(expr(s"a_id div ${1L << 20}").as("video_a"),
        col("a_id").as("fa"),
        expr(s"b_id div ${1L << 20}").as("video_b"))
      .filter(col("video_a") =!= col("video_b"))
      .groupBy(col("video_a"), col("video_b"))
      .agg(countDistinct(col("fa")).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Scene-cut detection: sampled frame indices where the perceptual
    * hash jumps by more than `minHamming` bits against the previous
    * sampled frame — the keyframe-selection primitive for video
    * training data (keep one frame per SCENE instead of one per time
    * step; consecutive frames inside a scene land within a few dHash
    * bits, a cut lands tens of bits away). One per-video ordered
    * window over [[frameHashes]]; the distance is the codegen'd
    * POPCOUNT(XOR) on two longs (HammingDistance) — after the decode
    * pass nothing touches pixels again, and window partitions are
    * per-video frame-count bounded. Output: one row per cut
    * `(doc_id, frame_idx, prev_idx, dist)`, where frame_idx is the
    * first frame of the NEW scene. */
  def sceneCuts(spark: SparkSession, df: DataFrame, idCol: String,
                step: Int = 2, minHamming: Int = 16, batchSize: Int = 16,
                decoder: FrameDecoder = ImageIoFrameDecoder): DataFrame = {
    import graft.functions.HammingDistance.hamming
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    frameHashes(spark, df, idCol, step, batchSize, decoder).toDF()
      .withColumn("__prev_hash", lag(col("dhash"), 1).over(w))
      .withColumn("prev_idx", lag(col("frame_idx"), 1).over(w))
      .filter(col("__prev_hash").isNotNull)
      .withColumn("dist", hamming(col("dhash"), col("__prev_hash")))
      .filter(col("dist") > minHamming)
      .select(col("doc_id"), col("frame_idx"), col("prev_idx"), col("dist"))
  }
}
