package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.sources.TableCatalog

class MultimodalSpec extends SparkSpec {

  test("payload metadata matches the source text byte-for-byte") {
    val docs = Multimodal.withPayload(TableCatalog(spark, sf).documents, "text")
    val bad = docs.filter(octet_length(col("payload")) =!= length(col("text")))
    assert(bad.isEmpty) // ascii corpus: bytes == chars
  }

  test("batched feature extraction is deterministic and total") {
    val docs = Multimodal.withPayload(TableCatalog(spark, sf).documents, "text")
    val f1 = Multimodal.extractFeatures(spark, docs, "doc_id").collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(spark, docs.repartition(7), "doc_id")
      .collect().sortBy(_.doc_id)
    assert(f1.length === docs.count())
    assert(f1.toSeq === f2.toSeq) // independent of partitioning/batching
    assert(f1.forall(f => f.mean_byte >= 0 && f.mean_byte <= 255))
    // text bytes are not an image: every row falls back, flagged
    assert(f1.forall(!_.decoded))
  }

  /** 16-bit PCM mono WAV of a sine wave, generated via the same
    * javax.sound API a real pipeline stores from. */
  private def wav(sampleRate: Float, seconds: Double, amplitude: Double): Array[Byte] = {
    val n = (sampleRate * seconds).toInt
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val v = (amplitude * math.sin(2 * math.Pi * 440 * i / sampleRate) * 32767).toInt
      pcm(i * 2) = (v & 0xff).toByte
      pcm(i * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("audio features: real WAV decode, quarantined non-audio") {
    import graft.SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, wav(8000f, 0.5, 0.5)),
      (2L, "definitely not audio".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val f = Multimodal.extractAudioFeatures(spark, docs, "doc_id")
      .collect().map(a => a.doc_id -> a).toMap
    val a = f(1L)
    assert(a.decoded && a.sample_rate === 8000.0 && a.channels === 1)
    assert(a.n_frames === 4000L)
    assert(math.abs(a.duration_sec - 0.5) < 1e-9)
    // sine at amplitude 0.5: RMS = 0.5/sqrt(2), peak ~ 0.5
    assert(math.abs(a.rms - 0.5 / math.sqrt(2)) < 0.01, s"rms ${a.rms}")
    assert(math.abs(a.peak - 0.5) < 0.01, s"peak ${a.peak}")
    assert(!f(2L).decoded && f(2L).byte_len > 0)
  }

  private def png(w: Int, h: Int, rgb: (Int, Int) => Int): Array[Byte] = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(im, "png", out)
    out.toByteArray
  }

  test("resize re-encodes decodable payloads at the target size") {
    import graft.SparkSpec.spark.implicits._
    val docs = Seq(
      (1L, png(16, 8, (_, _) => 0x808080)),
      (2L, "definitely not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val r = Multimodal.resizeImages(spark, docs, "doc_id", 4, 4)
      .collect().map(p => p.doc_id -> p).toMap
    assert(r(1L).ok && r(1L).width === 4 && r(1L).height === 4)
    // round-trip: the resized payload is a valid 4x4 image
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r(1L).payload))
    assert(back.getWidth === 4 && back.getHeight === 4)
    assert(back.getRGB(2, 2) === 0xff808080) // uniform grey survives scaling
    assert(!r(2L).ok && r(2L).payload.isEmpty)
    // deterministic under repartitioning (batch boundaries don't matter)
    val again = Multimodal.resizeImages(spark, docs.repartition(5), "doc_id", 4, 4)
      .collect().map(p => p.doc_id -> p.payload.toSeq).toMap
    assert(again(1L) === r(1L).payload.toSeq)
  }

  private def animatedGif(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f => writer.writeToSequence(
      new javax.imageio.IIOImage(f, null, null), writer.getDefaultWriteParam))
    writer.endWriteSequence()
    writer.dispose(); ios.close()
    out.toByteArray
  }

  test("frame sampling reads every step-th frame of a multi-frame payload") {
    import graft.SparkSpec.spark.implicits._
    def grey(v: Int) = {
      val im = new BufferedImage(3, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until 3) im.setRGB(x, y, (v << 16) | (v << 8) | v)
      im
    }
    val gif = animatedGif(Seq(grey(10), grey(60), grey(110), grey(160)))
    val docs = Seq((1L, gif), (2L, "noise".getBytes("UTF-8"))).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", step = 2)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq === Seq((1L, 0), (1L, 2)))
    assert(frames.forall(f => f.width === 3 && f.height === 2))
    assert(frames.map(_.mean_luma).toSeq === Seq(10.0, 110.0))
    // step 1 reads all four frames
    assert(Multimodal.sampleFrames(spark, docs, "doc_id", step = 1).count() === 4)
  }

  /** Assemble a spec-conformant MJPEG AVI: RIFF("AVI ") with an hdrl
    * LIST (opaque to the frame walk, as in real files), a movi LIST
    * whose 00dc chunks are real JPEGs, one frame wrapped in a
    * `rec ` grouping LIST and odd-size chunks padded to even — the
    * container details a real capture file exercises. */
  private def mjpegAvi(frames: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    def jpeg(im: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(im, "jpg", out)
      out.toByteArray
    }
    val out = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val Seq(f0, rest @ _*) = frames
    val movi = list("movi",
      list("rec ", chunk("00dc", jpeg(f0))) ++
        rest.flatMap(f => chunk("00dc", jpeg(f))).toArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    out.write("RIFF".getBytes("US-ASCII")); out.write(le32(body.length))
    out.write(body)
    out.toByteArray
  }

  test("MJPEG-AVI: a real video container decodes through the codec seam") {
    import graft.SparkSpec.spark.implicits._
    def grey(v: Int) = {
      val im = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) im.setRGB(x, y, (v << 16) | (v << 8) | v)
      im
    }
    val avi = mjpegAvi(Seq(grey(20), grey(80), grey(140), grey(200)))
    val docs = Seq((1L, avi), (2L, "not a riff".getBytes("UTF-8")),
        (3L, "RIFF????NOPE".getBytes("US-ASCII")))
      .toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", step = 2,
        decoder = Multimodal.MjpegAviFrameDecoder)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    // only the AVI decodes; step=2 samples frames 0 and 2
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq === Seq((1L, 0), (1L, 2)))
    assert(frames.forall(f => f.width === 8 && f.height === 6))
    // JPEG is lossy but flat-grey survives within a few levels
    assert(math.abs(frames(0).mean_luma - 20.0) < 4.0 &&
      math.abs(frames(1).mean_luma - 140.0) < 4.0)
    assert(Multimodal.sampleFrames(spark, docs, "doc_id", step = 1,
      decoder = Multimodal.MjpegAviFrameDecoder).count() === 4)
  }

  test("MJPEG-AVI: multi-stream files sample only the first video stream") {
    import graft.SparkSpec.spark.implicits._
    def grey(w: Int, v: Int) = {
      val im = new BufferedImage(w, 2, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 2; x <- 0 until w) im.setRGB(x, y, (v << 16) | (v << 8) | v)
      im
    }
    def jpeg(im: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(im, "jpg", out)
      out.toByteArray
    }
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(listType: String, children: Array[Byte]): Array[Byte] =
      chunk("LIST", listType.getBytes("US-ASCII") ++ children)
    // Two interleaved video streams: 00dc frames are 4px wide, 01dc
    // frames 6px wide — a frame's width tells which track it came from.
    val movi = list("movi",
      chunk("00dc", jpeg(grey(4, 20))) ++ chunk("01dc", jpeg(grey(6, 20))) ++
        chunk("00dc", jpeg(grey(4, 120))) ++ chunk("01dc", jpeg(grey(6, 120))) ++
        chunk("00dc", jpeg(grey(4, 220))) ++ chunk("01dc", jpeg(grey(6, 220))))
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)))
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
    val docs = Seq((1L, avi)).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", step = 1,
        decoder = Multimodal.MjpegAviFrameDecoder)
      .collect().sortBy(_.frame_idx)
    // only stream 00's three frames, contiguously indexed, all 4px wide
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(frames.forall(_.width === 4))
  }

  test("ProcessFrameDecoder drives an external command through the ffmpeg image2pipe contract") {
    import graft.SparkSpec.spark.implicits._
    // payload = concatenated JPEGs, exactly what
    // `ffmpeg ... -f image2pipe -vcodec mjpeg` emits; `cat` stands in
    // for ffmpeg (this container carries no binary), so the spec
    // exercises the REAL plumbing — process spawn, stdin feed /
    // temp-file substitution, SOI/EOI stream split, step sampling —
    // with only the codec binary itself swapped out.
    def grey(v: Int) = {
      val im = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) im.setRGB(x, y, (v << 16) | (v << 8) | v)
      im
    }
    def jpeg(im: java.awt.image.BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(im, "jpg", out)
      out.toByteArray
    }
    val stream = Seq(20, 80, 140, 200).map(v => jpeg(grey(v))).reduce(_ ++ _)
    val docs = Seq((1L, stream), (2L, "not a jpeg stream".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    // stdin-pipe form
    val piped = new Multimodal.ProcessFrameDecoder(Seq("cat"))
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", step = 2,
        decoder = piped)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq === Seq((1L, 0), (1L, 2)))
    assert(frames.forall(f => f.width === 8 && f.height === 6))
    assert(math.abs(frames(0).mean_luma - 20.0) < 4.0 &&
      math.abs(frames(1).mean_luma - 140.0) < 4.0)
    // temp-file form (the {} placeholder FfmpegFrameDecoder uses for
    // seek-hungry containers like non-faststart MP4)
    val viaFile = new Multimodal.ProcessFrameDecoder(Seq("cat", "{}"))
    assert(Multimodal.sampleFrames(spark, docs, "doc_id", step = 1,
      decoder = viaFile).count() === 4)
    // a failing / absent decoder binary yields nothing, never throws
    val failing = new Multimodal.ProcessFrameDecoder(Seq("false"))
    assert(Multimodal.sampleFrames(spark, docs, "doc_id", step = 1,
      decoder = failing).count() === 0)
    val missing = new Multimodal.ProcessFrameDecoder(Seq("/no/such/binary"))
    assert(Multimodal.sampleFrames(spark, docs, "doc_id", step = 1,
      decoder = missing).count() === 0)
    // the ffmpeg instance constructs (compile-checked recipe) and is
    // serializable like every FrameDecoder
    val ff = Multimodal.FfmpegFrameDecoder()
    new java.io.ObjectOutputStream(new ByteArrayOutputStream()).writeObject(ff)
  }

  // The FrameDecoder seam: a synthetic "video codec" (payload bytes =
  // [nFrames, w, h, greyBase] of a trivial container format) proves
  // the Spark-side plumbing — batching, schema, per-frame rows, step
  // sampling — is codec-independent: a production video deployment
  // plugs FFmpeg/JCodec behind the same trait and touches nothing
  // else.
  test("frame sampling is codec-pluggable: a synthetic video decoder reuses the plumbing") {
    import graft.SparkSpec.spark.implicits._
    object FakeVideoDecoder extends Multimodal.FrameDecoder {
      def frames(payload: Array[Byte], step: Int): Iterator[(Int, BufferedImage)] = {
        if (payload.length != 4) return Iterator.empty // not our container
        val Array(n, w, h, base) = payload.map(_.toInt & 0xff)
        (0 until n by step).iterator.map { i =>
          val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
          val v = (base + i) & 0xff
          for (y <- 0 until h; x <- 0 until w) im.setRGB(x, y, (v << 16) | (v << 8) | v)
          (i, im)
        }
      }
    }
    val docs = Seq(
      (1L, Array[Byte](5, 4, 2, 50)),    // 5 frames, 4×2, luma 50,51,…
      (2L, Array[Byte](1, 2, 2, 10)),    // single frame
      (3L, "noise".getBytes("UTF-8"))    // undecodable → 0 rows
    ).toDF("doc_id", "payload")
    val frames = Multimodal.sampleFrames(spark, docs, "doc_id", step = 2,
        decoder = FakeVideoDecoder)
      .collect().sortBy(f => (f.doc_id, f.frame_idx))
    assert(frames.map(f => (f.doc_id, f.frame_idx)).toSeq ===
      Seq((1L, 0), (1L, 2), (1L, 4), (2L, 0)))
    assert(frames.filter(_.doc_id == 1L).map(_.mean_luma).toSeq === Seq(50.0, 52.0, 54.0))
    assert(frames.forall(f => f.doc_id == 2L || (f.width == 4 && f.height == 2)))
    // the default decoder still handles the same rows' GIF payloads
    // (mixed-format corpora route by format in the decoder, not here)
  }

  test("real image payloads decode to (width, height, mean_luma)") {
    import graft.SparkSpec.spark.implicits._
    val white = png(3, 2, (_, _) => 0xffffff)          // luma 255
    val black = png(4, 5, (_, _) => 0x000000)          // luma 0
    val grey  = png(2, 2, (_, _) => 0x808080)          // luma 128
    val mixed = png(2, 1, (x, _) => if (x == 0) 0xffffff else 0x000000) // luma 127.5
    val docs = Seq((1L, white), (2L, black), (3L, grey), (4L, mixed),
      (5L, "not an image".getBytes("UTF-8")))
      .toDF("doc_id", "payload")
    val f = Multimodal.extractFeatures(spark, docs, "doc_id")
      .collect().map(p => p.doc_id -> p).toMap
    assert(f(1L).decoded && f(1L).width === 3 && f(1L).height === 2 && f(1L).mean_luma === 255.0)
    assert(f(2L).decoded && f(2L).width === 4 && f(2L).height === 5 && f(2L).mean_luma === 0.0)
    assert(f(3L).decoded && f(3L).mean_luma === 128.0)
    assert(f(4L).decoded && f(4L).mean_luma === 127.5)
    assert(!f(5L).decoded && f(5L).byte_len === 12)
  }

  test("perceptual dedup finds planted resized/re-encoded duplicates") {
    import graft.SparkSpec.spark.implicits._
    // 8 distinct patterns; each planted twice: the original at 64×64
    // and a RESIZED 48×48 re-encode (ids 100+s). Different patterns
    // use well-separated (fx, fy, phase) seeds.
    val seeds = Seq(0L, 4L, 8L, 13L, 17L, 22L, 26L, 31L)
    val docs = seeds.zipWithIndex.flatMap { case (s, i) =>
      Seq((i.toLong, Multimodal.syntheticImage(s, 64, 64)),
        (100L + i, Multimodal.syntheticImage(s, 48, 48)))
    }.toDF("doc_id", "payload")
    val fps = Multimodal.dHash(spark, docs, "doc_id").toDF()
    assert(fps.filter(!col("decoded")).isEmpty)
    val pairs = graft.operators.Dedup.hammingPairs(
        fps.select(col("doc_id"), col("fp")), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted (original, resized) sibling pair is found
    seeds.indices.foreach { i =>
      assert(pairs.contains((i.toLong, 100L + i)), s"missing planted pair $i")
    }
    // hashing is deterministic and partitioning-independent
    val fps2 = Multimodal.dHash(spark, docs.repartition(5), "doc_id")
      .collect().map(p => p.doc_id -> p.fp).toMap
    val fps1 = fps.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(fps1 === fps2)
    // non-images are quarantined, not paired
    val withJunk = docs.unionByName(
      Seq((999L, "not an image".getBytes("UTF-8"))).toDF("doc_id", "payload"))
    val withJunkFps = Multimodal.dHash(spark, withJunk, "doc_id").toDF()
    assert(withJunkFps.filter(col("doc_id") === 999L).head.getBoolean(1) === false)
  }

  test("video near-dup: videos sharing re-encoded frames pair; unrelated ones don't") {
    import graft.SparkSpec.spark.implicits._
    def im(seed: Long) = ImageIO.read(
      new java.io.ByteArrayInputStream(Multimodal.syntheticImage(seed, 64, 64)))
    // step=2 samples frames {0, 2}; videos 1 and 2 share those two
    // patterns (INDEPENDENTLY JPEG-re-encoded inside each container),
    // video 3 is disjoint; odd frames are noise either way
    val v1 = mjpegAvi(Seq(im(0), im(4), im(8), im(13)))
    val v2 = mjpegAvi(Seq(im(0), im(17), im(8), im(22)))
    val v3 = mjpegAvi(Seq(im(26), im(4), im(31), im(13)))
    val docs = Seq((1L, v1), (2L, v2), (3L, v3)).toDF("doc_id", "payload")
    val pairs = Multimodal.videoDupPairs(spark, docs, "doc_id", step = 2,
        maxHamming = 6, minShared = 2, decoder = Multimodal.MjpegAviFrameDecoder)
      .collect()
    assert(pairs.length === 1, s"expected exactly the planted pair, got ${pairs.toSeq}")
    assert((pairs.head.getLong(0), pairs.head.getLong(1)) === (1L, 2L))
    assert(pairs.head.getLong(2) === 2L)
  }

  test("audio segmentation recovers planted tone-silence-tone boundaries") {
    import graft.SparkSpec.spark.implicits._
    // 0.1 s tone, 0.1 s silence, 0.1 s tone at 8 kHz, 20 ms windows
    // → segments [0,0.1) active, [0.1,0.2) silence, [0.2,0.3) active
    // exactly on the grid (0.1 s = 5 whole windows).
    val wav = Multimodal.syntheticWavSegments(3L, Seq((0.1, 0.5), (0.1, 0.0), (0.1, 0.5)))
    val silent = Multimodal.syntheticWavSegments(4L, Seq((0.2, 0.0)))
    val docs = Seq((1L, wav), (2L, silent), (3L, Array[Byte](1, 2, 3)))
      .toDF("doc_id", "payload")
    val segs = Multimodal.segmentAudio(spark, docs, "doc_id").toDF()
      .select(col("doc_id"), col("seg_idx"), col("kind"),
        round(col("start_s"), 4), round(col("end_s"), 4))
      .as[(Long, Int, String, Double, Double)].collect().toSet
    assert(segs === Set(
      (1L, 0, "active", 0.0, 0.1), (1L, 1, "silence", 0.1, 0.2),
      (1L, 2, "active", 0.2, 0.3),
      (2L, 0, "silence", 0.0, 0.2),
      (3L, 0, "undecodable", 0.0, 0.0)))
  }

  test("scene cuts flag exactly the planted scene boundary; steady videos stay cut-free") {
    import graft.SparkSpec.spark.implicits._
    // video 1: two 3-frame scenes → exactly one cut, at the first
    // frame of the NEW scene (idx 3, prev 2). video 2: one scene
    // (identical frames) → no cuts at all.
    val twoScene = Multimodal.syntheticVideo(Seq(5L, 5L, 5L, 9L, 9L, 9L))
    val oneScene = Multimodal.syntheticVideo(Seq(21L, 21L, 21L, 21L))
    val docs = Seq((1L, twoScene), (2L, oneScene)).toDF("doc_id", "payload")
    val cuts = Multimodal.sceneCuts(spark, docs, "doc_id", step = 1,
        minHamming = 10, decoder = Multimodal.MjpegAviFrameDecoder)
      .select(col("doc_id"), col("frame_idx"), col("prev_idx"))
      .as[(Long, Int, Int)].collect().toSet
    assert(cuts === Set((1L, 3, 2)))
    // sampling every 2nd frame still straddles the boundary: the cut
    // survives sub-sampling (sampled idxs 0,2,4 → cut at idx 4)
    val sampled = Multimodal.sceneCuts(spark, docs, "doc_id", step = 2,
        minHamming = 10, decoder = Multimodal.MjpegAviFrameDecoder)
      .select(col("doc_id"), col("frame_idx"), col("prev_idx"))
      .as[(Long, Int, Int)].collect().toSet
    assert(sampled === Set((1L, 4, 2)))
  }
}
