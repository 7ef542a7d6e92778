package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.sources.ImageTable

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  lazy val images = ImageTable.generate(spark, 64, 4).cache()

  test("image features: real decode, luma grid matches phash basis") {
    val feats = Multimodal.imageFeatures(images).collect()
    assert(feats.length == 64)
    feats.foreach { f =>
      assert(f.luma_grid.length == 64)
      assert(f.mean_luma > 0 && f.mean_luma < 255)
      // grid reproduces the stored phash (same 8x8 luma basis)
      val mean = f.luma_grid.sum / 64
      var bits = 0L
      f.luma_grid.zipWithIndex.foreach { case (v, i) => if (v >= mean) bits |= (1L << i) }
      val stored = images.filter(col("image_id") === f.media_id)
        .select("phash").collect()(0).getLong(0)
      assert(bits == stored, s"${f.media_id}")
    }
  }

  test("resize produces fixed-size RAW thumbnails") {
    val thumbs = Multimodal.resize(images, 8, 8).collect()
    assert(thumbs.forall(t => t.bytes.length == 8 * 8 * 3))
    // deterministic: same input -> same thumbnail
    val again = Multimodal.resize(images, 8, 8).collect()
      .map(t => t.media_id -> t.bytes.toSeq).toMap
    thumbs.foreach(t => assert(again(t.media_id) == t.bytes.toSeq))
  }

  test("wav codec: encode/parse round trip and sine-wave features") {
    import spark.implicits._
    // 440 Hz sine at 8 kHz, 1 s, amplitude 10000, stereo (equal chans)
    val rate = 8000; val n = 8000; val amp = 10000.0; val freq = 440.0
    val mono = Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * freq * i / rate)).toShort)
    val stereo = Array.tabulate(2 * n)(i => mono(i / 2))
    val wav = MediaCodecs.encodeWavPcm16(rate, 2, stereo)
    val parsed = MediaCodecs.parseWav(wav).get
    assert(parsed.sampleRate == rate && parsed.channels == 2 &&
      parsed.bitsPerSample == 16 && parsed.framesPerChannel == n)
    val df = Seq(("a1", wav), ("bad", Array[Byte](1, 2, 3, 4, 5)))
      .toDF("media_id", "bytes")
    val af = Multimodal.audioFeatures(df, "media_id", "bytes").collect()
    // the undecodable payload is dropped, not faked
    assert(af.length == 1 && af.head.media_id == "a1")
    val a = af.head
    assert(a.sample_rate == rate && a.channels == 2 && a.n_frames == n)
    assert(math.abs(a.duration_s - 1.0) < 1e-9)
    // sine rms = amp/sqrt(2); quantization keeps it within 1%
    assert(math.abs(a.rms - amp / math.sqrt(2)) < amp * 0.01, s"rms=${a.rms}")
    // a 440 Hz sine crosses zero ~2*440 times per second
    assert(math.abs(a.zero_crossings - 880) <= 2, s"zc=${a.zero_crossings}")
  }

  test("wav parser rejects malformed chunk sizes without hanging") {
    def riff(chunkSize: Long): Array[Byte] = {
      val b = java.nio.ByteBuffer.allocate(64)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("RIFF".getBytes); b.putInt(56); b.put("WAVE".getBytes)
      b.put("junk".getBytes); b.putInt(chunkSize.toInt)
      b.array()
    }
    // size 0xFFFFFFF8 used to step the cursor backwards (infinite loop)
    assert(MediaCodecs.parseWav(riff(0xFFFFFFF8L)).isEmpty)
    // large positive size must not bypass the bounds check
    assert(MediaCodecs.parseWav(riff(0x7FFFFFF0L)).isEmpty)
    // truncated header
    assert(MediaCodecs.parseWav("RIFF1234WAV".getBytes).isEmpty)
  }

  test("mjpeg demux skips APPn segments containing embedded FF D9") {
    // craft a frame: SOI + APP1 whose payload embeds FF D8 ... FF D9
    // (an EXIF-thumbnail stand-in) + a real JPEG body after it
    val img = new java.awt.image.BufferedImage(8, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val real = bos.toByteArray // FF D8 <segments> ... FF D9
    val thumb = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x11, 0x22,
      0xFF.toByte, 0xD9.toByte)
    val app1Len = 2 + thumb.length
    val app1 = Array[Byte](0xFF.toByte, 0xE1.toByte,
      ((app1Len >> 8) & 0xff).toByte, (app1Len & 0xff).toByte) ++ thumb
    // splice APP1 right after the real frame's SOI
    val spliced = real.take(2) ++ app1 ++ real.drop(2)
    val stream = MediaCodecs.encodeMjpeg(Seq(spliced, real))
    val offsets = MediaCodecs.mjpegFrameOffsets(stream)
    assert(offsets.length == 2, s"expected 2 frames, got ${offsets.length}")
    assert(offsets(0) == ((0, spliced.length)),
      s"embedded FF D9 must not end the frame: ${offsets(0)}")
    assert(offsets(1) == ((spliced.length, real.length)))

    // fill bytes (0xFF padding) before a header marker are legal
    val padded = real.take(2) ++ Array[Byte](0xFF.toByte, 0xFF.toByte) ++ real.drop(2)
    val off2 = MediaCodecs.mjpegFrameOffsets(padded)
    assert(off2.length == 1 && off2(0) == ((0, padded.length)),
      s"fill bytes broke the parse: ${off2.toSeq}")
  }

  test("mjpeg demux: real frame boundaries and imageio decode") {
    import spark.implicits._
    // build a real MJPEG stream from JPEG-encoded synthetic frames
    def jpegFrame(seed: Int, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (seed * 2654435761L + y * w + x).toInt & 0xffffff)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val frames = (0 until 7).map(i => jpegFrame(i, 24, 16))
    val stream = MediaCodecs.encodeMjpeg(frames)
    val offsets = MediaCodecs.mjpegFrameOffsets(stream)
    assert(offsets.length == 7, s"demuxed ${offsets.length} frames")
    assert(offsets.map(_._2).sum == stream.length, "frames must tile the stream")
    val df = Seq(("v1", stream), ("noise", Array.fill[Byte](64)(0x11))).toDF("media_id", "bytes")
    val vf = Multimodal.videoFrameSample(df, "media_id", "bytes", everyNth = 2)
      .collect().sortBy(_.frame_index)
    assert(vf.map(_.media_id).distinct.sameElements(Array("v1")))
    assert(vf.map(_.frame_index).sameElements(Array(0, 2, 4, 6)))
    assert(vf.forall(f => f.frame_w == 24 && f.frame_h == 16))
    // sampled frame bytes are the exact original JPEGs
    vf.foreach(f => assert(f.frame_bytes.sameElements(frames(f.frame_index))))
  }
}
