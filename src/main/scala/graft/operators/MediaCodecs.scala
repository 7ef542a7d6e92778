package graft.operators

/** Pure-JVM media codecs for the multimodal operators. No native or
  * third-party libraries exist in this environment, so coverage is the
  * set of formats decodable from first principles on the JVM:
  *
  *  - RIFF/WAVE with integer PCM payloads (8/16-bit), the dominant
  *    uncompressed audio interchange format — a real parser, not a
  *    reinterpretation of raw bytes;
  *  - raw MJPEG streams (concatenated JPEG frames — the classic
  *    motion-JPEG elementary stream), demuxed by SOI/EOI marker scan
  *    with correct skipping of entropy-stuffed 0xFF00 bytes and
  *    per-frame decode via javax.imageio.
  *
  * Compressed audio (MP3/AAC/...) and inter-frame video codecs stay
  * out of scope here; the operators in [[Multimodal]] surface a clear
  * error for payloads they cannot decode rather than faking features.
  */
object MediaCodecs {
  /** Decoded PCM audio: interleaved integer samples. */
  final case class WavData(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           samples: Array[Int]) {
    def framesPerChannel: Int = if (channels == 0) 0 else samples.length / channels
    def durationSeconds: Double =
      if (sampleRate == 0) 0.0 else framesPerChannel.toDouble / sampleRate
  }

  @inline private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  @inline private def u32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)

  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Parse a RIFF/WAVE container with an integer-PCM `data` chunk.
    * Returns None for anything that is not a well-formed PCM WAV.
    */
  def parseWav(bytes: Array[Byte]): Option[WavData] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE")
      return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // (audioFormat, channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (off + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(bytes, off)
      // size stays a Long (u32 yields [0, 2^32)) until bounds-checked
      // in Long math, so a corrupt 32-bit size can neither step the
      // cursor backwards nor bypass the bounds check via overflow
      val size = u32(bytes, off + 4)
      val body = off + 8L
      if (body + size > bytes.length) return None
      val sz = size.toInt
      id match {
        case "fmt " if sz >= 16 =>
          // the u32 rate field must be range-checked before narrowing:
          // a corrupt rate >= 2^31 would wrap negative through .toInt
          // and be accepted as well-formed
          val rate = u32(bytes, body.toInt + 4)
          if (rate > 0 && rate <= Int.MaxValue)
            fmt = Some((u16(bytes, body.toInt), u16(bytes, body.toInt + 2),
              rate.toInt, u16(bytes, body.toInt + 14)))
        case "data" => data = Some((body.toInt, sz))
        case _ => ()
      }
      off = body.toInt + sz + (sz & 1) // chunks are word-aligned
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      (dOff, dSize) <- data
      if audioFormat == 1 && channels > 0 && (bits == 8 || bits == 16)
    } yield {
      val bytesPer = bits / 8
      val n = dSize / bytesPer
      val samples = new Array[Int](n)
      var i = 0
      while (i < n) {
        samples(i) =
          if (bits == 8) (bytes(dOff + i) & 0xff) - 128 // 8-bit WAV is unsigned
          else ((bytes(dOff + 2 * i) & 0xff) | (bytes(dOff + 2 * i + 1) << 8)).toShort.toInt
        i += 1
      }
      WavData(rate, channels, bits, samples)
    }
  }

  /** Encode interleaved 16-bit PCM as a canonical WAV file. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes); out.putInt(36 + dataSize); out.put("WAVE".getBytes)
    out.put("fmt ".getBytes); out.putInt(16)
    out.putShort(1); out.putShort(channels.toShort)
    out.putInt(sampleRate); out.putInt(sampleRate * channels * 2)
    out.putShort((channels * 2).toShort); out.putShort(16)
    out.put("data".getBytes); out.putInt(dataSize)
    samples.foreach(out.putShort)
    out.array()
  }

  /** (offset, length) of each JPEG frame in a raw MJPEG stream —
    * SEGMENT-AWARE: length-delimited header segments (APPn, COM, DQT,
    * DHT, SOF, DRI, ...) are skipped by their declared 2-byte
    * lengths, so an FF D9 embedded inside e.g. an EXIF APP1 thumbnail
    * cannot fake a frame boundary; after SOS the entropy-coded data
    * is scanned with stuffed-FF00 and RSTn awareness until the true
    * EOI. A structurally broken frame aborts the stream at its start
    * (no guessing).
    */
  def mjpegFrameOffsets(bytes: Array[Byte]): Array[(Int, Int)] = {
    val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    var i = 0
    while (i + 1 < bytes.length) {
      if (u8(i) == 0xff && u8(i + 1) == 0xd8) {
        val start = i
        var j = i + 2
        var end = -1
        var broken = false
        // header segments until SOS or EOI
        while (end < 0 && !broken) {
          if (j + 1 >= bytes.length || u8(j) != 0xff) broken = true
          else u8(j + 1) match {
            case 0xd9 => end = j + 2 // EOI (frame without scan data)
            case 0xff => j += 1 // fill byte before a marker
            case 0xd8 | 0x01 => j += 2 // SOI again / TEM: no length
            case m if m >= 0xd0 && m <= 0xd7 => j += 2 // RSTn: no length
            case 0xda => // SOS: skip its header, then entropy scan
              if (j + 3 >= bytes.length) broken = true
              else {
                var k = j + 2 + ((u8(j + 2) << 8) | u8(j + 3))
                var done = false
                while (!done && !broken) {
                  if (k + 1 >= bytes.length) broken = true
                  else if (u8(k) == 0xff) {
                    val m2 = u8(k + 1)
                    if (m2 == 0xd9) { end = k + 2; done = true }
                    else if (m2 == 0x00 || (m2 >= 0xd0 && m2 <= 0xd7)) k += 2
                    else if (m2 == 0xff) k += 1 // fill byte
                    else { j = k; done = true } // next segment marker
                  } else k += 1
                }
              }
            case _ => // length-delimited segment (APPn, COM, DQT, ...)
              if (j + 3 >= bytes.length) broken = true
              else {
                val len = (u8(j + 2) << 8) | u8(j + 3)
                if (len < 2 || j + 2 + len > bytes.length) broken = true
                else j = j + 2 + len
              }
          }
        }
        if (end > 0) { frames += ((start, end - start)); i = end }
        else i = bytes.length // broken frame: stop (no guessing)
      } else i += 1
    }
    frames.toArray
  }

  /** A raw MJPEG stream IS the concatenation of its JPEG frames. */
  def encodeMjpeg(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new Array[Byte](frames.map(_.length).sum)
    var off = 0
    frames.foreach { f =>
      System.arraycopy(f, 0, out, off, f.length); off += f.length
    }
    out
  }

  /** Deterministic synthetic media payload for gates/benches: even
    * ordinals get a PCM WAV (seeded tone mix), odd ordinals a small
    * raw MJPEG stream. Returns (media_id, bytes, kind).
    */
  def syntheticMedia(ord: Long): (String, Array[Byte], String) = {
    if (ord % 2 == 0) {
      val rate = 8000
      val n = 2000 + (ord % 7).toInt * 500
      val f1 = 200.0 + (ord % 13) * 40.0
      val samples = Array.tabulate(n) { i =>
        val t = i.toDouble / rate
        ((math.sin(2 * math.Pi * f1 * t) * 0.7 +
          math.sin(2 * math.Pi * f1 * 2.7 * t) * 0.2) * 9000).toShort
      }
      (f"media_$ord%06d", encodeWavPcm16(rate, 1, samples), "wav")
    } else {
      javax.imageio.ImageIO.setUseCache(false)
      val w = 32; val h = 24
      val frames = (0 until 4 + (ord % 3).toInt).map { f =>
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y,
              ((ord * 2654435761L + f * 131071L + y * w + x) & 0xffffff).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "jpg", bos)
        bos.toByteArray
      }
      (f"media_$ord%06d", encodeMjpeg(frames), "mjpeg")
    }
  }
}
