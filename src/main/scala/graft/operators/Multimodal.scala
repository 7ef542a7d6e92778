package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.sources.ImageTable

/** Multimodal payload operators: media travel as opaque `binary`
  * columns plus typed metadata, and per-row transforms run as typed
  * `mapPartitions` batches (the JVM analogue of `mapInPandas` — one
  * iterator per partition, no per-row scheduling overhead, media
  * libraries initialized once per task).
  *
  * Image decode/resize/feature-extract are REAL (pure-JVM
  * javax.imageio + raw buffers). Audio and video are decoded by the
  * pure-JVM codecs in [[MediaCodecs]]: integer-PCM RIFF/WAVE parsing
  * for [[audioFeatures]] and raw-MJPEG demux + javax.imageio frame
  * decode for [[videoFrameSample]]. Payloads outside those formats
  * (compressed audio, inter-frame video) are DROPPED with skip
  * semantics — no library in this container can decode them, and
  * faking features would be worse than omitting rows.
  */
object Multimodal {
  final case class MediaRow(media_id: String, bytes: Array[Byte], w: Int, h: Int,
                            fmt: String)
  final case class ImageFeatures(media_id: String, w: Int, h: Int,
                                 mean_luma: Double, luma_grid: Array[Double])
  final case class Thumbnail(media_id: String, w: Int, h: Int, bytes: Array[Byte])
  final case class AudioFeatures(media_id: String, sample_rate: Int, channels: Int,
                                 n_frames: Int, duration_s: Double, rms: Double,
                                 zero_crossings: Int)
  final case class VideoFrames(media_id: String, frame_index: Int,
                               frame_w: Int, frame_h: Int,
                               frame_bytes: Array[Byte])

  /** Decode + 8x8 luma feature grid per image (REAL decode path). */
  def imageFeatures(images: DataFrame): Dataset[ImageFeatures] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          val px = ImageTable.decode(bytes, w, h, fmt)
          // near-twin of ImageTable.phash64's luma grid but NOT
          // unifiable: this one uses integer cell boundaries, phash64
          // uses double boundaries, and phash values are frozen into
          // generated parquet (a silent boundary change would break
          // payload verification against existing tables)
          val grid = new Array[Double](64)
          var gi = 0
          while (gi < 64) {
            val x0 = (gi % 8) * w / 8; val x1 = math.max(x0 + 1, ((gi % 8) + 1) * w / 8)
            val y0 = (gi / 8) * h / 8; val y1 = math.max(y0 + 1, ((gi / 8) + 1) * h / 8)
            var sum = 0.0; var cnt = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val p = (y * w + x) * 3
                sum += 0.299 * (px(p) & 0xff) + 0.587 * (px(p + 1) & 0xff) +
                  0.114 * (px(p + 2) & 0xff)
                cnt += 1; x += 1
              }
              y += 1
            }
            grid(gi) = sum / cnt
            gi += 1
          }
          ImageFeatures(id, w, h, grid.sum / 64, grid)
        }
      }
  }

  /** Nearest-neighbor resize to (tw, th) RAW RGB (REAL). */
  def resize(images: DataFrame, tw: Int, th: Int): Dataset[Thumbnail] = {
    val spark = images.sparkSession
    import spark.implicits._
    images.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { it =>
        it.map { case (id, bytes, w, h, fmt) =>
          val px = ImageTable.decode(bytes, w, h, fmt)
          val out = new Array[Byte](tw * th * 3)
          var y = 0
          while (y < th) {
            val sy = y * h / th
            var x = 0
            while (x < tw) {
              val sx = x * w / tw
              val sp = (sy * w + sx) * 3; val dp = (y * tw + x) * 3
              out(dp) = px(sp); out(dp + 1) = px(sp + 1); out(dp + 2) = px(sp + 2)
              x += 1
            }
            y += 1
          }
          Thumbnail(id, tw, th, out)
        }
      }
  }

  /** REAL audio decode: parse the RIFF/WAVE container (integer PCM,
    * [[MediaCodecs.parseWav]]), mix interleaved channels to mono, and
    * compute rms (in sample units) + zero crossings. Non-WAV /
    * non-PCM payloads are dropped (skip semantics — see object doc).
    */
  def audioFeatures(media: DataFrame, idCol: String, bytesCol: String): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          MediaCodecs.parseWav(bytes).map { wav =>
            val ch = wav.channels
            val n = wav.framesPerChannel
            var sumSq = 0.0
            var crossings = 0
            var prev = 0.0
            var i = 0
            while (i < n) {
              var acc = 0.0
              var c = 0
              while (c < ch) { acc += wav.samples(i * ch + c); c += 1 }
              val s = acc / ch // mono mixdown
              sumSq += s * s
              if (i > 0 && (s >= 0) != (prev >= 0)) crossings += 1
              prev = s
              i += 1
            }
            AudioFeatures(id, wav.sampleRate, ch, n, wav.durationSeconds,
              math.sqrt(sumSq / math.max(1, n)), crossings)
          }
        }
      }
  }

  /** REAL video frame sampling: demux the raw MJPEG stream by JPEG
    * SOI/EOI marker scan ([[MediaCodecs.mjpegFrameOffsets]]), keep
    * every `everyNth` frame, and decode each kept frame with
    * javax.imageio for its dimensions. Streams with no parseable
    * frames are dropped (skip semantics — see object doc).
    */
  def videoFrameSample(media: DataFrame, idCol: String, bytesCol: String,
                       everyNth: Int): Dataset[VideoFrames] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col(idCol), col(bytesCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, bytes) =>
          val offsets = MediaCodecs.mjpegFrameOffsets(bytes)
          offsets.indices.by(math.max(1, everyNth)).iterator.flatMap { f =>
            val (start, len) = offsets(f)
            val frame = java.util.Arrays.copyOfRange(bytes, start, start + len)
            val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(frame))
            if (img == null) None
            else Some(VideoFrames(id, f, img.getWidth, img.getHeight, frame))
          }
        }
      }
  }
}
