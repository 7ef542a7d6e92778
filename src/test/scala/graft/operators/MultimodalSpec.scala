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

  test("audio/video stubs keep schema and determinism") {
    val af = Multimodal.audioFeatures(images, "image_id", "bytes").collect()
    assert(af.length == 64)
    assert(af.forall(a => a.n_samples > 0 && a.rms >= 0))
    val vf = Multimodal.videoFrameSample(images, "image_id", "bytes", 256, 2).collect()
    assert(vf.nonEmpty)
    assert(vf.forall(_.frame_bytes.length <= 256))
    val byId = vf.groupBy(_.media_id)
    assert(byId.values.forall(fs => fs.map(_.frame_index).distinct.length == fs.length))
  }
}
