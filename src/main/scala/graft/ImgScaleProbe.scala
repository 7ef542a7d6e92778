package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.ImageTable

/** Scratch probe: locate the non-scaling stage of the flagship image
  * pipeline. Times (a) parquet scan only, (b) scan + verify map,
  * (c) the full Bench.imagePipeline, at SPARK_GRAFT_CPUS cores.
  */
object ImgScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val rows = sys.env.getOrElse("SPARK_GRAFT_IMG_ROWS", "1200000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val images = Bench.imageSource(spark, rows, math.max(cpus.toInt * 2, 8))
    if (sys.env.contains("IMG_GEN_ONLY")) { spark.stop(); return }
    def t(tag: String)(f: => Unit): Unit = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[imgscale] cpus=$cpus $tag best=${times.min}%.2f all=" +
        times.map(x => f"$x%.2f").mkString(","))
    }
    t("scan-only")(images.write.format("noop").mode("overwrite").save())
    t("scan+verify") {
      images.as[ImageTable.ImageRow].map { r =>
        val ord = r.image_id.drop(4).toLong
        val ok = ImageTable.referencePsnr(ord, r.bytes, r.w, r.h, r.fmt) >= 40.0 &&
          ImageTable.payloadPhash(r.bytes, r.w, r.h, r.fmt) == r.phash &&
          ImageTable.referenceCaption(ord) == r.caption
        (r.image_id, r.phash, r.caption, ok)
      }.toDF("image_id", "phash", "caption", "verify_ok")
        .write.format("noop").mode("overwrite").save()
    }
    t("full-pipeline")(Bench.imagePipeline(images))
    spark.stop()
  }
}
