package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.ImageTable

object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.parquet.columnarReaderBatchSize",
        sys.env.getOrElse("SPARK_GRAFT_BATCH", "4096"))
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val images = spark.read.parquet("/tmp/graft_bench_images_600000")
    def time(name: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ => val t0 = System.nanoTime(); f; (System.nanoTime()-t0)/1e9 }.sorted
      println(f"PROBE $name cpus=$cpus median=${ts(1)}%.2f")
    }
    // A: raw scan only
    time("scan")(images.agg(sum(length(col("caption")))).collect())
    // B: scan incl. bytes column
    time("scan_bytes")(images.agg(sum(length(col("bytes")))).collect())
    // C: pure compute (no parquet): regenerate pixels from range
    time("compute") {
      spark.range(0, 600000, 1, cpus.toInt * 8).map { i =>
        val w = ImageTable.widthOf(i); val h = ImageTable.heightOf(i)
        val px = ImageTable.pixelsOf(i, w, h)
        px(0).toLong + px.length
      }.agg(sum("value")).collect()
    }
    // D: full verify map over parquet
    time("verify") {
      images.as[ImageTable.ImageRow].map { r =>
        val ord = r.image_id.drop(4).toLong
        val ok = ImageTable.referencePsnr(ord, r.bytes, r.w, r.h, r.fmt) >= 40.0
        if (ok) 1L else 0L
      }.agg(sum("value")).collect()
    }
    // D2: verify RAW rows only (no ImageIO)
    time("verify_raw") {
      images.filter(col("fmt") === "RAW").as[ImageTable.ImageRow].map { r =>
        val ord = r.image_id.drop(4).toLong
        if (ImageTable.referencePsnr(ord, r.bytes, r.w, r.h, r.fmt) >= 40.0) 1L else 0L
      }.agg(sum("value")).collect()
    }
    // D3: verify JPG rows only (ImageIO decode path)
    time("verify_jpg") {
      images.filter(col("fmt") === "JPG").as[ImageTable.ImageRow].map { r =>
        val ord = r.image_id.drop(4).toLong
        if (ImageTable.referencePsnr(ord, r.bytes, r.w, r.h, r.fmt) >= 40.0) 1L else 0L
      }.agg(sum("value")).collect()
    }
    // D4: JPG decode only (no PSNR/regen)
    time("jpg_decode_only") {
      images.filter(col("fmt") === "JPG").as[ImageTable.ImageRow].map { r =>
        ImageTable.decode(r.bytes, r.w, r.h, r.fmt).length.toLong
      }.agg(sum("value")).collect()
    }
    // E: geometry + join + agg, no verify
    time("geo_join") {
      graft.operators.SpatialJoins.aoiJoin(
        images.select("image_id")
          .withColumn("ord", substring(col("image_id"), 5, 12).cast("long"))
          .withColumn("lat", SparkEntry.latRad(col("ord"))) // shared overflow-safe position hash
          .withColumn("lon", SparkEntry.lonRad(col("ord")))
          .withColumn("n", graft.functions.geo.nvec(col("lat"), col("lon"))),
        "n", Seq(graft.operators.SpatialJoins.Aoi("eq",
          Seq((-25.0, -30.0), (-25.0, 30.0), (25.0, 30.0), (25.0, -30.0)))))
        .groupBy("aoi_id").count().collect()
    }
    spark.stop()
  }
}
