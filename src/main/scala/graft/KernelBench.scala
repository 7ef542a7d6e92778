package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.geo

/** Single-core kernel throughput microbenchmark (documented in
  * BENCH/BASELINE.md): rows/sec through whole-stage codegen for the
  * headline kernels on local[1].
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[1]")
      .config("spark.sql.shuffle.partitions", 1)
      .config("spark.ui.enabled", false).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = 3000000L
    val base = spark.range(0, n, 1, 1)
      .withColumn("lat1", radians((col("id") % 17000).cast("double") / 100.0 - 85.0))
      .withColumn("lon1", radians((col("id") % 35900).cast("double") / 100.0 - 179.0))
      .withColumn("lat2", radians((col("id") % 16900).cast("double") / 101.0 - 83.0))
      .withColumn("lon2", radians((col("id") % 35800).cast("double") / 103.0 - 178.0))
    def time(name: String)(c: org.apache.spark.sql.Column): Unit = {
      val df = base.select(c.as("v")).agg(sum("v"))
      df.collect() // warm
      val t0 = System.nanoTime()
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"KERNELBENCH $name ${n / dt / 1e6}%.2f Mrows/s/core")
    }
    time("gc_distance")(geo.gcDistanceLatLon(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
    time("azimuth")(geo.azimuth(geo.nvec(col("lat1"), col("lon1")), geo.nvec(col("lat2"), col("lon2"))))
    time("cell_at_l12")(graft.index.cells.cellAt(geo.nvec(col("lat1"), col("lon1")), 12).cast("double"))
    time("karney_inverse")(geo.geodesicDistance(col("lat1"), col("lon1"), col("lat2"), col("lon2")))
    // landmark kNN: per-row top-3 against 256 literal landmarks
    val lms: Seq[(Long, graft.geo.Vec3)] = (0 until 256).map { i =>
      (i.toLong, graft.geo.Gade.latLonToNvec(
        (-80.0 + 10.3 * (i % 16)) / 180.0 * math.Pi,
        (-170.0 + 21.1 * (i / 16)) / 180.0 * math.Pi))
    }
    locally {
      val pts = base.withColumn("n", geo.nvec(col("lat1"), col("lon1")))
      val df = graft.operators.SpatialJoins.knnLandmarks(
        pts.select(col("id"), col("n")), "n", lms, k = 3)
        .agg(sum("dist_m"))
      df.collect() // warm
      val t0 = System.nanoTime()
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"KERNELBENCH knn_landmarks_256 ${n / dt / 1e6}%.2f Mrows/s/core")
    }
    // fused md5-basis simhash over ~60-char strings (gate-kernel rate)
    locally {
      val txt = base.withColumn("t",
        concat_ws(" ", lit("the quick brown fox jumps over"), col("id"),
          lit("lazy dogs near riverbank settlements")))
      // bit_count, not sum: signatures are arbitrary 64-bit values and
      // a 3M-row sum overflows under ANSI mode
      val df = txt.select(graft.operators.Dedup.simHashMd5(col("t")).as("v"))
        .agg(sum(bit_count(col("v"))))
      df.collect() // warm
      val t0 = System.nanoTime()
      df.collect()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"KERNELBENCH simhash_md5_60ch ${n / dt / 1e6}%.2f Mrows/s/core")
    }
    spark.stop()
  }
}
