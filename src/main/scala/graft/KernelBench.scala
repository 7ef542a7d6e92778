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
    spark.stop()
  }
}
