package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.geo
import graft.operators.SpatialJoins

/** Scale probe for the spatial-join machinery: synthesizes N query and
  * M data points (deterministic integer-hash scatter, generated
  * distributed via spark.range — nothing collected to the driver) and
  * times distanceJoin and knnJoin end to end. Run at two sizes /
  * parallelism levels to see how the candidate->verify->select joins
  * scale; results recorded in BENCH/BASELINE.md.
  *
  * {{{
  * SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.JoinScaleProbe 1000000 1000000"
  * }}}
  */
object JoinScaleProbe {
  def points(spark: SparkSession, n: Long, name: String, salt: Long): DataFrame =
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 2)
      // 179424673 distinct sites; intermediates stay < 2^63 under
      // ANSI arithmetic (id*2654435761 ~ 1e16, k*69069 ~ 1.2e13)
      .withColumn("k", pmod(col("id") * 2654435761L + salt, lit(179424673L)))
      .withColumn("lat", asin(((col("k") * 40503L) % 180001L) / 90000.5 - 1.0))
      .withColumn("lon", (((col("k") * 69069L) % 360001L) / 180000.5 - 1.0) * math.Pi)
      .select(col("id").as(s"${name}_id"),
        geo.nvec(col("lat"), col("lon")).as(s"${name}_n"))

  /** Power-law-skewed points: half the rows concentrate in a ~20 km
    * disc at (45N, 10E) — one white-hot cell at any join level — and
    * half scatter uniformly like [[points]]. Exercises the hot-cell
    * salting path of distanceJoin with a realistic worst case
    * (metro-area photo dumps in a global corpus).
    */
  def skewedPoints(spark: SparkSession, n: Long, name: String, salt: Long): DataFrame =
    spark.range(0, n, 1, spark.sparkContext.defaultParallelism * 2)
      .withColumn("k", pmod(col("id") * 2654435761L + salt, lit(179424673L)))
      .withColumn("hot", pmod(col("id"), lit(2)) === 0)
      .withColumn("lat",
        when(col("hot"),
          lit(math.toRadians(45.0)) + ((col("k") % 1000L) / 1000.0 - 0.5) * 0.003)
          .otherwise(asin(((col("k") * 40503L) % 180001L) / 90000.5 - 1.0)))
      .withColumn("lon",
        when(col("hot"),
          lit(math.toRadians(10.0)) + (((col("k") * 7L) % 1000L) / 1000.0 - 0.5) * 0.003)
          .otherwise((((col("k") * 69069L) % 360001L) / 180000.5 - 1.0) * math.Pi))
      .select(col("id").as(s"${name}_id"),
        geo.nvec(col("lat"), col("lon")).as(s"${name}_n"))

  def main(args: Array[String]): Unit = {
    val nQ = if (args.length > 0) args(0).toLong else 1000000L
    val nD = if (args.length > 1) args(1).toLong else 1000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = points(spark, nQ, "q", 7)
    val d = points(spark, nD, "d", 13)
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      println(f"PROBE $name nQ=$nQ nD=$nD cpus=$cpus rows=$rows elapsed=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("distance_join_50km") {
      SpatialJoins.distanceJoin(q, d, "q_n", "d_n", 50e3).count()
    }
    time("knn_join_k5") {
      SpatialJoins.knnJoin(q, d, "q_n", "d_n", "q_id", "d_id", 5,
        bruteForceThreshold = 0).count()
    }
    // hot-cell skew: half the probe side in one ~20 km disc; compare
    // the unsalted join (one giant cell key) against salted
    // repartitioning of the hot cells
    val qSkew = skewedPoints(spark, nQ, "q", 7)
    time("distance_join_50km_skewed_nosalt") {
      SpatialJoins.distanceJoin(qSkew, d, "q_n", "d_n", 50e3).count()
    }
    time("distance_join_50km_skewed_salt16") {
      SpatialJoins.distanceJoin(qSkew, d, "q_n", "d_n", 50e3,
        skewSalt = 16, hotCellThreshold = 100000L).count()
    }
    spark.stop()
  }
}
