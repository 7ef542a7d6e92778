package graft
import org.apache.spark.sql.SparkSession
object KnnProbeOnly {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 4000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = JoinScaleProbe.points(spark, n, "q", 7)
    val d = JoinScaleProbe.points(spark, n, "d", 13)
    val lvl = if (args.length > 1) args(1).toInt else -1
    val t0 = System.nanoTime()
    val rows = graft.operators.SpatialJoins.knnJoin(q, d, "q_n", "d_n", "q_id", "d_id", 5,
      level = lvl, bruteForceThreshold = 0).count()
    println(f"KNNONLY n=$n lvl=$lvl rows=$rows elapsed=${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
