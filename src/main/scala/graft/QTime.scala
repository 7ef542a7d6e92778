package graft

import org.apache.spark.sql.SparkSession

/** Dev timing harness: run named gate queries repeatedly and print
  * per-run seconds. Usage:
  *   sbt "runMain graft.QTime q40_cog_smoothed q17_knn_suppliers"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32),
  * SPARK_GRAFT_REPS (3).
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(100000).selectExpr("sum(id)").collect() // session warm-up
    for (q <- args) {
      val fn = SparkEntry.queries.getOrElse(q,
        sys.error(s"unknown query $q; known: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        // noop sink — same methodology as Bench (count() lets
        // Catalyst prune projection-heavy queries to near zero)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        (dt, 0L)
      }
      println(f"QTIME $q " +
        times.map(t => f"${t._1}%.2f").mkString("[", ", ", "]") + " sec")
    }
    spark.stop()
  }
}
