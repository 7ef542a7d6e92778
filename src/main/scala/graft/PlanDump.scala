package graft

import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` of named gate queries to files —
  * the plan evidence the optimization notes cite. Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> q97_route_cross ..."
  * writes <outDir>/<query>_<suffix>.txt per query.
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (32).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <query>...")
    val outDir = new java.io.File(args(0)); outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (q <- args.drop(2)) {
      val fn = SparkEntry.queries.getOrElse(q, sys.error(s"unknown query $q"))
      val plan = fn(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(new java.io.File(outDir, s"${q}_$suffix.txt"))
      try w.write(plan) finally w.close()
      println(s"PLANDUMP wrote ${q}_$suffix.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
