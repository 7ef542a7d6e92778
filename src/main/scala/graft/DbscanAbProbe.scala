package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** A/B probe: contracted DBSCAN (Clustering.dbscan) vs the
  * member-pair plan (Clustering.pairwiseDbscan) on the GeoScaleProbe
  * cloud, same session conditions — the recorded evidence that the
  * dense-core contraction wins at scale (it is also the only plan
  * that survives a planted clique: see CliqueProbe).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.DbscanAbProbe 4000000 [old]"
  */
object DbscanAbProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(4000000L)
    val old = args.length > 1 && args(1) == "old"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val path = s"/tmp/graft_geo_probe_v1_$rows"
    if (!new java.io.File(path + "/_SUCCESS").exists())
      GeoScaleProbe.cloud(spark, rows, cpus.toInt * 4).write.mode("overwrite")
        .option("compression", "none").parquet(path)
    val df = spark.read.parquet(path)
    val t0 = System.nanoTime()
    val out = if (old) Clustering.pairwiseDbscan(df, "id", "n", 10e3, 10,
        graft.geo.Ellipsoids.MeanEarthRadius, 0)
      else Clustering.dbscan(df, "id", "n", 10e3, 10,
        pairwiseBudget = -1L) // the A/B compares PLANS, not the dispatch
    val n = out.count()
    val c = out.filter(col("kind") === "core")
      .groupBy("cluster").count().filter(col("count") >= 8).count()
    val which = if (old) "pairwise" else "contracted"
    println(f"PROBE dbscan_ab plan=$which rows=$rows out=$n clusters=$c sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    spark.stop()
  }
}
