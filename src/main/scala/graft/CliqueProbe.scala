package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** DBSCAN dense-core probe: ONE planted clique of `SPARK_GRAFT_CLIQUE`
  * points (default 150k) inside a 300 m disc — every pair mutually
  * within the 10 km eps — plus 1M uniform background scatter.
  *
  * A member-pair eps graph would have to materialize ~n²/2 pair rows
  * for the clique alone (150k -> ~1.1e10 pairs; it OOMs long before
  * that), so this probe is the existence proof for the cell
  * contraction: the clique collapses to a handful of DENSE cells
  * whose members are core by same-cell count alone and whose
  * connectivity is a few proven supernode edges. The probe REQUIRES
  * the clique to resolve to exactly one cluster labeled by its min
  * id, with every member core.
  */
object CliqueProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val cliqueN = sys.env.getOrElse("SPARK_GRAFT_CLIQUE", "150000").toLong
    val bgN = 1000000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.geo

    def u(tag: String, c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c, lit(tag)), lit(1000000L)) / 1000000.0
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    // clique: ids [0, cliqueN) jittered within a 300 m disc at (10N 20E)
    val clique = spark.range(0, cliqueN, 1, cpus.toInt * 4)
      .select(col("id"),
        geo.nvec(
          lit(math.toRadians(10.0)) + (u("qlat", col("id")) * 2.0 - 1.0) * (300.0 / R),
          lit(math.toRadians(20.0)) + (u("qlon", col("id")) * 2.0 - 1.0) * (300.0 / R)).as("n"))
    val bg = spark.range(cliqueN, cliqueN + bgN, 1, cpus.toInt * 4)
      .select(col("id"),
        geo.nvec(asin(u("blat", col("id")) * 2.0 - 1.0),
          (u("blon", col("id")) * 2.0 - 1.0) * lit(math.Pi)).as("n"))
    val df = clique.unionByName(bg)

    val t0 = System.nanoTime()
    // pinned: the clique's hazard exceeds any sane budget anyway, but
    // this probe exists to prove the contraction plan specifically
    val out = Clustering.dbscan(df, "id", "n", 10e3, 10,
      pairwiseBudget = -1L)
    val sec = (System.nanoTime() - t0) / 1e9
    val cliqueRows = out.filter(col("id") < cliqueN)
      .groupBy("cluster", "kind").count().collect()
    require(cliqueRows.length == 1
        && cliqueRows(0).getLong(0) == 0L
        && cliqueRows(0).getString(1) == "core"
        && cliqueRows(0).getLong(2) == cliqueN,
      s"clique must be one all-core cluster labeled 0, got ${cliqueRows.mkString("; ")}")
    val total = out.count()
    out.unpersist()
    println(f"PROBE clique n=$cliqueN bg=$bgN total=$total sec=$sec%.1f")
    spark.stop()
  }
}
