package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Clustering

/** DBSCAN dense-dense refinement probe: TWO planted blobs of
  * `SPARK_GRAFT_BLOB` points each (default 400k), uniform in 6 km
  * discs whose centers sit 9 km apart at a 10 km eps, plus 200k
  * uniform background scatter.
  *
  * Each blob spans several contraction cells (cell diameter <= 8.8 km
  * at this eps) whose pairwise supernode bounds mostly cannot decide
  * the eps edge — the pre-refinement fallback joined FULL memberships
  * per uncertain cell pair (~80k x 80k rows per pair, ~1e10 overall;
  * it OOMs long before that), so this probe is the existence proof
  * for the sub-cell refinement + existence short-circuit: every
  * uncertain cell pair here owns a deep-inside sub-pair, the edge is
  * proven at sub-cell granularity, and NO member pair materializes.
  * The probe REQUIRES both blobs to resolve to ONE all-core cluster
  * labeled by the global min id.
  */
object TwinBlobProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val blobN = sys.env.getOrElse("SPARK_GRAFT_BLOB", "400000").toLong
    val bgN = 200000L
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      // dbscan's composed plan over EXPRESSION-GENERATED input re-inlines
      // the disc-construction trees at every persisted-frame reference;
      // AQE renders the final plan's explain string per plan update and
      // an uncapped (2 GiB default) render OOMs the driver before any
      // data moves. Production jobs read scans (short plan strings), but
      // capping the render is the operational guard either way.
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.geo

    def u(tag: String, c: org.apache.spark.sql.Column) =
      pmod(xxhash64(c, lit(tag)), lit(1000000L)) / 1000000.0
    val R = graft.geo.Ellipsoids.MeanEarthRadius
    // uniform-in-disc: radius = 6 km * sqrt(u), angle = 2 pi u
    def disc(ids: org.apache.spark.sql.Dataset[java.lang.Long],
             latDeg: Double, lonDeg: Double) = {
      val rad = sqrt(u("r", col("id"))) * (6000.0 / R)
      val ang = u("a", col("id")) * (2.0 * math.Pi)
      ids.select(col("id"), geo.nvec(
        lit(math.toRadians(latDeg)) + rad * cos(ang),
        lit(math.toRadians(lonDeg)) +
          rad * sin(ang) / math.cos(math.toRadians(latDeg))).as("n"))
    }
    val east = math.toDegrees(9000.0 / R / math.cos(math.toRadians(10.0)))
    val blobA = disc(spark.range(0, blobN, 1, cpus.toInt * 4), 10.0, 20.0)
    val blobB = disc(spark.range(blobN, 2 * blobN, 1, cpus.toInt * 4),
      10.0, 20.0 + east)
    val bg = spark.range(2 * blobN, 2 * blobN + bgN, 1, cpus.toInt * 4)
      .select(col("id"),
        geo.nvec(asin(u("blat", col("id")) * 2.0 - 1.0),
          (u("blon", col("id")) * 2.0 - 1.0) * lit(math.Pi)).as("n"))
    val df = blobA.unionByName(blobB).unionByName(bg)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    df.count() // materialize generation outside the timed window

    val t0 = System.nanoTime()
    val out = Clustering.dbscan(df, "id", "n", 10e3, 10,
      pairwiseBudget = -1L) // prove the refinement path, not the dispatch
    val sec = (System.nanoTime() - t0) / 1e9
    val blobRows = out.filter(col("id") < 2 * blobN)
      .groupBy("cluster", "kind").count().collect()
    require(blobRows.length == 1
        && blobRows(0).getLong(0) == 0L
        && blobRows(0).getString(1) == "core"
        && blobRows(0).getLong(2) == 2 * blobN,
      s"twin blobs must merge to one all-core cluster labeled 0, got " +
        blobRows.mkString("; "))
    val total = out.count()
    out.unpersist()
    println(f"PROBE twinblob n=${2 * blobN} bg=$bgN total=$total sec=$sec%.1f")
    spark.stop()
  }
}
