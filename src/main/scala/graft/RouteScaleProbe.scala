package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoins

/** Scale probe for the route-route crossing join: a self-join over
  * SPARK_GRAFT_ROUTES polylines (default 200k) at a quarter of the
  * size and at full size, AT CONSTANT ROUTE DENSITY — the anchor
  * longitude window scales with the leg size (quarter leg, quarter
  * window), modeling a 4x scale-up as MORE WORLD at the same
  * density. (Fixed-area densification is a different regime: both
  * crossing pairs and cover candidates grow quadratically with
  * density by simple geometry — a fixed-window 200k -> 800k run
  * produced 16x the pairs and exhausted 60+ GB of spill, which is
  * the output's size, not a plan defect.) Routes are 4-vertex
  * zig-zags built DISTRIBUTIVELY from hashed anchors with a
  * road-like length mix (90% ~10-70 km, 9% ~100-500 km, 1%
  * ~700-1900 km per half-width class); pieceMeters 25 km keeps the
  * shared cover level near the short-route scale so dense short
  * routes don't pile into coarse cells.
  */
object RouteScaleProbe {
  private def u(tag: String, c: Column): Column =
    pmod(xxhash64(c, lit(tag)), lit(1000000L)) / 1000000.0

  private def routes(spark: SparkSession, n: Long, lonFrac: Double,
                     parts: Int): DataFrame = {
    import graft.functions.geo
    val d2r = math.Pi / 180.0
    val cls = u("rc", col("id"))
    val half = when(cls < 0.90, lit(0.05) + u("rs", col("id")) * 0.25)
      .when(cls < 0.99, lit(0.5) + u("rm", col("id")) * 1.5)
      .otherwise(lit(3.0) + u("rl", col("id")) * 5.0)
    val base = spark.range(0, n, 1, parts)
      .withColumn("__clat", (u("ra", col("id")) * 2.0 - 1.0) * (60.0 * d2r))
      .withColumn("__clon", (u("ro", col("id")) * 2.0 - 1.0) * (math.Pi * lonFrac))
      .withColumn("__dla", half * d2r)
      .withColumn("__dlo", (half * (lit(0.6) + u("rr", col("id")))) * d2r)
    def v(sa: Int, so: Int) = geo.nvec(
      col("__clat") + lit(sa) * col("__dla"),
      col("__clon") + lit(so) * col("__dlo"))
    val verts = Seq(v(-1, -1), v(1, 0), v(-1, 1), v(1, 2))
      .flatMap(c => Seq(geo.vx(c), geo.vy(c), geo.vz(c)))
    base.select(col("id").as("r_id"), array(verts: _*).as("verts"))
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nFull = sys.env.getOrElse("SPARK_GRAFT_ROUTES", "200000").toLong
    // shuffle partitions scale with input so each cover/candidate
    // sort partition stays executor-memory sized (the brief's sizing
    // rule) — a fixed cpus*4 OOMs the 800k-route candidate sort at
    // the default 8g heap; pair with SPARK_DRIVER_MEM for huge runs
    val parts = math.max(cpus.toInt * 4, (nFull / 1500L).toInt)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    for (n <- Seq(nFull / 4, nFull)) {
      val rs = routes(spark, n, n.toDouble / nFull, parts).persist(lvl)
      rs.count()
      val b = rs.select(col("r_id").as("b_id"), col("verts").as("b_verts"))
      val t0 = System.nanoTime()
      val pairs = SpatialJoins.routeIntersectJoin(rs, "r_id", "verts",
          b, "b_id", "b_verts", pieceMeters = 25e3)
        .filter(col("r_id") < col("b_id"))
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"PROBE route_cross routes=$n pairs=$pairs sec=$sec%.1f " +
        f"routes_per_sec=${n / sec}%.0f")
      rs.unpersist()
    }
    spark.stop()
  }
}
