package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoins

/** Scale probe for the polygon-TABLE joins: SPARK_GRAFT_ROWS points
  * (default 4M) joined against SPARK_GRAFT_POLYS polygons (default
  * 20k; 95% city-block sized, 4% metro, 1% region — the mixed-level
  * path), then polygon-polygon intersection between that table and a
  * 5k second table. Every polygon is a great-circle quad built
  * DISTRIBUTIVELY from hashed centers/half-widths (no driver data);
  * inputs persist before the timed window.
  */
object PolygonScaleProbe {
  private def u(tag: String, c: Column): Column =
    pmod(xxhash64(c, lit(tag)), lit(1000000L)) / 1000000.0

  /** (id, rings) quad table: centers |lat| <= 60 deg, half-widths by
    * the size-class mix, ring-list encoding columns end-to-end.
    */
  private def quads(spark: SparkSession, n: Long, seed: String,
                    parts: Int): DataFrame = {
    import graft.functions.geo
    val d2r = math.Pi / 180.0
    val ids = spark.range(0, n, 1, parts)
    val cls = u(seed + "c", col("id"))
    val half = when(cls < 0.95, lit(0.2) + u(seed + "s", col("id")) * 1.3)
      .when(cls < 0.99, lit(2.0) + u(seed + "m", col("id")) * 4.0)
      .otherwise(lit(10.0) + u(seed + "l", col("id")) * 15.0)
    val base = ids
      .withColumn("__clat", (u(seed + "a", col("id")) * 2.0 - 1.0) * (60.0 * d2r))
      .withColumn("__clon", (u(seed + "o", col("id")) * 2.0 - 1.0) * math.Pi)
      .withColumn("__dla", half * d2r)
      .withColumn("__dlo", (half * (lit(0.6) + u(seed + "r", col("id")))) * d2r)
    def crn(sa: Int, so: Int) = geo.nvec(
      col("__clat") + lit(sa) * col("__dla"),
      col("__clon") + lit(so) * col("__dlo"))
    val ringCols = Seq(lit(1.0), lit(4.0)) ++
      Seq(crn(-1, -1), crn(-1, 1), crn(1, 1), crn(1, -1))
        .flatMap(c => Seq(geo.vx(c), geo.vy(c), geo.vz(c)))
    base.select(col("id"), array(ringCols: _*).as("rings"))
  }

  def main(args: Array[String]): Unit = {
    import graft.functions.geo
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rows = sys.env.getOrElse("SPARK_GRAFT_ROWS", "4000000").toLong
    val nPoly = sys.env.getOrElse("SPARK_GRAFT_POLYS", "20000").toLong
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt * 4)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.maxPlanStringLength", (1 << 20).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val parts = cpus.toInt * 4
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK

    val pts = spark.range(0, rows, 1, parts)
      .select(col("id").as("pid"),
        geo.nvec(asin(u("plat", col("id")) * 2.0 - 1.0),
          (u("plon", col("id")) * 2.0 - 1.0) * math.Pi).as("n"))
      .persist(lvl)
    val polyA = quads(spark, nPoly, "A", parts)
      .withColumnRenamed("id", "a_id").withColumnRenamed("rings", "a_rings")
      .persist(lvl)
    val polyB = quads(spark, nPoly / 4, "B", parts)
      .withColumnRenamed("id", "b_id").withColumnRenamed("rings", "b_rings")
      .persist(lvl)
    pts.count(); polyA.count(); polyB.count()

    val t0 = System.nanoTime()
    val hits = SpatialJoins.polygonJoin(pts, "n", "pid", polyA, "a_id", "a_rings")
      .count()
    val pjSec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE polygon_join rows=$rows polys=$nPoly hits=$hits sec=$pjSec%.1f " +
      f"krows_per_sec=${rows / pjSec / 1000}%.0f")

    val t1 = System.nanoTime()
    val pairs = SpatialJoins.polygonIntersectJoin(
      polyA, "a_id", "a_rings", polyB, "b_id", "b_rings").count()
    val piSec = (System.nanoTime() - t1) / 1e9
    println(f"PROBE polygon_intersect a=$nPoly b=${nPoly / 4} pairs=$pairs " +
      f"sec=$piSec%.1f")
    spark.stop()
  }
}
