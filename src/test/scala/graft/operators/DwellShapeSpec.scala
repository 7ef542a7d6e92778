package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.Gade
import graft.geo.Ellipsoids.MeanEarthRadius

/** trackDwell's interval-attribution contract against hand-built
  * tracks, and polygonPerimeter/compactness against independent
  * driver-side arc sums.
  */
class DwellShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val fence = SpatialJoins.Aoi("f", Seq(
    (-1.0, -1.0), (-1.0, 1.0), (1.0, 1.0), (1.0, -1.0)))

  private def track(rows: Seq[(Long, java.lang.Long, Double, Double)]) =
    rows.toDF("trk", "t", "lat", "lon")
      .withColumn("nv", geo.nvec(radians(col("lat")), radians(col("lon"))))

  test("trackDwell attributes each interval to its starting state") {
    // trk 0: out(t=0) in(10) in(25) out(30) -> [10,25)+[25,30) = 20
    // trk 1: never inside -> zero-dwell row still present
    // trk 2: ends INSIDE -> the last fix anchors no interval
    val pts = track(Seq(
      (0L, 0L, 0.0, -2.0), (0L, 10L, 0.0, 0.0), (0L, 25L, 0.5, 0.5),
      (0L, 30L, 0.0, 2.0),
      (1L, 0L, 5.0, 5.0), (1L, 7L, 6.0, 6.0),
      (2L, 0L, 0.0, -2.0), (2L, 4L, 0.0, 0.0)))
    val got = SpatialJoins.trackDwell(pts, "trk", "t", "nv", Seq(fence))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(2), r.getLong(3)))).toMap
    assert(got == Map(0L -> (20.0, 2L), 1L -> (0.0, 0L), 2L -> (0.0, 1L)))
  }

  test("trackDwell drops null-time and null-position rows by the track contract") {
    val pts = track(Seq(
      (0L, 0L, 0.0, 0.0), (0L, 10L, 0.3, 0.3), (0L, 20L, 0.0, 2.0)))
      .unionByName(Seq((0L, null.asInstanceOf[java.lang.Long], 0.4, 0.4))
        .toDF("trk", "t", "lat", "lon")
        .withColumn("nv", geo.nvec(radians(col("lat")), radians(col("lon")))))
      .unionByName(Seq((0L, 5L)).toDF("trk", "t")
        .withColumn("lat", lit(null).cast("double"))
        .withColumn("lon", lit(null).cast("double"))
        .withColumn("nv", lit(null).cast(
          "struct<x:double,y:double,z:double>")))
    val got = SpatialJoins.trackDwell(pts, "trk", "t", "nv", Seq(fence))
      .collect().map(r => (r.getDouble(2), r.getLong(3)))
    // with the two null rows gone: in(0) in(10) out(20) -> 20 units
    assert(got.toSeq == Seq((20.0, 2L)))
  }

  private def gcRad(a: (Double, Double), b: (Double, Double)): Double = {
    val u = Gade.latLonToNvec(math.toRadians(a._1), math.toRadians(a._2))
    val v = Gade.latLonToNvec(math.toRadians(b._1), math.toRadians(b._2))
    val c = u cross v
    math.atan2(c.norm, u dot v)
  }

  test("polygonPerimeter equals the driver-side edge-arc sum") {
    val vs = Seq((10.0, 20.0), (10.0, 35.0), (25.0, 35.0), (25.0, 20.0))
    val expected = vs.indices
      .map(i => gcRad(vs(i), vs((i + 1) % vs.length))).sum * MeanEarthRadius
    val cols = vs.map { case (la, lo) =>
      geo.nvec(lit(math.toRadians(la)), lit(math.toRadians(lo))) }
    val got = spark.range(1)
      .select(geo.polygonPerimeter(cols).as("p")).head().getDouble(0)
    assert(math.abs(got - expected) / expected < 1e-12)
  }

  test("isoperimetric compactness: near-circle ~ 1, elongated strip << 1") {
    def shape(vs: Seq[(Double, Double)]): Double = {
      val cols = vs.map { case (la, lo) =>
        geo.nvec(lit(math.toRadians(la)), lit(math.toRadians(lo))) }
      val per = geo.polygonPerimeter(cols)
      spark.range(1)
        .select((lit(4.0 * math.Pi) * geo.polygonArea(cols) / (per * per)).as("c"))
        .head().getDouble(0)
    }
    val circle36 = (0 until 36).map { j =>
      val a = 2.0 * math.Pi * j / 36.0
      (5.0 * math.cos(a), 5.0 * math.sin(a))
    }
    val strip = Seq((0.0, 0.0), (0.0, 40.0), (0.5, 40.0), (0.5, 0.0))
    assert(shape(circle36) > 0.95 && shape(circle36) <= 1.0)
    assert(shape(strip) < 0.2)
  }
}
