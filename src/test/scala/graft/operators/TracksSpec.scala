package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.{Gade, Vec3}
import math.{toRadians => rad, toDegrees => deg}

class TracksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def trackDf(points: Seq[(Long, Double, Double, Double)]) =
    points.toDF("track", "t", "latd", "lond")
      .withColumn("n", geo.nvecDeg(col("latd"), col("lond")))
      .drop("latd", "lond")

  test("linear interpolation matches Gade Ex6") {
    val fixes = trackDf(Seq((1L, 10.0, 89.0, 0.0), (1L, 20.0, 89.0, 180.0)))
    val queries = Seq((1L, 16.0)).toDF("track", "t")
    val out = Tracks.interpolateLinear(fixes, queries, "track", "t", "n")
    val r = out.select(geo.latDeg(col("n")), geo.lonDeg(col("n"))).collect()(0)
    assert(math.abs(r.getDouble(0) - 89.7999805) < 1e-7)
    assert(math.abs(math.abs(r.getDouble(1)) - 180.0) < 1e-7)
  }

  test("interpolation brackets correctly along a multi-fix track") {
    val fixes = trackDf((0 to 10).map(i => (7L, i * 10.0, 50.0 + i, 6.0)))
    val queries = Seq((7L, 25.0), (7L, 0.0), (7L, 100.0), (7L, 777.0)).toDF("track", "t")
    val rows = Tracks.interpolateLinear(fixes, queries, "track", "t", "n")
      .select(col("t"), geo.latDeg(col("n")).as("lat"))
      .collect().map(r => r.getDouble(0) -> (if (r.isNullAt(1)) Double.NaN else r.getDouble(1))).toMap
    assert(math.abs(rows(25.0) - 52.5) < 1e-2)
    assert(math.abs(rows(0.0) - 50.0) < 1e-9)
    assert(math.abs(rows(100.0) - 60.0) < 1e-9)
    assert(rows(777.0).isNaN) // outside span -> null
  }

  test("savgol filter reproduces polynomials exactly") {
    // a quadratic track signal must be invariant under SG(polyorder=2)
    val c = Tracks.savgolCoefficients(7, 2)
    assert(math.abs(c.sum - 1.0) < 1e-12)
    def poly(x: Double) = 3.0 + 0.5 * x - 0.02 * x * x
    val smoothedCenter = (0 until 7).map(k => c(k) * poly(k - 3.0)).sum
    assert(math.abs(smoothedCenter - poly(0.0)) < 1e-10)
  }

  test("savgol smoothing denoises a track") {
    def noisy(i: Int): Double = 10.0 + i * 0.1 + (if (i % 2 == 0) 0.01 else -0.01)
    val fixes = trackDf((0 until 40).map(i => (3L, i.toDouble, noisy(i), 5.0)))
    val out = Tracks.savgolSmooth(fixes, "track", "t", "n", 9, 2)
      .withColumn("lat", geo.latDeg(col("n")))
      .orderBy("t").collect()
    // interior points should be close to the clean trend
    (10 until 30).foreach { i =>
      val clean = 10.0 + i * 0.1
      assert(math.abs(out(i).getAs[Double]("lat") - clean) < 2e-3,
        s"at $i: ${out(i).getAs[Double]("lat")} vs $clean")
    }
  }

  test("savgol interp mode reproduces polynomials exactly at the edges") {
    // a quadratic latitude trend must be exactly reproduced everywhere
    // under mode="interp" (nearest-mode edges are biased)
    def quad(i: Int): Double = 20.0 + 0.3 * i - 0.004 * i * i
    val fixes = trackDf((0 until 25).map(i => (4L, i.toDouble, quad(i), 5.0)))
    val out = Tracks.savgolSmooth(fixes, "track", "t", "n", 9, 2, mode = "interp")
      .withColumn("lat", geo.latDeg(col("n")))
      .orderBy("t").collect()
    (0 until 25).foreach { i =>
      assert(math.abs(out(i).getAs[Double]("lat") - quad(i)) < 2e-5,
        s"interp edge at $i: ${out(i).getAs[Double]("lat")} vs ${quad(i)}")
    }
  }

  test("course over ground matches the scalar kernel") {
    val pts = Seq((0.0, 59.381509, 10.496590), (1.0, 59.387647, 10.494713),
      (2.0, 59.390000, 10.490000), (3.0, 59.395000, 10.480000))
    val fixes = trackDf(pts.map { case (t, la, lo) => (9L, t, la, lo) })
    val got = Tracks.courseOverGround(fixes, "track", "t", "n")
      .orderBy("t").select("cog").collect().map(_.getDouble(0))
    val expected = Gade.courseOverGround(
      pts.map { case (_, la, lo) => Gade.latLonToNvec(rad(la), rad(lo)) }.toIndexedSeq)
    got.zip(expected).foreach { case (g, e) =>
      assert(math.abs(g - e) < 1e-9, s"got $g expected $e")
    }
    // single-point track -> NaN
    val lone = Tracks.courseOverGround(trackDf(Seq((5L, 0.0, 10.0, 10.0))),
      "track", "t", "n").select("cog").collect()(0).getDouble(0)
    assert(lone.isNaN)
  }
}
