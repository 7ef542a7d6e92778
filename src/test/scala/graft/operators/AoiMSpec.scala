package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import graft.SparkTestSession
import graft.functions.geo
import graft.geo.Gade
import graft.index.CellKernels
import graft.operators.SpatialJoins.{Aoi, AoiM}

/** Multipolygon / polygon-with-holes AOIs: even-odd containment,
  * signed boundary distance over every ring's edges, and the cover
  * joins — against per-ring single-ring kernels (their own oracle-
  * gated machinery) combined by parity, plus hand geometry including
  * a concave outer, an island-in-a-lake, a disjoint part, and an
  * antimeridian-straddling part.
  */
class AoiMSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val R = graft.geo.Ellipsoids.MeanEarthRadius

  def box(lat0: Double, lat1: Double, lon0: Double, lon1: Double) =
    Seq((lat0, lon0), (lat0, lon1), (lat1, lon1), (lat1, lon0))

  // donut with an island, plus a disjoint antimeridian-straddling part:
  //   outer 30x30 deg box, 12x12 hole, 4x4 island inside the hole,
  //   and a 10x20 box across lon 180
  val outer = box(-15.0, 15.0, -15.0, 15.0)
  val hole = box(-6.0, 6.0, -6.0, 6.0)
  val island = box(-2.0, 2.0, -2.0, 2.0)
  val amPart = Seq((40.0, 170.0), (40.0, -170.0), (50.0, -170.0), (50.0, 170.0))
  val multi = AoiM("m", Seq(outer, hole, island, amPart))

  // concave (L-shaped) outer with a hole in its thick corner
  val lShape = Seq((-10.0, 40.0), (-10.0, 60.0), (0.0, 60.0), (0.0, 50.0),
    (10.0, 50.0), (10.0, 40.0))
  val lHole = box(-8.0, -2.0, 42.0, 48.0)
  val concave = AoiM("c", Seq(lShape, lHole))

  def flat(a: AoiM) = new GenericArrayData(a.flatRings)
  def ringsInside(a: AoiM, p: graft.geo.Vec3): Boolean =
    CellKernels.pointInPolygonRings(p.x, p.y, p.z, flat(a))
  def ringsDist(a: AoiM, p: graft.geo.Vec3): Double =
    CellKernels.boundaryDistSignedRings(p.x, p.y, p.z, flat(a))
  def one(ring: Seq[(Double, Double)], p: graft.geo.Vec3): Boolean =
    CellKernels.pointInPolygon(p.x, p.y, p.z, new GenericArrayData(
      ring.flatMap { case (la, lo) =>
        val v = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
        Seq(v.x, v.y, v.z)
      }.toArray))
  def oneDist(ring: Seq[(Double, Double)], p: graft.geo.Vec3): Double =
    CellKernels.boundaryDistSigned(p.x, p.y, p.z, new GenericArrayData(
      ring.flatMap { case (la, lo) =>
        val v = Gade.latLonToNvec(math.toRadians(la), math.toRadians(lo))
        Seq(v.x, v.y, v.z)
      }.toArray))
  def pt(lat: Double, lon: Double) =
    Gade.latLonToNvec(math.toRadians(lat), math.toRadians(lon))

  test("hand geometry: ring area in, hole out, island in, disjoint + antimeridian parts in") {
    assert(ringsInside(multi, pt(10.0, 10.0)), "outer ring area")
    assert(!ringsInside(multi, pt(4.0, 4.0)), "inside the hole")
    assert(ringsInside(multi, pt(0.0, 0.0)), "island inside the hole")
    assert(!ringsInside(multi, pt(20.0, 0.0)), "outside everything")
    assert(ringsInside(multi, pt(45.0, 179.0)), "antimeridian part, east side")
    assert(ringsInside(multi, pt(45.0, -179.0)), "antimeridian part, west side")
    assert(!ringsInside(multi, pt(45.0, 160.0)), "west of the antimeridian part")
    assert(ringsInside(concave, pt(5.0, 45.0)), "thin arm of the L")
    assert(ringsInside(concave, pt(-9.5, 55.0)), "thick base of the L")
    assert(!ringsInside(concave, pt(5.0, 55.0)), "concave notch")
    assert(!ringsInside(concave, pt(-5.0, 45.0)), "hole in the L")
  }

  test("even-odd equals per-ring single-ring kernels combined by parity") {
    val rnd = new scala.util.Random(7)
    (0 until 4000).foreach { _ =>
      val lat = rnd.nextDouble() * 140.0 - 70.0
      val lon = rnd.nextDouble() * 360.0 - 180.0
      val p = pt(lat, lon)
      for (a <- Seq(multi, concave)) {
        val want = a.ringsLatLonDeg.count(one(_, p)) % 2 == 1
        assert(ringsInside(a, p) == want, s"parity mismatch at ($lat, $lon) for ${a.id}")
        val wantD = {
          val m = a.ringsLatLonDeg.map(r => math.abs(oneDist(r, p))).min
          if (want) -m else m
        }
        val got = ringsDist(a, p)
        assert(math.abs(got - wantD) < 1e-12,
          s"boundary dist mismatch at ($lat, $lon) for ${a.id}: $got vs $wantD")
      }
    }
  }

  test("aoiJoinM / aoiBufferJoinM / aoiBoundaryDistanceM match the driver brute force") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 3000).map { i =>
      (i.toLong, rnd.nextDouble() * 140.0 - 70.0, rnd.nextDouble() * 360.0 - 180.0)
    }
    val df = rows.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val aois = Seq(multi, concave)

    val gotIn = SpatialJoins.aoiJoinM(df, "n", aois)
      .select("id", "aoi_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val wantIn = (for ((i, la, lo) <- rows; a <- aois if ringsInside(a, pt(la, lo)))
      yield (i, a.id)).toSet
    assert(gotIn == wantIn,
      s"aoiJoinM diff: +${(gotIn -- wantIn).take(5)} -${(wantIn -- gotIn).take(5)}")

    val buf = 300e3
    val gotBuf = SpatialJoins.aoiBufferJoinM(df, "n", aois, buf)
      .select("id", "aoi_id").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val wantBuf = (for ((i, la, lo) <- rows; a <- aois
      if ringsDist(a, pt(la, lo)) * R <= buf) yield (i, a.id)).toSet
    assert(gotBuf == wantBuf,
      s"aoiBufferJoinM diff: +${(gotBuf -- wantBuf).take(5)} -${(wantBuf -- gotBuf).take(5)}")

    val gotD = SpatialJoins.aoiBoundaryDistanceM(df, "n", aois)
      .select("id", "aoi_id", "dist_m").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(gotD.size == rows.size * aois.size)
    rows.foreach { case (i, la, lo) =>
      aois.foreach { a =>
        val want = ringsDist(a, pt(la, lo)) * R
        assert(math.abs(gotD((i, a.id)) - want) < 1e-6,
          s"boundary dist mismatch id=$i aoi=${a.id}")
      }
    }
  }

  test("single-ring AoiM agrees with the gated single-ring Aoi operators") {
    val ring = box(-20.0, 25.0, -40.0, 10.0)
    val rnd = new scala.util.Random(13)
    val df = (0 until 2000).map { i =>
      (i.toLong, rnd.nextDouble() * 120.0 - 60.0, rnd.nextDouble() * 360.0 - 180.0)
    }.toDF("id", "lat", "lon")
      .select(col("id"), geo.nvecDeg(col("lat"), col("lon")).as("n"))
    val a = SpatialJoins.aoiJoin(df, "n", Seq(Aoi("x", ring)))
      .select("id").collect().map(_.getLong(0)).toSet
    val m = SpatialJoins.aoiJoinM(df, "n", Seq(AoiM("x", Seq(ring))))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(a == m)
    val da = SpatialJoins.aoiBoundaryDistance(df, "n", Seq(Aoi("x", ring)))
      .select("id", "dist_m").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val dm = SpatialJoins.aoiBoundaryDistanceM(df, "n", Seq(AoiM("x", Seq(ring))))
      .select("id", "dist_m").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(da.keySet == dm.keySet)
    da.foreach { case (k, v) => assert(math.abs(dm(k) - v) < 1e-12) }
  }

  test("validation rejects degenerate and near-hemispheric rings") {
    intercept[IllegalArgumentException] {
      AoiM("bad", Seq(Seq((0.0, 0.0), (1.0, 1.0))))
    }
    intercept[IllegalArgumentException] {
      // equatorial sliver spanning 200 deg of longitude: farthest
      // vertex is ~100 deg from the ring's vertex centroid
      AoiM("wide", Seq((0 to 8).map(i => (0.0 + (i % 2), i * 25.0)),
        box(0.0, 1.0, 0.0, 1.0))).validated
    }
  }
}
