package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import math.{Pi, toRadians => rad, toDegrees => deg}

/** Golden worked examples from Gade (2010) Examples 1-10, transcribed
  * from the reference test suite (tests/test_nvector.py:44-336) at the
  * reference tolerance atol=1e-15 (scaled per magnitude below, since
  * assert_allclose also applies rtol=1e-7 — we use far tighter rtol).
  */
class GadeSpec extends AnyFunSuite {
  import Gade._

  def close(actual: Double, expected: Double, atol: Double = 1e-8, rtol: Double = 1e-12): Unit =
    assert(math.abs(actual - expected) <= atol + rtol * math.abs(expected),
      s"expected $expected, got $actual")

  test("Ex1: A and B to delta in frame N") {
    val nA = latLonToNvec(rad(1), rad(2))
    val nB = latLonToNvec(rad(4), rad(5))
    val d = deltaN(nA, nB, zA = 3, zB = 6)
    close(d.x, 331730.23478089)
    close(d.y, 332997.87498927)
    close(d.z, 17404.27136194)
    close(deg(math.atan2(d.y, d.x)), 45.10926324)
  }

  test("Ex2: B and delta in frame B to C in frame E") {
    val pBCb = Vec3(3000, 2000, 100)
    val nEB = VecMath.unit(Vec3(1, 2, 3))
    val zEB = -400.0
    val rNB = Rot.zyx2R(rad(10), rad(20), rad(30))
    val rEN = nvecToREN(nEB)
    val rEB = rEN.mm(rNB)
    val pBCe = rEB.mv(pBCb)
    val (a, f) = (6378135.0, 1.0 / 298.26) // WGS-72
    val (nEC, zEC) = destinationE(nEB, pBCe, zEB, a, f)
    val (lat, lon) = nvecToLatLon(nEC)
    close(deg(lat), 53.32637826)
    close(deg(lon), 63.46812344)
    close(zEC, -406.00719607)
  }

  test("Ex3: ECEF vector to geodetic latitude") {
    val p = Vec3(0.9, -1.0, 1.1) * 6371e3
    val (n, z) = pvecToNvec(p)
    val (lat, lon) = nvecToLatLon(n)
    close(deg(lat), 39.37874867)
    close(deg(lon), -48.0127875)
    close(-z, 4702059.83429485)
  }

  test("Ex4: geodetic latitude to ECEF vector") {
    val n = latLonToNvec(rad(1), rad(2))
    val p = nvecToPvec(n, -3.0)
    close(p.x, 6373290.27721828)
    close(p.y, 222560.20067474)
    close(p.z, 110568.82718179)
  }

  test("Ex5: great circle and euclidean distance") {
    val nA = latLonToNvec(rad(88), rad(0))
    val nB = latLonToNvec(rad(89), rad(-170))
    close(greatCircleDistance(nA, nB, 6371e3) / 1000, 332.45644411)
    close(euclideanDistance(nA, nB, 6371e3) / 1000, 332.41872486)
  }

  test("Ex6: interpolated position") {
    val n0 = latLonToNvec(rad(89), rad(0))
    val n1 = latLonToNvec(rad(89), rad(180))
    val ni = interpolate(n0, n1, (16.0 - 10.0) / (20.0 - 10.0))
    val (lat, lon) = nvecToLatLon(ni)
    close(deg(lat), 89.7999805)
    close(deg(lon), 180.0)
  }

  test("Ex7: mean position") {
    val ns = Seq(latLonToNvec(rad(90), rad(0)),
      latLonToNvec(rad(60), rad(10)), latLonToNvec(rad(50), rad(-20)))
    val m = meanHorizontalPosition(ns)
    close(m.x, 0.3841171702926, atol = 1e-15)
    close(m.y, -0.046602405485689447, atol = 1e-15)
    close(m.z, 0.9221074857571395, atol = 1e-15)
  }

  test("Ex8: position A, azimuth and distance to B") {
    val nA = latLonToNvec(rad(80), rad(-90))
    val nB = sphereReckon(nA, 1000.0 / 6371e3, rad(200))
    val (lat, lon) = nvecToLatLon(nB)
    close(deg(lat), 79.99154867)
    close(deg(lon), -90.01769837)
    val az1 = azimuth(nA, nB, a = 6371e3, f = 0)
    close(rad(200), az1 + 2 * Pi, atol = 1e-12)
  }

  test("Ex9: intersect") {
    val c = intersect(
      latLonToNvec(rad(10), rad(20)), latLonToNvec(rad(30), rad(40)),
      latLonToNvec(rad(50), rad(60)), latLonToNvec(rad(70), rad(80)))
    val (lat, lon) = nvecToLatLon(c)
    close(deg(lat), 40.31864307)
    close(deg(lon), 55.90186788)
  }

  test("Ex10: cross track distance") {
    val a1 = latLonToNvec(rad(0), rad(0))
    val a2 = latLonToNvec(rad(10), rad(0))
    val b = latLonToNvec(rad(1), rad(0.1))
    close(crossTrackDistance(a1, a2, b, greatCircle = true, 6371e3), 11117.79911015)
    close(crossTrackDistance(a1, a2, b, greatCircle = false, 6371e3), 11117.79346741)
  }

  test("small and large cross track distances round-trip") {
    val radius = 6371e3
    val a1 = latLonToNvec(rad(5), rad(10))
    val a2 = latLonToNvec(rad(10), rad(10))
    val b0 = latLonToNvec(rad(7), rad(10.1))
    val b1 = closestPointOnGreatCircle(a1, a2, b0)
    for (sxt0 <- Seq(Pi * radius, Pi / 3 * radius, 10.0, 0.1, 1e-3, 1e-4, 1e-5, 1e-8)) {
      val nB = sphereReckon(b1, sxt0 / radius, Pi / 2)
      val sxt = greatCircleDistance(b1, nB, radius)
      val rtol = math.pow(10, -math.min(9 + math.log10(sxt0), 15))
      assert(math.abs(sxt - sxt0) <= rtol * sxt0 + 1e-15,
        s"round trip $sxt0 -> $sxt")
      if (sxt0 <= Pi / 3 * radius) {
        val b2 = closestPointOnGreatCircle(a1, a2, nB)
        close(b2.x, b1.x, atol = 1e-10); close(b2.y, b1.y, atol = 1e-10)
        close(b2.z, b1.z, atol = 1e-10)
        val sxt3 = crossTrackDistance(a1, a2, nB, greatCircle = true, radius)
        assert(math.abs(sxt3 - sxt0) <= rtol * sxt0 + 1e-15)
      }
    }
  }

  test("on great circle path and interpolation") {
    val radius = 6371e3
    val a1 = latLonToNvec(rad(5), rad(10))
    val a2 = latLonToNvec(rad(10), rad(10))
    val mid = interpolate(a1, a2, 0.5)
    assert(onGreatCirclePath(a1, a2, mid, radius))
    val (lat, _) = nvecToLatLon(mid)
    close(deg(lat), 7.5, atol = 2e-2) // sphere midpoint near mean latitude
    val outside = sphereReckon(a2, 100.0 / radius, 0.0)
    assert(!onGreatCirclePath(a1, a2, outside, radius))
    assert(onGreatCircle(a1, a2, outside, radius, atol = 1e-4))
  }

  test("lat/lon <-> n-vector round trips") {
    for (lat <- -89 to 89 by 7; lon <- -179 to 179 by 13) {
      val n = latLonToNvec(rad(lat), rad(lon))
      val (la, lo) = nvecToLatLon(n)
      close(deg(la), lat, atol = 1e-12)
      close(deg(lo), lon, atol = 1e-12)
      val p = nvecToPvec(n, 123.0)
      val (n2, z2) = pvecToNvec(p)
      close(n2.x, n.x, atol = 1e-14); close(n2.y, n.y, atol = 1e-14)
      close(n2.z, n.z, atol = 1e-14)
      close(z2, 123.0, atol = 1e-6)
    }
  }

  test("poles are non-singular") {
    val np = latLonToNvec(rad(90), rad(0))
    val r = nvecToREN(np)
    close(r.c1.y, 1.0, atol = 0) // east fallback (0,1,0)
    val p = nvecToPvec(np)
    close(p.z, Ellipsoids.WGS84.b, atol = 1e-6)
    val reck = sphereReckon(np, 1000.0 / 6371e3, 0.0)
    assert(!reck.hasNaN)
  }

  test("azimuthSphere follows the reference's back-azimuth convention") {
    // A on the equator, B due east: forward az1 = +pi/2; the reference
    // az2 is the bearing FROM B BACK TO A = -pi/2 (west), core.py:1204
    val (az1, az2) = Gade.azimuthSphere(0.0, 0.0, 0.0, math.Pi / 2)
    close(az1, math.Pi / 2, atol = 1e-15)
    close(az2, -math.Pi / 2, atol = 1e-15)
    // oblique pair: az2 equals recomputing az1 with A and B swapped
    val (a1, a2) = Gade.azimuthSphere(0.3, -0.2, 0.9, 1.1)
    val (b1, _) = Gade.azimuthSphere(0.9, 1.1, 0.3, -0.2)
    close(a2, b1, atol = 1e-12)
    assert(math.abs(a1) > 1e-6)
  }

  test("euler round trips") {
    for ((z, y, x) <- Seq((0.1, -0.4, 1.2), (2.5, 1.2, -2.9), (0.0, 0.0, 0.0))) {
      val r = Rot.zyx2R(z, y, x)
      val (z2, y2, x2) = Rot.r2zyx(r)
      close(z2, z, atol = 1e-12); close(y2, y, atol = 1e-12); close(x2, x, atol = 1e-12)
      val rx = Rot.xyz2R(x, y, z)
      val (x3, y3, z3) = Rot.r2xyz(rx)
      close(x3, x, atol = 1e-12); close(y3, y, atol = 1e-12); close(z3, z, atol = 1e-12)
    }
  }
}
