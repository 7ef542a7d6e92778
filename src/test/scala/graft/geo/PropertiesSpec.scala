package graft.geo

import org.scalatest.funsuite.AnyFunSuite
import math.{toRadians, toDegrees, Pi}
import graft.SparkTestSession.rnd

/** Property-based invariants mirroring the reference hypothesis suite
  * (tests/test_util.py:72-90, tests/test_rotation.py:165-177) plus
  * kernel round trips — deterministic splitmix64 case generation
  * (the offline cache carries no scalatest-scalacheck bridge).
  */
class PropertiesSpec extends AnyFunSuite {
  def in(seed: Long, lo: Double, hi: Double): Double = lo + (hi - lo) * rnd(seed)
  val N = 300

  test("ellipsoid registry: ETRS89 reproduces the reference's un-inverted flattening") {
    // upstream parity bug, kept deliberately (reference util.py:59):
    // entry 19 stores the inverse flattening as the flattening. This
    // test exists so nobody "fixes" it into disagreement with the
    // reference — and documents that b < 0 for that entry.
    val e = Ellipsoids("ETRS89")
    assert(e.f == 298.257222101)
    assert(e.b < 0, "expected the (faithful) nonsense polar radius")
    // the adjacent GRS80 entry is the correct ETRS89-compatible choice
    assert(math.abs(Ellipsoids("GRS80").f - 1.0 / 298.257222101) < 1e-9)
  }

  test("nvectorCheckLength flags only significant deviations (util.py:415-450)") {
    assert(VecMath.nvectorCheckLength(Vec3(0, 0, 1)) == 0.0)
    assert(VecMath.nvectorCheckLength(Vec3(0, 0, 1.05)) < 0.1) // below atol
    assert(VecMath.nvectorCheckLength(Vec3(0, 0, 2.0)) == 1.0) // warns
    assert(VecMath.nvectorCheckLength(Vec3(0, 0, 1.2), atol = 0.1) > 0.1)
  }

  test("deg(rad(x)) == x") {
    for (i <- 1 to N) {
      val x = in(i, -1e6, 1e6)
      assert(math.abs(toDegrees(toRadians(x)) - x) <= 1e-9 * math.max(1.0, math.abs(x)))
    }
  }

  test("nthroot(x^n, n) ~= x") {
    for (i <- 1 to N; n <- 2 to 6) {
      val x = in(i * 31L + n, 1e-3, 1e3)
      assert(math.abs(VecMath.nthroot(math.pow(x, n), n) - x) <= 1e-12 * x)
    }
  }

  test("||unit(v)|| == 1 for nonzero v") {
    for (i <- 1 to N) {
      val v = Vec3(in(i * 3L, -1e8, 1e8), in(i * 3L + 1, -1e8, 1e8), in(i * 3L + 2, -1e8, 1e8))
      assert(math.abs(VecMath.unit(v).norm - 1.0) < 1e-12)
    }
  }

  test("lat/lon -> nvec -> lat/lon round trip") {
    for (i <- 1 to N) {
      val lat = in(i * 7L, -89.99, 89.99); val lon = in(i * 7L + 1, -179.99, 179.99)
      val (la, lo) = Gade.nvecToLatLon(Gade.latLonToNvec(toRadians(lat), toRadians(lon)))
      assert(math.abs(toDegrees(la) - lat) < 1e-12)
      assert(math.abs(toDegrees(lo) - lon) < 1e-12)
    }
  }

  test("euler zyx round trip") {
    for (i <- 1 to N) {
      val z = in(i * 11L, -Pi, Pi)
      val y = in(i * 11L + 1, -Pi / 2 + 0.01, Pi / 2 - 0.01)
      val x = in(i * 11L + 2, -Pi, Pi)
      val (z2, y2, x2) = Rot.r2zyx(Rot.zyx2R(z, y, x))
      assert(math.abs(z2 - z) < 1e-10 && math.abs(y2 - y) < 1e-10 &&
        math.abs(x2 - x) < 1e-10)
    }
  }

  test("karney direct(inverse) round trip") {
    for (i <- 1 to N) {
      val lat1 = in(i * 13L, -89.0, 89.0); val lon1 = in(i * 13L + 1, -179.0, 179.0)
      val lat2 = in(i * 13L + 2, -89.0, 89.0); val lon2 = in(i * 13L + 3, -179.0, 179.0)
      val g = Karney.WGS84
      val (s, az1, _) = g.inverse(toRadians(lat1), toRadians(lon1),
        toRadians(lat2), toRadians(lon2))
      val (la2, lo2, _) = g.direct(toRadians(lat1), toRadians(lon1), s, az1)
      assert(math.abs(toDegrees(la2) - lat2) < 1e-8,
        s"case $i lat: ${toDegrees(la2)} vs $lat2 (from $lat1,$lon1)")
      val dLon = math.abs(toDegrees(lo2) - lon2) % 360
      assert(math.min(dLon, 360 - dLon) < 1e-8,
        s"case $i lon: ${toDegrees(lo2)} vs $lon2")
    }
  }

  test("great-circle distance symmetric and triangle inequality") {
    for (i <- 1 to N) {
      def pt(k: Long) = Gade.latLonToNvec(
        toRadians(in(k, -89.0, 89.0)), toRadians(in(k + 1, -179.0, 179.0)))
      val p = pt(i * 17L); val q = pt(i * 17L + 2); val s = pt(i * 17L + 4)
      val r = Gade.greatCircleDistanceRad _
      assert(math.abs(r(p, q) - r(q, p)) < 1e-14)
      assert(r(p, q) <= r(p, s) + r(s, q) + 1e-12)
    }
  }

  test("cell containment: every point is inside its own cell ring at all levels") {
    for (i <- 1 to N; level <- Seq(1, 6, 12, 20, 26)) {
      val p = Gade.latLonToNvec(toRadians(in(i * 19L, -89.9, 89.9)),
        toRadians(in(i * 19L + 1, -179.9, 179.9)))
      val id = graft.index.CellIndex.cellAt(p.x, p.y, p.z, level)
      assert(graft.index.CellIndex.levelOf(id) == level)
      assert(graft.index.CellIndex.ring(id, 0).sameElements(Array(id)))
    }
  }
}
